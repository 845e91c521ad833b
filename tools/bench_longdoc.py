"""Hot-ROW probe: one pathological multi-megabyte document through the
text/dedup operators.

Round 10/11 probed hot KEYS (zipfian joins, hot LSH bands); nothing has
probed hot ROWS — yet a 100 TB crawl always contains a handful of
monster documents (concatenated logs, minified JS, genome dumps), and
Spark's unit of parallelism is the row for every per-document transform:
a 1M-token document is ONE task's problem. The shingle pipeline
amplifies it — k-grams build a ~token-count array of ~20-char strings
(~40 MB in one row at 1M tokens), then the MinHash base pass hashes each
shingle and 16 permutations scan the base array.

Measures, per planted document size (tokens), on a corpus of `--docs`
normal documents plus ONE monster:

- wall for shingles() alone (materialised via noop),
- wall for the full minhash_lsh_pairs screen,
- wall for textstats quality_score + token_count (per-row but linear),
- the same corpus WITHOUT the monster as the contrast row.

Usage:
    python tools/bench_longdoc.py [--docs 2000] [--sizes 10000,100000,1000000]
                                  [--out SCALING_longdoc_r11.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_anonymiser_minimiser_spark.operators import dedup as D  # noqa: E402
from database_anonymiser_minimiser_spark.operators import textstats as T  # noqa: E402
from database_anonymiser_minimiser_spark.session import get_spark  # noqa: E402

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def corpus(spark, n_docs: int, monster_tokens: int | None):
    """n_docs ~60-token docs; optionally one monster_tokens-token doc
    (deterministic pseudo-text so runs are comparable)."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(WORDS[i % len(WORDS)]),
                    ((F.col("id") * (i + 3)) % 997).cast("string"),
                )
                for i in range(60)
            ],
        ).alias("text"),
    )
    if monster_tokens is None:
        return base
    # one row whose text is monster_tokens whitespace-separated tokens;
    # build JVM-side (a Python literal of that size would bloat the plan)
    monster = spark.range(1).select(
        F.lit(10_000_000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(monster_tokens - 1)),
                lambda i: F.concat(F.lit("w"), (i % 50021).cast("string")),
            ),
            " ",
        ).alias("text"),
    )
    return base.unionByName(monster)


def timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--sizes", default="10000,100000,1000000")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="bench_longdoc")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for label, monster in [("baseline", None)] + [
        (f"monster_{s}", int(s)) for s in args.sizes.split(",")
    ]:
        df = corpus(spark, args.docs, monster).persist()
        df.count()
        r = {
            "corpus": label,
            "shingles_s": timed(
                lambda: D.shingles(df)
                .write.format("noop")
                .mode("overwrite")
                .save()
            ),
            "minhash_lsh_s": timed(
                lambda: D.minhash_lsh_pairs(df, threshold=0.5).count()
            ),
            "textstats_s": timed(
                lambda: df.select(
                    T.quality_score_column(F.col("text")).alias("q"),
                    F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n"),
                )
                .agg(F.sum("q"), F.sum("n"))
                .collect()
            ),
        }
        df.unpersist()
        rows.append(r)
        print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"docs": args.docs, "results": rows}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Measure the PII discovery sample-mode convergence claim (r8 verdict
item 5): ``discovery.py`` asserts "hit-RATES converge long before 1% of
rows" — this tool turns that into numbers at a given scale corpus.

Method: profile the corpus tables (the driver query's three fixtures:
customer, events, salted documents) PLUS two deliberately MARGINAL
columns synthesized from documents — an email-bearing column at exactly
35% hit rate (just above the 30% threshold) and one at 25% (just
below) — at sample fractions {0.001, 0.01, 0.1} and full scan. The
marginal columns are the honest probe: the real fixtures sit at ~0% or
~100% where sampling trivially converges; the threshold-adjacent
columns are where a sampled rate could flip a suggestion.

For each fraction: wall time (profile persisted once, suggestions
consume it — same shape as Engine.scan_pii), the sampled hit-rate of
the marginal columns, and the full suggestion list. Output: one JSON
line per fraction plus a convergence verdict (smallest fraction whose
suggestions match the full scan's exactly).

Run: ``python tools/bench_pii_sample.py [sf_dir]`` (default
/tmp/dbmask_scale/sf4; regenerate corpora per TESTDATA/COVERAGE notes).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from database_anonymiser_minimiser_spark import queries as Q  # noqa: E402
from database_anonymiser_minimiser_spark.operators.discovery import (  # noqa: E402
    profile_pii,
    suggest_rules,
)
from database_anonymiser_minimiser_spark.session import get_spark  # noqa: E402


def tables_for(spark, sf_dir):
    docs = Q.load(spark, sf_dir, "documents")
    # threshold-adjacent fixture: doc_id % 100 gives exact 35% / 25%
    # email rates (corpus doc_ids are dense 0..n-1, so the rate is exact
    # on the full scan and Bernoulli-noisy on samples — the probe)
    marginal = docs.select(
        (
            F.when(
                F.pmod("doc_id", F.lit(100)) < 35,
                F.concat(F.lit("u"), F.col("doc_id").cast("string"), F.lit("@ex.com")),
            ).otherwise(F.lit("plain text"))
        ).alias("contact_35pct"),
        (
            F.when(
                F.pmod("doc_id", F.lit(100)) < 25,
                F.concat(F.lit("u"), F.col("doc_id").cast("string"), F.lit("@ex.com")),
            ).otherwise(F.lit("plain text"))
        ).alias("contact_25pct"),
    )
    return [
        ("customer", Q.load(spark, sf_dir, "customer"), ["c_name", "c_mktsegment"]),
        ("events", Q.load(spark, sf_dir, "events"), ["event_type", "props"]),
        ("documents", docs.select(F.col("text").alias("doc_text")), ["doc_text"]),
        ("marginal", marginal, ["contact_35pct", "contact_25pct"]),
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dbmask_scale/sf4"
    spark = get_spark(app_name="pii-sample-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm footers/JIT once so fraction walls compare plans, not first-touch
    for _, df, cols in tables_for(spark, sf_dir):
        df.select(cols[0]).write.mode("overwrite").format("noop").save()

    results = []
    for frac in (None, 0.1, 0.01, 0.001):
        t0 = time.perf_counter()
        parts = [
            profile_pii(df, name, columns=cols, sample_fraction=frac)
            for name, df, cols in tables_for(spark, sf_dir)
        ]
        profile = reduce(DataFrame.unionAll, parts).persist()
        prof_rows = profile.collect()
        sugg = suggest_rules(profile).collect()
        profile.unpersist()
        wall = round(time.perf_counter() - t0, 3)
        rates = {
            f"{r.table_name}.{r.column_name}": round(r.hits / max(r.n_nonnull, 1), 4)
            for r in prof_rows
            if r.detector == "email" and r.table_name == "marginal"
        }
        rules = sorted(
            (r.table_name, r.column_name, r.suggested_rule)
            for r in sugg
            if r.suggested_rule is not None
        )
        results.append(
            {
                "fraction": frac or 1.0,
                "wall_sec": wall,
                "marginal_email_rates": rates,
                "suggestions": ["{}.{}={}".format(*x) for x in rules],
            }
        )
        print(json.dumps(results[-1]))

    full = results[0]["suggestions"]
    converged = [
        r["fraction"] for r in results[1:] if r["suggestions"] == full
    ]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "full_suggestions": full,
                "fractions_matching_full": converged,
                "verdict": (
                    "converged at every tested fraction"
                    if len(converged) == len(results) - 1
                    else f"diverges below fraction {min(converged) if converged else 'ALL'}"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

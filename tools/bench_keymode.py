"""MinHash key_mode crossover: one same-session A/B curve (r10 verdict
item 3).

The engine defaults to key_mode="hashed" (xxhash64 shingle + band keys);
driver r10 showed the production path 1.9x the md5 reference at sf0.1
while the r9 measurement showed 0.73x/0.87x at sf1/sf4 — two numbers
from two different rounds' tables. This tool turns the inference into
one recorded curve: both modes, both scales, SAME session, interleaved
runs (machine drift hits both sides), medians reported with the
crossover scale stated.

What is being measured: ``minhash_lsh_pairs(documents, threshold=0.5)``
exactly as the registered queries run it (dedup_minhash_lsh = md5,
dedup_minhash_lsh_xxhash = xxhash). Row counts are recorded per
mode/scale — the pair sets may differ at the LSH margin BY DESIGN, so
counts are reported, not asserted equal.

Usage:
    python tools/gen_corpus.py --sf 1 --out /tmp/dbmask_scale/sf1   # once
    python tools/bench_keymode.py [--runs 5] [--out keymode_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/tmp/dbmask_scale/sf1"),
]
MODES = ["xxhash", "md5"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from database_anonymiser_minimiser_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from database_anonymiser_minimiser_spark.queries import load
    from database_anonymiser_minimiser_spark.session import get_spark

    spark = get_spark(app_name="bench-keymode")
    spark.sparkContext.setLogLevel("ERROR")

    def run(sf_dir: str, mode: str) -> tuple[float, int]:
        t = time.monotonic()
        n = minhash_lsh_pairs(
            load(spark, sf_dir, "documents"), threshold=0.5, mode=mode
        ).count()
        return time.monotonic() - t, n

    results: dict[str, dict] = {}
    for label, sf_dir in POINTS:
        if not os.path.isdir(sf_dir):
            print(f"skip {label}: {sf_dir} missing", file=sys.stderr)
            continue
        for mode in MODES:  # warm both sides before timing either
            run(sf_dir, mode)
        ts: dict[str, list[float]] = {m: [] for m in MODES}
        rows: dict[str, int] = {}
        for _ in range(args.runs):  # interleaved: drift hits both modes
            for mode in MODES:
                wall, n = run(sf_dir, mode)
                ts[mode].append(wall)
                rows[mode] = n
        med = {m: statistics.median(ts[m]) for m in MODES}
        results[label] = {
            "median_sec": med,
            "ratio_xxhash_over_md5": med["xxhash"] / med["md5"],
            "runs": ts,
            "pairs": rows,
        }
        print(
            f"{label}: xxhash {med['xxhash']:.3f}s  md5 {med['md5']:.3f}s  "
            f"ratio {med['xxhash'] / med['md5']:.2f}x  pairs {rows}"
        )

    out = {"tool": "bench_keymode", "runs_per_point": args.runs,
           "points": results}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Small-files input scale probe (r12): how much does lake
fragmentation cost at scan time, and does compaction recover it?

Every axis probed so far varied the DATA (size, skew, width, heap);
this one varies the FILE LAYOUT of the same bytes: the documents table
written as N tiny files vs compacted ~128 MB files. At 100 TB a
streaming-append lake can hold millions of files, and every file costs
a footer read, an open, and a scheduling slot — the classic silent
scan-time tax. The fix under test is the generic ``compact`` verb
(operators/compaction.py).

Usage:
    python tools/bench_smallfiles.py [--sf-dir /root/testdata/sf0.1]
        [--fragments 512,2048] [--out SCALING_smallfiles_r12.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--fragments", default="512,2048")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.operators.compaction import (
        compact_dataset,
        dataset_file_stats,
    )
    from database_anonymiser_minimiser_spark.queries import load
    from database_anonymiser_minimiser_spark.session import get_spark

    spark = get_spark(app_name="bench-smallfiles")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, args.sf_dir, "documents")

    def scan_wall(path: str) -> float:
        # a representative scan+agg (token totals per lang) — the cost
        # under test is file opens, so the query body is scan-bound
        df = spark.read.parquet(path)
        q = lambda: df.groupBy("lang").agg(  # noqa: E731
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
        ).collect()
        q()  # warm
        runs = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            q()
            runs.append(time.monotonic() - t0)
        runs.sort()
        return round(runs[len(runs) // 2], 3)

    work = tempfile.mkdtemp(prefix="smallfiles_")
    results: dict = {}
    try:
        for n_frag in [int(x) for x in args.fragments.split(",")]:
            frag = os.path.join(work, f"frag_{n_frag}")
            docs.repartition(n_frag).write.parquet(frag)
            n_files, total = dataset_file_stats(spark, frag)
            wall_frag = scan_wall(frag)
            compacted = os.path.join(work, f"compact_{n_frag}")
            t0 = time.monotonic()
            stats = compact_dataset(spark, frag, compacted, target_mb=128)
            compact_wall = round(time.monotonic() - t0, 3)
            wall_comp = scan_wall(compacted)
            results[str(n_frag)] = {
                "files_fragmented": n_files,
                "total_bytes": total,
                "scan_fragmented_s": wall_frag,
                "files_compacted": stats["files_after"],
                "rows_verified": stats["rows"],
                "compact_wall_s": compact_wall,
                "scan_compacted_s": wall_comp,
                "speedup": round(wall_frag / max(wall_comp, 1e-9), 2),
            }
            print(json.dumps({str(n_frag): results[str(n_frag)]}), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    line = json.dumps(
        {"tool": "bench_smallfiles", "sf_dir": args.sf_dir, "results": results}
    )
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

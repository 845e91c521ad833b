"""Per-epoch wall of the streaming near-dup ingest screen, bucketed vs
plain-partitioned index layout (r11: the screen's default moved to the
bucketed index).

The claim under test: with the bucketed layout, the per-micro-batch
screen reads the corpus-sized landed side as co-located buckets (no
index-side Exchange), so per-epoch wall should stay flat-ish as epochs
accumulate and should not exceed the plain layout's (which re-shuffles
the landed side every epoch). Also records the file-count trajectory
with and without --compact-every, the other half of the r11 work.

Setup: seed = the corpus documents table; the spool is the same table
split into N equal parquet files (so each epoch screens a real text
batch against a growing landed side).

Usage:
    python tools/bench_screen.py [--sf-dir /root/testdata/sf0.1]
        [--epochs 8] [--out screen_bench.json]
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
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.queries import load
    from database_anonymiser_minimiser_spark.session import get_spark
    from database_anonymiser_minimiser_spark.streaming import events as SE

    spark = get_spark(app_name="bench-screen")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, args.sf_dir, "documents").select("doc_id", "text")
    # landed = even doc_ids; spool = odd doc_ids split into N files
    landed_df = docs.filter(F.col("doc_id") % 2 == 0)
    arriving = docs.filter(F.col("doc_id") % 2 == 1)

    work = tempfile.mkdtemp(prefix="screen_bench_")
    landed = os.path.join(work, "landed")
    spool = os.path.join(work, "spool")
    landed_df.write.mode("overwrite").parquet(landed)
    os.makedirs(spool)
    # N spool files with deterministic arrival order
    # doc_ids on the arriving side are all odd — hash-split so every
    # epoch file is non-empty (pmod(doc_id, epochs) would leave the
    # even-residue parts empty for even epoch counts)
    parts = arriving.withColumn(
        "part", F.pmod(F.xxhash64("doc_id"), F.lit(args.epochs))
    )
    for i in range(args.epochs):
        one = os.path.join(work, f"stage{i}")
        parts.filter(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "overwrite"
        ).parquet(one)
        pq = [f for f in os.listdir(one) if f.endswith(".parquet")][0]
        dst = os.path.join(spool, f"part{i:04d}.parquet")
        shutil.move(os.path.join(one, pq), dst)
        os.utime(dst, (1700000000 + i, 1700000000 + i))
        shutil.rmtree(one, ignore_errors=True)

    # per-epoch timing: wrap the sink by timing each foreachBatch call
    # from OUTSIDE via a monkeypatched screen — simplest reliable probe
    # is to process the spool one file at a time with maxFilesPerTrigger
    # already 1 and record per-progress durationMs from the listener
    from pyspark.sql.streaming import StreamingQueryListener

    class _Epochs(StreamingQueryListener):
        def __init__(self):
            self.walls = []

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            if p.numInputRows:
                self.walls.append(
                    (p.batchId, p.durationMs.get("triggerExecution"))
                )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    results = {}
    for layout in ("bucketed", "partitioned"):
        cap = _Epochs()
        spark.streams.addListener(cap)
        prefix = f"bench_screen_{layout}"
        for t in (f"{prefix}_bands", f"{prefix}_shingles"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        idx = os.path.join(work, f"idx_{layout}")
        t0 = time.monotonic()
        flagged = SE.run_streaming_neardup_ingest(
            spark, landed, spool, idx, threshold=0.5,
            layout=layout, table_prefix=prefix, n_buckets=args.n_buckets,
        )
        total = time.monotonic() - t0
        time.sleep(2)
        spark.streams.removeListener(cap)
        results[layout] = {
            "total_sec": round(total, 3),
            "flagged": len(flagged),
            "per_epoch_trigger_ms": sorted(cap.walls),
        }
        print(f"{layout}: {results[layout]}", flush=True)
        for t in (f"{prefix}_bands", f"{prefix}_shingles"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    # compaction file-count trajectory (bucketed only, fresh index)
    from database_anonymiser_minimiser_spark.operators.dedup import (  # noqa: E501
        save_minhash_index_bucketed,
    )

    def count_files(root):
        return sum(
            1
            for dp, _dn, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        )

    for compact_every in (None, 3):
        prefix = "bench_screen_cmp"
        for t in (f"{prefix}_bands", f"{prefix}_shingles"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        idx = os.path.join(work, f"idx_cmp_{compact_every}")
        SE.run_streaming_neardup_ingest(
            spark, landed, spool, idx, threshold=0.5,
            table_prefix=prefix, n_buckets=args.n_buckets,
            compact_every=compact_every,
        )
        n_parts = len(
            spark.sql(f"SHOW PARTITIONS {prefix}_bands").collect()
        )
        loc_row = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {prefix}_bands")
            .filter("col_name = 'Location'")
            .first()
        )
        files = count_files(loc_row["data_type"].removeprefix("file:"))
        results[f"files_compact_every_{compact_every}"] = {
            "bands_parquet_files": files,
            "batch_partitions": n_parts,
        }
        print(f"compact_every={compact_every}: files={files} parts={n_parts}",
              flush=True)
        for t in (f"{prefix}_bands", f"{prefix}_shingles"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    shutil.rmtree(work, ignore_errors=True)
    line = json.dumps({"tool": "bench_screen", "epochs": args.epochs,
                       "sf_dir": args.sf_dir, "results": results})
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

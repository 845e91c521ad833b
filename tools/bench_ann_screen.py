"""Scale probe of the persisted ANN index (r13): seed cost, per-epoch
streaming-screen wall as the index grows, the compaction file-count
trajectory, and the nprobe sweep of the batch screen.

Claims under test:
- the per-micro-batch screen's wall stays flat-ish as epochs accumulate
  (the index side is never shuffled: broadcast delta + DPP cell seek),
- without compact_every the index's file count grows linearly with
  ingest history and with it the scan's open/footer cost; with it the
  count stays bounded,
- batch-screen wall decreases as nprobe shrinks (fewer cell directories
  read), with nprobe=k equal to the exhaustive screen.

Usage:
    python tools/bench_ann_screen.py [--sf-dir /root/testdata/sf0.1]
        [--epochs 8] [--num-centroids 16] [--out SCALING_ann_r13.json]
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


def count_files(root):
    return sum(
        1
        for _dp, _dn, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--num-centroids", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.35)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.operators import similarity as S
    from database_anonymiser_minimiser_spark.queries import load
    from database_anonymiser_minimiser_spark.session import get_spark
    from database_anonymiser_minimiser_spark.streaming.events import (
        run_streaming_ann_screen,
    )

    spark = get_spark(app_name="bench-ann-screen")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load(spark, args.sf_dir, "embeddings").select("vec_id", "embedding")
    n_total = emb.count()
    landed_df = emb.filter(F.col("vec_id") % 2 == 0)
    arriving = emb.filter(F.col("vec_id") % 2 == 1)

    work = tempfile.mkdtemp(prefix="ann_screen_bench_")
    landed = os.path.join(work, "landed")
    spool = os.path.join(work, "spool")
    landed_df.write.mode("overwrite").parquet(landed)
    os.makedirs(spool)
    parts = arriving.withColumn(
        "part", F.pmod(F.xxhash64("vec_id"), F.lit(args.epochs))
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

    results = {
        "sf_dir": args.sf_dir,
        "n_vectors": n_total,
        "epochs": args.epochs,
        "num_centroids": args.num_centroids,
    }

    # one-time seed cost (the amortised half)
    seed_idx = os.path.join(work, "idx_seed_probe")
    t0 = time.monotonic()
    S.save_ann_index(
        landed_df, seed_idx, num_centroids=args.num_centroids
    )
    results["seed_sec"] = round(time.monotonic() - t0, 3)

    for label, compact_every in (("no_compact", None), ("compact_4", 4)):
        cap = _Epochs()
        spark.streams.addListener(cap)
        idx = os.path.join(work, f"idx_{label}")
        t0 = time.monotonic()
        flagged = run_streaming_ann_screen(
            spark, landed, spool, idx,
            threshold=args.threshold, nprobe=2,
            num_centroids=args.num_centroids,
            compact_every=compact_every,
        )
        total = time.monotonic() - t0
        time.sleep(2)
        spark.streams.removeListener(cap)
        results[label] = {
            "total_sec": round(total, 3),
            "flagged": sum(1 for t in flagged if t[4]),
            "screened": len(flagged),
            "per_epoch_trigger_ms": sorted(cap.walls),
            "index_parquet_files": count_files(os.path.join(idx, "vectors")),
            "index_batches": len(S.ann_index_batches(spark, idx)),
        }
        print(f"{label}: {results[label]}", flush=True)

    # batch-screen nprobe sweep against the seeded index (median of 3).
    # The delta is deliberately SMALL (the daily shape: |delta| <<
    # |landed|) so the sweep measures the landed-side read, not the
    # delta's fixed centroid-assignment cost.
    delta = arriving.filter(F.col("vec_id") % 101 == 1)
    results["sweep_delta_rows"] = delta.count()
    sweep = {}
    for nprobe in (1, 2, 4, args.num_centroids):
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            n = S.ann_screen_vs_index(
                delta, seed_idx, threshold=args.threshold, nprobe=nprobe
            ).count()
            walls.append(time.monotonic() - t0)
        sweep[f"nprobe_{nprobe}"] = {
            "median_sec": round(sorted(walls)[1], 3),
            "rows": n,
        }
        print(f"nprobe={nprobe}: {sweep[f'nprobe_{nprobe}']}", flush=True)
    results["batch_screen_sweep"] = sweep

    out = args.out or "ann_screen_bench.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

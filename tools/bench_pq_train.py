"""Scale probe of trained PQ codebooks (r14): training wall per Lloyd's
iteration at sf1, recall@k seeded vs trained against exact brute force,
the k-means objective (mean squared quantization distortion) ratio, and
the ADC serve wall with each codebook.

Claims under test:
- training cost is per-iteration bounded (one literal-projection encode
  + one map-side partially-aggregated n x d re-centering; K x d driver
  sync between iterations) and flat in wall across iterations,
- trained codes beat seeded codes on recall@k vs brute force and on the
  k-means objective itself,
- the SERVE path costs the same with either codebook (the codebook is
  driver-side literals; the scan shape is identical) — training is a
  quality knob, never a serve-time tax.

Usage:
    python tools/bench_pq_train.py [--sf-dir /tmp/dbmask_scale/sf1]
        [--iters 3] [--out SCALING_pq_r14.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/dbmask_scale/sf1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--num-codes", type=int, default=16)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--out", default="SCALING_pq_r14.json")
    args = ap.parse_args()

    import numpy as np
    import pyarrow.parquet as pq

    from database_anonymiser_minimiser_spark.operators import similarity as S
    from database_anonymiser_minimiser_spark.queries import load
    from database_anonymiser_minimiser_spark.session import get_spark

    spark = get_spark(app_name="bench-pq-train")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, args.sf_dir, "embeddings")
    n = emb.count()
    qids = list(range(100, n * 25, 500))[:40]

    out: dict = {
        "sf_dir": args.sf_dir,
        "n_vectors": n,
        "m": args.m,
        "num_codes": args.num_codes,
        "k": args.k,
    }

    # per-iteration training wall (each call trains from scratch with
    # i iterations, so wall(i) - wall(i-1) isolates one iteration)
    walls = []
    cb = None
    for i in range(1, args.iters + 1):
        t0 = time.time()
        cb = S.train_pq_codebook(
            emb, m=args.m, num_codes=args.num_codes, iters=i
        )
        cb_rows = cb.collect()
        walls.append(round(time.time() - t0, 3))
    # each entry is a FULL from-scratch training run with i iterations;
    # near-flat walls mean fixed (encode/JIT) cost dominates and the
    # marginal iteration is cheap — exactly the claim under test
    out["train_wall_by_iters"] = walls

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.topk_cosine(emb, qids, k=args.k).collect()
    }

    def measure(codebook, label):
        t0 = time.time()
        rows = S.ann_pq_adc_topk(
            emb, qids, k=args.k, num_codes=args.num_codes, m=args.m,
            codebook=codebook,
        ).collect()
        wall = time.time() - t0
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        out[label] = {
            "serve_sec": round(wall, 3),
            "recall": round(len(exact & got) / len(exact), 4),
        }

    measure(None, "seeded")
    measure(cb, "trained")

    t = pq.read_table(f"{args.sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist())
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    mat = mat[np.argsort(ids)]
    dsub = mat.shape[1] // args.m

    def distortion(cents):
        tot = 0.0
        for s in range(args.m):
            sl = slice(s * dsub, (s + 1) * dsub)
            d2 = ((mat[:, None, sl] - cents[None, :, sl]) ** 2).sum(axis=2)
            tot += d2.min(axis=1).sum()
        return tot / len(mat)

    d_seed = distortion(mat[: args.num_codes])
    d_train = distortion(
        np.array(
            [r["cv"] for r in sorted(cb_rows, key=lambda r: r["cid"])]
        )
    )
    out["distortion"] = {
        "seeded": round(d_seed, 6),
        "trained": round(d_train, 6),
        "ratio": round(d_train / d_seed, 4),
    }

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

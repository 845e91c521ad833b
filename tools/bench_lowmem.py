"""Memory-envelope probe: the heavy shuffle queries in a SMALL JVM.

Every sweep so far ran with the sized-up 8g local JVM
(session.py: SPARK_GRAFT_DRIVER_MEM). On a real cluster the per-task
memory share is whatever the executor has divided by its task slots —
often far less than local testing enjoys — and the engine's claim must
be that queries DEGRADE TO SPILL under pressure, not OOM. This probe
runs the shuffle-heaviest queries at sf0.1 in fresh subprocess sessions
at descending driver-memory sizes and records wall + outcome per query.

A query that fails at a small size is a finding: either its plan holds
something corpus-sized in memory (bug) or the size is below Spark's
documented floor (~450 MB usable) — the error text tells which.

Usage:
    python tools/bench_lowmem.py [--mems 8g,2g,1g] [--out SCALING_lowmem_r11.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HEAVY = [
    "q18_large_volume_customers",
    "dedup_ngram_jaccard",
    "bpe_encode_token_count",
    "semantic_dedup_embeddings",
    "subset_export_lines",
    "dedup_minhash_lsh_xxhash",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from database_anonymiser_minimiser_spark.session import get_spark
from database_anonymiser_minimiser_spark.queries import QUERIES
spark = get_spark(app_name="bench_lowmem")
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for name in {queries!r}:
    t0 = time.monotonic()
    try:
        n = QUERIES[name](spark, {sf_dir!r}).count()
        out[name] = {{"ok": True, "rows": n,
                      "wall_s": round(time.monotonic() - t0, 3)}}
    except Exception as exc:
        msg = str(exc)
        out[name] = {{"ok": False, "error": msg[:300],
                      "wall_s": round(time.monotonic() - t0, 3)}}
        if "Connection refused" in msg or "Py4JNetworkError" in msg:
            # an earlier OOM killed the JVM; later queries would only
            # report the dead gateway, not their own behaviour
            out[name]["error"] = "skipped: session died on a prior query"
            break
print("LOWMEM_RESULT " + json.dumps(out))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mems", default="8g,2g,1g")
    ap.add_argument(
        "--cpus", default=None,
        help="override SPARK_GRAFT_CPUS for the child sessions — the "
        "memory FLOOR is per-task, so mem and task-slot count trade off",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--queries", default=None,
        help="comma-separated query subset (default: the six "
        "shuffle-heaviest) — e.g. only dedup_ngram_jaccard for the "
        "zipfian spill-merge re-probe, where skewed spill-file sizes "
        "are the harder case for merge-phase memory",
    )
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    results = {}
    for mem in args.mems.split(","):
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
        if args.cpus is not None:
            env["SPARK_GRAFT_CPUS"] = args.cpus
        queries = args.queries.split(",") if args.queries else HEAVY
        code = _CHILD.format(repo=repo, queries=queries, sf_dir=args.sf_dir)
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        payload = None
        for line in proc.stdout.splitlines():
            if line.startswith("LOWMEM_RESULT "):
                payload = json.loads(line[len("LOWMEM_RESULT "):])
        if payload is None:
            payload = {
                "__session__": {
                    "ok": False,
                    "error": (proc.stderr.strip().splitlines() or ["no output"])[-1][:300],
                }
            }
        results[mem] = payload
        print(json.dumps({mem: payload}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf_dir": args.sf_dir, "results": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

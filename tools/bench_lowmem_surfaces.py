"""Memory-envelope probe for the two surfaces bench_lowmem.py never
measured (r11 verdict item 5): the foreachBatch streaming screen (state
lives on disk, but every micro-batch runs a delta-vs-landed join with a
real per-task memory footprint) and curate's GREEDY budget admission
(one language's entire survivor set materialises in one applyInPandas
worker frame — the documented constraint, never priced).

Both run in fresh subprocess sessions at descending driver-memory
sizes, like bench_lowmem.py. The curate probe is run in its WORST
shape: every document forced into one language, so the single grouped
frame holds the whole surviving corpus — the measured floor is the
per-language ceiling a deployment must budget for.

Usage:
    python tools/bench_lowmem_surfaces.py [--mems 8g,2g,1g]
        [--sf-dir /root/testdata/sf0.1] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_SCREEN_CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from database_anonymiser_minimiser_spark.queries import load
from database_anonymiser_minimiser_spark.session import get_spark
from database_anonymiser_minimiser_spark.streaming import events as SE

spark = get_spark(app_name="lowmem_screen")
spark.sparkContext.setLogLevel("ERROR")
docs = load(spark, {sf_dir!r}, "documents").select("doc_id", "text")
work = tempfile.mkdtemp(prefix="lowmem_screen_")
landed = os.path.join(work, "landed")
spool = os.path.join(work, "spool")
docs.filter(F.col("doc_id") % 2 == 0).write.parquet(landed)
os.makedirs(spool)
parts = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
    "part", F.pmod(F.xxhash64("doc_id"), F.lit(4)))
for i in range(4):
    one = os.path.join(work, f"stage{{i}}")
    parts.filter(F.col("part") == i).drop("part").coalesce(1) \
        .write.parquet(one)
    pq = [f for f in os.listdir(one) if f.endswith(".parquet")][0]
    dst = os.path.join(spool, f"part{{i:04d}}.parquet")
    shutil.move(os.path.join(one, pq), dst)
    os.utime(dst, (1700000000 + i, 1700000000 + i))
    shutil.rmtree(one, ignore_errors=True)
out = {{}}
t0 = time.monotonic()
try:
    prefix = "lowmem_screen"
    for t in (prefix + "_bands", prefix + "_shingles"):
        spark.sql("DROP TABLE IF EXISTS " + t)
    flagged = SE.run_streaming_neardup_ingest(
        spark, landed, spool, os.path.join(work, "idx"),
        threshold=0.5, table_prefix=prefix)
    out["screen"] = {{"ok": True, "flagged": len(flagged),
                      "wall_s": round(time.monotonic() - t0, 3)}}
except Exception as exc:
    out["screen"] = {{"ok": False, "error": str(exc)[:300],
                      "wall_s": round(time.monotonic() - t0, 3)}}
shutil.rmtree(work, ignore_errors=True)
print("LOWMEM_RESULT " + json.dumps(out))
"""

_CURATE_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from database_anonymiser_minimiser_spark.queries import load
from database_anonymiser_minimiser_spark.operators.curation import (
    curate_documents,
)
from database_anonymiser_minimiser_spark.session import get_spark

spark = get_spark(app_name="lowmem_curate")
spark.sparkContext.setLogLevel("ERROR")
# worst frame: ONE language -> the whole surviving corpus in one
# applyInPandas group (the greedy mode's documented per-language bound)
docs = load(spark, {sf_dir!r}, "documents").select(
    "doc_id", "text", F.lit("xx").alias("lang"))
out = {{}}
t0 = time.monotonic()
try:
    n = curate_documents(
        docs, min_quality=0.0, budget_tokens=1 << 40,
        budget_mode="greedy").count()
    out["curate_greedy_one_lang"] = {{
        "ok": True, "rows": n,
        "wall_s": round(time.monotonic() - t0, 3)}}
except Exception as exc:
    out["curate_greedy_one_lang"] = {{
        "ok": False, "error": str(exc)[:300],
        "wall_s": round(time.monotonic() - t0, 3)}}
print("LOWMEM_RESULT " + json.dumps(out))
"""


def _run_child(code: str, mem: str, cpus: str | None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
    if cpus is not None:
        env["SPARK_GRAFT_CPUS"] = cpus
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("LOWMEM_RESULT "):
            return json.loads(line[len("LOWMEM_RESULT "):])
    return {
        "__session__": {
            "ok": False,
            "error": (proc.stderr.strip().splitlines() or ["no output"])[-1][
                :300
            ],
        }
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mems", default="8g,2g,1g")
    ap.add_argument("--cpus", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--surfaces", default="screen,curate",
        help="comma subset of screen,curate",
    )
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    surfaces = args.surfaces.split(",")

    results: dict = {}
    for mem in args.mems.split(","):
        merged: dict = {}
        if "screen" in surfaces:
            merged.update(
                _run_child(
                    _SCREEN_CHILD.format(repo=repo, sf_dir=args.sf_dir),
                    mem,
                    args.cpus,
                )
            )
        if "curate" in surfaces:
            merged.update(
                _run_child(
                    _CURATE_CHILD.format(repo=repo, sf_dir=args.sf_dir),
                    mem,
                    args.cpus,
                )
            )
        results[mem] = merged
        print(json.dumps({mem: merged}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf_dir": args.sf_dir, "results": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

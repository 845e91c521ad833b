"""Wide-table probe: the anonymiser's single-projection design at
hundreds of masked columns.

The reference anonymises arbitrary DB tables; enterprise schemas run to
hundreds of columns (SAP-style wide tables), and every scale sweep so
far used the <=16-column TPC-H tables. Two Spark-specific cliffs live on
this axis:

1. ``spark.sql.codegen.maxFields`` (default 100): past it Spark SILENTLY
   drops whole-stage codegen for the projection — the anonymise
   transform's "zero interpreted rows" claim (operators/anonymise.py)
   stops holding exactly on the tables where per-row cost matters most.
2. Expression-tree size: N faker rules = N salted-hash template trees in
   ONE Project; planning time and generated-method size grow with N
   (JVM 64KB method limit forces codegen splits).

This probe measures, per width W (masked-faker columns over a synthetic
W-column table):

- plan time (df -> executedPlan, the Catalyst cost),
- whether the projection runs inside WholeStageCodegen at the default
  maxFields and with maxFields raised past W,
- wall for a full count-materialisation of the anonymised projection,
  default vs raised, same session, interleaved runs.

Usage:
    python tools/bench_wide.py [--rows 200000] [--widths 50,150,300,600]
                               [--runs 3] [--out SCALING_wide_r11.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_anonymiser_minimiser_spark.config import TableConfig  # noqa: E402
from database_anonymiser_minimiser_spark.operators.anonymise import (  # noqa: E402
    anonymise,
)
from database_anonymiser_minimiser_spark.session import get_spark  # noqa: E402

FAKERS = ["name", "email", "city", "company", "username"]


def wide_df(spark, rows: int, width: int):
    base = spark.range(rows).withColumnRenamed("id", "pk")
    cols = [F.col("pk")] + [
        F.concat(F.lit(f"v{i}_"), (F.col("pk") * (i + 1) % 9973).cast("string")).alias(
            f"c{i}"
        )
        for i in range(width)
    ]
    return base.select(*cols)


def wide_config(width: int) -> TableConfig:
    return TableConfig(
        primary_key="pk",
        columns={
            f"c{i}": "{{faker." + FAKERS[i % len(FAKERS)] + "}}"
            for i in range(width)
        },
    )


def wscg_covers_project(df) -> bool:
    """True when the anonymise Project sits inside WholeStageCodegen."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the projection is the top operator; WSCG prints as
    # "*(1) Project" vs interpreted " Project"
    return "*(1) Project" in plan or "*(2) Project" in plan


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--widths", default="50,150,300,600")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]

    spark = get_spark(app_name="bench_wide")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for width in widths:
        cfg = wide_config(width)
        df = wide_df(spark, args.rows, width)
        df.persist().count()  # isolate anonymise cost from input synthesis

        row: dict = {"width": width, "rows": args.rows}
        for label, max_fields in (
            ("default", None),
            ("raised", max(width + 10, 100)),
        ):
            if max_fields is not None:
                spark.conf.set("spark.sql.codegen.maxFields", str(max_fields))
            else:
                spark.conf.unset("spark.sql.codegen.maxFields")
            t0 = time.monotonic()
            out = anonymise(df, cfg)
            _ = out._jdf.queryExecution().executedPlan()
            plan_s = time.monotonic() - t0
            walls = []
            for _r in range(args.runs):
                t0 = time.monotonic()
                # count() alone would prune the projection; the noop sink
                # evaluates every masked column without adding a harness
                # expression of its own (a 300-column hash-agg probe blew
                # the 64KB codegen method limit in ITS OWN aggregate)
                out.write.format("noop").mode("overwrite").save()
                walls.append(time.monotonic() - t0)
            row[label] = {
                "plan_s": round(plan_s, 3),
                "wall_s": round(statistics.median(walls), 3),
                "wscg": wscg_covers_project(out),
            }
        df.unpersist()
        results.append(row)
        print(json.dumps(row))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": args.rows, "results": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

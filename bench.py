"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes via a noop-format write so we measure distributed
compute + full result materialisation without driver-side collect
overhead dominating (aggregates are tiny anyway; scans are not).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_anonymiser_minimiser_spark import queries as Q
from database_anonymiser_minimiser_spark.session import get_spark

HEADLINE = [
    "full_export_customer",
    "retain_count_orders",
    "retain_date_events",
    "anonymise_customer_full",
    "mask_email",
    "consistency_mapping",
    "sqldump_tuple_customer",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_top_orders_per_customer",
    "events_tumbling_hourly",
    "dedup_exact_documents",
    "text_token_count",
    "text_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="dbmask-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # plan, not first-touch JIT/IO
    Q.load(spark, sf_dir, "lineitem").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        start = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - start, 4)

    print(
        json.dumps(
            {
                "metric": "headline-queries wall time",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

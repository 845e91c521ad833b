"""SparkSession construction with scale-appropriate defaults.

Local testing runs ``local[N]`` but every setting here is chosen for the
1000-executor / 100 TB case and merely *also* works locally:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switching (broadcast when a side turns out
  small),
- Arrow on: any unavoidable pandas-UDF path moves columnar batches, not
  pickled rows,
- UTC session timezone: deterministic timestamp semantics across engines
  (the DuckDB oracle reads the same parquet as naive/UTC),
- shuffle partitions default sized for the local corpus; on a real
  cluster AQE coalesces from a deliberately high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "database-anonymiser-minimiser-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Local mode runs driver+executor in ONE JVM whose default heap (1g)
    # is absurd for 32 concurrent tasks — sf1 measurement showed AQE
    # broadcast builds failing against it. A real cluster node serving
    # this many cores has tens of GB; size the local JVM accordingly
    # (env-overridable; ignored if a JVM already exists).
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.driver.memory", mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        .config("spark.ui.enabled", "false")
    )
    return b.getOrCreate()


def configure_for_determinism(spark: SparkSession) -> SparkSession:
    """Settings every oracle-compared query relies on; safe to call on a
    session we did not build (the driver passes its own)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark

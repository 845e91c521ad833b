"""Small-file compaction for parquet datasets.

Streaming appends, per-trigger micro-batches, and over-partitioned
writes fragment a lake into thousands of tiny files; at scan time every
file costs a footer read, an open, and a task-scheduling slot, so a
fragmented dataset reads many times slower than the same bytes in
right-sized files (measured in tools/bench_smallfiles.py — the r12
probe). The MinHash index already compacts itself per-bucket
(operators/dedup.py compact_every); this is the GENERIC form for any
parquet dataset, exposed as the ``compact`` CLI verb.

Two forms share the ``compact`` verb: THIS one writes to a NEW
directory with a row-count verification gate (object-store friendly —
no rename dependence), while ``dump.compact_parquet`` compacts IN
PLACE with hive-partition awareness and a crash-safe tmp+rename
promotion (local/HDFS-rename stores). Shape here: one read, one
``repartition(ceil(bytes/target))`` (a round-robin exchange — the only
shuffle; plain coalesce() skews when input files are uneven), one
write, then the verification count BEFORE the caller swaps
directories — a compaction that loses rows must fail loudly, never
return.

Writes to a NEW directory (never in place): overwriting the dataset
being read would destroy it mid-scan, the same refusal curate makes.
The caller swaps directories after the verified write — on object
stores a cheap manifest/pointer update, on HDFS a rename.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def dataset_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of a dataset's parquet data files, listed
    through the Hadoop FileSystem for the path's scheme (works on
    local, HDFS and object stores alike — a driver-local listdir would
    see nothing remote, the preflight lesson)."""
    jvm = spark._jvm
    hroot = jvm.org.apache.hadoop.fs.Path(path)
    fs = hroot.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(hroot):
        raise FileNotFoundError(f"dataset does not exist: {path}")
    it = fs.listFiles(hroot, True)
    n = total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")) or not name.endswith(".parquet"):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact_dataset(
    spark: SparkSession,
    path: str,
    out: str,
    target_mb: int = 128,
) -> dict:
    """Compact ``path`` into ``out`` with ~``target_mb`` files and
    verify row counts before returning. Returns the stats dict
    {files_before, bytes, files_after, rows} the CLI prints."""
    import os

    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    norm = lambda p: os.path.normpath(os.path.abspath(p))  # noqa: E731
    np_, no_ = norm(path), norm(out)
    # reject nesting in EITHER direction, not just equality: an out dir
    # under the dataset makes every later read of path double-count rows
    # (and the row-count gate below would still pass, since it counts
    # out separately); a path under out would be clobbered by the write
    if os.path.commonpath([np_, no_]) in (np_, no_):
        raise ValueError(
            "compact: --out must not equal, contain, or be contained by "
            "--path (writing into the dataset being read double-counts "
            "every later read); write to a disjoint directory and swap "
            "after"
        )
    n_before, total_bytes = dataset_file_stats(spark, path)
    if n_before == 0:
        raise FileNotFoundError(
            f"compact found no parquet data files under {path}"
        )
    df = spark.read.parquet(path)
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df.repartition(n_out).write.mode("error").parquet(out)
    # verification gate: a compaction that loses rows must fail loudly
    rows_in = df.count()
    rows_out = spark.read.parquet(out).count()
    if rows_in != rows_out:
        raise RuntimeError(
            f"compact row-count mismatch: {rows_in} in, {rows_out} out — "
            f"output at {out} is NOT safe to swap in"
        )
    n_after, _ = dataset_file_stats(spark, out)
    return {
        "files_before": n_before,
        "bytes": total_bytes,
        "files_after": n_after,
        "rows": rows_out,
    }

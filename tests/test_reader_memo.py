"""r14 optimization: the per-session lazy-reader memo in
read_parquet_table (sources/parquet.py). The memo holds only the
unresolved read plan (schema resolution), never rows: these tests pin
the hit/miss contract — same session + unchanged file hits; a changed
file (mtime/size) misses AND the new bytes are what an action reads; a
directory path is never memoized."""

import pyarrow as pa
import pyarrow.parquet as pq

from database_anonymiser_minimiser_spark.sources.parquet import (
    _READER_MEMO,
    read_parquet_table,
)


def _write_single_file(path, ids):
    pq.write_table(pa.table({"id": pa.array(ids, type=pa.int64())}), str(path))


def test_same_session_same_file_hits(spark, tmp_path):
    f = tmp_path / "t.parquet"
    _write_single_file(f, [1, 2, 3])
    a = read_parquet_table(spark, f)
    b = read_parquet_table(spark, f)
    assert a is b  # memo hit: the identical lazy plan object
    assert sorted(r["id"] for r in b.collect()) == [1, 2, 3]


def test_changed_file_misses_and_reads_new_bytes(spark, tmp_path):
    f = tmp_path / "t.parquet"
    _write_single_file(f, [1, 2, 3])
    a = read_parquet_table(spark, f)
    assert sorted(r["id"] for r in a.collect()) == [1, 2, 3]
    _write_single_file(f, [10, 20, 30, 40])
    b = read_parquet_table(spark, f)
    assert b is not a  # size/mtime changed -> rebuilt
    assert sorted(r["id"] for r in b.collect()) == [10, 20, 30, 40]


def test_directory_paths_never_memoized(spark, tmp_path):
    d = tmp_path / "tdir.parquet"
    d.mkdir()
    _write_single_file(d / "part-0.parquet", [5, 6])
    a = read_parquet_table(spark, d)
    b = read_parquet_table(spark, d)
    assert a is not b
    assert all(v[0] is not spark or v[1] is not a for v in _READER_MEMO.values())


def test_memo_never_holds_rows(spark, tmp_path):
    """The memo's values are (session, DataFrame) pairs — lazy plans.
    Nothing in the memo is a collected row set or a persisted relation."""
    f = tmp_path / "t2.parquet"
    _write_single_file(f, [7])
    df = read_parquet_table(spark, f)
    hit = [v for v in _READER_MEMO.values() if v[1] is df]
    assert hit and hit[0][0] is spark
    assert df.storageLevel.useMemory is False  # not persisted by the memo

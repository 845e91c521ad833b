"""Small-file compaction (operators/compaction.py + the ``compact``
CLI verb): file-count reduction, the row-count verification gate, and
the refusal paths."""

import pytest

from database_anonymiser_minimiser_spark.operators.compaction import (
    compact_dataset,
    dataset_file_stats,
)


def test_compact_reduces_files_and_verifies_rows(spark, tmp_path):
    frag = str(tmp_path / "frag")
    spark.range(10_000).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS v"
    ).repartition(64).write.parquet(frag)
    n_before, total = dataset_file_stats(spark, frag)
    assert n_before == 64 and total > 0
    out = str(tmp_path / "compacted")
    stats = compact_dataset(spark, frag, out, target_mb=128)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1  # tiny dataset -> one target file
    assert stats["rows"] == 10_000
    # content identical, not just counts
    a = {tuple(r) for r in spark.read.parquet(frag).collect()}
    b = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert a == b


def test_compact_refusals(spark, tmp_path):
    d = str(tmp_path / "data")
    spark.range(10).write.parquet(d)
    with pytest.raises(ValueError, match="must not equal"):
        compact_dataset(spark, d, d + "/")
    # r12 ADVICE: nesting in EITHER direction is rejected too — an out
    # dir UNDER the dataset would double-count every later read of d
    # (while the row-count gate still passes, since it counts out alone)
    with pytest.raises(ValueError, match="must not equal"):
        compact_dataset(spark, d, d + "/compacted")
    with pytest.raises(ValueError, match="must not equal"):
        compact_dataset(spark, str(tmp_path), d)
    with pytest.raises(FileNotFoundError, match="does not exist"):
        compact_dataset(spark, str(tmp_path / "nope"), str(tmp_path / "o"))
    empty = tmp_path / "empty"
    empty.mkdir()
    (empty / "_SUCCESS").write_text("")
    with pytest.raises(FileNotFoundError, match="no parquet data files"):
        compact_dataset(spark, str(empty), str(tmp_path / "o2"))
    # existing output is never clobbered (mode error)
    out = str(tmp_path / "exists")
    spark.range(5).write.parquet(out)
    with pytest.raises(Exception, match="already exists|ERROR"):
        compact_dataset(spark, d, out)


def test_compact_cli(spark, tmp_path, capsys):
    frag = str(tmp_path / "cli_frag")
    spark.range(5_000).repartition(32).write.parquet(frag)
    out = str(tmp_path / "cli_out")
    from database_anonymiser_minimiser_spark.cli import main

    assert main(["compact", "--path", frag, "--out", out]) == 0
    printed = capsys.readouterr().out
    assert "32 -> 1 file(s)" in printed and "5000 row(s) verified" in printed
    assert spark.read.parquet(out).count() == 5_000
    # refusal surfaces as exit 2 with the message, not a traceback
    assert main(["compact", "--path", frag, "--out", frag]) == 2
    assert "must not equal" in capsys.readouterr().err


def test_compact_cli_in_place(spark, tmp_path, capsys):
    """Without --out the verb delegates to the in-place hive-aware
    crash-safe form (dump.compact_parquet): same path, fewer files,
    rows preserved."""
    from database_anonymiser_minimiser_spark.cli import main

    frag = str(tmp_path / "inplace")
    spark.range(4_000).repartition(16).write.parquet(frag)
    assert main(["compact", "--path", frag]) == 0
    printed = capsys.readouterr().out
    assert "in place: 16 -> 1 file(s)" in printed
    assert spark.read.parquet(frag).count() == 4_000

"""SQL-literal formatting + escaping goldens.

Behavior spec from the reference's golden unit tables
(``internal/exporter/exporter_test.go:377-439``: formatValue/escapeString)
re-expressed as independent cases, plus dialect header/footer/DROP shape
checks (``exporter_test.go:306-347``)."""

import datetime

from database_anonymiser_minimiser_spark import dump as D


def test_escape_plain():
    assert D.escape_string("hello") == "'hello'"


def test_escape_single_quote():
    assert D.escape_string("O'Brien") == "'O''Brien'"


def test_escape_backslash_first():
    assert D.escape_string("a\\b") == "'a\\\\b'"
    # backslash doubling must happen before the control-char escapes,
    # otherwise the backslash introduced by \n would double again
    assert D.escape_string("a\nb") == "'a\\nb'"
    assert D.escape_string("a\\nb") == "'a\\\\nb'"


def test_escape_control_chars():
    assert D.escape_string("a\x00b") == "'a\\0b'"
    assert D.escape_string("a\rb") == "'a\\rb'"
    assert D.escape_string("a\x1ab") == "'a\\Zb'"


def test_format_null():
    assert D.format_value(None) == "NULL"


def test_format_bool():
    assert D.format_value(True) == "1"
    assert D.format_value(False) == "0"


def test_format_ints():
    assert D.format_value(42) == "42"
    assert D.format_value(-7) == "-7"
    assert D.format_value(0) == "0"


def test_format_floats():
    assert D.format_value(3.14) == "3.14"
    assert D.format_value(3.0) == "3"  # Go %v shortest form
    assert D.format_value(-0.5) == "-0.5"


def test_format_bytes_and_str():
    assert D.format_value(b"hello") == "'hello'"
    assert D.format_value("it's") == "'it''s'"


def test_format_timestamp():
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5)
    assert D.format_value(ts) == "'2024-01-02 03:04:05'"
    assert D.format_value(datetime.date(2024, 1, 2)) == "'2024-01-02'"


def test_format_fallback_stringifies():
    assert D.format_value({"a": 1}) == "'{''a'': 1}'"


def test_headers_per_dialect():
    h = D.header_text("mysql", generated_at="2026-01-01T00:00:00Z")
    assert "SET FOREIGN_KEY_CHECKS = 0;" in h and "START TRANSACTION;" in h
    assert "Database Type: mysql" in h
    assert "client_encoding" in D.header_text("postgres")
    assert "PRAGMA foreign_keys = OFF;" in D.header_text("sqlite")


def test_footers_per_dialect():
    assert "COMMIT;" in D.footer_text("mysql")
    assert "End of dump" in D.footer_text("postgres")
    assert "PRAGMA foreign_keys = ON;" in D.footer_text("sqlite")


def test_drop_table():
    assert D.drop_table_statement("mysql", "t") == "DROP TABLE IF EXISTS `t`;"
    assert D.drop_table_statement("postgres", "t") == 'DROP TABLE IF EXISTS "t" CASCADE;'
    assert D.drop_table_statement("sqlite", "t") == 'DROP TABLE IF EXISTS "t";'

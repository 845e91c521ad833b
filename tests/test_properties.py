"""Property-based tests (hypothesis) for the formatting/escaping layer and
the deterministic fakers — the reference's shape/uniqueness specs
(faker_test.go:64-205) generalised to arbitrary inputs."""

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from database_anonymiser_minimiser_spark import dump as D

text_strategy = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=200
)


def unescape(s: str) -> str:
    """Inverse of escape_string for round-trip checking (MySQL-dialect
    escapes, exporter.go:339-349)."""
    assert s.startswith("'") and s.endswith("'")
    body = s[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            mapping = {"\\": "\\", "0": "\x00", "n": "\n", "r": "\r", "Z": "\x1a"}
            if nxt in mapping:
                out.append(mapping[nxt])
                i += 2
                continue
            out.append(c)
            i += 1
        elif c == "'" and i + 1 < len(body) and body[i + 1] == "'":
            out.append("'")
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


@given(text_strategy)
@settings(max_examples=300)
def test_escape_round_trips(s):
    assert unescape(D.escape_string(s)) == s


@given(text_strategy)
@settings(max_examples=300)
def test_escaped_has_no_raw_specials(s):
    body = D.escape_string(s)[1:-1]
    # no raw control characters survive
    assert "\x00" not in body and "\n" not in body and "\r" not in body
    assert "\x1a" not in body
    # every quote is doubled: no odd-length quote runs
    for run in re.findall(r"'+", body):
        assert len(run) % 2 == 0


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_int_format_verbatim(n):
    assert D.format_value(n) == str(n)


@given(st.floats(allow_nan=False, allow_infinity=False))
@settings(max_examples=300)
def test_float_format_parses_back(x):
    s = D.format_value(x)
    assert float(s) == x  # shortest-form representation is lossless


@given(st.binary(max_size=100))
def test_bytes_format_is_quoted(b):
    s = D.format_value(b)
    assert s.startswith("'") and s.endswith("'")


def test_faker_uniqueness_bulk(spark):
    """100 distinct inputs -> (near-)distinct outputs for the hash-backed
    fakers (faker_test.go:179-205)."""
    from database_anonymiser_minimiser_spark.functions.faker_deterministic import (
        FAKER_FUNCTIONS,
    )

    inputs = ", ".join(f"('in-{i}')" for i in range(100))
    for fname in ("email", "uuid", "password", "number"):
        spec = FAKER_FUNCTIONS[fname]
        df = spark.sql(
            f"SELECT {spec.sql('spark', 'v')} AS out FROM VALUES {inputs} AS t(v)"
        )
        vals = [r["out"] for r in df.collect()]
        assert len(set(vals)) >= 99, fname  # md5-backed: collisions ~impossible

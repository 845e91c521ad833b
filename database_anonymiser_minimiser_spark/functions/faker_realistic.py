"""Realistic faker mode: Arrow-vectorised pandas UDFs.

The deterministic SQL fakers (faker_deterministic.py) are the default —
pure JVM expressions, oracle-checkable. This module is the "looks human"
mode the reference gets from gofakeit (faker.go:11-28): richer
vocabularies and formats, generated in Python.

Spark discipline: these are @pandas_udf (Arrow batches, vectorised
numpy RNG) — never row-at-a-time Python UDFs; each batch seeds one RNG
from a hash of the values, so output stays deterministic per input value
(consistency holds with zero state) while drawing from vocabularies that
would be unwieldy as SQL literals. Not SQL-expressible -> registered as
rows-only queries (no DuckDB oracle), exactly as the driver contract
allows for such ops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

FIRST = np.array(
    "james mary john patricia robert jennifer michael linda william elizabeth "
    "david barbara richard susan joseph jessica thomas sarah charles karen "
    "amelia lucas mia noah olivia liam emma oliver ava elijah sophia mateo "
    "harper evelyn abigail emily ella scarlett grace chloe".split()
)
LAST = np.array(
    "smith johnson williams brown jones garcia miller davis rodriguez martinez "
    "hernandez lopez gonzalez wilson anderson thomas taylor moore jackson "
    "martin lee perez thompson white harris sanchez clark ramirez lewis "
    "robinson walker young allen king wright scott torres nguyen hill".split()
)
DOMAINS = np.array(["example.com", "example.org", "example.net", "mail.test", "post.test"])


def _seeds(values: pd.Series) -> np.ndarray:
    """One uint64 seed per value, md5-derived (stable across runs/hosts)."""
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(str(v).encode()).digest()[:8], "big"
            )
            if v is not None
            else 0
            for v in values
        ],
        dtype=np.uint64,
    )


def _make_udf(fn):
    """Build the pandas_udf lazily: the decorator parses its return type
    through the active SparkSession, so construction must wait until one
    exists (import-time construction would crash)."""
    cache = {}

    def get():
        if "udf" not in cache:

            @pandas_udf("string")
            def udf(values: pd.Series) -> pd.Series:
                seeds = _seeds(values)
                out = fn(seeds)
                return pd.Series(np.where(values.isna(), None, out))

            cache["udf"] = udf
        return cache["udf"]

    return get


def _name(seeds: np.ndarray) -> np.ndarray:
    f = FIRST[seeds % len(FIRST)]
    l = LAST[(seeds >> np.uint64(8)) % len(LAST)]
    return np.char.add(np.char.add(np.char.capitalize(f), " "), np.char.capitalize(l))


def _email(seeds: np.ndarray) -> np.ndarray:
    f = FIRST[seeds % len(FIRST)]
    l = LAST[(seeds >> np.uint64(8)) % len(LAST)]
    n = (seeds >> np.uint64(16)) % np.uint64(1000)
    d = DOMAINS[(seeds >> np.uint64(24)) % len(DOMAINS)]
    local = np.char.add(np.char.add(f, "."), l)
    local = np.char.add(np.char.add(local, n.astype(str)), "@")
    return np.char.add(local, d)


def _phone(seeds: np.ndarray) -> np.ndarray:
    area = 200 + seeds % np.uint64(800)
    mid = (seeds >> np.uint64(10)) % np.uint64(1000)
    tail = (seeds >> np.uint64(20)) % np.uint64(10000)
    return np.array(
        [f"({a}) {m:03d}-{t:04d}" for a, m, t in zip(area, mid, tail)]
    )


REALISTIC_FAKERS = {
    "name": _make_udf(_name),
    "email": _make_udf(_email),
    "phone": _make_udf(_phone),
}


def realistic_column(fn_name: str, column: str) -> Column:
    return REALISTIC_FAKERS[fn_name]()(F.col(f"`{column}`"))

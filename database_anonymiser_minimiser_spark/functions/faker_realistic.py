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
    """One uint64 seed per value, salted-md5-derived (stable across runs/
    hosts within a deployment; DBMASK_FAKER_SALT blocks cross-deployment
    linkage and dictionary recovery, same scheme as faker_deterministic).
    """
    import os

    salt = os.environ.get("DBMASK_FAKER_SALT", "dbmask.v1").encode()
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(salt + str(v).encode()).digest()[:8], "big"
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


STREETS = np.array(
    "Maple Oak Cedar Elm Pine Birch Willow Aspen Juniper Laurel Magnolia "
    "Sycamore Chestnut Hawthorn Linden Poplar Rowan Spruce Walnut Alder".split()
)
SUFFIXES = np.array("Street Avenue Road Lane Drive Way Court Place".split())
CITIES = np.array(
    "London Paris Berlin Madrid Rome Vienna Prague Lisbon Dublin Warsaw "
    "Athens Oslo Helsinki Stockholm Copenhagen Amsterdam Brussels Zurich "
    "Toronto Chicago Houston Phoenix Denver Seattle Boston Atlanta".split()
)
COUNTRIES = np.array(
    "France Germany Spain Italy Portugal Ireland Poland Greece Norway "
    "Finland Sweden Denmark Netherlands Belgium Switzerland Canada Brazil "
    "Argentina Japan Kenya Morocco Egypt India Vietnam Thailand Chile".split()
)
COMPANY_A = np.array(
    "Global Apex Nova Prime Vertex Summit Pioneer Quantum Stellar Atlas "
    "Orion Zenith Horizon Vanguard Crescent Beacon".split()
)
COMPANY_B = np.array(
    "Systems Industries Solutions Holdings Dynamics Labs Logistics "
    "Analytics Partners Ventures Networks Group Technologies Consulting".split()
)
LOREM = np.array(
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed eiusmod "
    "tempor incididunt labore dolore magna aliqua enim minim veniam quis "
    "nostrud exercitation ullamco laboris nisi aliquip commodo consequat".split()
)
_HEX = np.array(list("0123456789abcdef"))
_PW = np.array(list("abcdefghjkmnpqrstuvwxyzABCDEFGHJKMNPQRSTUVWXYZ23456789!@#$%^&*"))


def _address(seeds: np.ndarray) -> np.ndarray:
    num = (seeds % np.uint64(999) + np.uint64(1)).astype(str)
    st = STREETS[(seeds >> np.uint64(10)) % len(STREETS)]
    sf = SUFFIXES[(seeds >> np.uint64(20)) % len(SUFFIXES)]
    return np.char.add(np.char.add(np.char.add(np.char.add(num, " "), st), " "), sf)


def _city(seeds: np.ndarray) -> np.ndarray:
    return CITIES[seeds % len(CITIES)].copy()


def _country(seeds: np.ndarray) -> np.ndarray:
    return COUNTRIES[seeds % len(COUNTRIES)].copy()


def _company(seeds: np.ndarray) -> np.ndarray:
    a = COMPANY_A[seeds % len(COMPANY_A)]
    b = COMPANY_B[(seeds >> np.uint64(8)) % len(COMPANY_B)]
    return np.char.add(np.char.add(a, " "), b)


def _chars_from_seed(seeds: np.ndarray, alphabet: np.ndarray, n: int) -> np.ndarray:
    """n pseudo-random chars per seed via an LCG remix (vectorised)."""
    out = np.full(seeds.shape, "", dtype="U64")
    s = seeds.copy()
    for _ in range(n):
        s = s * np.uint64(6364136223846793005) + np.uint64(1442695040888963407)
        idx = (s >> np.uint64(33)) % np.uint64(len(alphabet))
        out = np.char.add(out, alphabet[idx.astype(int)])
    return out


def _uuid(seeds: np.ndarray) -> np.ndarray:
    h = _chars_from_seed(seeds, _HEX, 32)
    return np.array([f"{x[:8]}-{x[8:12]}-{x[12:16]}-{x[16:20]}-{x[20:]}" for x in h])


def _username(seeds: np.ndarray) -> np.ndarray:
    f = FIRST[seeds % len(FIRST)]
    n = ((seeds >> np.uint64(16)) % np.uint64(10000)).astype(str)
    return np.char.add(f, n)


def _password(seeds: np.ndarray) -> np.ndarray:
    return _chars_from_seed(seeds, _PW, 32)


def _ipv4(seeds: np.ndarray) -> np.ndarray:
    o = [(seeds >> np.uint64(8 * i)) % np.uint64(256) for i in range(4)]
    return np.array([f"{a}.{b}.{c}.{d}" for a, b, c, d in zip(*o)])


def _date(seeds: np.ndarray) -> np.ndarray:
    days = (seeds % np.uint64(20000)).astype("int64")
    dates = np.datetime64("1970-01-01") + days.astype("timedelta64[D]")
    return np.datetime_as_string(dates, unit="D")


def _text(seeds: np.ndarray) -> np.ndarray:
    out = None
    s = seeds.copy()
    for _ in range(10):
        s = s * np.uint64(2862933555777941757) + np.uint64(3037000493)
        w = LOREM[((s >> np.uint64(33)) % np.uint64(len(LOREM))).astype(int)]
        out = np.char.capitalize(w) if out is None else np.char.add(np.char.add(out, " "), w)
    return np.char.add(out, ".")


def _first(seeds: np.ndarray) -> np.ndarray:
    return np.char.capitalize(FIRST[seeds % len(FIRST)])


def _last(seeds: np.ndarray) -> np.ndarray:
    return np.char.capitalize(LAST[(seeds >> np.uint64(8)) % len(LAST)])


def _number(seeds: np.ndarray) -> np.ndarray:
    return np.array([f"{int(s) % 10**8:08d}" for s in seeds])


# full 16-function registry, name-for-name with the reference
# (faker.go:11-28) — realistic shapes, still deterministic per value
REALISTIC_FAKERS = {
    "name": _make_udf(_name),
    "firstName": _make_udf(_first),
    "lastName": _make_udf(_last),
    "email": _make_udf(_email),
    "phone": _make_udf(_phone),
    "address": _make_udf(_address),
    "city": _make_udf(_city),
    "country": _make_udf(_country),
    "company": _make_udf(_company),
    "uuid": _make_udf(_uuid),
    "username": _make_udf(_username),
    "password": _make_udf(_password),
    "ipv4": _make_udf(_ipv4),
    "date": _make_udf(_date),
    "text": _make_udf(_text),
    "number": _make_udf(_number),
}


def realistic_column(fn_name: str, column: str) -> Column:
    return REALISTIC_FAKERS[fn_name]()(F.col(f"`{column}`"))

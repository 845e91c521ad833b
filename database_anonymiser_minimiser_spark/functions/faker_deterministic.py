"""Deterministic faker functions — the engine's scalar-function surface.

The reference's "UDF registry" is 16 zero-argument random generators
(``internal/anonymiser/faker.go:11-28``) plus an in-memory consistency map
that re-uses the generated value for repeated originals
(``internal/anonymiser/anonymiser.go:74-91``). An unbounded shared dict is
impossible at 100 TB, so this engine makes each faker a *pure deterministic
function of the original value*: consistency ("same in -> same out, across
all tables") holds with zero state, zero shuffle, and full whole-stage
codegen — every function below is built-in JVM expressions only
(md5 / translate / substr / element_at), no Python UDFs in the hot path.

Every function is defined as a SQL template rendered for two engines:

- ``engine="spark"`` -> Spark SQL, wrapped in ``F.expr`` for the DataFrame
  plan;
- ``engine="duckdb"`` -> ANSI-ish DuckDB SQL used as the correctness
  oracle.

The two renderings are bit-identical on the same input (md5 hex is
lowercase in both; ``translate(h,'abcdef','012345')`` maps hex to digits in
both), which is what lets the driver hash-compare Spark results against
DuckDB.

Derivation scheme, for original value v (string-cast):
  H(v)  = md5(salt || v)              -- 32 lowercase hex chars
  D(v)  = translate(H(v), 'abcdef', '012345')  -- 32 decimal digits
  pick(off, lst) = lst[ (int(D[off:off+6]) % len(lst)) + 1 ]
NULL originals propagate to NULL outputs in both engines.

The salt (env ``DBMASK_FAKER_SALT``, default ``"dbmask.v1"``) keys the
whole derivation: an UNSALTED md5(original) is recoverable by offline
dictionary attack for low-entropy originals (emails, phones, names,
DOBs), and identical inputs would link across every dump from every
deployment. A per-deployment secret salt blocks both while preserving
determinism and cross-table consistency within the deployment. The salt
is read once at import (it is baked into the generated SQL for both
engines, so oracle comparisons stay bit-identical).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-deployment secret keying the derivation (see module docstring).
# Single quotes are doubled so the literal embeds safely in both dialects.
_SALT = os.environ.get("DBMASK_FAKER_SALT", "dbmask.v1").replace("'", "''")

# --- seed lists (no quote characters; shared by both engines) ---------------

FIRST_NAMES = [
    "james", "mary", "john", "patricia", "robert", "jennifer", "michael",
    "linda", "william", "elizabeth", "david", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "sarah", "charles", "karen", "amelia",
    "lucas", "mia", "noah", "olivia", "liam", "emma", "oliver", "ava",
    "elijah", "sophia", "mateo",
]
LAST_NAMES = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
    "lee", "perez", "thompson", "white", "harris", "sanchez", "clark",
    "ramirez", "lewis", "robinson", "walker", "young",
]
CITIES = [
    "London", "Paris", "Berlin", "Madrid", "Rome", "Vienna", "Prague",
    "Lisbon", "Dublin", "Warsaw", "Athens", "Oslo", "Helsinki", "Stockholm",
    "Copenhagen", "Amsterdam", "Brussels", "Zurich", "Toronto", "Chicago",
    "Houston", "Phoenix", "Denver", "Seattle", "Boston", "Atlanta",
    "Portland", "Austin", "Dallas", "Miami", "Nairobi", "Osaka",
]
COUNTRIES = [
    "France", "Germany", "Spain", "Italy", "Portugal", "Ireland", "Poland",
    "Greece", "Norway", "Finland", "Sweden", "Denmark", "Netherlands",
    "Belgium", "Switzerland", "Canada", "Brazil", "Argentina", "Japan",
    "Kenya", "Morocco", "Egypt", "India", "Vietnam", "Thailand", "Chile",
    "Peru", "Mexico", "Iceland", "Austria", "Estonia", "Latvia",
]
STREET_NAMES = [
    "Maple", "Oak", "Cedar", "Elm", "Pine", "Birch", "Willow", "Aspen",
    "Juniper", "Laurel", "Magnolia", "Sycamore", "Chestnut", "Hawthorn",
    "Linden", "Poplar", "Rowan", "Spruce", "Walnut", "Alder", "Beech",
    "Cypress", "Dogwood", "Fir", "Hazel", "Holly", "Ivy", "Larch",
    "Mulberry", "Olive", "Palm", "Redwood",
]
STREET_SUFFIXES = [
    "Street", "Avenue", "Road", "Lane", "Drive", "Way", "Court", "Place",
]
COMPANY_HEADS = [
    "Global", "Apex", "Nova", "Prime", "Vertex", "Summit", "Pioneer",
    "Quantum", "Stellar", "Atlas", "Orion", "Zenith", "Horizon", "Vanguard",
    "Crescent", "Beacon",
]
COMPANY_TAILS = [
    "Systems", "Industries", "Solutions", "Holdings", "Dynamics", "Labs",
    "Logistics", "Analytics", "Partners", "Ventures", "Networks", "Group",
    "Technologies", "Consulting", "Works", "Collective",
]
LOREM_WORDS = [
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
    "elit", "sed", "eiusmod", "tempor", "incididunt", "labore", "dolore",
    "magna", "aliqua", "enim", "minim", "veniam", "quis", "nostrud",
    "exercitation", "ullamco", "laboris", "nisi", "aliquip", "commodo",
    "consequat", "duis", "aute", "irure", "voluptate",
]


def _lit_list(items: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in items)


def _cast_str(engine: str, expr: str) -> str:
    return f"CAST({expr} AS {'STRING' if engine == 'spark' else 'VARCHAR'})"


def _H(s: str) -> str:
    # NULL-safety note: the concat body is only reached under the outer
    # "CASE WHEN s IS NULL THEN NULL" guard in FakerSpec.sql, so Spark's
    # NULL-propagating concat vs DuckDB's NULL-skipping concat never
    # diverge here.
    return f"md5(concat('{_SALT}', {s}))"


def _D(s: str) -> str:
    return f"translate({_H(s)}, 'abcdef', '012345')"


def _pick(engine: str, s: str, off: int, items: list[str], width: int = 6) -> str:
    """Deterministic seed-list element: lst[(int(D[off..off+width-1]) % n) + 1]."""
    assert off + width <= 33, "digit window out of range"
    assert 10 ** width >= len(items), "window too narrow for list"
    idx = f"(CAST(substr({_D(s)}, {off}, {width}) AS BIGINT) % {len(items)}) + 1"
    if engine == "spark":
        return f"element_at(array({_lit_list(items)}), CAST({idx} AS INT))"
    return f"list_extract([{_lit_list(items)}], CAST({idx} AS INT))"


def _int_window(s: str, off: int, width: int) -> str:
    return f"CAST(substr({_D(s)}, {off}, {width}) AS BIGINT)"


def _sql_name(engine: str, s: str) -> str:
    return (
        f"concat({_pick(engine, s, 1, FIRST_NAMES)}, ' ', "
        f"{_pick(engine, s, 7, LAST_NAMES)})"
    )


def _sql_first(engine: str, s: str) -> str:
    return _pick(engine, s, 1, FIRST_NAMES)


def _sql_last(engine: str, s: str) -> str:
    return _pick(engine, s, 7, LAST_NAMES)


def _sql_email(engine: str, s: str) -> str:
    # reference shape: valid email (faker_test.go:86-91)
    return f"concat(substr({_H(s)}, 1, 12), '@example.com')"


def _sql_phone(engine: str, s: str) -> str:
    return (
        f"concat('555-', substr({_D(s)}, 1, 3), '-', substr({_D(s)}, 4, 4))"
    )


def _sql_address(engine: str, s: str) -> str:
    house = f"({_int_window(s, 1, 3)} % 999) + 1"
    return (
        f"concat({_cast_str(engine, house)}, ' ', "
        f"{_pick(engine, s, 13, STREET_NAMES)}, ' ', "
        f"{_pick(engine, s, 19, STREET_SUFFIXES)})"
    )


def _sql_city(engine: str, s: str) -> str:
    return _pick(engine, s, 1, CITIES)


def _sql_country(engine: str, s: str) -> str:
    return _pick(engine, s, 1, COUNTRIES)


def _sql_company(engine: str, s: str) -> str:
    return (
        f"concat({_pick(engine, s, 1, COMPANY_HEADS)}, ' ', "
        f"{_pick(engine, s, 7, COMPANY_TAILS)})"
    )


def _sql_uuid(engine: str, s: str) -> str:
    h = _H(s)
    return (
        f"concat_ws('-', substr({h},1,8), substr({h},9,4), substr({h},13,4), "
        f"substr({h},17,4), substr({h},21,12))"
    )


def _sql_username(engine: str, s: str) -> str:
    return f"concat({_pick(engine, s, 1, FIRST_NAMES)}, substr({_D(s)}, 1, 4))"


def _sql_password(engine: str, s: str) -> str:
    # reference: 32-char random (faker_test.go:130-133); deterministic: 32 hex
    return _H(s)


def _sql_ipv4(engine: str, s: str) -> str:
    octets = ", ".join(
        _cast_str(engine, f"{_int_window(s, 1 + 3 * i, 3)} % 256") for i in range(4)
    )
    return f"concat_ws('.', {octets})"


def _sql_date(engine: str, s: str) -> str:
    days = f"CAST({_int_window(s, 1, 5)} % 20000 AS INT{'' if engine == 'spark' else 'EGER'})"
    if engine == "spark":
        return f"date_format(date_add(DATE '1970-01-01', {days}), 'yyyy-MM-dd')"
    return f"strftime(DATE '1970-01-01' + {days}, '%Y-%m-%d')"


def _sql_text(engine: str, s: str) -> str:
    # ~10-word lorem sentence (reference faker.go:26: gofakeit.Sentence(10)):
    # capitalised first word, period at the end.
    words = [_pick(engine, s, 1 + 3 * i, LOREM_WORDS, width=3) for i in range(10)]
    first = words[0]
    cap_first = f"concat(upper(substr({first}, 1, 1)), substr({first}, 2))"
    rest = ", ".join(words[1:])
    return f"concat(concat_ws(' ', {cap_first}, {rest}), '.')"


def _sql_number(engine: str, s: str) -> str:
    # exactly 8 digits (faker_test.go:154-158); substring of D keeps leading 0s
    return f"substr({_D(s)}, 1, 8)"


@dataclass(frozen=True)
class FakerSpec:
    """One deterministic faker function, renderable for spark or duckdb."""

    name: str
    _render: Callable[[str, str], str]

    def sql(self, engine: str, input_expr: str) -> str:
        """SQL for this faker applied to ``input_expr`` (a column reference
        or expression; it is string-cast internally).

        NULL originals yield NULL in BOTH engines — DuckDB's ``concat``
        swallows NULL arguments where Spark's propagates, so an explicit
        guard keeps the two renderings bit-identical.
        """
        s = _cast_str(engine, input_expr)
        body = self._render(engine, s)
        return f"CASE WHEN {s} IS NULL THEN NULL ELSE {body} END"

    def spark_column(self, column_name: str) -> Column:
        return F.expr(self.sql("spark", f"`{column_name}`"))

    def duckdb_sql(self, column_name: str) -> str:
        return self.sql("duckdb", f'"{column_name}"')


# Registry — same 16 names as the reference (faker.go:11-28).
FAKER_FUNCTIONS: dict[str, FakerSpec] = {
    spec.name: spec
    for spec in [
        FakerSpec("name", _sql_name),
        FakerSpec("firstName", _sql_first),
        FakerSpec("lastName", _sql_last),
        FakerSpec("email", _sql_email),
        FakerSpec("phone", _sql_phone),
        FakerSpec("address", _sql_address),
        FakerSpec("city", _sql_city),
        FakerSpec("country", _sql_country),
        FakerSpec("company", _sql_company),
        FakerSpec("uuid", _sql_uuid),
        FakerSpec("username", _sql_username),
        FakerSpec("password", _sql_password),
        FakerSpec("ipv4", _sql_ipv4),
        FakerSpec("date", _sql_date),
        FakerSpec("text", _sql_text),
        FakerSpec("number", _sql_number),
    ]
}


def get_faker(name: str) -> FakerSpec | None:
    """faker.go:32-34 — None for unknown names."""
    return FAKER_FUNCTIONS.get(name)


def list_faker_functions() -> list[str]:
    """faker.go:38-44."""
    return sorted(FAKER_FUNCTIONS)

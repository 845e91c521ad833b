"""Realistic (pandas-UDF) faker mode: registry completeness, shapes
(faker_test.go:64-177 spirit), per-value determinism, NULL handling."""

import re

import pytest
from pyspark.sql import functions as F

from database_anonymiser_minimiser_spark.functions.faker_realistic import (
    REALISTIC_FAKERS,
    realistic_column,
)

SHAPES = {
    "name": re.compile(r"^[A-Z][a-z]+ [A-Z][a-z]+$"),
    "firstName": re.compile(r"^[A-Z][a-z]+$"),
    "lastName": re.compile(r"^[A-Z][a-z]+$"),
    "email": re.compile(r"^[a-z]+\.[a-z]+\d+@[a-z.]+$"),
    "phone": re.compile(r"^\(\d{3}\) \d{3}-\d{4}$"),
    "address": re.compile(r"^\d+ [A-Z][a-z]+ [A-Z][a-z]+$"),
    "city": re.compile(r"^[A-Z][a-z]+$"),
    "country": re.compile(r"^[A-Z][a-z]+$"),
    "company": re.compile(r"^[A-Z][a-z]+ [A-Z][a-z]+$"),
    "uuid": re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"),
    "username": re.compile(r"^[a-z]+\d+$"),
    "password": re.compile(r"^.{32}$"),
    "ipv4": re.compile(r"^(\d{1,3}\.){3}\d{1,3}$"),
    "date": re.compile(r"^\d{4}-\d{2}-\d{2}$"),
    "text": re.compile(r"^[A-Z][a-z]+( [a-z]+){9}\.$"),
    "number": re.compile(r"^\d{8}$"),
}


def test_registry_matches_reference_names():
    assert sorted(REALISTIC_FAKERS) == sorted(SHAPES)
    assert len(REALISTIC_FAKERS) == 16


@pytest.fixture(scope="module")
def inputs(spark):
    return spark.createDataFrame(
        [(f"value-{i}",) for i in range(30)] + [(None,)], ["v"]
    )


@pytest.mark.parametrize("fname", sorted(REALISTIC_FAKERS))
def test_shape_and_null(spark, inputs, fname):
    out = inputs.select(F.col("v"), realistic_column(fname, "v").alias("o")).collect()
    for r in out:
        if r["v"] is None:
            assert r["o"] is None
        else:
            assert SHAPES[fname].match(r["o"]), (fname, r["o"])


def test_deterministic_per_value(spark, inputs):
    a = {r["v"]: r["o"] for r in
         inputs.select("v", realistic_column("email", "v").alias("o")).collect()}
    b = {r["v"]: r["o"] for r in
         inputs.select("v", realistic_column("email", "v").alias("o")).collect()}
    assert a == b


def test_variety(spark, inputs):
    for fname in ("uuid", "password", "number"):
        vals = [
            r["o"]
            for r in inputs.filter(F.col("v").isNotNull())
            .select(realistic_column(fname, "v").alias("o"))
            .collect()
        ]
        assert len(set(vals)) == len(vals), fname


def test_ipv4_octet_range(spark, inputs):
    for r in inputs.filter(F.col("v").isNotNull()).select(
        realistic_column("ipv4", "v").alias("o")
    ).collect():
        assert all(0 <= int(x) <= 255 for x in r["o"].split("."))

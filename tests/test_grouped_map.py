"""Grouped-map normalisation: the applyInPandas path must agree with the
decimal-exact SQL path to float tolerance, and z-scores must actually
standardise each group."""

import math

from database_anonymiser_minimiser_spark.queries import QUERIES


def test_pandas_agrees_with_exact(spark, sf_dir):
    exact = {
        r["event_id"]: r["zscore"]
        for r in QUERIES["zscore_events_exact"](spark, sf_dir).collect()
    }
    approx = {
        r["event_id"]: r["zscore"]
        for r in QUERIES["zscore_events_pandas"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    worst = max(abs(exact[k] - approx[k]) for k in exact)
    assert worst < 1e-9, worst


def test_zscores_standardise(spark, sf_dir):
    rows = QUERIES["zscore_events_exact"](spark, sf_dir).collect()
    zs = [r["zscore"] for r in rows]
    n = len(zs)
    mean = sum(zs) / n
    var = sum((z - mean) ** 2 for z in zs) / (n - 1)
    # pooled per-group standardisation: overall mean ~0; per-group var 1
    assert abs(mean) < 1e-6
    assert 0.5 < var < 1.5
    assert all(math.isfinite(z) for z in zs)

"""t-digest sketch: compression invariants, merge order-insensitivity,
rank-accuracy bounds (hypothesis-fuzzed), and the distributed two-level
Spark path against numpy exact quantiles."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from database_anonymiser_minimiser_spark.operators.tdigest import (
    compress,
    merge_digests,
    quantile,
    tdigest_quantiles,
)

PS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _rank_error(vals, est, p):
    """|empirical rank of est - p| (the bound t-digest actually makes)."""
    vals = np.sort(vals)
    lo = np.searchsorted(vals, est, side="left") / vals.size
    hi = np.searchsorted(vals, est, side="right") / vals.size
    return 0.0 if lo <= p <= hi else min(abs(lo - p), abs(hi - p))


def test_compress_bounds_centroid_count():
    rng = np.random.default_rng(7)
    vals = rng.lognormal(3.0, 1.0, 50_000)
    m, w = compress(vals, np.ones_like(vals), delta=100.0)
    assert m.size <= 2 * 100 + 2
    assert float(w.sum()) == pytest.approx(50_000.0)
    assert np.all(np.diff(m) >= 0)  # sorted means


def test_quantile_edges_exact_and_monotone():
    rng = np.random.default_rng(11)
    vals = rng.normal(0, 1, 20_000)
    m, w = compress(vals, np.ones_like(vals), delta=100.0)
    ests = quantile(m, w, float(vals.min()), float(vals.max()), [0.0, *PS, 1.0])
    assert ests[0] == pytest.approx(float(vals.min()))
    assert ests[-1] == pytest.approx(float(vals.max()))
    assert np.all(np.diff(ests) >= 0)


def test_merge_is_order_insensitive():
    rng = np.random.default_rng(3)
    parts = []
    for _ in range(6):
        v = rng.exponential(10.0, 4_000)
        parts.append(compress(v, np.ones_like(v), 100.0))
    a = merge_digests(parts, 100.0)
    b = merge_digests(parts[::-1], 100.0)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_merged_matches_whole_accuracy():
    """Digest-of-parts must be as accurate as digest-of-whole: both
    within the 1.5% rank band on a heavy-tailed distribution."""
    rng = np.random.default_rng(5)
    vals = rng.lognormal(2.0, 1.5, 60_000)
    chunks = np.array_split(vals, 13)
    merged = merge_digests(
        [compress(c, np.ones_like(c), 100.0) for c in chunks], 100.0
    )
    whole = compress(vals, np.ones_like(vals), 100.0)
    for digest in (merged, whole):
        ests = quantile(*digest, float(vals.min()), float(vals.max()), PS)
        for p, e in zip(PS, ests):
            assert _rank_error(vals, e, p) <= 0.015, (p, e)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=50, max_size=3000),
    st.sampled_from([0.1, 0.5, 0.9]),
)
def test_rank_error_bound_fuzzed(xs, p):
    vals = np.asarray(xs, dtype=np.float64)
    m, w = compress(vals, np.ones_like(vals), delta=100.0)
    est = quantile(m, w, float(vals.min()), float(vals.max()), [p])[0]
    # fuzz sanity bound, looser than the smooth-distribution tests
    # above: on adversarial inputs (heavy duplication at a mass step,
    # n~50) midpoint interpolation can stray past the asymptotic
    # O(q(1-q)/delta) bound — hypothesis found 2.9% — while the shipped
    # guarantee (the 5% VALUE band gate in
    # percentiles_tdigest_band_orders) remains comfortably met
    assert _rank_error(vals, est, p) <= 0.05


def test_spark_two_level_vs_exact(spark, sf_dir):
    """The distributed path (mapInPandas partials -> sharded pre-merge
    -> final merge) lands within 5% of numpy's exact per-group
    quantiles on real order totals, for every group and p."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = (
        tdigest_quantiles(df, "o_totalprice", ["o_orderstatus"], PS)
        .orderBy("o_orderstatus", "p")
        .collect()
    )
    pdf = df.select("o_orderstatus", "o_totalprice").toPandas()
    assert len(got) == pdf["o_orderstatus"].nunique() * len(PS)
    for r in got:
        vals = pdf.loc[
            pdf["o_orderstatus"] == r["o_orderstatus"], "o_totalprice"
        ].to_numpy(dtype=np.float64)
        exact = np.quantile(vals, r["p"])
        assert abs(r["est"] - exact) <= 0.05 * max(abs(exact), 1.0), r


def test_nan_values_excluded_like_null(spark):
    """ADVICE r7: isNotNull() passes NaN, and one NaN poisons
    vmin/vmax and every centroid mean for its group. The batch path
    must strip NaN exactly like the streaming twin does — quantiles
    over [1..100] + NaN must equal quantiles over [1..100]."""
    rows = [("a", float(i)) for i in range(1, 101)]
    rows += [("a", float("nan")), ("a", None), ("b", float("nan"))]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["p"]): r["est"]
        for r in tdigest_quantiles(df, "v", ["g"], [0.0, 0.5, 1.0]).collect()
    }
    # group b had ONLY NaN values -> no digest row at all (like all-NULL)
    assert set(g for g, _ in got) == {"a"}
    assert got[("a", 0.0)] == 1.0 and got[("a", 1.0)] == 100.0
    assert abs(got[("a", 0.5)] - 50.5) <= 1.0
    for v in got.values():
        assert not np.isnan(v)


def test_spark_path_no_raw_row_shuffle(spark, sf_dir):
    """Plan gate: the only exchanges are digest-keyed (group/shard) —
    the raw value column never appears in an Exchange's output, i.e.
    the shuffle moves O(delta) centroid arrays, not rows."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = tdigest_quantiles(df, "o_totalprice", ["o_orderstatus"], PS)
    plan = out._jdf.queryExecution().explainString(
        out._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    for m in re.finditer(r"\(\d+\) Exchange\b.*?\n(.*?)\n", plan):
        assert "_v#" not in m.group(1), m.group(0)


def test_incremental_feed_accuracy():
    """The streaming state discipline: feed a corpus in arbitrary batch
    splits through repeated merge-with-running-digest. The running
    digest must stay size-bounded after EVERY step and land within the
    rank band at the end — digest(digest(A)+B) is not byte-equal to
    digest(A+B), but the accuracy contract survives."""
    rng = np.random.default_rng(17)
    vals = rng.lognormal(2.0, 1.2, 40_000)
    for n_batches in (1, 7, 23):
        m = w = np.array([])
        for chunk in np.array_split(vals, n_batches):
            pm, pw = compress(chunk, np.ones_like(chunk), 100.0)
            m, w = merge_digests([(m, w), (pm, pw)], 100.0) if m.size else (pm, pw)
            assert m.size <= 2 * 100 + 2
        ests = quantile(m, w, float(vals.min()), float(vals.max()), PS)
        for p, e in zip(PS, ests):
            assert _rank_error(vals, e, p) <= 0.02, (n_batches, p)


def test_streaming_running_quantiles(spark, sf_dir):
    """Live-stream path: 4 micro-batches through applyInPandasWithState;
    the final per-type estimates land within 5% of numpy exact, and
    every type in the corpus is present."""
    from database_anonymiser_minimiser_spark.sources.parquet import (
        read_parquet_table,
    )
    from database_anonymiser_minimiser_spark.streaming.stateful import (
        run_streaming_quantiles,
    )

    got = {r["event_type"]: r for r in run_streaming_quantiles(spark, sf_dir).collect()}
    pdf = (
        read_parquet_table(spark, f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .toPandas()
    )
    assert set(got) == set(pdf["event_type"].unique())
    for etype, r in got.items():
        vals = pdf.loc[pdf["event_type"] == etype, "value"].to_numpy(dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        assert r["n_seen"] == vals.size
        for p, col in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
            exact = np.quantile(vals, p)
            assert abs(r[col] - exact) <= 0.05 * max(abs(exact), 1.0), (etype, p)

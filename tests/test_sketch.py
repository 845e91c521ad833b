"""Property tests for the Misra-Gries summary (operators/sketch.py):
the guarantees the heavy_hitters_sketch_pairs gate relies on must hold
for ARBITRARY streams and batchings, not just the benched corpus."""

from collections import Counter

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from database_anonymiser_minimiser_spark.operators.sketch import (
    mg_partition_summary,
    mg_update,
)

# small alphabets + small caps force constant eviction — the regime
# where the bound actually bites
stream = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=2), max_size=400
)
caps = st.integers(min_value=1, max_value=10)


@given(stream, caps)
@settings(max_examples=200, deadline=None)
def test_mg_absence_and_undercount_bounds(items, cap):
    cnt: Counter = Counter()
    cnt = mg_update(cnt, items, cap)
    true = Counter(items)
    n = len(items)
    assert len(cnt) <= cap
    for k, t in true.items():
        est = cnt.get(k, 0)
        # estimates never overcount, and undercount <= n/(cap+1)
        assert est <= t
        assert t - est <= n / (cap + 1)
        # the absence bound the oracle gate asserts:
        if t * (cap + 1) > n:
            assert k in cnt, (k, t, n, cap)


@given(
    st.lists(stream, min_size=1, max_size=5),
    caps,
)
@settings(max_examples=100, deadline=None)
def test_mg_batched_equals_streamed_bounds_and_merge(batches, cap):
    """Feeding the same stream in any batching keeps the bounds; merged
    summaries (sum of estimates) keep the global absence bound."""
    summaries = []
    total = Counter()
    n_total = 0
    for b in batches:
        frames = (pd.DataFrame({"k": chunk}) for chunk in [b])
        out = list(mg_partition_summary(frames, cap, "k"))
        assert len(out) == 1
        summaries.append(dict(zip(out[0]["k"], out[0]["est"])))
        total.update(b)
        n_total += len(b)
    merged = Counter()
    for s in summaries:
        merged.update(s)
    for k, t in total.items():
        est = merged.get(k, 0)
        assert est <= t
        assert t - est <= n_total / (cap + 1)
        if t * cap > n_total:  # the query's integer-arithmetic guarantee
            assert k in merged, (k, t, n_total, cap)


def test_mg_partition_summary_deterministic_order():
    frames = (pd.DataFrame({"k": ["b", "a", "b", "c", "a", "b"]}) for _ in [0])
    (out,) = mg_partition_summary(frames, 10, "k")
    assert list(out["k"]) == ["b", "a", "c"]  # (-count, key) order
    assert list(out["est"]) == [3, 2, 1]


# --- Count-Min sketch ------------------------------------------------------


def test_cm_never_underestimates_and_exact_when_wide(spark):
    """est >= true for EVERY key (cells only over-count via collisions);
    with width >> distinct keys, collisions are absent for this fixed
    key set and est == true exactly."""
    from collections import Counter

    from database_anonymiser_minimiser_spark.operators.sketch import (
        cm_estimate,
        cm_sketch,
    )

    items = [f"k{i % 37}" for i in range(1000)] + ["hot"] * 500
    true = Counter(items)
    df = spark.createDataFrame([(x,) for x in items], ["v"])
    keys = spark.createDataFrame([(k,) for k in true], ["v"])

    # tight width: only the lower bound is guaranteed
    sk = cm_sketch(df, "v", depth=4, width=16)
    est = {r["k"]: r["est"] for r in cm_estimate(sk, keys, "v", 4, 16).collect()}
    assert all(est[k] >= c for k, c in true.items()), (est, true)

    # wide sketch: exact
    sk = cm_sketch(df, "v", depth=4, width=4096)
    est = {r["k"]: r["est"] for r in cm_estimate(sk, keys, "v", 4, 4096).collect()}
    assert est == dict(true)


def test_cm_sketches_merge_by_cell_sum(spark):
    """Mergeability: the sketch of A UNION B equals the elementwise sum
    of the sketches of A and B — the property that makes per-partition
    sketches combinable by one aggregation."""
    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.operators.sketch import cm_sketch

    a = spark.createDataFrame([(f"a{i % 7}",) for i in range(100)], ["v"])
    b = spark.createDataFrame([(f"b{i % 5}",) for i in range(80)], ["v"])
    merged = {
        (r["r"], r["c"]): r["cnt"]
        for r in cm_sketch(a.union(b), "v", 3, 64).collect()
    }
    summed = {}
    for part in (a, b):
        for r in cm_sketch(part, "v", 3, 64).collect():
            summed[(r["r"], r["c"])] = summed.get((r["r"], r["c"]), 0) + r["cnt"]
    assert merged == summed


def test_cm_sketch_relation_is_bounded(spark):
    """The sketch never exceeds depth*width rows no matter the input."""
    from database_anonymiser_minimiser_spark.operators.sketch import cm_sketch

    df = spark.createDataFrame([(f"k{i}",) for i in range(5000)], ["v"])
    assert cm_sketch(df, "v", depth=2, width=32).count() <= 2 * 32

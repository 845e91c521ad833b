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

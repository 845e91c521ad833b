"""Funnel operator: hypothesis-fuzzed equivalence against an independent
pure-Python reference of the sequential-min definition, with tiny ts/user
domains so timestamp TIES and step-order inversions actually occur — the
cases where a wrong funnel (>= instead of >, order-dependent fold,
per-step independence) silently diverges."""

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from database_anonymiser_minimiser_spark.operators.funnel import (
    funnel_counts,
    funnel_times,
)

STEPS = ["a", "b", "c"]

# small domains force collisions: 4 users, 8 distinct ts, 4 event types
EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=7),  # ts
        st.sampled_from(STEPS + ["noise"]),  # type
    ),
    min_size=1,
    max_size=30,
)


def ref_funnel(events, steps):
    """Independent sequential-min reference: t1 = min ts of step 1;
    t_i = min ts of step i strictly greater than t_{i-1}."""
    per_user = defaultdict(list)
    for u, ts, ty in events:
        per_user[u].append((ts, ty))
    counts = [0] * len(steps)
    times = {}
    for u, evs in per_user.items():
        t = None
        ts_out = []
        for i, s in enumerate(steps):
            cand = [
                ts
                for ts, ty in evs
                if ty == s and (t is None if i == 0 else ts > t)
            ]
            if not cand:
                break
            t = min(cand)
            ts_out.append(t)
            counts[i] += 1
        times[u] = ts_out + [None] * (len(steps) - len(ts_out))
    return counts, times


@given(EVENTS)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # r15 full-tier (scale/fuzz/e2e twin; see conftest)
def test_funnel_matches_reference_on_random_event_sets(spark, events):
    df = spark.createDataFrame(events, "user_id int, ts int, event_type string")
    want_counts, want_times = ref_funnel(events, STEPS)

    got_counts = {
        r["step"]: r["users"]
        for r in funnel_counts(df, "user_id", "ts", "event_type", STEPS).collect()
    }
    assert [got_counts[i] for i in (1, 2, 3)] == want_counts

    got_times = {
        r["user_id"]: [r["t1"], r["t2"], r["t3"]]
        for r in funnel_times(df, "user_id", "ts", "event_type", STEPS).collect()
    }
    assert got_times == want_times


def test_funnel_tie_does_not_advance(spark):
    """A step-2 event at exactly t1 must NOT count (strict >)."""
    df = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "b"), (1, 6, "b"), (2, 5, "a"), (2, 5, "b")],
        "user_id int, ts int, event_type string",
    )
    times = {
        r["user_id"]: (r["t1"], r["t2"])
        for r in funnel_times(df, "user_id", "ts", "event_type", ["a", "b"]).collect()
    }
    assert times[1] == (5, 6)  # the ts=5 'b' is skipped, ts=6 counts
    assert times[2] == (5, None)  # only a tied 'b' exists -> step 2 unreached


def test_funnel_out_of_order_steps_do_not_count(spark):
    """Step events BEFORE the prior step completed are invisible."""
    df = spark.createDataFrame(
        [(1, 1, "b"), (1, 2, "a"), (1, 3, "b")],
        "user_id int, ts int, event_type string",
    )
    times = funnel_times(df, "user_id", "ts", "event_type", ["a", "b"]).collect()[0]
    assert (times["t1"], times["t2"]) == (2, 3)


def test_funnel_empty_steps_rejected(spark):
    df = spark.createDataFrame([(1, 1, "a")], "user_id int, ts int, event_type string")
    with pytest.raises(ValueError):
        funnel_times(df, "user_id", "ts", "event_type", [])


# --- cohort retention ------------------------------------------------------

from datetime import datetime, timedelta

from database_anonymiser_minimiser_spark.operators.funnel import cohort_retention

_EPOCH = datetime(2024, 1, 1)  # a Monday

COHORT_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=45),  # day offset (7 weeks)
        st.integers(min_value=0, max_value=23),  # hour
    ),
    min_size=1,
    max_size=30,
)


def ref_cohort(events):
    """Independent reference: Monday-aligned first week per user, count
    users per (cohort_week, whole-week offset)."""
    weeks = defaultdict(set)
    for u, day, hour in events:
        ts = _EPOCH + timedelta(days=day, hours=hour)
        monday = (ts - timedelta(days=ts.weekday())).date()
        weeks[u].add(monday)
    matrix = defaultdict(int)
    for u, wks in weeks.items():
        first = min(wks)
        for wk in wks:
            matrix[(first.isoformat(), (wk - first).days // 7)] += 1
    return dict(matrix)


@given(COHORT_EVENTS)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cohort_matches_reference_on_random_event_sets(spark, events):
    rows = [
        (u, _EPOCH + timedelta(days=day, hours=hour))
        for u, day, hour in events
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        (r["cohort_week"], r["week_offset"]): r["users"]
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    assert got == ref_cohort(events)


# --- windowed funnel (exists-semantics) ------------------------------------

from database_anonymiser_minimiser_spark.operators.funnel import (
    funnel_times_windowed,
)


def ref_windowed_funnel(events, steps, within):
    """Brute-force reference straight from the definition: step i's
    qualifying set = step-i events with SOME qualifying step-(i-1) time
    strictly before and at most `within` earlier."""
    per_user = defaultdict(list)
    for u, ts, ty in events:
        per_user[u].append((ts, ty))
    out = {}
    for u, evs in per_user.items():
        prev = None  # qualifying set of the previous step
        times = []
        for i, s in enumerate(steps):
            if i == 0:
                q = {ts for ts, ty in evs if ty == s}
            else:
                q = {
                    ts
                    for ts, ty in evs
                    if ty == s
                    and any(p < ts <= p + within for p in prev)
                }
            times.append(min(q) if q else None)
            prev = q
        out[u] = times
    return out


@given(EVENTS, st.integers(min_value=1, max_value=4))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_windowed_funnel_matches_bruteforce(spark, events, within):
    df = spark.createDataFrame(events, "user_id int, ts int, event_type string")
    got = {
        r["user_id"]: [r["t1"], r["t2"], r["t3"]]
        for r in funnel_times_windowed(
            df, "user_id", "ts", "event_type", STEPS, within
        ).collect()
    }
    assert got == ref_windowed_funnel(events, STEPS, within)


def test_windowed_funnel_beats_greedy_anchor(spark):
    """The case a greedy first-anchor fold gets WRONG: with W=2 and
    a@0, a@2, b@3, anchoring on a@0 misses the a@2 -> b@3 conversion.
    Exists-semantics must count it."""
    df = spark.createDataFrame(
        [(1, 0, "a"), (1, 2, "a"), (1, 3, "b")],
        "user_id int, ts int, event_type string",
    )
    r = funnel_times_windowed(df, "user_id", "ts", "event_type", ["a", "b"], 2).collect()[0]
    assert (r["t1"], r["t2"]) == (0, 3)


def test_windowed_funnel_tie_excluded(spark):
    """Equal timestamps must not satisfy the strict < (range frame, not
    rows frame — a rows frame would leak same-ts rows nondeterministically)."""
    df = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "b")], "user_id int, ts int, event_type string"
    )
    r = funnel_times_windowed(df, "user_id", "ts", "event_type", ["a", "b"], 10).collect()[0]
    assert (r["t1"], r["t2"]) == (5, None)

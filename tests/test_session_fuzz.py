"""Gap-sessionization: hypothesis-fuzzed equivalence of Spark's
F.session_window against an independent pure-Python gaps-and-islands
reference, with a tiny timestamp domain so EXACT-GAP deltas occur — the
boundary where a wrong convention (> vs >= on the inactivity gap)
silently diverges. FIRST RUN OF THIS FUZZER CAUGHT EXACTLY THAT: the
session oracles said >= gap starts a new session, but Spark MERGES
touching windows — an event at exactly last+gap EXTENDS the session
(probed: events at 0 s and 60 s with a 60 s gap form ONE [0,120)
session). The oracles were green only because corpus deltas never land
on the microsecond-exact boundary; both now encode the verified
STRICT-> convention this reference implements."""

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

GAP_S = 60

# 3 users, ts on a 30 s grid spanning 0..600 s: plenty of deltas at
# EXACTLY the 60 s gap, plus duplicates (same user+ts twice)
EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=20),  # ts in 30 s units
    ),
    min_size=1,
    max_size=40,
)


def ref_sessions(events):
    """Independent reference: per user, sort ts; a new session starts
    when ts - prev > GAP_S (Spark-verified: touching windows MERGE, so
    an event at exactly last+gap EXTENDS the session). Returns
    {(user, session_start_s, n_events)} as a multiset-free set — counts
    make rows unique per (user, start)."""
    per_user = defaultdict(list)
    for u, t in events:
        per_user[u].append(t * 30)
    out = set()
    for u, ts_list in per_user.items():
        ts_list.sort()
        start, n, prev = ts_list[0], 0, None
        for t in ts_list:
            if prev is not None and t - prev > GAP_S:
                out.add((u, start, n))
                start, n = t, 0
            n += 1
            prev = t
        out.add((u, start, n))
    return out


@given(EVENTS)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_session_window_matches_reference(spark, events):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(
        [(u, t * 30) for u, t in events], "user_id int, ts_s int"
    ).select("user_id", F.timestamp_seconds("ts_s").alias("ts"))
    got = {
        (
            r["user_id"],
            int(r["start_s"]),
            r["n_events"],
        )
        for r in (
            df.groupBy(
                F.session_window("ts", f"{GAP_S} seconds").alias("w"), "user_id"
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .select(
                "user_id",
                F.unix_timestamp("w.start").alias("start_s"),
                "n_events",
            )
            .collect()
        )
    }
    assert got == ref_sessions(events)

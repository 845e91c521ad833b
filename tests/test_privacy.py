"""Privacy operator semantics on hand-built fixtures where the k-anonymity
properties are known exactly."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from database_anonymiser_minimiser_spark.operators import privacy as P

ROWS = [
    # (id, zip, age, diagnosis) — class (981, 2x) has 2 rows, (982, 3x) has 3
    (1, "98101", 34, "flu"),
    (2, "98102", 35, "cold"),
    (3, "98201", 30, "flu"),
    (4, "98202", 31, "flu"),
    (5, "98203", 32, "covid"),
    (6, "99901", 77, "rare-disease"),  # singleton class
]


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(ROWS, ["id", "zip", "age", "diagnosis"])


@pytest.fixture(scope="module")
def generalized(people):
    return people.select(
        "id",
        P.generalize_prefix("zip", 3).alias("zip3"),
        P.generalize_numeric("age", 10).alias("age_band"),
        "diagnosis",
    )


def test_generalize_numeric(people):
    bands = {r["id"]: r["b"] for r in
             people.select("id", P.generalize_numeric("age", 10).alias("b")).collect()}
    assert bands[1] == 30.0 and bands[6] == 70.0


def test_generalize_prefix(people):
    zips = {r["id"]: r["z"] for r in
            people.select("id", P.generalize_prefix("zip", 3).alias("z")).collect()}
    assert zips[1] == "981" and zips[3] == "982"


def test_generalize_time(spark):
    df = spark.createDataFrame(
        [(1, datetime(2024, 5, 17, 13, 45))], ["id", "ts"]
    )
    out = df.select(P.generalize_time("ts", "month").alias("m")).collect()[0]["m"]
    assert out == datetime(2024, 5, 1)


def test_k_anonymity_stats_and_violations(generalized):
    sizes = {
        (r["zip3"], r["age_band"]): r["class_size"]
        for r in P.k_anonymity_stats(generalized, ["zip3", "age_band"]).collect()
    }
    assert sizes[("981", 30.0)] == 2
    assert sizes[("982", 30.0)] == 3
    assert sizes[("999", 70.0)] == 1
    violations = P.k_anonymity_violations(generalized, ["zip3", "age_band"], k=2)
    assert {tuple(r)[:2] for r in violations.collect()} == {("999", 70.0)}
    # k=1 is always satisfied
    assert P.k_anonymity_violations(generalized, ["zip3", "age_band"], k=1).count() == 0


def test_suppress_below_k(generalized):
    kept = P.suppress_below_k(generalized, ["zip3", "age_band"], k=2)
    ids = {r["id"] for r in kept.collect()}
    assert ids == {1, 2, 3, 4, 5}  # singleton row 6 suppressed
    assert kept.columns == generalized.columns
    # result is now 2-anonymous
    assert P.k_anonymity_violations(kept, ["zip3", "age_band"], k=2).count() == 0


def test_shift_dates_preserves_intervals(spark):
    """Each key's timestamps shift by ONE common offset: intervals and
    ordering inside a key survive; different keys shift differently."""
    rows = [
        (1, "u1", datetime(2024, 1, 1)),
        (2, "u1", datetime(2024, 1, 11)),
        (3, "u2", datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows, ["id", "user", "ts"])
    out = {
        r["id"]: r["shifted"]
        for r in df.select(
            "id", P.shift_dates("ts", "user", max_days=30).alias("shifted")
        ).collect()
    }
    # interval within u1 preserved exactly
    assert (out[2] - out[1]).days == 10
    # offset in [1, 30] days
    assert 1 <= (out[1] - datetime(2024, 1, 1)).days <= 30
    # different keys get (almost surely) different offsets
    assert out[3] != out[1]


def test_perturb_numeric_bounded_and_deterministic(spark):
    rows = [(i, float(100 + i)) for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {
        r["k"]: r["p"]
        for r in df.select(
            "k", P.perturb_numeric("v", "k", step=0.5, buckets=21).alias("p")
        ).collect()
    }
    for k, p in out.items():
        assert abs(p - (100 + k)) <= 10 * 0.5 + 1e-9  # bounded noise
    again = {
        r["k"]: r["p"]
        for r in df.select(
            "k", P.perturb_numeric("v", "k", step=0.5, buckets=21).alias("p")
        ).collect()
    }
    assert out == again
    assert any(p != 100 + k for k, p in out.items())  # actually perturbs


def test_suppress_keeps_null_classes(spark):
    """A NULL quasi-identifier value forms its own equivalence class; if
    that class has >= k rows it must survive suppression (null-safe join
    regression test)."""
    rows = [(i, None, "x") for i in range(5)] + [(9, "981", "y")]
    df = spark.createDataFrame(rows, ["id", "zip3", "v"])
    kept = {r["id"] for r in P.suppress_below_k(df, ["zip3"], k=3).collect()}
    assert kept == {0, 1, 2, 3, 4}  # NULL class of 5 kept, singleton dropped


def test_l_diversity(generalized):
    stats = {
        r["zip3"]: (r["class_size"], r["l_distinct"])
        for r in P.l_diversity_stats(generalized, ["zip3"], "diagnosis").collect()
    }
    assert stats["981"] == (2, 2)  # flu, cold
    assert stats["982"] == (3, 2)  # flu, flu, covid -> 2 distinct
    assert stats["999"] == (1, 1)  # homogeneity: l=1 exposes the diagnosis


# --- reversible pseudonymization ------------------------------------------


def test_pseudonymize_roundtrip_and_modes(spark):
    """GCM: roundtrip identity, ciphertext != plaintext, equal plaintexts
    get DIFFERENT tokens (random IV). ECB (deterministic=True): equal
    plaintexts get the SAME token — the join-preserving mode."""
    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.operators.privacy import (
        depseudonymize_column,
        pseudonymize_column,
    )

    key = "0123456789abcdef"  # 16-byte AES-128 test key
    df = spark.createDataFrame(
        [(1, "alice"), (2, "alice"), (3, "bob")], ["id", "name"]
    )

    gcm = df.select(
        "id", "name", pseudonymize_column("name", key).alias("tok")
    )
    back = gcm.select(
        "id", "name", depseudonymize_column("tok", key).alias("plain")
    ).collect()
    assert all(r["plain"] == r["name"] for r in back)
    toks = {r["id"]: r["tok"] for r in gcm.collect()}
    assert toks[1] != "alice" and toks[1] != toks[2]  # random IV

    det = df.select(
        "id",
        pseudonymize_column("name", key, deterministic=True).alias("tok"),
    ).collect()
    dtoks = {r["id"]: r["tok"] for r in det}
    assert dtoks[1] == dtoks[2] != dtoks[3]  # join-preserving

    # deterministic roundtrip too
    det2 = (
        spark.createDataFrame(det, ["id", "tok"])
        .select(
            "id",
            depseudonymize_column("tok", key, deterministic=True).alias(
                "plain"
            ),
        )
        .collect()
    )
    assert {r["id"]: r["plain"] for r in det2} == {1: "alice", 2: "alice", 3: "bob"}


def test_pseudonymize_wrong_key_fails_closed(spark):
    """GCM is authenticated: decrypting with the wrong key must raise,
    not return garbage."""
    import pytest as _pytest

    from database_anonymiser_minimiser_spark.operators.privacy import (
        depseudonymize_column,
        pseudonymize_column,
    )

    df = spark.createDataFrame([("secret",)], ["v"])
    enc = df.select(pseudonymize_column("v", "0123456789abcdef").alias("tok"))
    with _pytest.raises(Exception):
        enc.select(
            depseudonymize_column("tok", "feedfacefeedface")
        ).collect()


# ---------------------------------------------------------------------------
# DP noisy counts (two-sided geometric mechanism)
# ---------------------------------------------------------------------------


def test_geometric_inverse_cdf_table():
    """The literal breakpoint table must be a valid inverse CDF: sorted,
    2K entries, covering [0, 2^52) with the documented tail bound."""
    from database_anonymiser_minimiser_spark.operators.privacy import (
        geometric_inverse_cdf,
    )
    import math

    for eps in (0.1, 0.5, 1.0, 2.0):
        breaks, k_tail = geometric_inverse_cdf(eps)
        assert len(breaks) == 2 * k_tail
        assert breaks == sorted(breaks)
        assert breaks[0] >= 0 and breaks[-1] <= (1 << 52)
        a = math.exp(-eps)
        # tail mass beyond K is below the uniform's resolution
        assert 2 * a ** (k_tail + 1) / (1 + a) <= 2.0**-52
        # the median break (CDF just below 0) sits near the distribution
        # centre: CDF(-1) = a/(1+a), CDF(0) = 1/(1+a)
        lo = breaks[k_tail - 1] / (1 << 52)  # CDF(-1)
        hi = breaks[k_tail] / (1 << 52)  # CDF(0)
        assert abs(lo - a / (1 + a)) < 1e-9
        assert abs(hi - 1 / (1 + a)) < 1e-9


def test_dp_noise_distribution_and_determinism(spark):
    """Empirical noise over many keys matches the two-sided geometric:
    zero-centred, E|Z| = 2a/(1-a^2) within a sampling band, bounded by
    the tail cutoff, deterministic across evaluations, and smaller at
    larger epsilon."""
    import math

    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_noise_column,
        geometric_inverse_cdf,
    )

    keys = spark.range(5000)

    def sample(eps):
        return [
            r["z"]
            for r in keys.select(
                dp_noise_column(F.col("id"), epsilon=eps).alias("z")
            ).collect()
        ]

    z1 = sample(1.0)
    assert z1 == sample(1.0)  # deterministic release
    _, k_tail = geometric_inverse_cdf(1.0)
    assert all(abs(z) <= k_tail for z in z1)
    a = math.exp(-1.0)
    expected_abs = 2 * a / (1 - a * a)  # 0.851 at eps=1
    mean_abs = sum(abs(z) for z in z1) / len(z1)
    assert abs(mean_abs - expected_abs) < 0.08
    assert abs(sum(z1) / len(z1)) < 0.05  # zero-centred

    z_tight = sample(2.0)
    assert sum(abs(z) for z in z_tight) / len(z_tight) < mean_abs


def test_dp_noisy_count_clamps_and_shapes(spark):
    """dp_noisy_count: released counts are never negative (epsilon small
    enough that size-1 groups draw noise below -1), and the plan is ONE
    aggregate exchange with the noise on the aggregated side."""
    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_noisy_count,
    )

    df = spark.range(400).select(F.col("id").alias("g"))  # 400 groups of 1
    out = dp_noisy_count(df, ["g"], epsilon=0.05)
    rows = {r["g"]: r["noisy_count"] for r in out.collect()}
    assert len(rows) == 400
    assert min(rows.values()) == 0  # clamp engaged
    assert all(v >= 0 for v in rows.values())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # one agg shuffle at most
    assert "PythonUDF" not in plan


def test_dp_noisy_sum_release_properties(spark):
    """dp_noisy_sum: releases are non-negative multiples of the bound,
    within bound/2 (rounding) + bound*K (noise tail) of the clamped true
    sum, deterministic, and the clamp actually binds oversized rows."""
    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_noisy_sum,
        geometric_inverse_cdf,
    )

    bound = 10
    df = spark.createDataFrame(
        [("a", 3), ("a", 7), ("a", 999), ("b", 2), ("b", -5), ("c", 0)],
        ["g", "v"],
    )
    # clamped sums: a = 3+7+10 = 20, b = 2+0 = 2, c = 0
    true_clamped = {"a": 20, "b": 2, "c": 0}
    out1 = {r["g"]: r["noisy_sum"] for r in dp_noisy_sum(df, ["g"], "v", bound).collect()}
    out2 = {r["g"]: r["noisy_sum"] for r in dp_noisy_sum(df, ["g"], "v", bound).collect()}
    assert out1 == out2  # deterministic release
    _, k_tail = geometric_inverse_cdf(1.0)
    for g, s in out1.items():
        assert s >= 0 and s % bound == 0
        assert abs(s - true_clamped[g]) <= bound // 2 + bound * k_tail
    # without the oversized row the a-sum differs by >= the clamp cut
    df2 = df.filter(F.col("v") <= 100)
    out3 = {r["g"]: r["noisy_sum"] for r in dp_noisy_sum(df2, ["g"], "v", bound).collect()}
    assert out3["a"] <= out1["a"]


def test_dp_null_group_keys_cross_engine(spark):
    """NULL-valued group keys: concat_ws silently drops null columns, so
    (NULL, x) and (x, NULL) would share one noise draw and the DuckDB
    twin (null-propagating ||) diverged — probed before the sentinel
    coalesce landed. Both engines must now release identical counts for
    every null/non-null key combination."""
    import duckdb

    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_noisy_count,
        duck_dp_noisy_count_sql,
    )

    df = spark.createDataFrame(
        [("a", "x"), (None, "x"), (None, "x"), ("b", None), (None, None)],
        ["g", "h"],
    )
    got = sorted(
        ((r["g"] or ""), (r["h"] or ""), r["noisy_count"])
        for r in dp_noisy_count(df, ["g", "h"]).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, h VARCHAR)")
    con.execute(
        "INSERT INTO t VALUES ('a','x'), (NULL,'x'), (NULL,'x'), "
        "('b',NULL), (NULL,NULL)"
    )
    want = sorted(
        ((r[0] or ""), (r[1] or ""), r[2])
        for r in con.execute(duck_dp_noisy_count_sql("t", ["g", "h"])).fetchall()
    )
    assert got == want


@pytest.mark.slow  # r15 full-tier (scale/fuzz/e2e twin; see conftest)
def test_dp_noisy_avg_null_on_clamped_count(spark):
    """A group whose noisy count clamps to 0 releases NULL, not a
    division error — and the released means are deterministic."""
    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_noisy_avg,
    )
    from pyspark.sql import functions as F

    df = spark.range(300).select(
        F.col("id").alias("g"), (F.col("id") % 7).alias("v")
    )
    # epsilon tiny -> size-1 groups frequently clamp to zero count
    out1 = {r["g"]: r["noisy_avg"]
            for r in dp_noisy_avg(df, ["g"], "v", bound=7, epsilon=0.05).collect()}
    out2 = {r["g"]: r["noisy_avg"]
            for r in dp_noisy_avg(df, ["g"], "v", bound=7, epsilon=0.05).collect()}
    assert out1 == out2
    assert len(out1) == 300
    assert any(v is None for v in out1.values())  # clamp -> NULL path hit
    assert all(v is None or v >= 0.0 for v in out1.values())


def test_dp_null_group_keys_avg_cross_engine(spark):
    """The AVG path's sum-count join must be null-safe: a plain
    equi-join drops NULL group keys while the DuckDB twin (IS NOT
    DISTINCT FROM) keeps them — probed, Spark released [('a', ...)]
    where DuckDB released the NULL group too (r11 ADVICE)."""
    import duckdb

    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_noisy_avg,
        duck_dp_noisy_avg_sql,
    )

    df = spark.createDataFrame(
        [("a", 3), ("a", 5), (None, 4), (None, 6), (None, 5)],
        ["g", "v"],
    )
    got = sorted(
        ((r["g"] or ""), r["noisy_avg"])
        for r in dp_noisy_avg(df, ["g"], "v", bound=10).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v INTEGER)")
    con.execute(
        "INSERT INTO t VALUES ('a',3), ('a',5), (NULL,4), (NULL,6), (NULL,5)"
    )
    want = sorted(
        ((r[0] or ""), r[1])
        for r in con.execute(
            duck_dp_noisy_avg_sql("t", ["g"], "v", bound=10)
        ).fetchall()
    )
    assert len(got) == 2  # the NULL group is in the release
    assert got == want


def test_dp_known_domain_cross_engine(spark):
    """Known-domain release: every caller-supplied domain key appears
    exactly once (absent keys get noise around 0), out-of-domain rows
    are clamped away, NULL-in-domain counts, and the two engines are
    byte-identical."""
    import duckdb

    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_noisy_count_known_domain,
        duck_dp_noisy_count_known_domain_sql,
    )

    domain = ["a", "b", "ghost", None]
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("intruder",), (None,), (None,)],
        ["g"],
    )
    rows = dp_noisy_count_known_domain(df, "g", domain).collect()
    got = sorted(((r["g"] or ""), r["noisy_count"]) for r in rows)
    assert len(rows) == len(domain)  # densified: one row per domain key
    assert "intruder" not in {r["g"] for r in rows}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR)")
    con.execute(
        "INSERT INTO t VALUES ('a'), ('a'), ('b'), ('intruder'), "
        "(NULL), (NULL)"
    )
    want = sorted(
        ((r[0] or ""), r[1])
        for r in con.execute(
            duck_dp_noisy_count_known_domain_sql("t", "g", domain)
        ).fetchall()
    )
    assert got == want


def test_dp_known_domain_presence_is_uninformative(spark):
    """The property the variant exists for: the released KEY SET is the
    domain, independent of the data — datasets with disjoint true key
    sets release the same keys."""
    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_noisy_count_known_domain,
    )

    domain = ["x", "y", "z"]
    a = spark.createDataFrame([("x",)], ["g"])
    b = spark.createDataFrame([("q",)], ["g"])  # nothing in-domain
    keys_a = sorted(
        r["g"] for r in dp_noisy_count_known_domain(a, "g", domain).collect()
    )
    keys_b = sorted(
        r["g"] for r in dp_noisy_count_known_domain(b, "g", domain).collect()
    )
    assert keys_a == keys_b == sorted(domain)


def test_t_closeness_math(spark):
    """Pin the TV-distance math on a hand-computed fixture: a perfectly
    representative class scores 0; a fully skewed class scores the
    textbook distance; absent (class, value) cells still contribute."""
    from database_anonymiser_minimiser_spark.operators.privacy import (
        t_closeness_stats,
    )

    # global segments: A x4, B x4 (p = 0.5/0.5)
    rows = (
        [(1, "A")] * 2 + [(1, "B")] * 2      # class 1: 0.5/0.5 -> TV 0
        + [(2, "A")] * 2                       # class 2: all A  -> TV 0.5
        + [(3, "B")] * 2                       # class 3: all B  -> TV 0.5
    )
    df = spark.createDataFrame(rows, ["qid", "seg"])
    got = {
        r["qid"]: (r["class_size"], round(r["tv_distance"], 9))
        for r in t_closeness_stats(df, ["qid"], "seg").collect()
    }
    assert got == {1: (4, 0.0), 2: (2, 0.5), 3: (2, 0.5)}


def test_dp_user_counts_invariant_to_row_duplication(spark):
    """The user-level release's defining property: duplicating ALL of an
    entity's rows (or adding rows for an entity in groups >= its
    minimum) changes NOTHING — the bounded statistic depends only on
    each entity's first group, so the release is invariant."""
    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_noisy_count_entities,
    )

    base = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (3, "b"), (4, "c")], ["u", "g"]
    )
    rel = lambda df: sorted(  # noqa: E731
        tuple(r)
        for r in dp_noisy_count_entities(df, "g", "u").collect()
    )
    out = rel(base)
    # duplicate user 1's rows five times + pile rows onto later groups
    noisy_input = base.union(
        spark.createDataFrame(
            [(1, "a"), (1, "b")] * 5 + [(2, "b"), (3, "c")], ["u", "g"]
        )
    )
    assert rel(noisy_input) == out
    # a genuinely NEW entity does change it (sanity that the gate bites)
    assert rel(base.union(spark.createDataFrame([(9, "a")], ["u", "g"]))) != out


def test_dp_quantiles_postprocessing_properties(spark):
    """DP quantiles are post-processing of the histogram release:
    monotone in the percentile, drawn from the PUBLIC bin grid, and the
    degenerate all-clamped release (empty relation) returns the first
    bin for every percentile — deterministic, never an error."""
    import pytest as _pytest

    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_quantiles_from_histogram,
    )

    bins = list(range(0, 101, 10))
    df = spark.range(0, 1000).selectExpr(
        "CAST((id % 100) / 10 AS BIGINT) * 10 AS b"
    )
    got = {
        r["pct"]: r["quantile_bin"]
        for r in dp_quantiles_from_histogram(
            df, "b", bins, [10, 25, 50, 75, 90, 100], epsilon=2.0,
            seed="qtest",
        ).collect()
    }
    assert set(got) == {10, 25, 50, 75, 90, 100}
    ordered = [got[p] for p in (10, 25, 50, 75, 90, 100)]
    assert ordered == sorted(ordered), ordered  # monotone in pct
    assert all(b in bins for b in ordered)  # public grid only
    # roughly uniform data over 0..90: the median lands mid-grid
    assert 30 <= got[50] <= 70
    # degenerate: empty relation -> noisy counts clamp around 0; the
    # release is the first bin everywhere (honest too-small signal)
    empty = df.filter("b < 0")
    got0 = {
        r["pct"]: r["quantile_bin"]
        for r in dp_quantiles_from_histogram(
            empty, "b", bins, [50], epsilon=1000.0, seed="qtest"
        ).collect()
    }
    assert got0 == {50: 0}
    with _pytest.raises(ValueError, match="percentiles"):
        dp_quantiles_from_histogram(df, "b", bins, [0], epsilon=1.0)


def test_dp_stable_topk_suppresses_rare_keys(spark):
    """r14: the stability threshold is the whole point — a key
    contributed by one row must not survive (its noisy count would
    have to clear the threshold on noise alone), heavy keys must, and
    ranks are a deterministic total order."""
    from database_anonymiser_minimiser_spark.operators.privacy import (
        dp_stable_topk,
    )

    rows = (
        [("heavy_a",)] * 200 + [("heavy_b",)] * 150 + [("rare_one",)]
        + [("rare_two",)]
    )
    df = spark.createDataFrame(rows, "k string")
    got = {
        r["k"]: (r["noisy_count"], r["rank"])
        for r in dp_stable_topk(
            df, ["k"], epsilon=1.0, threshold=20, k=5, seed="stest"
        ).collect()
    }
    assert set(got) == {"heavy_a", "heavy_b"}  # rare keys suppressed
    assert got["heavy_a"][1] == 1 and got["heavy_b"][1] == 2
    assert abs(got["heavy_a"][0] - 200) <= 15  # noise is small at eps=1
    # k truncates: with k=1 only the top key releases
    one = dp_stable_topk(
        df, ["k"], epsilon=1.0, threshold=20, k=1, seed="stest"
    ).collect()
    assert [(r["k"], r["rank"]) for r in one] == [("heavy_a", 1)]


def test_recursive_cl_diversity_flags_skew(spark):
    """r14: a class can be l-diverse by distinct count yet fail the
    recursive check when one value dominates — and the boundary is the
    exact integer inequality r1 < c * tail_sum."""
    from database_anonymiser_minimiser_spark.operators.privacy import (
        recursive_cl_diversity_stats,
    )

    rows = (
        # class A: 90/5/5 — distinct l=3 but heavily skewed
        [("A", "x")] * 90 + [("A", "y")] * 5 + [("A", "z")] * 5
        # class B: 12/10/8 — balanced
        + [("B", "x")] * 12 + [("B", "y")] * 10 + [("B", "z")] * 8
        # class C: single sensitive value -> tail empty, always fails
        + [("C", "x")] * 7
    )
    df = spark.createDataFrame(rows, "q string, s string")
    got = {
        r["q"]: r
        for r in recursive_cl_diversity_stats(
            df, ["q"], "s", l=2, c=3
        ).collect()
    }
    assert (got["A"]["top_count"], got["A"]["tail_sum"]) == (90, 10)
    assert not got["A"]["cl_diverse"]  # 90 >= 3 * 10
    assert (got["B"]["top_count"], got["B"]["tail_sum"]) == (12, 18)
    assert got["B"]["cl_diverse"]  # 12 < 54
    assert (got["C"]["tail_sum"], got["C"]["cl_diverse"]) == (0, False)
    # boundary: r1 = c*tail exactly -> strict inequality fails it
    edge = spark.createDataFrame(
        [("E", "x")] * 30 + [("E", "y")] * 10, "q string, s string"
    )
    (r,) = recursive_cl_diversity_stats(edge, ["q"], "s", l=2, c=3).collect()
    assert r["top_count"] == 30 and r["tail_sum"] == 10
    assert not r["cl_diverse"]
    with pytest.raises(ValueError, match="l must be"):
        recursive_cl_diversity_stats(df, ["q"], "s", l=0)

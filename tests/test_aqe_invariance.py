"""AQE invariance: adaptive query execution (coalescing, skew splits,
join-strategy switches) is an EXECUTION optimisation and must never
change released values. Representative queries from each shuffle-shaped
family run with AQE on (the engine default) and off; results must be
identical. Guards against accidentally depending on AQE-specific
behaviours (partition counts, join sides) anywhere in the operator
stack."""

import pytest

from database_anonymiser_minimiser_spark.queries import QUERIES

CASES = [
    "q5_local_supplier_volume",        # star join chain
    "window_top_orders_per_customer",  # window over a shuffle
    "dedup_minhash_lsh",               # self-join + verify
    "consistency_broadcast_apply",     # value-mapping broadcast join
    "privacy_dp_noisy_counts",         # new DP release
]


@pytest.mark.parametrize("name", CASES)
def test_results_identical_with_aqe_off(spark, sf_dir, name):
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "true")
        on = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        spark.conf.set(key, "false")
        off = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert on == off

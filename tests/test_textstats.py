"""Semantic pins for the text-analysis operators that need more than the
oracle replica (hand-built corpora where the right answer is computable
by eye)."""

from database_anonymiser_minimiser_spark.operators import textstats as TS


def test_bigram_novelty_counts(spark):
    rows = [
        (0, "a b c"),          # bigrams: "a b", "b c"
        (1, "a b d"),          # bigrams: "a b", "b d"
        (2, "x y"),            # bigram:  "x y"
        (3, "solo"),           # <2 tokens -> no bigrams, drops out
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in TS.bigram_novelty(df).collect()}
    assert set(got) == {0, 1, 2}
    # "a b" is shared (df=2); "b c"/"b d"/"x y" are novel (df=1)
    assert (got[0]["n_bigrams"], got[0]["n_distinct"], got[0]["n_novel"]) == (2, 2, 1)
    assert got[0]["novelty_rate"] == 0.5
    assert (got[1]["n_novel"], got[2]["n_novel"]) == (1, 1)
    assert got[2]["novelty_rate"] == 1.0


def test_bigram_novelty_repeated_bigram_counts_once(spark):
    """Within-doc repetition inflates n_bigrams but not n_distinct or
    novelty — the df is per-document, not per-occurrence."""
    df = spark.createDataFrame([(0, "a b a b a")], ["doc_id", "text"])
    r = TS.bigram_novelty(df).collect()[0]
    # bigrams: "a b","b a","a b","b a" -> 4 total, 2 distinct, both novel
    assert (r["n_bigrams"], r["n_distinct"], r["n_novel"]) == (4, 2, 2)

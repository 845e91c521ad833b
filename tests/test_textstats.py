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


def test_strip_markup_semantics(spark):
    """Script/style contents must VANISH (not leak as text), tags strip,
    the six standard entities decode, whitespace collapses — and the
    counts audit the original page."""
    from database_anonymiser_minimiser_spark.operators.textstats import (
        strip_markup,
    )

    rows = [
        (0, '<p>hello <b>world</b></p>'),
        (1, '<script type="x">SECRET()</script>visible'),
        (2, '<STYLE>body{color:red}</STYLE>shown'),
        (3, 'a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f'),
        (4, 'plain   text\n\nonly'),
        (5, '<div\nclass="multi\nline">across</div>'),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in strip_markup(df).collect()}
    assert got[0]["clean"] == "hello world"
    assert got[0]["n_tags"] == 4
    assert got[1]["clean"] == "visible" and "SECRET" not in got[1]["clean"]
    assert got[2]["clean"] == "shown"  # case-insensitive style block
    assert got[3]["clean"] == "a & b <c> \"d\" 'e' f"
    assert got[3]["n_entities"] == 8
    assert got[4]["clean"] == "plain text only"
    assert got[5]["clean"] == "across"  # tag spanning newlines


def test_strip_markup_nested_escapes_cross_engine(spark):
    """Doubly-escaped entities decode ONE level (standard order: &amp;
    last): '&amp;lt;' is the literal text '&lt;', not '<' — the r11
    ADVICE double-decode. Both engines must agree on the fixed order."""
    import duckdb

    from database_anonymiser_minimiser_spark.operators.textstats import (
        duck_strip_markup_sql,
        strip_markup,
    )

    rows = [
        (0, "a &amp;lt; b"),        # -> 'a &lt; b' (NOT 'a < b')
        (1, "x &amp;amp; y"),       # -> 'x &amp; y'
        (2, "&amp; &lt; &gt; mix"),  # singles still decode
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["clean"] for r in strip_markup(df).collect()}
    assert got[0] == "a &lt; b"
    assert got[1] == "x &amp; y"
    assert got[2] == "& < > mix"
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id INTEGER, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = {
        r[0]: r[1]
        for r in con.execute(
            duck_strip_markup_sql("text", "doc_id") + " FROM d"
        ).fetchall()
    }
    assert got == want


def test_chunk_documents_boundaries(spark):
    """Chunk semantics pinned by hand: overlap = window - stride, the
    final chunk is short (never dropped), a short doc yields one chunk,
    and concatenating stride-slices of every chunk reconstructs the
    document exactly."""
    import pytest as _pytest

    from database_anonymiser_minimiser_spark.operators.textstats import (
        chunk_documents,
    )

    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [(0, words), (1, "just three tokens")], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(df, window=4, stride=3).collect()
    }
    # doc 0: starts 0,3,6,9 -> 4 chunks; last is the 1-token tail
    assert [got[(0, i)]["chunk_start"] for i in range(4)] == [0, 3, 6, 9]
    assert got[(0, 0)]["chunk"] == "w0 w1 w2 w3"
    assert got[(0, 1)]["chunk"] == "w3 w4 w5 w6"  # 1-token overlap
    assert got[(0, 3)]["chunk"] == "w9" and got[(0, 3)]["n_tokens"] == 1
    # doc 1: 3 tokens < window -> exactly one (short) chunk
    assert {k for k in got if k[0] == 1} == {(1, 0)}
    assert got[(1, 0)]["chunk"] == "just three tokens"
    # stride-prefix of each chunk reconstructs the document
    rebuilt = " ".join(
        " ".join(got[(0, i)]["chunk"].split()[:3]) for i in range(4)
    )
    assert rebuilt == words
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, window=4, stride=5)


def test_interpolate_hourly_math(spark, sf_dir):
    """Pin the interpolation semantics on the real corpus: observed
    hours pass through exactly; every interior gap is the straight line
    between its bracketing observed means; edge gaps are NULL."""
    from database_anonymiser_minimiser_spark.queries import QUERIES

    rows = QUERIES["events_interpolate_hourly"](spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert len(by_type) >= 2
    interpolated = 0
    for series in by_type.values():
        series.sort(key=lambda r: r["hour"])
        obs_idx = [i for i, r in enumerate(series) if r["is_observed"]]
        first, last = obs_idx[0], obs_idx[-1]
        for i, r in enumerate(series):
            if r["is_observed"]:
                continue
            if i < first or i > last:
                assert r["value_interp"] is None  # edge gap
                continue
            interpolated += 1
            p = max(j for j in obs_idx if j < i)
            n = min(j for j in obs_idx if j > i)
            py, ny = series[p]["value_interp"], series[n]["value_interp"]
            expect = py + (ny - py) * ((i - p) / (n - p))
            assert abs(r["value_interp"] - expect) < 1e-9
    assert interpolated > 0  # the corpus actually exercises the path

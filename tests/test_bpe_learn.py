"""Exact gate for the iterative BPE merge-learning loop.

`bpe_learn_merges` is rows-only in the driver window (iterative
algorithms are the documented non-SQL-expressible case), so its exact
verification lives here: an independent pure-Python BPE reference —
word frequencies recomputed via DuckDB straight from the parquet, the
merge loop in plain dicts — must produce the IDENTICAL merge list
(rank, pair, merged token, weighted count) as the distributed query.
Reference semantics are classic Sennrich et al. BPE: count adjacent
symbol pairs weighted by word frequency, merge the (count DESC, left
ASC, right ASC) winner greedily left-to-right non-overlapping, repeat.
"""

from collections import Counter

import duckdb


def _python_bpe(word_freqs: dict[str, int], n_merges: int):
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, toks in vocab.items():
            f = word_freqs[w]
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += f
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, left + right, n))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_learn_matches_python_reference(spark, sf_dir):
    from database_anonymiser_minimiser_spark import queries as Q

    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in Q.QUERIES["bpe_learn_merges"](spark, sf_dir).collect()
    ]
    got.sort()

    rows = duckdb.sql(
        "SELECT word, count(*) AS freq FROM (SELECT unnest(string_split("
        "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS word "
        f"FROM read_parquet('{sf_dir}/documents.parquet')) WHERE word <> '' "
        "GROUP BY word"
    ).fetchall()
    expected = _python_bpe(dict(rows), 8)

    assert got == expected
    assert len(got) == 8  # the corpus supports all eight merges


def test_bpe_apply_merge_fold_edge_cases(spark):
    """The SQL fold's greedy non-overlap must match the reference on the
    classic traps: odd runs ('aaa' -> 'aa','a'), even runs, the merged
    token never re-merging in the same pass, and no-op sequences."""
    from pyspark.sql import functions as F

    from database_anonymiser_minimiser_spark.queries import (
        _bpe_apply_merge_expr,
    )

    cases = [
        (["a", "a", "a"], ["aa", "a"]),
        (["a", "a", "a", "a"], ["aa", "aa"]),
        (["a", "b", "a"], ["a", "b", "a"]),  # merge is (a,a): no-op
        (["a"], ["a"]),
        ([], []),
        (["b", "a", "a", "b"], ["b", "aa", "b"]),
    ]
    df = spark.createDataFrame(
        [(i, toks) for i, (toks, _) in enumerate(cases)],
        "i int, tokens array<string>",
    )
    out = {
        r["i"]: r["applied"]
        for r in df.select(
            "i", F.expr(_bpe_apply_merge_expr("a", "a")).alias("applied")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert out[i] == want, (i, out[i], want)


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    """The serving half: encode with the learned merges, count per doc.
    The Python reference learns the same 8 merges, encodes every
    document word-by-word, and every per-doc count must match."""
    from database_anonymiser_minimiser_spark import queries as Q

    got = {
        r["doc_id"]: r["n_bpe8_tokens"]
        for r in Q.QUERIES["bpe_encode_token_count"](spark, sf_dir).collect()
    }

    rows = duckdb.sql(
        "SELECT word, count(*) AS freq FROM (SELECT unnest(string_split("
        "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS word "
        f"FROM read_parquet('{sf_dir}/documents.parquet')) WHERE word <> '' "
        "GROUP BY word"
    ).fetchall()
    word_freqs = dict(rows)
    merges = _python_bpe(word_freqs, 8)

    def encode_len(word: str) -> int:
        toks = list(word)
        for _, left, right, _, _ in merges:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return len(toks)

    word_len = {w: encode_len(w) for w in word_freqs}
    doc_rows = duckdb.sql(
        "SELECT doc_id, string_split(regexp_replace(lower(trim(text)), "
        f"'\\s+', ' ', 'g'), ' ') FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    expected = {
        doc_id: sum(word_len[w] for w in words if w != "")
        for doc_id, words in doc_rows
        if any(w != "" for w in words)
    }
    assert got == expected


def test_bpe_driver_path_equals_distributed_path(spark, sf_dir, monkeypatch):
    """r15 scale-adaptive trainer: the driver-side small-vocab merge
    loop must produce the IDENTICAL merge list as the distributed loop
    (cap=0 forces the distributed path; the default cap takes the
    driver path on this corpus)."""
    from database_anonymiser_minimiser_spark import queries as Q

    docs = Q.load(spark, sf_dir, "documents")
    monkeypatch.setenv("SPARK_GRAFT_TOKENIZER_DRIVER_VOCAB_CAP", "0")
    distributed = Q._bpe_learn_from_words(Q._bpe_word_freqs(docs))
    monkeypatch.delenv("SPARK_GRAFT_TOKENIZER_DRIVER_VOCAB_CAP")
    driver_side = Q._bpe_learn_from_words(Q._bpe_word_freqs(docs))
    assert driver_side == distributed
    assert len(driver_side) == 8

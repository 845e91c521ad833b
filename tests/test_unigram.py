"""Unigram-LM tokenizer trainer: EXACT gate against an independent
pure-Python reference (the BPE-learn discipline, tests/test_bpe_learn.py)
— the reference recomputes word frequencies via DuckDB from the same
parquet and re-implements the determinism spec (seed policy, Fraction
probabilities, Viterbi comparator, EM/prune, final ranking) from the
spec text in operators/unigram.py, sharing only the declared constants.
The trainer's exact-rational arithmetic is what makes equality (not a
band) demandable.
"""

from fractions import Fraction

import duckdb
import pytest

from database_anonymiser_minimiser_spark.operators import unigram as U


# ---------------------------------------------------------------------------
# independent reference (spec re-implementation: candidate-list argmin
# instead of incremental replace, explicit loops instead of the
# operator's expression pipeline)
# ---------------------------------------------------------------------------


def ref_viterbi(word, probs, max_len=U.MAX_PIECE_LEN):
    best = {0: (Fraction(1), 0, ())}
    for i in range(1, len(word) + 1):
        cands = []
        for j in range(max(0, i - max_len), i):
            if j not in best:
                continue
            piece = word[j:i]
            if piece not in probs:
                continue
            bp, bn, bt = best[j]
            cands.append((bp * probs[piece], bn + 1, bt + (piece,)))
        if cands:
            best[i] = min(cands, key=lambda c: (-c[0], c[1], c[2]))
    return list(best[len(word)][2])


def ref_train(word_freq):
    seed = {}
    for w, f in word_freq.items():
        for i in range(len(w)):
            for length in range(1, U.MAX_PIECE_LEN + 1):
                if i + length <= len(w):
                    p = w[i : i + length]
                    seed[p] = seed.get(p, 0) + f
    counts = {p: c for p, c in seed.items() if len(p) == 1}
    counts.update(
        dict(
            sorted(
                ((p, c) for p, c in seed.items() if len(p) > 1),
                key=lambda t: (-t[1], t[0]),
            )[: U.SEED_MULTI]
        )
    )
    for _ in range(U.EM_ITERS):
        total = sum(counts.values())
        probs = {p: Fraction(c, total) for p, c in counts.items()}
        new = {}
        for w, f in word_freq.items():
            for piece in ref_viterbi(w, probs):
                new[piece] = new.get(piece, 0) + f
        counts = {
            p: new.get(p, 0)
            for p in counts
            if len(p) == 1 or new.get(p, 0) > 0
        }
    final = {p: c for p, c in counts.items() if len(p) == 1}
    final.update(
        dict(
            sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda t: (-t[1], t[0]),
            )[: U.FINAL_MULTI]
        )
    )
    ordered = sorted(final.items(), key=lambda t: (-t[1], t[0]))
    return [(p, c, i + 1) for i, (p, c) in enumerate(ordered)]


def ref_word_freqs_duckdb(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(regexp_split_to_array(
                lower(trim(text)), '\\s+')) AS w
              FROM '{sf_dir}/documents.parquet')
        WHERE w <> '' GROUP BY w
        """
    ).fetchall()
    return dict(rows)


def ref_doc_counts(sf_dir, vocab):
    probs = {p: Fraction(c, sum(c for _p, c, _r in vocab))
             for p, c, _r in vocab}
    rows = duckdb.sql(
        f"""
        SELECT doc_id, w FROM (
          SELECT doc_id, unnest(regexp_split_to_array(
            lower(trim(text)), '\\s+')) AS w
          FROM '{sf_dir}/documents.parquet') WHERE w <> ''
        """
    ).fetchall()
    cache = {}
    out = {}
    for doc_id, w in rows:
        if w not in cache:
            cache[w] = len(ref_viterbi(w, probs))
        out[doc_id] = out.get(doc_id, 0) + cache[w]
    return out


# ---------------------------------------------------------------------------
# gates
# ---------------------------------------------------------------------------


def test_unigram_vocab_matches_reference_corpus(spark, sf_dir):
    """The full trainer over the real corpus must equal the reference
    vocabulary row for row (piece, count, rank)."""
    from database_anonymiser_minimiser_spark.queries import QUERIES

    got = sorted(
        tuple(r) for r in QUERIES["unigram_learn_vocab"](spark, sf_dir).collect()
    )
    want = sorted(ref_train(ref_word_freqs_duckdb(sf_dir)))
    assert got == want
    # learned structure sanity: multi-char pieces survived EM
    assert any(len(p) > 1 for p, _c, _r in got)


def test_unigram_encode_matches_reference_corpus(spark, sf_dir):
    """Per-document token counts under the trained vocabulary must match
    the reference encode exactly."""
    from database_anonymiser_minimiser_spark.queries import QUERIES

    got = {
        r["doc_id"]: r["n_unigram_tokens"]
        for r in QUERIES["unigram_encode_token_count"](
            spark, sf_dir
        ).collect()
    }
    vocab = ref_train(ref_word_freqs_duckdb(sf_dir))
    want = ref_doc_counts(sf_dir, vocab)
    assert got == want
    # chars-only lower bound: every count <= summed word lengths
    lens = dict(
        duckdb.sql(
            f"""SELECT doc_id, CAST(sum(length(w)) AS BIGINT) FROM (
              SELECT doc_id, unnest(regexp_split_to_array(
                lower(trim(text)), '\\s+')) AS w
              FROM '{sf_dir}/documents.parquet') WHERE w <> ''
            GROUP BY doc_id"""
        ).fetchall()
    )
    assert all(got[d] <= lens[d] for d in got)


def test_unigram_synthetic_edges(spark):
    """Overlap runs, exact ties, and single-char closure — the cases
    where an unpinned tie-break or a dropped char would diverge."""
    docs = spark.createDataFrame(
        [
            (0, "aaaa aaaa aa b"),        # overlapping-substring runs
            (1, "abab abab cdcd cdcd"),   # tied pieces ('ab'/'cd')
            (2, "xyzw"),                  # every char unique, one word
        ],
        ["doc_id", "text"],
    )
    wf = {}
    for _i, t in docs.collect():
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    got = U.train_unigram(docs)
    assert got == ref_train(wf)
    tc = {
        r["doc_id"]: r["n_unigram_tokens"]
        for r in U.unigram_token_counts(docs, got).collect()
    }
    probs = {p: Fraction(c, sum(c for _p, c, _r in got)) for p, c, _r in got}
    want = {
        d: sum(len(ref_viterbi(w, probs)) for w in t.split())
        for d, t in [(0, "aaaa aaaa aa b"), (1, "abab abab cdcd cdcd"),
                     (2, "xyzw")]
    }
    assert tc == want


def test_viterbi_determinism_spec():
    """The pinned comparator: higher probability wins; equal probability
    -> fewer pieces; equal again -> lexicographically smaller tuple."""
    # 'abab': p(ab) dominates chars -> 2 pieces
    probs = {p: Fraction(1, 10) for p in "ab"}
    probs["ab"] = Fraction(3, 10)
    assert U.viterbi_segment("abab", probs) == ["ab", "ab"]
    # exact tie in probability: ('aa','a') vs ('a','aa') -> lex smaller
    probs = {"a": Fraction(1, 4), "aa": Fraction(1, 4)}
    assert U.viterbi_segment("aaa", probs) == ["a", "aa"]
    # fewer pieces beats more at equal probability: p(aaa)=p(a)^2 ties a
    # 1-piece vs 3-piece split only if probs align; make them align
    probs = {"a": Fraction(1, 2), "aaa": Fraction(1, 8),
             "aa": Fraction(0, 8)}
    # (aaa) prob 1/8 == (a,a,a) prob 1/8 -> 1 piece wins
    assert U.viterbi_segment("aaa", probs) == ["aaa"]
    # zero-probability char still preserves closure deterministically
    probs = {"q": Fraction(0, 5), "z": Fraction(0, 5)}
    assert U.viterbi_segment("qz", probs) == ["q", "z"]
    with pytest.raises(ValueError, match="not segmentable"):
        U.viterbi_segment("qx", {"q": Fraction(1, 2)})


def test_unigram_driver_path_equals_distributed_path(spark, sf_dir, monkeypatch):
    """r15 scale-adaptive trainer: the driver-side small-vocab EM loop
    must produce the IDENTICAL (piece, count, rank) vocabulary as the
    distributed mapInPandas loop (cap=0 forces distributed)."""
    from database_anonymiser_minimiser_spark.operators import unigram as U
    from database_anonymiser_minimiser_spark.queries import load

    docs = load(spark, sf_dir, "documents")
    monkeypatch.setenv("SPARK_GRAFT_TOKENIZER_DRIVER_VOCAB_CAP", "0")
    distributed = U.train_unigram(docs)
    monkeypatch.delenv("SPARK_GRAFT_TOKENIZER_DRIVER_VOCAB_CAP")
    driver_side = U.train_unigram(docs)
    assert driver_side == distributed

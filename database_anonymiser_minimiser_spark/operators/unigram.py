"""Unigram-LM tokenizer training (Kudo, ACL'18 — the SentencePiece
unigram model), the second member of the tokenizer family next to BPE
(queries.py:bpe_learn_merges): a vocabulary of variable-length pieces
with unigram probabilities, segmentation by highest-probability piece
sequence, trained by EM over the corpus.

This implementation is the VITERBI (hard-EM) variant with count-based
pruning — each E-step assigns every word its single best segmentation
instead of forward-backward expected counts, and the final vocabulary
keeps the highest-count pieces instead of re-scoring loss-if-removed.
That trade is deliberate: hard-EM with EXACT rational arithmetic
(`fractions.Fraction` — piece probabilities are count/total, Viterbi
compares products of them exactly) makes every step deterministic and
bit-reproducible, so the trainer can be gated EQUAL against an
independent reference implementation (tests/test_unigram.py, the
BPE-learn discipline) — a float log-prob implementation could only be
band-gated. Full soft-EM differs in the E-step weighting only.

Scale shape (the BPE pair's, verbatim): the corpus is touched EXACTLY
ONCE (one explode + one partial-aggregated shuffle to the (word, freq)
relation); seeding and every EM iteration then run on the DISTINCT-WORD
relation, which scales with vocabulary (Heaps' law — millions of rows),
not the corpus (trillions). Per iteration: one Arrow-batched
mapInPandas pass segments the distinct words (pure per-row work, no
state), one piece-keyed partial-agg shuffle sums the freq-weighted
piece counts, and ONE piece-table-sized collect (<= seed vocab, ~200
rows) syncs the new probabilities to the driver — bounded driver
traffic per iteration, like the BPE loop's 1-row top-pair collect.
Encoding joins per-word token counts back to the corpus through one
broadcast join; the corpus is never re-segmented character by
character.

Determinism spec (shared verbatim with the test reference — ties are
pinned, not left to float luck):
- tokenization: lower, trim, split on whitespace (the BPE regex),
- seed vocabulary: every substring of length 1..MAX_PIECE_LEN of every
  distinct word, weighted by word freq x occurrence count (overlapping
  occurrences all count); ALL single characters are kept, plus the top
  SEED_MULTI multi-char pieces by (weight desc, piece asc),
- piece probability: Fraction(count, total) where total sums the
  kept pieces' counts (seed weights in iteration 0, Viterbi counts
  after),
- Viterbi: best[i] over prefix w[:i], candidates best[j] + piece
  w[j:i] scanned in increasing j; a candidate replaces the incumbent
  iff (prob, -n_pieces, pieces_tuple) is strictly better (higher prob,
  then fewer pieces, then lexicographically smaller tuple),
- EM: EM_ITERS rounds of segment-all-words -> count -> re-normalise;
  multi-char pieces with zero count drop out, single chars never drop
  (closure: any word must stay segmentable),
- final vocabulary: single chars plus the top FINAL_MULTI multi-char
  pieces by (final count desc, piece asc), ranked in that order.
"""

from __future__ import annotations

import os
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE_LEN = 4
SEED_MULTI = 120
EM_ITERS = 3
FINAL_MULTI = 60


def _driver_vocab_cap() -> int:
    """Row cap under which a tokenizer trainer may run its iteration
    loop DRIVER-SIDE on the collected (word, freq) relation (r15, guide
    §1.2/§5.3): the trainers' per-iteration math is already pure
    per-word Python (Viterbi/merge folds), so below the cap the
    distributed loop buys nothing but 4-9 sequential Spark jobs of pure
    scheduling overhead (~0.4 s each at bench scale over a 31-word
    vocabulary). The collect is BOUNDED (LIMIT cap+1 probe, ~50 B/row
    -> a few MB at the default cap — broadcast-class, guide §3.1);
    above it the distributed Heaps'-law path runs unchanged. 0 disables
    the driver path entirely (used by the equality gates in
    tests/test_unigram.py / test_bpe_learn.py)."""
    try:
        return int(
            os.environ.get("SPARK_GRAFT_TOKENIZER_DRIVER_VOCAB_CAP", "65536")
        )
    except ValueError:
        return 65536


def collect_words_if_small(
    words: DataFrame, cap: int | None = None
) -> "list[tuple[str, int]] | None":
    """Bounded probe: the full (word, freq) relation iff it has at most
    ``cap`` rows, else None. ONE LIMIT cap+1 job — never an unbounded
    collect (the limit is the memory guarantee, not the observed size)."""
    cap = _driver_vocab_cap() if cap is None else cap
    if cap <= 0:
        return None
    rows = words.limit(cap + 1).collect()
    if len(rows) > cap:
        return None
    return [(r["word"], int(r["freq"])) for r in rows]

_WORD_SPLIT = r"\s+"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the single corpus pass (BPE's tokenization)."""
    return (
        docs.select(
            F.explode(
                F.split(
                    F.regexp_replace(
                        F.lower(F.trim(F.col(text_col))), _WORD_SPLIT, " "
                    ),
                    " ",
                )
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def seed_piece_weights(words: DataFrame) -> DataFrame:
    """(piece, weight) over all substrings of length 1..MAX_PIECE_LEN of
    the distinct words, weight = sum(word freq x occurrences-in-word).
    Vocabulary-bound: |words| x O(len x MAX_PIECE_LEN) candidate rows,
    one piece-keyed partial-agg shuffle."""
    subs = F.expr(
        "flatten(transform(sequence(1, length(word)), i -> "
        f"transform(sequence(1, {MAX_PIECE_LEN}), l -> "
        "  CASE WHEN i + l - 1 <= length(word) "
        "       THEN substring(word, i, l) END)))"
    )
    return (
        words.select("freq", F.explode(subs).alias("piece"))
        .filter(F.col("piece").isNotNull())
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("weight"))
    )


def _select_seed(rows: "list[tuple[str, int]]") -> "dict[str, int]":
    """Apply the seed policy to collected (piece, weight) rows: all
    single chars + top SEED_MULTI multi-char by (weight desc, piece
    asc)."""
    chars = {p: w for p, w in rows if len(p) == 1}
    multi = sorted(
        ((p, w) for p, w in rows if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:SEED_MULTI]
    out = dict(chars)
    out.update(dict(multi))
    return out


def viterbi_segment(
    word: str, probs: "dict[str, Fraction]", max_len: int = MAX_PIECE_LEN
) -> "list[str]":
    """Best piece sequence for ``word`` under the determinism spec.
    Raises KeyError via lookup only for pieces absent from ``probs``
    (never happens while all single chars are kept)."""
    n = len(word)
    # best[i]: (prob, n_pieces, pieces_tuple) for prefix word[:i]
    best: list = [None] * (n + 1)
    best[0] = (Fraction(1), 0, ())
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            p = probs.get(piece)
            if p is None:
                continue
            bp, bn, bt = best[j]
            cand = (bp * p, bn + 1, bt + (piece,))
            inc = best[i]
            if (
                inc is None
                or cand[0] > inc[0]
                or (cand[0] == inc[0] and cand[1] < inc[1])
                or (
                    cand[0] == inc[0]
                    and cand[1] == inc[1]
                    and cand[2] < inc[2]
                )
            ):
                best[i] = cand
    if best[n] is None:  # unreachable while single chars are kept
        raise ValueError(f"word {word!r} not segmentable")
    return list(best[n][2])


def _probs_from_counts(counts: "dict[str, int]") -> "dict[str, Fraction]":
    total = sum(counts.values())
    return {p: Fraction(c, total) for p, c in counts.items()}


def _segment_counts(
    words: DataFrame, probs: "dict[str, Fraction]"
) -> DataFrame:
    """One E-step: Viterbi-segment every distinct word (Arrow-batched
    mapInPandas — pure per-row python over the vocabulary-sized
    relation; probs ride in the task closure as (numerator, total)
    ints), emit (piece, freq-weighted count) partials."""
    import pandas as pd

    num = {p: (fr.numerator, fr.denominator) for p, fr in probs.items()}

    def run(batches):
        for pdf in batches:
            out: dict = {}
            pr = {p: Fraction(n, d) for p, (n, d) in num.items()}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for piece in viterbi_segment(word, pr):
                    out[piece] = out.get(piece, 0) + int(freq)
            yield pd.DataFrame(
                {"piece": list(out), "cnt": list(out.values())}
            )

    return (
        words.mapInPandas(run, "piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    words: DataFrame | None = None,
) -> "list[tuple[str, int, int]]":
    """Full trainer: returns the final vocabulary as (piece, count,
    rank) rows, rank ordered by (count desc, piece asc) with single
    chars always retained. Driver-side control flow over EM_ITERS
    bounded iterations; one piece-table-sized collect per iteration.

    ``words`` (r14): an already-built :func:`word_freqs` relation to
    train from — the encode query passes its persisted copy so train +
    encode share ONE corpus pass; the caller owns its lifecycle. When
    omitted the trainer builds (and releases) its own, as before."""
    owned = words is None
    if owned:
        words = word_freqs(docs, text_col).persist()
    try:
        # r15 (guide §1.2 order-of-operations: fix the distributed
        # algorithm's overhead before per-task work): below the bounded
        # cap the whole EM loop runs driver-side on the collected
        # relation — the SAME _select_seed/viterbi_segment/
        # _probs_from_counts functions the executors run, applied to
        # the same (word, freq) rows, so the vocabulary is identical by
        # construction (gated distributed-vs-driver in
        # tests/test_unigram.py). Saves 1 + EM_ITERS sequential Spark
        # jobs (each a mapInPandas pass + shuffle + collect) at bench
        # scale; a Heaps'-law corpus exceeds the cap and takes the
        # distributed path unchanged.
        small = collect_words_if_small(words)
        if small is not None:
            counts = _seed_counts_python(small)
            for _ in range(EM_ITERS):
                probs = _probs_from_counts(counts)
                new: dict = {}
                for w, f in small:
                    for piece in viterbi_segment(w, probs):
                        new[piece] = new.get(piece, 0) + f
                counts = {
                    p: new.get(p, 0)
                    for p in counts
                    if len(p) == 1 or new.get(p, 0) > 0
                }
            return _finalise_vocab(counts)
        seed_rows = [
            (r["piece"], int(r["weight"]))
            for r in seed_piece_weights(words).collect()
        ]
        counts = _select_seed(seed_rows)
        for _ in range(EM_ITERS):
            probs = _probs_from_counts(counts)
            new = {
                r["piece"]: int(r["cnt"])
                for r in _segment_counts(words, probs).collect()
            }
            # closure: chars never drop; unused multi-char pieces do
            counts = {
                p: new.get(p, 0)
                for p in counts
                if len(p) == 1 or new.get(p, 0) > 0
            }
    finally:
        if owned:
            words.unpersist()
    return _finalise_vocab(counts)


def _seed_counts_python(word_rows: "list[tuple[str, int]]") -> "dict[str, int]":
    """Driver-side twin of seed_piece_weights + _select_seed: every
    substring of length 1..MAX_PIECE_LEN, weight = sum(freq x
    occurrences), overlapping occurrences all counted — the SQL
    expression's semantics verbatim (substring is character-indexed in
    both)."""
    weights: dict = {}
    for w, f in word_rows:
        n = len(w)
        for i in range(n):
            for ln in range(1, MAX_PIECE_LEN + 1):
                if i + ln <= n:
                    p = w[i : i + ln]
                    weights[p] = weights.get(p, 0) + f
    return _select_seed(list(weights.items()))


def _finalise_vocab(counts: "dict[str, int]") -> "list[tuple[str, int, int]]":
    """Final-vocabulary policy (shared by both trainer paths): single
    chars always retained, top FINAL_MULTI multi-char pieces by
    (count desc, piece asc), ranked in that order."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:FINAL_MULTI]
    final = dict(chars)
    final.update(dict(multi))
    ordered = sorted(final.items(), key=lambda t: (-t[1], t[0]))
    return [(p, c, i + 1) for i, (p, c) in enumerate(ordered)]


def unigram_token_counts(
    docs: DataFrame,
    vocab: "list[tuple[str, int, int]]",
    words: DataFrame | None = None,
) -> DataFrame:
    """SERVING: Viterbi-encode the corpus under a trained vocabulary and
    count tokens per document — (doc_id, n_unigram_tokens). The
    distinct-word relation is segmented once (mapInPandas); per-word
    counts broadcast-join back to the corpus; one doc-keyed partial-agg
    shuffle.

    ``words`` (r14): an already-built :func:`word_freqs` relation whose
    word column replaces the corpus-side ``distinct()`` re-derivation
    for the segmentation input — the word SET is identical by
    construction (same tokenization, same empty-word filter), so the
    result is unchanged, but the broadcast build reads a (usually
    persisted) vocabulary-sized relation instead of re-exploding the
    corpus."""
    import pandas as pd

    counts = {p: c for p, c, _r in vocab}
    probs = _probs_from_counts(counts)
    num = {p: (fr.numerator, fr.denominator) for p, fr in probs.items()}

    doc_words = docs.select(
        "doc_id",
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim("text")), _WORD_SPLIT, " "),
                " ",
            )
        ).alias("word"),
    ).filter(F.col("word") != "")

    def run(batches):
        pr = {p: Fraction(n, d) for p, (n, d) in num.items()}
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_word_tokens": [
                        len(viterbi_segment(w, pr)) for w in pdf["word"]
                    ],
                }
            )

    word_src = (
        words.select("word")
        if words is not None
        else doc_words.select("word").distinct()
    )
    word_tok = word_src.mapInPandas(
        run, "word string, n_word_tokens long"
    )
    return (
        doc_words.join(F.broadcast(word_tok), "word")
        .groupBy("doc_id")
        .agg(F.sum("n_word_tokens").cast("long").alias("n_unigram_tokens"))
    )

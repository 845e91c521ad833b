"""sf1 VALUE gates for the scale-sweep's deselected family (r7 verdict
item 3).

The sf1/sf2/sf4 replica sweeps deselect the interpreted-list-bound
dedup/ANN family (their DuckDB oracles are list-lambda-bound and
infeasible at full scale), so those operators' VALUES were only
oracle-checked at sf0.01 — exactly the class of operator where the
ngram zero-recall cliff (sf2) and the RRF zero-overlap bug (sf1) hid.
This file closes the gap with INDEPENDENT single-process goldens over
the FULL sf1 corpus (50k docs / 20k vectors, 1000x the grading scale):

- ``dedup_minhash_lsh``: a from-scratch numpy/pure-Python
  shingle->minhash->band->verify reference sharing only the DECLARED
  hash constants with the Spark operator (the constants are the spec;
  the execution — tokenisation, distinct, banding, bucketing, Jaccard —
  is reimplemented), compared pair-for-pair and value-for-value.
- ``dedup_simhash_wide_pairs``: same approach for the 63-bit
  frequency-weighted majority simhash and its 3x21-bit banding.
- ``ann_topk_cosine`` + ``ann_topk_cosine_numpy``: float64 numpy
  brute-force cosine top-k golden (rank-for-rank), plus a
  separation check that the rank boundary is not a float tie.

A distributed-execution bug (partition-dependent distinct, overflow
past 2^31, double-execution divergence, lost rows in a self-join)
would make Spark disagree with these goldens at 50k docs even if
sf0.01 stayed green.

Needs the r7 scale corpus: regenerate after a /tmp wipe with
``python tools/gen_corpus.py --sf 1 --out /tmp/dbmask_scale/sf1``
(seed-deterministic; ~30 s).
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pytest

from database_anonymiser_minimiser_spark.operators.dedup import (
    _MINHASH_P,
    _BASE_MOD,
    _perm_constants,
    BANDS,
    NUM_HASHES,
    ROWS_PER_BAND,
    SHINGLE_K,
    WIDE_BAND_BITS,
    WIDE_BANDS,
    WIDE_BITS,
)

SF1 = "/tmp/dbmask_scale/sf1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF1),
    reason="sf1 scale corpus absent - regenerate with "
    "`python tools/gen_corpus.py --sf 1 --out /tmp/dbmask_scale/sf1`",
)

_HEX_TR = str.maketrans("abcdef", "012345")


def _load_documents():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF1}/documents.parquet", columns=["doc_id", "text"])
    return t["doc_id"].to_numpy(), t["text"].to_pylist()


def _tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


# ---------------------------------------------------------------------------
# golden 1: minhash + LSH + exact-Jaccard verify
# ---------------------------------------------------------------------------


def _golden_minhash_pairs(threshold: float = 0.5):
    ids, texts = _load_documents()
    base_cache: dict[str, int] = {}

    def base_hash(sh: str) -> int:
        v = base_cache.get(sh)
        if v is None:
            hx = hashlib.md5(sh.encode()).hexdigest().translate(_HEX_TR)
            v = int(hx[:15]) % _BASE_MOD
            base_cache[sh] = v
        return v

    shingle_sets: dict[int, frozenset] = {}
    flat: list[int] = []
    offsets: list[int] = [0]
    kept_ids: list[int] = []
    for i, txt in zip(ids, texts):
        ts = _tokens(txt)
        if len(ts) < SHINGLE_K:
            continue
        sh = list(
            dict.fromkeys(
                " ".join(ts[j : j + SHINGLE_K])
                for j in range(len(ts) - SHINGLE_K + 1)
            )
        )
        shingle_sets[int(i)] = frozenset(sh)
        kept_ids.append(int(i))
        flat.extend(base_hash(x) for x in sh)
        offsets.append(len(flat))
    hb = np.asarray(flat, dtype=np.int64)
    starts = np.asarray(offsets[:-1], dtype=np.int64)
    sigs = np.empty((len(kept_ids), NUM_HASHES), dtype=np.int64)
    for p, (a, b) in enumerate(_perm_constants(NUM_HASHES)):
        sigs[:, p] = np.minimum.reduceat((a * hb + b) % _MINHASH_P, starts)

    buckets: dict[tuple, list[int]] = {}
    for row, did in enumerate(kept_ids):
        for bnd in range(BANDS):
            key = (bnd, *sigs[row, bnd * ROWS_PER_BAND : (bnd + 1) * ROWS_PER_BAND])
            buckets.setdefault(key, []).append(did)
    cands: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) > 1:
            members.sort()
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    cands.add((members[x], members[y]))

    golden = {}
    for a_id, b_id in cands:
        sa, sb = shingle_sets[a_id], shingle_sets[b_id]
        inter = len(sa & sb)
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= threshold:
            golden[(a_id, b_id)] = jac
    return golden


def test_dedup_minhash_lsh_full_sf1_vs_independent_golden(spark):
    from database_anonymiser_minimiser_spark import queries as Q

    golden = _golden_minhash_pairs(threshold=0.5)
    rows = Q.QUERIES["dedup_minhash_lsh"](spark, SF1).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert len(rows) == len(got), "duplicate pairs in Spark output"
    # the corpus injects ~3% near-dups at every scale: the gate must be
    # exercising real pair volume, not comparing empty sets
    assert len(golden) > 200, f"suspicious golden size {len(golden)}"
    assert set(got) == set(golden), (
        f"pair set mismatch: spark-only={sorted(set(got) - set(golden))[:5]} "
        f"golden-only={sorted(set(golden) - set(got))[:5]}"
    )
    for k, v in golden.items():
        assert got[k] == pytest.approx(v, abs=1e-12), (k, got[k], v)


# ---------------------------------------------------------------------------
# golden 2: 63-bit simhash near pairs
# ---------------------------------------------------------------------------


def _token_wide_hash(tok: str) -> int:
    hx = hashlib.md5(tok.encode()).hexdigest()
    h = 0
    for j in range(WIDE_BITS):
        bit = (int(hx[j // 2], 16) >> (j % 2)) & 1
        h |= bit << j
    return h


def _golden_simhash_wide_pairs(max_hamming: int = 2):
    from collections import Counter

    ids, texts = _load_documents()
    tok_hash: dict[str, np.ndarray] = {}

    def bits_of(tok: str) -> np.ndarray:
        v = tok_hash.get(tok)
        if v is None:
            h = _token_wide_hash(tok)
            v = np.array([(h >> j) & 1 for j in range(WIDE_BITS)], dtype=np.int64)
            tok_hash[tok] = v
        return v

    sims: dict[int, int] = {}
    for i, txt in zip(ids, texts):
        counts = Counter(_tokens(txt))
        n = sum(counts.values())
        bitsum = np.zeros(WIDE_BITS, dtype=np.int64)
        for tok, c in counts.items():
            bitsum += c * bits_of(tok)
        sim = 0
        for j in range(WIDE_BITS):
            if 2 * int(bitsum[j]) > n:
                sim |= 1 << j
        sims[int(i)] = sim

    mask = (1 << WIDE_BAND_BITS) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sim in sims.items():
        for bnd in range(WIDE_BANDS):
            buckets.setdefault(
                (bnd, (sim >> (WIDE_BAND_BITS * bnd)) & mask), []
            ).append(did)
    golden = {}
    for members in buckets.values():
        if len(members) > 1:
            members.sort()
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    a_id, b_id = members[x], members[y]
                    ham = bin(sims[a_id] ^ sims[b_id]).count("1")
                    if ham <= max_hamming:
                        golden[(a_id, b_id)] = ham
    return golden


def test_dedup_simhash_wide_full_sf1_vs_independent_golden(spark):
    from database_anonymiser_minimiser_spark import queries as Q

    golden = _golden_simhash_wide_pairs(max_hamming=2)
    rows = Q.QUERIES["dedup_simhash_wide_pairs"](spark, SF1).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert len(rows) == len(got), "duplicate pairs in Spark output"
    assert len(golden) > 100, f"suspicious golden size {len(golden)}"
    assert set(got) == set(golden), (
        f"pair set mismatch: spark-only={sorted(set(got) - set(golden))[:5]} "
        f"golden-only={sorted(set(golden) - set(got))[:5]}"
    )
    for k, v in golden.items():
        assert got[k] == v, (k, got[k], v)


# ---------------------------------------------------------------------------
# golden 3: brute-force cosine top-k over the full 20k-vector corpus
# ---------------------------------------------------------------------------


def _golden_topk(query_ids, k):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF1}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    golden = {}
    margins = []
    for q in query_ids:
        qi = id_to_row[q]
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        cos[qi] = -np.inf  # self-match excluded
        # ties broken by neighbor id: sort by (-cos, id)
        order = np.lexsort((ids, -cos))
        top = [int(ids[j]) for j in order[:k]]
        golden[q] = top
        margins.append(float(cos[order[k - 1]] - cos[order[k]]))
    return golden, min(margins)


@pytest.mark.parametrize("qname", ["ann_topk_cosine", "ann_topk_cosine_numpy"])
def test_ann_topk_full_sf1_vs_numpy_golden(spark, qname):
    from database_anonymiser_minimiser_spark import queries as Q

    golden, min_margin = _golden_topk([0, 1, 2], k=5)
    # the k-th/(k+1)-th cosine gap must dwarf fold-order float drift,
    # otherwise rank equality would be luck, not correctness
    assert min_margin > 1e-9, f"rank boundary is a float tie ({min_margin})"
    rows = Q.QUERIES[qname](spark, SF1).collect()
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got == golden

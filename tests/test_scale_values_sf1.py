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

r9 extends the harness to the REST of the deselected family (r8 verdict
item 4):

- ``text_winnow_fingerprint``: pure-Python rolling 3-shingle min-hash
  fingerprints, exact string compare over all 50k docs.
- ``dedup_levenshtein_pairs``: independent blocking (length bucket +
  12-char prefix, adjacency included) + an exact banded edit-distance
  DP with common-affix stripping, pair-for-pair and value-for-value.
- ``dedup_common_spans``: dict-based span frequency + per-lang rollup,
  integer-exact.
- ``contamination_ngram_overlap``: set-based 5-gram shingle overlap vs
  the md5-sampled benchmark side, integer counts exact and max_overlap
  compared as the identical IEEE double division.
- ``semantic_dedup_embeddings`` + ``embedding_neardup``: numpy
  normalized-matmul cosine per block (sign-bit blocks / label blocks),
  survivor-set / pair-set exact with an explicit no-threshold-tie
  margin check (the fold-vs-BLAS low-bit question the margin answers).

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

pytestmark = [
    # r15 full tier: every gate here is a 10x-scale golden TWIN of a
    # default-tier correctness gate (see tests/conftest.py)
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(SF1),
        reason="sf1 scale corpus absent - regenerate with "
        "`python tools/gen_corpus.py --sf 1 --out /tmp/dbmask_scale/sf1`",
    ),
]

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


_MINHASH_GOLDEN_CACHE: dict = {}


def _golden_minhash_pairs(threshold: float = 0.5):
    if threshold in _MINHASH_GOLDEN_CACHE:  # shared by the incremental gate
        return _MINHASH_GOLDEN_CACHE[threshold]
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
    _MINHASH_GOLDEN_CACHE[threshold] = golden
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


# ---------------------------------------------------------------------------
# golden 4 (r9): winnowing-style rolling-hash fingerprint
# ---------------------------------------------------------------------------


def _golden_winnow_fingerprints():
    ids, texts = _load_documents()
    out = {}
    for i, txt in zip(ids, texts):
        ts = _tokens(txt)
        if len(ts) < 3:
            continue
        hs = sorted(
            int(
                hashlib.md5(" ".join(ts[j : j + 3]).encode())
                .hexdigest()
                .translate(_HEX_TR)[:12]
            )
            for j in range(len(ts) - 2)
        )
        out[int(i)] = "-".join(str(h) for h in hs[:4])
    return out


def test_text_winnow_fingerprint_full_sf1_vs_python_golden(spark):
    from database_anonymiser_minimiser_spark import queries as Q

    golden = _golden_winnow_fingerprints()
    rows = Q.QUERIES["text_winnow_fingerprint"](spark, SF1).collect()
    got = {r["doc_id"]: r["fingerprint"] for r in rows}
    assert len(golden) > 10_000
    assert got == golden


# ---------------------------------------------------------------------------
# golden 5 (r9): blocked capped-prefix edit-distance near-dup pairs
# ---------------------------------------------------------------------------


def _lev_capped(a: str, b: str, k: int):
    """Exact Levenshtein if <= k else None: strip common affixes, then a
    banded DP (band width 2k+1 suffices for any distance <= k) with a
    row-min early abort. Independent of Spark's full-matrix builtin."""
    # strip common prefix
    i, n = 0, min(len(a), len(b))
    while i < n and a[i] == b[i]:
        i += 1
    a, b = a[i:], b[i:]
    # strip common suffix
    j, n = 0, min(len(a), len(b))
    while j < n and a[len(a) - 1 - j] == b[len(b) - 1 - j]:
        j += 1
    if j:
        a, b = a[: len(a) - j], b[: len(b) - j]
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return None
    if la == 0:
        return lb
    if lb == 0:
        return la
    INF = k + 1
    prev = [min(x, INF) for x in range(lb + 1)]
    for r in range(1, la + 1):
        lo, hi = max(1, r - k), min(lb, r + k)
        cur = [INF] * (lb + 1)
        if r <= k:
            cur[0] = r
        band_min = INF
        ar = a[r - 1]
        for c in range(lo, hi + 1):
            cost = 0 if ar == b[c - 1] else 1
            v = prev[c - 1] + cost
            if prev[c] + 1 < v:
                v = prev[c] + 1
            if cur[c - 1] + 1 < v:
                v = cur[c - 1] + 1
            cur[c] = v
            if v < band_min:
                band_min = v
        if min(band_min, cur[0]) > k:
            return None
        prev = cur
    return prev[lb] if prev[lb] <= k else None


def _golden_levenshtein_pairs(
    max_dist=10, prefix_chars=120, block_prefix=12, len_bucket=20
):
    ids, texts = _load_documents()
    buckets: dict[tuple, list[tuple[int, str]]] = {}
    for i, txt in zip(ids, texts):
        nt = re.sub(r"\s+", " ", txt.strip().lower())
        key = (len(nt) // len_bucket, nt[:block_prefix])
        buckets.setdefault(key, []).append((int(i), nt[:prefix_chars]))
    golden = {}

    def check(pa, pb):
        (ia, ta), (ib, tb) = pa, pb
        if ia > ib:
            ia, ib, ta, tb = ib, ia, tb, ta
        d = _lev_capped(ta, tb, max_dist)
        if d is not None:
            golden[(ia, ib)] = d

    for (lb, pfx), members in buckets.items():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                check(members[x], members[y])
        for m in buckets.get((lb + 1, pfx), ()):  # straddling pairs
            for pa in members:
                check(pa, m)
    return golden


def test_dedup_levenshtein_full_sf1_vs_banded_dp_golden(spark):
    from database_anonymiser_minimiser_spark import queries as Q

    golden = _golden_levenshtein_pairs()
    rows = Q.QUERIES["dedup_levenshtein_pairs"](spark, SF1).collect()
    got = {(r["doc_a"], r["doc_b"]): r["dist"] for r in rows}
    assert len(rows) == len(got), "duplicate pairs in Spark output"
    assert len(golden) > 100, f"suspicious golden size {len(golden)}"
    assert set(got) == set(golden), (
        f"pair set mismatch: spark-only={sorted(set(got) - set(golden))[:5]} "
        f"golden-only={sorted(set(golden) - set(got))[:5]}"
    )
    for k, v in golden.items():
        assert got[k] == v, (k, got[k], v)


# ---------------------------------------------------------------------------
# golden 6 (r9): sub-document common-span audit (per-lang integer rollup)
# ---------------------------------------------------------------------------


def _load_documents_with_lang():
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SF1}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    return (
        t["doc_id"].to_numpy(),
        t["lang"].to_pylist(),
        t["text"].to_pylist(),
    )


def _golden_common_spans():
    from collections import Counter

    from database_anonymiser_minimiser_spark.queries import (
        _SPAN_MIN_DOCS,
        _SPAN_TOKENS,
    )

    _, langs, texts = _load_documents_with_lang()
    per_doc = []
    freq: Counter = Counter()
    for lang, txt in zip(langs, texts):
        ts = _tokens(txt)
        if len(ts) < _SPAN_TOKENS:
            continue
        spans = {
            " ".join(ts[i * _SPAN_TOKENS : (i + 1) * _SPAN_TOKENS])
            for i in range(len(ts) // _SPAN_TOKENS)
        }
        per_doc.append((lang, spans))
        freq.update(spans)
    common = {s for s, n in freq.items() if n >= _SPAN_MIN_DOCS}
    agg: dict[str, list[int]] = {}
    for lang, spans in per_doc:
        n_common = sum(1 for s in spans if s in common)
        a = agg.setdefault(lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += 1 if n_common else 0
        a[2] += len(spans)
        a[3] += n_common
    return {k: tuple(v) for k, v in agg.items()}


def test_dedup_common_spans_full_sf1_vs_python_golden(spark):
    from database_anonymiser_minimiser_spark import queries as Q

    golden = _golden_common_spans()
    rows = Q.QUERIES["dedup_common_spans"](spark, SF1).collect()
    got = {
        r["lang"]: (
            r["n_docs"],
            r["n_affected_docs"],
            r["total_spans"],
            r["total_common_spans"],
        )
        for r in rows
    }
    assert sum(v[3] for v in golden.values()) > 0, "no common spans exercised"
    assert got == golden


# ---------------------------------------------------------------------------
# golden 7 (r9): n-gram-overlap decontamination (per-lang rollup)
# ---------------------------------------------------------------------------


def _golden_contamination_overlap(ngram=5, flag_frac=0.3):
    _, langs, texts = _load_documents_with_lang()
    docs = []
    bench: set[str] = set()
    for lang, txt in zip(langs, texts):
        ts = _tokens(txt)
        if len(ts) < ngram:
            continue
        sh = {
            " ".join(ts[j : j + ngram]) for j in range(len(ts) - ngram + 1)
        }
        is_bench = (
            int(hashlib.md5(txt.encode()).hexdigest().translate(_HEX_TR)[:6])
            % 20
            == 0
        )
        if is_bench:
            bench |= sh
        else:
            docs.append((lang, sh))
    agg: dict[str, list] = {}
    for lang, sh in docs:
        frac = len(sh & bench) * 1.0 / len(sh)
        a = agg.setdefault(lang, [0, 0, 0.0])
        a[0] += 1
        a[1] += 1 if frac >= flag_frac else 0
        a[2] = max(a[2], frac)
    return {k: tuple(v) for k, v in agg.items()}


def test_contamination_ngram_overlap_full_sf1_vs_python_golden(spark):
    from database_anonymiser_minimiser_spark import queries as Q

    golden = _golden_contamination_overlap()
    rows = Q.QUERIES["contamination_ngram_overlap"](spark, SF1).collect()
    got = {
        r["lang"]: (r["n_docs"], r["n_flagged"], r["max_overlap"])
        for r in rows
    }
    assert sum(v[1] for v in golden.values()) > 0, "no flagged docs exercised"
    assert set(got) == set(golden)
    for lang, (nd, nf, mo) in golden.items():
        gd, gf, gm = got[lang]
        assert (gd, gf) == (nd, nf), (lang, got[lang], golden[lang])
        # same two integers through one IEEE double division -> exact
        assert gm == mo, (lang, gm, mo)


# ---------------------------------------------------------------------------
# goldens 8+9 (r9): embedding-space dedup (sign-bit / label blocking)
# ---------------------------------------------------------------------------


def _load_embeddings():
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SF1}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = t["vec_id"].to_numpy()
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, mat, t["label"].to_numpy()


def _block_cosines(ids, mat):
    """All same-block (lo_id, hi_id) -> cosine via one normalized matmul."""
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    vn = np.divide(mat, nrm, out=np.zeros_like(mat), where=nrm != 0)
    C = vn @ vn.T
    iu, ju = np.triu_indices(len(ids), k=1)
    lo = np.minimum(ids[iu], ids[ju])
    hi = np.maximum(ids[iu], ids[ju])
    return lo, hi, C[iu, ju]


def test_semantic_dedup_full_sf1_vs_numpy_golden(spark):
    from database_anonymiser_minimiser_spark import queries as Q

    threshold, sign_bits = 0.3, 8
    ids, mat, labels = _load_embeddings()
    blk = (mat[:, :sign_bits] >= 0)  # sign-bit blocking, the shared constant
    keys = ["".join("1" if b else "0" for b in row) for row in blk]
    by_block: dict[str, list[int]] = {}
    for row, k in enumerate(keys):
        by_block.setdefault(k, []).append(row)
    dups: set[int] = set()
    min_margin = np.inf
    for rows_ in by_block.values():
        if len(rows_) < 2:
            continue
        sub_ids = ids[rows_]
        lo, hi, cos = _block_cosines(sub_ids, mat[rows_])
        min_margin = min(min_margin, float(np.abs(cos - threshold).min()))
        dups.update(int(h) for h in hi[cos >= threshold])
    # no in-block pair may sit on the threshold within float-fold drift,
    # else survivor equality would be luck, not correctness
    assert min_margin > 1e-9, f"threshold tie ({min_margin})"
    golden = {(int(i), str(l)) for i, l in zip(ids, labels) if int(i) not in dups}
    rows = Q.QUERIES["semantic_dedup_embeddings"](spark, SF1).collect()
    got = {(r["vec_id"], str(r["label"])) for r in rows}
    assert 0 < len(golden) < len(ids), "dedup not exercised"
    assert got == golden


def test_embedding_neardup_full_sf1_vs_numpy_golden(spark):
    from database_anonymiser_minimiser_spark import queries as Q

    threshold = 0.2
    ids, mat, labels = _load_embeddings()
    golden = {}
    min_margin = np.inf
    for lab in np.unique(labels):
        rows_ = np.nonzero(labels == lab)[0]
        lo, hi, cos = _block_cosines(ids[rows_], mat[rows_])
        min_margin = min(min_margin, float(np.abs(cos - threshold).min()))
        keep = cos >= threshold
        for a, b, c in zip(lo[keep], hi[keep], cos[keep]):
            golden[(int(a), int(b))] = float(c)
    assert min_margin > 1e-9, f"threshold tie ({min_margin})"
    assert len(golden) > 10_000, f"suspicious golden size {len(golden)}"
    rows = Q.QUERIES["embedding_neardup"](spark, SF1).collect()
    got = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in rows}
    assert len(rows) == len(got), "duplicate pairs in Spark output"
    assert set(got) == set(golden), (
        f"pair set mismatch: {len(got)} vs {len(golden)}; "
        f"spark-only={sorted(set(got) - set(golden))[:3]} "
        f"golden-only={sorted(set(golden) - set(got))[:3]}"
    )
    for k, v in golden.items():
        # Spark emits the JVM-fold cosine; numpy BLAS differs only in
        # summation order -> low-bit drift, banded far under the margin
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


# ---------------------------------------------------------------------------
# golden 10 (r9): incremental MinHash near-dup ingest (delta vs landed)
# ---------------------------------------------------------------------------


def test_dedup_minhash_incremental_full_sf1_vs_independent_golden(spark):
    """Sharing a band is a PAIRWISE property — the incremental operator
    (new bands x landed bands) must flag exactly the full self-join
    golden's pairs that straddle the md5-sampled new/landed split,
    aggregated per new doc with its exact best jaccard."""
    from database_anonymiser_minimiser_spark import queries as Q

    ids, texts = _load_documents()
    is_new = {
        int(i): int(
            hashlib.md5(t.encode()).hexdigest().translate(_HEX_TR)[:6]
        )
        % 10
        == 0
        for i, t in zip(ids, texts)
    }
    full = _golden_minhash_pairs(threshold=0.5)
    golden: dict[int, list[float]] = {}
    for (a, b), jac in full.items():
        if is_new[a] == is_new[b]:
            continue  # same-side pairs are out of the operator's scope
        new_id = a if is_new[a] else b
        golden.setdefault(new_id, []).append(jac)
    expected = {k: (len(v), max(v)) for k, v in golden.items()}
    assert len(expected) > 20, f"suspicious golden size {len(expected)}"

    rows = Q.QUERIES["dedup_minhash_incremental"](spark, SF1).collect()
    got = {r["doc_id"]: (r["n_dups"], r["best_jaccard"]) for r in rows}
    assert set(got) == set(expected), (
        f"flag-set mismatch: spark-only={sorted(set(got) - set(expected))[:5]} "
        f"golden-only={sorted(set(expected) - set(got))[:5]}"
    )
    for k, (n, j) in expected.items():
        assert got[k][0] == n, (k, got[k], (n, j))
        assert got[k][1] == pytest.approx(j, abs=1e-12), (k, got[k], (n, j))


# ---------------------------------------------------------------------------
# golden 11 (r12): directed n-gram containment on a 2k-doc sf1 slice
# ---------------------------------------------------------------------------


def test_dedup_containment_sf1_slice_vs_python_golden(spark):
    """Independent pure-Python golden for the containment operator on a
    deterministic md5-sampled 2,000-doc slice of the sf1 corpus (40x
    the grading scale; the FULL fixed-vocab sf1 corpus sits in the
    quantile-fallback regime where the mirrored candidate set is
    Theta(sum df^2) in any engine — the same reason its DuckDB oracle
    is in the sweep deselect list). The golden mirrors only the
    DECLARED candidate rule (rare shingles under the adaptive cap,
    ordered co-occurrence) and recomputes everything else from scratch;
    compared pair-for-pair and value-for-value."""
    from database_anonymiser_minimiser_spark.operators import dedup as D

    ids, texts = _load_documents()
    keep = {
        int(i)
        for i, t in zip(ids, texts)
        if int(hashlib.md5(t.encode()).hexdigest().translate(_HEX_TR)[:6])
        % 25
        == 0
    }
    sliced = [(int(i), t) for i, t in zip(ids, texts) if int(i) in keep]
    assert len(sliced) > 1500, f"suspicious slice size {len(sliced)}"

    threshold, max_df, fallback_q = 0.6, 100, 0.9
    shingle_sets: dict[int, frozenset] = {}
    for i, txt in sliced:
        ts = _tokens(txt)
        if len(ts) < SHINGLE_K:
            continue
        shingle_sets[i] = frozenset(
            " ".join(ts[j : j + SHINGLE_K])
            for j in range(len(ts) - SHINGLE_K + 1)
        )
    df_count: dict[str, int] = {}
    for sh in shingle_sets.values():
        for s in sh:
            df_count[s] = df_count.get(s, 0) + 1
    dfs = sorted(df_count.values())
    if dfs[0] > max_df:
        # quantile_cont / Spark percentile: linear interpolation
        pos = fallback_q * (len(dfs) - 1)
        lo, hi = int(pos), min(int(pos) + 1, len(dfs) - 1)
        cap = dfs[lo] + (pos - lo) * (dfs[hi] - dfs[lo])
    else:
        cap = float(max_df)
    rare = {s for s, c in df_count.items() if c <= cap}
    inv: dict[str, list[int]] = {}
    for i, sh in shingle_sets.items():
        for s in sh:
            if s in rare:
                inv.setdefault(s, []).append(i)
    cands: set[tuple[int, int]] = set()
    for members in inv.values():
        for a in members:
            for b in members:
                if a != b:
                    cands.add((a, b))
    golden = {}
    for a, b in cands:
        sa, sb = shingle_sets[a], shingle_sets[b]
        c = len(sa & sb) / len(sa)
        if c >= threshold:
            golden[(a, b)] = c
    assert golden, "slice exercised no containment pairs"

    id_list = ",".join(str(i) for i in sorted(keep))
    sub = spark.read.parquet(f"{SF1}/documents.parquet").where(
        f"doc_id IN ({id_list})"
    )
    rows = D.ngram_containment_pairs(
        sub, threshold=threshold, max_df=max_df, fallback_quantile=fallback_q
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): r["containment"] for r in rows}
    assert set(got) == set(golden), (
        f"pair-set mismatch: spark-only={sorted(set(got) - set(golden))[:5]} "
        f"golden-only={sorted(set(golden) - set(got))[:5]}"
    )
    for k, v in golden.items():
        # same two integers through one IEEE double division -> exact
        assert got[k] == v, (k, got[k], v)


# ---------------------------------------------------------------------------
# golden 12 (r13): mutual-top-1 bitext mining (cell-blocked, both sides)
# ---------------------------------------------------------------------------


def test_bitext_mutual_top1_full_sf1_vs_numpy_golden(spark):
    """Independent numpy golden over the FULL sf1 embeddings (20k
    vectors): shared-centroid cell assignment, per-cell A x B cosine
    matrices, mutual argmax intersection — pair-for-pair equal to the
    Spark operator, with explicit margin checks so no ranking depends
    on BLAS-vs-fold low-bit summation order."""
    from database_anonymiser_minimiser_spark import queries as Q

    ids, mat, labels = _load_embeddings()
    order = np.argsort(ids)
    ids, mat, labels = ids[order], mat[order], labels[order]
    norms = np.sqrt((mat * mat).sum(axis=1))
    unit = mat / norms[:, None]
    cent_rows = np.nonzero(ids < 8)[0]
    assert len(cent_rows) == 8
    ccos = unit @ unit[cent_rows].T  # argmax col = lowest cid on ties
    top2 = np.sort(ccos, axis=1)[:, -2:]
    assert float((top2[:, 1] - top2[:, 0]).min()) > 1e-9, "assignment tie"
    cell = np.argmax(ccos, axis=1)

    golden: dict[tuple, float] = {}
    min_margin = np.inf
    for c in range(8):
        rows_ = np.nonzero(cell == c)[0]
        a_rows = rows_[labels[rows_] % 2 == 0]
        b_rows = rows_[labels[rows_] % 2 == 1]
        if not len(a_rows) or not len(b_rows):
            continue
        cos = unit[a_rows] @ unit[b_rows].T
        # ranking-stability margins: per-row and per-column top-2 gap
        if cos.shape[1] >= 2:
            t2 = np.sort(cos, axis=1)[:, -2:]
            min_margin = min(min_margin, float((t2[:, 1] - t2[:, 0]).min()))
        if cos.shape[0] >= 2:
            t2 = np.sort(cos, axis=0)[-2:, :]
            min_margin = min(min_margin, float((t2[1, :] - t2[0, :]).min()))
        best_b = np.argmax(cos, axis=1)  # first max = lowest b_id
        best_a = np.argmax(cos, axis=0)
        for i, j in enumerate(best_b):
            if best_a[j] == i:  # mutual
                golden[(int(ids[a_rows[i]]), int(ids[b_rows[j]]))] = float(
                    cos[i, j]
                )
    assert min_margin > 1e-9, f"top-1 tie within float drift ({min_margin})"
    assert len(golden) > 100, f"suspicious golden size {len(golden)}"

    rows = Q.QUERIES["bitext_mutual_top1"](spark, SF1).collect()
    got = {(r["a_id"], r["b_id"]): r["cosine"] for r in rows}
    assert set(got) == set(golden), (
        f"pair set mismatch: {len(got)} vs {len(golden)}; "
        f"spark-only={sorted(set(got) - set(golden))[:3]} "
        f"golden-only={sorted(set(golden) - set(got))[:3]}"
    )
    for k, v in golden.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_trained_pq_codebook_beats_seeded_recall_sf1(spark):
    """r14 (r13 verdict item 3): at the full sf1 corpus (20k vectors)
    per-subspace k-means PQ codes must beat the seeded first-K codes on
    recall@k vs exact brute force, and must reduce the k-means
    objective itself (mean squared quantization distortion, numpy
    float64) — the scale where the improvement claim is statistically
    meaningful (40 queries, 200 graded pairs)."""
    import numpy as np
    import pyarrow.parquet as pq

    import database_anonymiser_minimiser_spark.operators.similarity as S
    from database_anonymiser_minimiser_spark.queries import load

    emb = load(spark, SF1, "embeddings")
    m, K, k = 8, 16, 5
    qids = list(range(100, 20100, 500))  # 40 queries
    cb = S.train_pq_codebook(emb, m=m, num_codes=K, iters=3)
    rows = sorted((int(r["cid"]), list(r["cv"])) for r in cb.collect())
    assert [c for c, _ in rows] == list(range(K))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.topk_cosine(emb, qids, k=k).collect()
    }

    def recall(codebook):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in S.ann_pq_adc_topk(
                emb, qids, k=k, num_codes=K, m=m, codebook=codebook
            ).collect()
        }
        return len(exact & got) / len(exact)

    r_seed, r_train = recall(None), recall(cb)
    assert r_train > r_seed, f"trained {r_train} <= seeded {r_seed}"

    t = pq.read_table(f"{SF1}/embeddings.parquet", columns=["embedding"])
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    dsub = mat.shape[1] // m

    def distortion(cents):
        tot = 0.0
        for s in range(m):
            sl = slice(s * dsub, (s + 1) * dsub)
            d2 = ((mat[:, None, sl] - cents[None, :, sl]) ** 2).sum(axis=2)
            tot += d2.min(axis=1).sum()
        return tot / len(mat)

    assert distortion(np.array([cv for _c, cv in rows])) < distortion(
        mat[:K]
    )


def test_bitext_margin_pairs_full_sf1_vs_numpy_golden(spark):
    """r14 (r13 verdict item 4): the margin-SCORED variant against an
    independent full-corpus numpy golden — mutual pairs, each side's
    top-4 neighbourhood means, the ratio margin, and the >= 1.2
    threshold all recomputed from scratch; pair set AND margin values
    compared, with a no-threshold-straddle check so membership cannot
    hinge on float drift."""
    from database_anonymiser_minimiser_spark import queries as Q

    K_NEIGH, THRESH = 4, 1.2
    ids, mat, labels = _load_embeddings()
    order = np.argsort(ids)
    ids, mat, labels = ids[order], mat[order], labels[order]
    norms = np.sqrt((mat * mat).sum(axis=1))
    unit = mat / norms[:, None]
    cent_rows = np.nonzero(ids < 8)[0]
    ccos = unit @ unit[cent_rows].T
    cell = np.argmax(ccos, axis=1)

    golden: dict[tuple, tuple] = {}
    for c in range(8):
        rows_ = np.nonzero(cell == c)[0]
        a_rows = rows_[labels[rows_] % 2 == 0]
        b_rows = rows_[labels[rows_] % 2 == 1]
        if not len(a_rows) or not len(b_rows):
            continue
        cos = unit[a_rows] @ unit[b_rows].T
        # per-side top-k neighbourhood means (all candidates in-cell)
        mean_a = np.sort(cos, axis=1)[:, ::-1][
            :, : min(K_NEIGH, cos.shape[1])
        ].mean(axis=1)
        mean_b = np.sort(cos, axis=0)[::-1, :][
            : min(K_NEIGH, cos.shape[0]), :
        ].mean(axis=0)
        best_b = np.argmax(cos, axis=1)
        best_a = np.argmax(cos, axis=0)
        for i, j in enumerate(best_b):
            if best_a[j] != i:
                continue
            margin = float(cos[i, j]) / ((mean_a[i] + mean_b[j]) / 2.0)
            # membership must not hinge on summation-order drift
            assert abs(margin - THRESH) > 1e-9, (i, j, margin)
            if margin >= THRESH:
                golden[(int(ids[a_rows[i]]), int(ids[b_rows[j]]))] = (
                    float(cos[i, j]),
                    margin,
                )
    assert 10 < len(golden), f"suspicious golden size {len(golden)}"

    rows = Q.QUERIES["bitext_margin_pairs"](spark, SF1).collect()
    got = {(r["a_id"], r["b_id"]): (r["cosine"], r["margin"]) for r in rows}
    assert set(got) == set(golden), (
        f"pair set mismatch: {len(got)} vs {len(golden)}; "
        f"spark-only={sorted(set(got) - set(golden))[:3]} "
        f"golden-only={sorted(set(golden) - set(got))[:3]}"
    )
    for pair, (cos_v, marg_v) in golden.items():
        assert abs(got[pair][0] - cos_v) < 1e-9, (pair, got[pair], cos_v)
        assert abs(got[pair][1] - marg_v) < 1e-9, (pair, got[pair], marg_v)

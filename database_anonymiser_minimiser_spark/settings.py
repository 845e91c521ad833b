"""Engine-wide execution knobs.

``key_mode`` selects the join/shuffle key representation for the
shingle-family operators (span dedup, n-gram decontamination, MinHash
banding):

- ``"hashed"`` (the default): fold every shingle/span key to a 64-bit
  ``xxhash64`` token map-side, so every Exchange, broadcast, and join
  carries 8-byte longs instead of ~25-60-byte strings. This is the
  production path — measured 0.83-0.88x wall at sf1/sf4 locally, and on
  a real cluster it is the 3-7x smaller *network* shuffle/broadcast
  payload that matters. Rollup results are byte-equal to the oracle
  mode for the span/contamination operators (a 64-bit collision across
  ~1M distinct keys has probability ~1e-7 and the hash-exact gates
  would surface one); for MinHash the candidate PAIR SET may differ at
  the LSH margin (candidate generation is hash-dependent by design)
  while every reported jaccard stays exact.
- ``"oracle"``: engine-neutral string / md5-derived keys — the shapes a
  cross-engine SQL oracle (DuckDB) can replicate bit-for-bit. Grading
  and cross-engine debugging run here.

Resolution order: explicit function argument > :func:`set_key_mode`
(what the config's ``settings.key_mode`` applies) > the
``SPARK_GRAFT_KEY_MODE`` environment variable > ``"hashed"``.
"""

from __future__ import annotations

import os

KEY_MODE_ENV = "SPARK_GRAFT_KEY_MODE"
_VALID = ("hashed", "oracle")
_session_override: str | None = None


def _validate(v: str) -> str:
    v = v.lower()
    if v not in _VALID:
        raise ValueError(
            f"key_mode must be one of {_VALID}, got {v!r}"
        )
    return v


def set_key_mode(value: str | None) -> None:
    """Set (or with ``None`` clear) the session-level key_mode override —
    the hook the config file's ``settings.key_mode`` uses."""
    global _session_override
    _session_override = _validate(value) if value is not None else None


def key_mode(override: str | None = None) -> str:
    if override is not None:
        return _validate(override)
    if _session_override is not None:
        return _session_override
    return _validate(os.environ.get(KEY_MODE_ENV, "hashed"))


def minhash_hash_mode(override: str | None = None) -> str:
    """The MinHash hash implementation the key_mode maps to: candidate
    generation hashes shingles with ``xxhash64`` in hashed mode and with
    md5-derived integers (DuckDB-replicable) in oracle mode."""
    return {"hashed": "xxhash", "oracle": "md5"}[key_mode(override)]

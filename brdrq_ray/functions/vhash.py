"""Vectorized 64-bit hashing primitives shared by the sketch operators.

At 100 TB the map stage IS the bill: hashing one value at a time through
hashlib (a Python loop + an object allocation per value) caps the sketch
operators at ~1M values/sec/core. These kernels hash whole columns at C
speed instead:

* :func:`hash64` — pandas' SipHash-1-3 ``hash_array`` (deterministic, fixed
  key, implemented in C) over an object/string column: one call per batch.
* :func:`splitmix64` — the standard 64-bit finalizer (Steele et al. 2014,
  public domain) as a numpy ufunc chain; used to derive independent hash
  families (count-min rows, band mixes) from one base hash.
* :func:`bit_length_u64` — exact vectorized ``int.bit_length`` for uint64
  (six shift/compare passes; no float log2, which mis-rounds near powers of
  two above 2^53).
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def hash64(values, categorize: bool = True) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a value sequence (uint64).

    Values are hashed by type (an int and its str() differ) — callers that
    need cross-type stability must cast to string first. ``categorize``
    factorizes first (wins when values repeat a lot, e.g. words; pass False
    for unique-heavy columns — the factorize pass is pure overhead there).
    The result is identical either way.
    """
    import pandas as pd

    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=categorize).astype(np.uint64,
                                                                 copy=False)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (wrapping uint64 arithmetic)."""
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(np.uint64, copy=False)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact int.bit_length for a uint64 array (vectorized, 6 passes)."""
    x = x.astype(np.uint64, copy=True)
    out = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        out[big] += s
        x = np.where(big, x >> np.uint64(s), x)
    return out + (x > 0)

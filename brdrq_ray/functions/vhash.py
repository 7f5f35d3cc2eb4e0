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


def bucket_i32(values, n_buckets: int) -> "object":
    """Vectorized shuffle-bucket column: hash % n_buckets as a pyarrow int32
    array. Accepts a pyarrow Array/ChunkedArray or any sequence. Integer
    columns hash through splitmix64 directly (no object boxing); everything
    else casts to string first so both sides of a tagged union agree.

    Replaces the per-row ``zlib.crc32(str(v).encode()) % n`` comprehensions
    on every shuffle-key path — the bucket is an internal shuffle key, so the
    hash family is free to change (except where a bucket id leaks into
    output, e.g. pack_sequences' seq_id, noted at the call site)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_integer(values.type):
            x = pc.fill_null(values.cast(pa.int64()), 0).to_numpy(
                zero_copy_only=False)
            h = splitmix64(x.astype(np.uint64))
        else:
            s = pc.fill_null(values.cast(pa.string()), "")
            h = hash64(s.to_numpy(zero_copy_only=False))
    else:
        arr = np.asarray(values)
        if arr.dtype.kind in "iu":
            h = splitmix64(arr.astype(np.uint64))
        else:
            h = hash64(arr.astype(object))
    return pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32())


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact int.bit_length for a uint64 array (vectorized, 6 passes)."""
    x = x.astype(np.uint64, copy=True)
    out = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        out[big] += s
        x = np.where(big, x >> np.uint64(s), x)
    return out + (x > 0)

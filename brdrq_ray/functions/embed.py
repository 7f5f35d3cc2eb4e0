"""Deterministic hashed n-gram text embeddings (feature hashing /
count-sketch, Weinberger et al. 2009; Charikar 2002 sign trick).

Closes the text -> embedding gap so the semantic family (SemDeDup, kNN,
cluster sampling, ANN joins) runs self-contained from raw text — no external
model, no network, no precomputed embedding table. Each document's word
k-gram MULTISET is sketched into a dense ``dim``-vector: every shingle hash
lands in bucket ``h % dim`` with sign ``+-1`` from a high hash bit, and the
row is L2-normalized. Cosine between two sketches is an unbiased JL-style
estimate of the cosine between the full n-gram count vectors, so near-dup /
same-topic text scores high and unrelated text concentrates near 0 as dim
grows.

Properties the pipeline relies on:
- pure function of (text, dim, k, seed): partition- and batch-invariant,
  reproducible across runs and machines (no RNG state, no model file);
- one vectorized pass per batch on the shared shingle kernel
  (functions/dedup._shingle_hashes, multiset form) + one np.add.at scatter;
- output schema matches the embeddings table contract
  (``list<float32>``), so every downstream consumer is format-compatible.

Reference scale shape: embedding is embarrassingly parallel map_batches;
nothing shuffles.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .vhash import splitmix64

_SEED_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def hashed_embedding_batch(batch: pa.Table, col: str = "text",
                           dim: int = 64, k: int = 3, seed: int = 0,
                           out_col: str = "embedding") -> pa.Table:
    """Append an L2-normalized ``dim``-dim count-sketch embedding of the
    word ``k``-gram multiset of ``col``. Empty docs embed as the zero
    vector (cosine 0 against everything)."""
    from .dedup import _shingle_hashes

    texts = batch.column(col).to_pylist()
    n = len(texts)
    doc_idx, grams = _shingle_hashes(texts, k, dedupe=False)
    # seed-salt AFTER the shared kernel so different seeds give independent
    # bucket/sign assignments over identical shingle sets
    h = splitmix64(grams ^ (np.uint64(seed) * _SEED_GOLDEN))
    bucket = (h % np.uint64(dim)).astype(np.int64)
    sign = 1.0 - 2.0 * ((h >> np.uint64(63)).astype(np.float64))
    E = np.zeros((n, dim), dtype=np.float64)
    np.add.at(E, (doc_idx, bucket), sign)
    norms = np.linalg.norm(E, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    E = (E / norms).astype(np.float32)
    # zero-copy list<float32> assembly: flat values + arithmetic offsets
    arr = pa.ListArray.from_arrays(
        pa.array(np.arange(n + 1, dtype=np.int32) * dim),
        pa.array(E.ravel()))
    return batch.append_column(out_col, arr)


def embed_documents(ds, col: str = "text", dim: int = 64, k: int = 3,
                    seed: int = 0, out_col: str = "embedding"):
    """Dataset form: append the hashed n-gram embedding column. Stateless
    vectorized task stage — no actor pool needed (no model to load)."""
    return ds.map_batches(
        lambda b: hashed_embedding_batch(b, col=col, dim=dim, k=k,
                                         seed=seed, out_col=out_col),
        batch_format="pyarrow")

"""Mergeable sketches for corpus-scale statistics.

HyperLogLog count-distinct (Flajolet et al. 2007, standard 2^p-register
construction with the HLL bias corrections): the per-batch sketch is a
register array, merge is an elementwise max — the canonical combiner shape,
so a 100 TB distinct-cardinality estimate moves only p*2^p bytes per batch
through the cluster and never shuffles rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hll_registers(values, p: int) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    for v in values:
        h = int.from_bytes(hashlib.blake2b(str(v).encode(),
                                           digest_size=8).digest(), "little")
        idx = h & (m - 1)
        w = h >> p
        # rank = position of the first 1-bit in the remaining 64-p bits
        rank = (64 - p) - w.bit_length() + 1 if w else (64 - p) + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)          # linear counting, small range
    elif est > (1 << 64) / 30.0:
        est = -(1 << 64) * np.log1p(-est / (1 << 64))
    return float(est)


def hll_count_distinct(ds, col: str, p: int = 12) -> dict:
    """Approximate COUNT(DISTINCT col) over a Dataset: one streaming pass
    emitting a 2^p-byte register sketch per batch, merged by elementwise max.
    Standard error ~= 1.04/sqrt(2^p) (~1.6% at p=12). Returns
    {'estimate': float, 'p': int}."""
    m = 1 << p

    def batch_sketch(t: pa.Table) -> pa.Table:
        regs = _hll_registers(t.column(col).to_pylist(), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(m, dtype=np.uint8)
    for b in (ds.map_batches(batch_sketch, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for buf in b.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(buf, dtype=np.uint8))
    return {"estimate": _hll_estimate(merged), "p": p}


def _cms_rows(values, counts, d: int, w: int) -> np.ndarray:
    """Count-min sketch matrix (d x w) for value:count pairs."""
    M = np.zeros((d, w), dtype=np.int64)
    for v, c in zip(values, counts):
        for r in range(d):
            h = int.from_bytes(hashlib.blake2b(f"{r}:{v}".encode(),
                                               digest_size=8).digest(), "little")
            M[r, h % w] += int(c)
    return M


def heavy_hitters(ds, col: str, k: int = 10, d: int = 4, w: int = 2048,
                  candidates_per_batch: int = 64) -> "object":
    """Approximate top-k heavy hitters (count-min sketch, Cormode &
    Muthukrishnan 2005): each batch emits a d*w count matrix plus its local
    top candidates; sketches merge by elementwise SUM (mergeable like HLL),
    and the merged sketch scores the union of candidates. Rows never shuffle
    — per batch only the sketch + <=candidates_per_batch keys move. Returns a
    pandas DataFrame (value, est_count) sorted desc, ties by value."""
    import pandas as pd

    def batch_sketch(t: pa.Table) -> pa.Table:
        vals, cnts = np.unique(np.asarray(t.column(col).to_pylist(), dtype=object),
                               return_counts=True)
        order = np.argsort(-cnts, kind="stable")[:candidates_per_batch]
        M = _cms_rows(vals, cnts, d, w)
        return pa.table({
            "cms": pa.array([M.tobytes()], pa.binary()),
            "cands": pa.array([[str(v) for v in vals[order]]],
                              pa.list_(pa.string())),
        })

    merged = np.zeros((d, w), dtype=np.int64)
    cands: set = set()
    for b in (ds.map_batches(batch_sketch, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for buf, cl in zip(b.column("cms").to_pylist(),
                           b.column("cands").to_pylist()):
            merged += np.frombuffer(buf, dtype=np.int64).reshape(d, w)
            cands.update(cl)

    rows = []
    for v in cands:
        est = min(merged[r, int.from_bytes(
            hashlib.blake2b(f"{r}:{v}".encode(), digest_size=8).digest(),
            "little") % w] for r in range(d))
        rows.append((v, int(est)))
    df = pd.DataFrame(rows, columns=["value", "est_count"])
    return (df.sort_values(["est_count", "value"], ascending=[False, True])
            .head(k).reset_index(drop=True))

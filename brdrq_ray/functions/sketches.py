"""Mergeable sketches for corpus-scale statistics.

HyperLogLog count-distinct (Flajolet et al. 2007, standard 2^p-register
construction with the HLL bias corrections): the per-batch sketch is a
register array, merge is an elementwise max — the canonical combiner shape,
so a 100 TB distinct-cardinality estimate moves only p*2^p bytes per batch
through the cluster and never shuffles rows.

Hashing is fully vectorized (see functions/vhash.py): one C-speed hash call
per batch column plus numpy scatter ops — never one hashlib call per value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .vhash import bit_length_u64, hash64, splitmix64

#: cluster-side tree-merge fan-in: per-batch sketches are coalesced into this
#: many blocks and merged inside the cluster before the driver touches them
_MERGE_FANIN = 16


def _hll_registers(values, p: int) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = hash64(values, categorize=False)  # count-distinct input: unique-heavy
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    # rank = position of the first 1-bit in the remaining 64-p bits
    rank = ((64 - p) - bit_length_u64(w) + 1).astype(np.uint8)
    # grouped max via lexsort + last-per-key (np.maximum.at's buffered-ufunc
    # path is ~20x slower)
    order = np.lexsort((rank, idx))
    idx_s, rank_s = idx[order], rank[order]
    last = np.ones(len(idx_s), dtype=bool)
    last[:-1] = idx_s[1:] != idx_s[:-1]
    regs[idx_s[last]] = rank_s[last]
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
        import pyarrow.compute as pc
        # cast to string so the vectorized hash is type-stable for any column
        vals = pc.cast(t.column(col), pa.string()).to_numpy(zero_copy_only=False)
        regs = _hll_registers(vals, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def merge_block(t: pa.Table) -> pa.Table:
        acc = np.zeros(m, dtype=np.uint8)
        for buf in t.column("regs").to_pylist():
            acc = np.maximum(acc, np.frombuffer(buf, dtype=np.uint8))
        return pa.table({"regs": pa.array([acc.tobytes()], pa.binary())})

    # tree merge: coalesce per-batch sketches into <= _MERGE_FANIN blocks and
    # max-merge INSIDE the cluster; the driver merges only the fan-in roots
    # (sketch bytes are mergeable both ways — this keeps even those off the
    # driver at billion-batch scale)
    merged = np.zeros(m, dtype=np.uint8)
    for b in (ds.map_batches(batch_sketch, batch_format="pyarrow")
              .repartition(_MERGE_FANIN)
              .map_batches(merge_block, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for buf in b.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(buf, dtype=np.uint8))
    return {"estimate": _hll_estimate(merged), "p": p}


def _cms_positions(values, d: int, w: int) -> np.ndarray:
    """(d, n) column positions for values: d independent hash families derived
    from one vectorized base hash via splitmix64 row seeds."""
    base = hash64(values)
    pos = np.empty((d, len(base)), dtype=np.int64)
    with np.errstate(over="ignore"):
        seeds = (np.arange(1, d + 1, dtype=np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15))
    for r in range(d):
        pos[r] = (splitmix64(base ^ seeds[r]) % np.uint64(w)).astype(np.int64)
    return pos


def _cms_rows(values, counts, d: int, w: int) -> np.ndarray:
    """Count-min sketch matrix (d x w) for value:count pairs."""
    M = np.zeros((d, w), dtype=np.int64)
    if len(values) == 0:
        return M
    pos = _cms_positions(values, d, w)
    # bincount-with-weights == np.add.at without the slow buffered-ufunc path
    # (counts are exact in float64 up to 2^53 per batch)
    c = np.asarray(counts, dtype=np.float64)
    for r in range(d):
        M[r] = np.bincount(pos[r], weights=c, minlength=w).astype(np.int64)
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
        import pyarrow.compute as pc
        # stringify ONCE (vectorized cast) so batch hashing and driver-side
        # candidate scoring hash identical representations
        col_s = pc.cast(t.column(col), pa.string()).to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(col_s.astype(str), return_counts=True)
        order = np.argsort(-cnts, kind="stable")[:candidates_per_batch]
        M = _cms_rows(vals, cnts, d, w)
        return pa.table({
            "cms": pa.array([M.tobytes()], pa.binary()),
            "cands": pa.array([list(vals[order])], pa.list_(pa.string())),
        })

    def merge_block(t: pa.Table) -> pa.Table:
        acc = np.zeros((d, w), dtype=np.int64)
        cset: set = set()
        for buf, cl in zip(t.column("cms").to_pylist(),
                           t.column("cands").to_pylist()):
            acc += np.frombuffer(buf, dtype=np.int64).reshape(d, w)
            cset.update(cl)
        return pa.table({
            "cms": pa.array([acc.tobytes()], pa.binary()),
            "cands": pa.array([sorted(cset)], pa.list_(pa.string())),
        })

    # tree merge (see hll_count_distinct): cluster-side sum into
    # <= _MERGE_FANIN roots, driver merges only those
    merged = np.zeros((d, w), dtype=np.int64)
    cands: set = set()
    for b in (ds.map_batches(batch_sketch, batch_format="pyarrow")
              .repartition(_MERGE_FANIN)
              .map_batches(merge_block, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for buf, cl in zip(b.column("cms").to_pylist(),
                           b.column("cands").to_pylist()):
            merged += np.frombuffer(buf, dtype=np.int64).reshape(d, w)
            cands.update(cl)

    cand_arr = np.array(sorted(cands), dtype=object)
    if len(cand_arr) == 0:
        return pd.DataFrame({"value": [], "est_count": []})
    pos = _cms_positions(cand_arr.astype(str), d, w)
    est = merged[np.arange(d)[:, None], pos].min(axis=0)
    df = pd.DataFrame({"value": cand_arr, "est_count": est.astype(np.int64)})
    return (df.sort_values(["est_count", "value"], ascending=[False, True])
            .head(k).reset_index(drop=True))


def binned_quantiles(ds, col: str, bin_width: float, qs) -> dict:
    """Mergeable fixed-width histogram sketch -> DETERMINISTIC quantiles.

    Each batch emits one (bin, count) partial per occupied bin
    (bin = floor(value / bin_width)); partials sum-merge through a tiny
    groupby (the combiner already ran per batch, so the shuffle moves
    occupied-bin rows, never data rows). The quantile answer is exact at
    bin resolution and reproducible in ANSI SQL with the same floor/ceil
    formula — unlike t-digest/KLL there is no merge-order dependence, so
    the driver correctness gate can hash-compare it against DuckDB.

    Returns {'quantiles': {q: bin_lo}, 'total': n}: for each q the LOWER
    BOUND of the smallest bin whose cumulative count reaches ceil(q * n).
    """
    import ray.data
    from ray.data.aggregate import Sum

    w = float(bin_width)

    def batch_hist(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v)]
        bins = np.floor(v / w).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(u, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    hist = (ds.map_batches(batch_hist, batch_format="pyarrow")
              .groupby("bin").aggregate(Sum("c", alias_name="csum"))
              .to_pandas())
    if "bin" not in hist.columns or not len(hist):  # empty input
        return {"quantiles": {float(q): None for q in qs}, "total": 0}
    hist = hist.sort_values("bin").reset_index(drop=True)
    return quantiles_from_hist(hist["bin"].to_numpy(),
                               hist["csum"].to_numpy(), w, qs)


def quantiles_from_hist(bins: np.ndarray, counts: np.ndarray,
                        bin_width: float, qs) -> dict:
    """The quantile formula shared by binned_quantiles and fused stat passes:
    for each q, the lower bound of the smallest bin whose cumulative count
    reaches ceil(q * n). ``bins`` must be sorted ascending."""
    total = int(counts.sum()) if len(counts) else 0
    if total == 0:
        return {"quantiles": {float(q): None for q in qs}, "total": 0}
    cum = np.cumsum(counts)
    out: dict = {}
    for q in qs:
        r = max(int(np.ceil(float(q) * total)), 1)
        idx = int(np.searchsorted(cum, r))
        out[float(q)] = float(bins[idx] * bin_width)
    return {"quantiles": out, "total": total}

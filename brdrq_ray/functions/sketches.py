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


def grouped_binned_quantiles(ds, group_col: str, col: str, bin_width: float,
                             qs) -> "object":
    """Per-group :func:`binned_quantiles`: one output row per group with the
    group's total count and one ``p{q}`` column per requested quantile.

    Scale shape: each batch pre-aggregates (group, bin) counts (the combiner
    runs before anything moves), then ONE groupby(group) shuffle co-locates a
    group's occupied-bin partials — the exchange moves histogram rows, never
    data rows, and a group's reduce input is bounded by its occupied-bin
    count, not its row count. Integer counts sum order-free, so the output
    is deterministic under any partitioning — same property that lets the
    global form be hash-compared against SQL.
    """
    import pandas as pd

    w = float(bin_width)
    q_list = [float(q) for q in qs]
    q_cols = [f"p{q:g}" for q in q_list]

    def batch_hist(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        grp = t.column(group_col)
        ok = np.isfinite(v)
        df = pd.DataFrame({
            "g": grp.to_pandas()[ok],
            "bin": np.floor(v[ok] / w).astype(np.int64),
        })
        agg = df.groupby(["g", "bin"], sort=True).size().reset_index(name="c")
        return pa.table({group_col: pa.array(agg["g"]),
                         "bin": pa.array(agg["bin"], pa.int64()),
                         "c": pa.array(agg["c"], pa.int64())})

    def per_group(gt: pa.Table) -> pa.Table:
        hist = (gt.select(["bin", "c"]).to_pandas()
                  .groupby("bin", sort=True)["c"].sum().reset_index())
        res = quantiles_from_hist(hist["bin"].to_numpy(),
                                  hist["c"].to_numpy(), w, q_list)
        cols = {group_col: gt.column(group_col).slice(0, 1),
                "total": pa.array([res["total"]], pa.int64())}
        for q, name in zip(q_list, q_cols):
            cols[name] = pa.array([res["quantiles"][q]], pa.float64())
        return pa.table(cols)

    return (ds.map_batches(batch_hist, batch_format="pyarrow")
              .groupby(group_col).map_groups(per_group, batch_format="pyarrow"))


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


# --- sharded Bloom filter (membership against a historical corpus) ----------

_BLOOM_C1 = np.uint64(0xD6E8FEB86659FD93)
_BLOOM_C2 = np.uint64(0xA5A5A5A5A5A5A5A5)
_BLOOM_PARAMS = "_bloom_params.json"


class BloomFilter:
    """Sharded Bloom filter over a key column — the exact-membership
    complement of the MinHash band index (dedup.build_minhash_index): build
    ONCE over a historical corpus, then answer "have we already ingested
    this key?" for every increment without re-scanning or joining against
    history. False positives only (rate ~``fp_rate``), never false
    negatives, so ``drop_seen`` may over-drop at the configured rate but
    can never re-admit a known duplicate.

    Keys hash by string value (cross-type stable); bit positions come from
    Kirsch-Mitzenmacher double hashing over splitmix64-derived g1/g2, so
    membership is a pure deterministic function of (key, sizing) —
    batching-, partitioning- and run-independent. A key's k bits all live
    in ONE shard (shard = hash % n_shards): the persisted form is one
    parquet row per shard, and a probe of key K touches only shard(K) — at
    10^12-key scale (where the filter itself is object-store-sized) both
    sides hash-partition by the same shard id and each probe task loads
    one shard, the same shard-selective pattern as the MinHash index.
    In-memory the shards sit in one dense (n_shards, words) uint64 matrix.
    """

    def __init__(self, words: np.ndarray, k: int, shard_bits: int,
                 capacity: int, fp_rate: float):
        self.words = words            # (n_shards, shard_bits // 64) uint64
        self.n_shards = words.shape[0]
        self.k = int(k)
        self.shard_bits = int(shard_bits)
        self.capacity = int(capacity)
        self.fp_rate = float(fp_rate)

    def _positions(self, keys):
        h = hash64(np.asarray([str(v) for v in keys], dtype=object))
        shard = (h % np.uint64(self.n_shards)).astype(np.int64)
        g1 = splitmix64(h ^ _BLOOM_C1)
        g2 = splitmix64(h ^ _BLOOM_C2) | np.uint64(1)
        return h, shard, g1, g2

    def contains(self, keys) -> np.ndarray:
        """Vectorized membership test -> bool mask (True = possibly seen)."""
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        _, shard, g1, g2 = self._positions(keys)
        seen = np.ones(n, dtype=bool)
        sb = np.uint64(self.shard_bits)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                idx = ((g1 + np.uint64(i) * g2) % sb).astype(np.int64)
                w = self.words[shard, idx >> 6]
                seen &= (w >> (idx & 63).astype(np.uint64)) & np.uint64(1) > 0
        return seen

    def to_table(self) -> pa.Table:
        """One row per shard: (shard, bits) — parquet-persistable."""
        return pa.table({
            "shard": pa.array(np.arange(self.n_shards, dtype=np.int32)),
            "bits": pa.array([self.words[s].tobytes()
                              for s in range(self.n_shards)], pa.binary()),
        })

    @classmethod
    def from_table(cls, table: pa.Table, k: int, shard_bits: int,
                   capacity: int, fp_rate: float, n_shards: int):
        words = np.zeros((n_shards, shard_bits // 64), dtype=np.uint64)
        for s, buf in zip(table.column("shard").to_pylist(),
                          table.column("bits").to_pylist()):
            words[s] = np.frombuffer(buf, dtype=np.uint64)
        return cls(words, k, shard_bits, capacity, fp_rate)


def bloom_sizing(capacity: int, fp_rate: float,
                 n_shards: int) -> tuple[int, int]:
    """(shard_bits, k) for the target capacity/fp_rate: total bits =
    ceil(-n ln p / ln^2 2) split over n_shards and rounded up to whole
    uint64 words; k = round(bits/n * ln 2)."""
    if capacity < 1:
        capacity = 1
    if not 0.0 < fp_rate < 1.0:
        raise ValueError(f"fp_rate must be in (0, 1), got {fp_rate}")
    total_bits = int(np.ceil(-capacity * np.log(fp_rate) / np.log(2) ** 2))
    shard_bits = -(-total_bits // n_shards)
    shard_bits = -(-shard_bits // 64) * 64
    k = max(1, round(shard_bits * n_shards / capacity * np.log(2)))
    return shard_bits, k


def bloom_build(ds, col: str = "doc_id", capacity: int | None = None,
                fp_rate: float = 0.01, n_shards: int = 16) -> BloomFilter:
    """Build a BloomFilter over ``ds[col]`` distributedly: each batch emits
    its DEDUPED (shard, bit) pairs (k per key), one groupby packs each
    shard's bitmap — the shuffle moves bit indices (<= k * distinct keys
    rows), never data rows, and no task ever holds more than one shard's
    bitmap. ``capacity`` defaults to ds.count() (fine when the key is
    near-unique; pass the distinct estimate — e.g. hll_count_distinct —
    when it repeats a lot, or the filter will be oversized, never wrong)."""
    import pandas as pd

    if capacity is None:
        capacity = max(int(ds.count()), 1)
    shard_bits, k = bloom_sizing(capacity, fp_rate, n_shards)

    def batch_bits(t: pa.Table) -> pa.Table:
        keys = t.column(col).to_pylist()
        if not keys:
            return pa.table({"shard": pa.array([], pa.int32()),
                             "bit": pa.array([], pa.int64())})
        h = hash64(np.asarray([str(v) for v in keys], dtype=object))
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        g1 = splitmix64(h ^ _BLOOM_C1)
        g2 = splitmix64(h ^ _BLOOM_C2) | np.uint64(1)
        sb = np.uint64(shard_bits)
        parts = []
        with np.errstate(over="ignore"):
            for i in range(k):
                idx = ((g1 + np.uint64(i) * g2) % sb).astype(np.int64)
                parts.append(shard * shard_bits + idx)
        flat = np.unique(np.concatenate(parts))
        return pa.table({
            "shard": pa.array((flat // shard_bits).astype(np.int32)),
            "bit": pa.array(flat % shard_bits, pa.int64()),
        })

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        bits = np.unique(g["bit"].to_numpy(dtype=np.int64))
        arr = np.zeros(shard_bits // 64, dtype=np.uint64)
        np.bitwise_or.at(arr, bits >> 6,
                         np.uint64(1) << (bits & 63).astype(np.uint64))
        return pd.DataFrame({"shard": [int(g["shard"].iloc[0])],
                             "bits": [arr.tobytes()]})

    packed = (ds.map_batches(batch_bits, batch_format="pyarrow")
              .groupby("shard").map_groups(pack, batch_format="pandas"))
    words = np.zeros((n_shards, shard_bits // 64), dtype=np.uint64)
    for b in packed.iter_batches(batch_format="pyarrow"):
        for s, buf in zip(b.column("shard").to_pylist(),
                          b.column("bits").to_pylist()):
            words[s] = np.frombuffer(buf, dtype=np.uint64)
    return BloomFilter(words, k, shard_bits, capacity, fp_rate)


def bloom_write(bloom: BloomFilter, path: str) -> None:
    """Persist: one parquet of (shard, bits) + a params sidecar."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    pq.write_table(bloom.to_table(), os.path.join(path, "shards.parquet"))
    with open(os.path.join(path, _BLOOM_PARAMS), "w") as f:
        json.dump({"k": bloom.k, "shard_bits": bloom.shard_bits,
                   "capacity": bloom.capacity, "fp_rate": bloom.fp_rate,
                   "n_shards": bloom.n_shards}, f)


def bloom_read(path: str) -> BloomFilter:
    import json
    import os

    import pyarrow.parquet as pq

    with open(os.path.join(path, _BLOOM_PARAMS)) as f:
        p = json.load(f)
    return BloomFilter.from_table(
        pq.read_table(os.path.join(path, "shards.parquet")), **p)


def bloom_filter_seen(ds, bloom: BloomFilter, col: str = "doc_id",
                      mode: str = "drop_seen"):
    """Apply a history BloomFilter to an increment: ``drop_seen`` keeps only
    never-seen keys (exact dedup against history, over-dropping at most at
    the fp rate), ``flag`` appends a ``seen`` bool column (audit / route).
    The filter ships ONCE via ray.put; every batch probes locally — zero
    shuffles, streams like a plain filter."""
    import ray

    if mode not in ("drop_seen", "flag"):
        raise ValueError(f"unknown mode {mode!r}")
    ref = ray.put(bloom)

    class Probe:
        def __init__(self):
            self.bloom = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            seen = self.bloom.contains(t.column(col).to_pylist())
            if mode == "flag":
                return t.append_column("seen", pa.array(seen))
            return t.filter(pa.array(~seen))

    return ds.map_batches(Probe, batch_format="pyarrow", concurrency=_pool())

def _pool():
    """Cluster-sized actor-pool bounds (see functions/pool.py)."""
    from .pool import actor_pool
    return actor_pool()

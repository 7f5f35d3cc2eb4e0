"""Deterministic sampling operators for training-data pipelines.

All three operators are RNG-free and shuffle-free: membership is a pure
function of (seed, id), so a sample is stable across runs, machines, block
orders and partitionings — the property a 100 TB curation pipeline needs
(resume a killed run, or re-run one shard, and get the same sample), and the
property that makes every operator SQL-reproducible for the driver oracle.

Hash family: the first 15 hex chars (60 bits) of ``md5(seed + "|" + id)``,
the same DuckDB-reproducible choice as ``text.hash_split_batch`` and
``fingerprint_md5`` (oracle-pinned; a faster non-cryptographic hash would
break SQL parity for a cost that is irrelevant next to I/O — ~1 µs/row).

- ``hash_sample``: global Bernoulli(p) — keep rows with hash < p·2^60.
  A pure per-row filter: no shuffle, no state, composes with any pipeline.
- ``stratified_sample``: per-stratum fractions (e.g. downsample 'train' to
  5% while keeping all of 'test') — one vectorized threshold lookup.
- ``stratified_take_k``: EXACTLY k rows per stratum = the k smallest hashes
  per stratum (a deterministic reservoir: uniform without replacement, no
  RNG). Distributed shape: per-batch partial top-k per stratum (combiner)
  -> driver fold of the bounded partials (<= blocks x strata x k rows) —
  the same partial-top-k merge shape as similarity.brute_force_topk.

Thresholds are EXACT integers: ``fraction_threshold`` computes
round(p · 2^60) once in Python and the oracle SQL interpolates that same
literal, so float-rounding differences between engines cannot flip a row.

No reference counterpart (the reference aligns features, it does not curate
corpora); part of the LLM-data-pipeline operator family (SURVEY.md §6).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

SIXTY_BITS = 1 << 60


def fraction_threshold(fraction: float) -> int:
    """round(fraction * 2^60) as an exact int — compute it ONCE and use the
    same literal on both the engine side and the SQL side."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return round(fraction * SIXTY_BITS)


def hash60(ids, seed: str = "") -> np.ndarray:
    """60-bit md5 prefix of f'{seed}|{id}' per id (int64 array). Matches
    DuckDB's CAST('0x' || substr(md5(seed || '|' || id), 1, 15) AS BIGINT)."""
    pre = f"{seed}|".encode()
    return np.fromiter(
        (int(hashlib.md5(pre + str(i).encode()).hexdigest()[:15], 16)
         for i in ids),
        dtype=np.int64, count=len(ids))


def _ids(batch: pa.Table, id_col: str) -> list:
    return batch.column(id_col).to_pylist()


def hash_sample(ds, fraction: float, id_col: str = "doc_id", seed: str = ""):
    """Deterministic Bernoulli(fraction) sample of a Dataset: keep rows with
    hash60(seed|id) < round(fraction * 2^60). Pure per-row filter."""
    thr = fraction_threshold(fraction)

    def keep(batch: pa.Table) -> pa.Table:
        mask = hash60(_ids(batch, id_col), seed) < thr
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, fractions: dict[str, float], strata_col: str,
                      id_col: str = "doc_id", seed: str = "",
                      default: float = 1.0):
    """Per-stratum Bernoulli sample: row in stratum s kept iff
    hash60(seed|id) < round(fractions.get(s, default) * 2^60)."""
    thr = {s: fraction_threshold(f) for s, f in fractions.items()}
    thr_default = fraction_threshold(default)

    def keep(batch: pa.Table) -> pa.Table:
        strata = batch.column(strata_col).to_pylist()
        limits = np.fromiter((thr.get(s, thr_default) for s in strata),
                             dtype=np.int64, count=len(strata))
        mask = hash60(_ids(batch, id_col), seed) < limits
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def mix_corpora(sources: dict[str, tuple], id_col: str = "doc_id",
                seed: str = "mix"):
    """Weighted corpus mixing for pretraining: each source contributes
    floor(w) full epochs plus a deterministic Bernoulli(frac(w)) sample as
    the final partial epoch (weight 2.3 -> 2 full copies + a 0.3 sample).
    Rows gain (source, epoch) columns; the partial epoch uses a per-epoch
    seed so repeated rows and sampled rows are reproducible independently.

    ``sources``: {name: (dataset, weight)} with weight >= 0. Returns the
    lazy union — no shuffle, no materialization; each leg is a pure per-row
    filter over its source, so the mix streams and scales like its inputs.
    Downstream training order is the consumer's concern (a global
    random_shuffle, or Ray's iter over randomized blocks)."""
    legs = []
    for name, (ds, weight) in sources.items():
        if weight < 0:
            raise ValueError(f"weight for {name!r} must be >= 0, got {weight}")
        full, frac = int(weight), weight - int(weight)
        for ep in range(full):
            legs.append(_tag(ds, name, ep))
        if frac > 0:
            part = hash_sample(ds, frac, id_col=id_col,
                               seed=f"{seed}|{name}|ep{full}")
            legs.append(_tag(part, name, full))
    if not legs:
        raise ValueError("mix_corpora needs at least one source with weight > 0")
    out = legs[0]
    for leg in legs[1:]:
        out = out.union(leg)
    return out


def _tag(ds, source: str, epoch: int):
    def add(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return (batch.append_column("source", pa.array([source] * n))
                     .append_column("epoch", pa.array([epoch] * n, pa.int32())))
    return ds.map_batches(add, batch_format="pyarrow")


def stratified_take_k(ds, k: int, strata_col: str, id_col: str = "doc_id",
                      seed: str = "") -> pa.Table:
    """Exactly min(k, stratum size) rows per stratum: the k smallest
    (hash60, id) per stratum — a deterministic reservoir sample (uniform
    without replacement; ties broken by id so the result is total-ordered).

    Returns a SMALL Arrow table (strata x k rows) of
    (strata, id, sample_hash60) — the selection set, meant to be broadcast
    back into a membership flag or semi-join. Never materializes the input:
    each batch contributes at most strata x k rows to the driver fold."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "strata": batch.column(strata_col).to_pylist(),
            "id": [str(v) for v in _ids(batch, id_col)],
        })
        df["sample_hash60"] = hash60(df["id"], seed)
        df = (df.sort_values(["strata", "sample_hash60", "id"],
                             kind="mergesort")
                .groupby("strata", sort=False).head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table({"strata": pa.array([], pa.string()),
                         "id": pa.array([], pa.string()),
                         "sample_hash60": pa.array([], pa.int64())})
    df = pd.DataFrame(parts)
    df = (df.sort_values(["strata", "sample_hash60", "id"], kind="mergesort")
            .groupby("strata", sort=False).head(k).reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)

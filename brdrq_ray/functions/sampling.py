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


def shuffle_by_hash(ds, id_col: str = "doc_id", seed: str = "epoch0",
                    keep_key: bool = False):
    """Deterministic global shuffle: rows ordered by ascending
    (hash60(seed|id), id). Unlike ``Dataset.random_shuffle`` the permutation
    is a pure function of (seed, id) — re-running a killed epoch, or
    re-materializing one output shard, reproduces the identical training
    order, and each epoch seed ("epoch0", "epoch1", ...) yields an
    independent permutation. Cost: one range-partitioned sample sort (Ray's
    distributed sort) — the same single all-to-all any true global shuffle
    pays; there is no cheaper exact shape. ``keep_key=True`` retains the
    ``shuffle_key`` column (useful to re-sort after a downstream union)."""

    def add_key(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "shuffle_key", pa.array(hash60(_ids(batch, id_col), seed)))

    out = ds.map_batches(add_key, batch_format="pyarrow").sort(
        ["shuffle_key", id_col])
    if keep_key:
        return out
    return out.map_batches(lambda t: t.drop_columns(["shuffle_key"]),
                           batch_format="pyarrow")


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


def token_budget_cut(ds, budget: int, score_col: str = "quality_score",
                     token_col: str = "ws_tokens", id_col: str = "doc_id",
                     seed: str = "budget", n_bins: int = 4096,
                     score_range: tuple = (0.0, 1.0),
                     driver_limit: int = 262_144, max_depth: int = 4):
    """Find the global token-budget boundary: the maximal prefix of the
    corpus sorted by (score DESC, hash60(seed, id) ASC, id ASC) whose token
    sum stays <= ``budget``. Returns ``(full_cut, boundary_ids)`` — a row is
    selected iff ``score >= full_cut`` OR its id is in ``boundary_ids``.

    No global sort: a token-weighted score histogram (one streaming
    combiner pass, n_bins rows to the driver) finds the boundary bin; bins
    above it are selected wholesale, and the boundary bin is REFINED
    recursively (histogram again over just that bin's score range) until it
    holds <= ``driver_limit`` docs, which are then cut exactly driver-side.
    Each refinement pass streams the corpus with a cheap range filter, so
    at 100 TB the op is max_depth column-pruned scans + one tiny driver
    sort — never an all-to-all exchange. Deterministic: RNG-free, batching-
    and partitioning-independent (the hash tie-break is a pure function of
    the id)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    lo, hi = float(score_range[0]), float(score_range[1])
    if not lo < hi:
        raise ValueError(f"empty score_range {score_range}")
    remaining = int(budget)
    # fully-selected region grows downward from `hi`; docs with
    # score >= full_cut are in wholesale
    full_cut = hi + 1.0  # nothing selected yet

    cur_lo, cur_hi = lo, hi
    boundary_ids: np.ndarray | None = None

    for depth in range(max_depth):
        width = (cur_hi - cur_lo) / n_bins
        # the very top of the full range is inclusive (s == hi is a real
        # score); refined ranges exclude their top edge — those docs belong
        # to the wholesale region already
        inclusive = depth == 0

        def hist(batch: pa.Table, _lo=cur_lo, _hi=cur_hi, _w=width,
                 _inc=inclusive) -> pa.Table:
            s = batch.column(score_col).to_numpy(zero_copy_only=False)
            t = batch.column(token_col).to_numpy(zero_copy_only=False)
            m = (s >= _lo) & ((s <= _hi) if _inc else (s < _hi))
            if not m.any():
                return pa.table({"bin": pa.array([], pa.int32()),
                                 "tok": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            b = np.minimum(((s[m] - _lo) / _w).astype(np.int64), n_bins - 1)
            tok = np.bincount(b, weights=t[m].astype(np.float64),
                              minlength=n_bins).astype(np.int64)
            cnt = np.bincount(b, minlength=n_bins)
            nz = np.nonzero(cnt)[0]
            return pa.table({"bin": pa.array(nz.astype(np.int32), pa.int32()),
                             "tok": pa.array(tok[nz], pa.int64()),
                             "n": pa.array(cnt[nz].astype(np.int64), pa.int64())})

        h = (ds.map_batches(hist, batch_format="pyarrow")
             .groupby("bin").aggregate(Sum("tok", alias_name="tok"),
                                       Sum("n", alias_name="n"))
             .to_pandas().sort_values("bin", ascending=False))
        if h.empty:
            boundary_ids = np.empty(0, dtype=object)
            break
        cum = h["tok"].cumsum()
        fits = cum <= remaining
        take_whole = h[fits]
        if fits.all():
            # everything in range fits: select the whole candidate region
            full_cut = cur_lo
            boundary_ids = np.empty(0, dtype=object)
            break
        boundary_row = h[~fits].iloc[0]
        if len(take_whole):
            # bins strictly above the boundary bin are selected wholesale
            top_edge = cur_lo + float(boundary_row["bin"] + 1) * width
            full_cut = min(full_cut, top_edge)
            remaining -= int(take_whole["tok"].sum())
        b_lo = cur_lo + float(boundary_row["bin"]) * width
        b_hi = cur_lo + float(boundary_row["bin"] + 1) * width
        if int(boundary_row["n"]) <= driver_limit or depth == max_depth - 1:
            # boundary bin small enough (or depth exhausted): cut it exactly.
            # Membership uses the SAME discretization as the histogram, so
            # float edge cases land in the same bin in both passes.
            def in_bin(batch: pa.Table, _lo=cur_lo, _hi=cur_hi, _w=width,
                       _inc=inclusive, _b=int(boundary_row["bin"])) -> pa.Table:
                s = batch.column(score_col).to_numpy(zero_copy_only=False)
                m = (s >= _lo) & ((s <= _hi) if _inc else (s < _hi))
                b = np.minimum(((s - _lo) / _w).astype(np.int64), n_bins - 1)
                m &= b == _b
                return batch.select([id_col, score_col, token_col]).filter(
                    pa.array(m))

            rows = ds.map_batches(in_bin, batch_format="pyarrow").take_all()
            df = pd.DataFrame(rows)
            if df.empty:
                boundary_ids = np.empty(0, dtype=object)
                break
            df["h"] = hash60([str(v) for v in df[id_col]], seed)
            df = df.sort_values([score_col, "h", id_col],
                                ascending=[False, True, True],
                                kind="mergesort")
            sel = df[df[token_col].cumsum() <= remaining]
            boundary_ids = sel[id_col].to_numpy()
            break
        cur_lo, cur_hi = b_lo, b_hi

    if boundary_ids is None:
        boundary_ids = np.empty(0, dtype=object)
    return full_cut, boundary_ids


def _budget_membership(batch: pa.Table, cut: float, bids, score_col: str,
                       id_col: str) -> np.ndarray:
    import pandas as pd

    s = batch.column(score_col).to_numpy(zero_copy_only=False)
    keep = s >= cut
    if len(bids):
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keep = keep | pd.Series(ids).isin(bids).to_numpy()
    return keep


def _pinned_budget_cut(ds, budget: int, score_col: str, token_col: str,
                       id_col: str, seed: str, **kwargs):
    """Shared shape of every budget-boundary consumer: pin the 3-scalar
    -column projection (the boundary search makes up to max_depth+1 passes —
    they must not re-scan the full corpus width or re-run upstream actors),
    run token_budget_cut over it, ship the boundary-id set once. Returns
    (cut, boundary_ids object ref)."""
    import ray

    proj = ds.select_columns([id_col, score_col, token_col]).materialize()
    cut, boundary_ids = token_budget_cut(
        proj, budget, score_col=score_col, token_col=token_col,
        id_col=id_col, seed=seed, **kwargs)
    return cut, ray.put(boundary_ids)


def _membership_stage(cut: float, bid_ref, score_col: str, id_col: str,
                      flag_col: str | None = None,
                      drop_cols: list | None = None):
    """Actor-stage factory over _budget_membership: filter rows (default),
    or append ``flag_col`` instead; ``drop_cols`` are removed after the
    filter (the dsir caller drops its scratch key columns)."""
    import ray

    class Membership:
        def __init__(self):
            self.bids = ray.get(bid_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = _budget_membership(batch, cut, self.bids, score_col,
                                      id_col)
            if flag_col is not None:
                return batch.append_column(flag_col, pa.array(keep))
            out = batch.filter(pa.array(keep))
            return out.drop_columns(drop_cols) if drop_cols else out

    return Membership


def select_token_budget(ds, budget: int, score_col: str = "quality_score",
                        token_col: str = "ws_tokens", id_col: str = "doc_id",
                        seed: str = "budget", **kwargs):
    """Select the highest-scoring documents until a global TOKEN budget —
    exactly the maximal prefix of the corpus sorted by (score DESC,
    hash60(seed, id) ASC, id ASC) whose token sum stays <= ``budget`` — the
    "best docs that fit the training budget" cut of a curation run. See
    ``token_budget_cut`` for the distributed shape (recursive histogram
    refinement — never a global sort).

    Returns the filtered Dataset (selection only, original columns)."""
    cut, bid_ref = _pinned_budget_cut(ds, budget, score_col, token_col,
                                      id_col, seed, **kwargs)
    return ds.map_batches(_membership_stage(cut, bid_ref, score_col, id_col),
                          batch_format="pyarrow", concurrency=_pool())


def flag_token_budget(ds, budget: int, score_col: str = "quality_score",
                      token_col: str = "ws_tokens", id_col: str = "doc_id",
                      seed: str = "budget", flag_col: str = "in_budget",
                      **kwargs):
    """Same selection as ``select_token_budget`` but appends a boolean
    ``flag_col`` instead of filtering — the audit/composite form (all rows
    kept, membership marked)."""
    cut, bid_ref = _pinned_budget_cut(ds, budget, score_col, token_col,
                                      id_col, seed, **kwargs)
    return ds.map_batches(_membership_stage(cut, bid_ref, score_col, id_col,
                                            flag_col=flag_col),
                          batch_format="pyarrow", concurrency=_pool())


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------
# Select raw-corpus documents that look like a TARGET corpus: score each doc
# with the hashed-n-gram bag likelihood ratio log p_target(doc)/p_raw(doc)
# (features = the same hashed uni/bigram buckets as text.train_ngram_lm, both
# models add-1 smoothed), then sample WITHOUT replacement proportionally to
# the softmax of those weights via deterministic Gumbel-top-k: the Gumbel
# noise is derived from hash60(seed|id), so the selection is a pure function
# of (corpus, seed) — partitioning-invariant and resume-stable like every
# sampler in this module. Top-k runs on the token_budget_cut histogram
# machinery (budget = k unit tokens) — no global sort.


def dsir_log_weights(ds, target_lm: dict, raw_lm: dict, col: str = "text",
                     weight_col: str = "dsir_logw"):
    """Append the DSIR importance weight: sum over the doc's hashed uni- and
    bigram occurrences of log p_target(feature) - log p_raw(feature), add-1
    smoothed within each feature family. The per-bucket log-ratio arrays are
    computed ONCE per actor from the two broadcast models; the per-batch work
    is the shared gram kernel + two fancy-index bincount reductions."""
    import ray

    if target_lm["n_buckets"] != raw_lm["n_buckets"]:
        raise ValueError("target and raw models must share n_buckets")
    tref, rref = ray.put(target_lm), ray.put(raw_lm)

    class Weigh:
        def __init__(self):
            t, r = ray.get(tref), ray.get(rref)
            nb = t["n_buckets"]
            self.nb = nb

            def logp(cnt: np.ndarray, total: int) -> np.ndarray:
                return np.log(cnt + 1.0) - np.log(float(total + nb))

            self.lr_uni = (logp(t["uni"], t["total"])
                           - logp(r["uni"], r["total"]))
            self.lr_bi = (logp(t["bi"], int(t["bi"].sum()))
                          - logp(r["bi"], int(r["bi"].sum())))

        def __call__(self, batch: pa.Table) -> pa.Table:
            from .text import _lm_gram_buckets

            texts = batch.column(col).to_pylist()
            doc_idx, uni_b, bi_b, lens = _lm_gram_buckets(texts, self.nb)
            n = batch.num_rows
            w = np.zeros(n, dtype=np.float64)
            if len(uni_b):
                w += np.bincount(doc_idx, weights=self.lr_uni[uni_b],
                                 minlength=n)
            if len(bi_b):
                bi_doc = np.repeat(np.arange(n), np.maximum(lens - 1, 0))
                w += np.bincount(bi_doc, weights=self.lr_bi[bi_b],
                                 minlength=n)
            return batch.append_column(weight_col, pa.array(w, pa.float64()))

    return ds.map_batches(Weigh, batch_format="pyarrow", concurrency=_pool())


def gumbel_keys(ids, logw: np.ndarray, seed: str) -> np.ndarray:
    """Deterministic Gumbel-top-k keys: logw + G(hash60-uniform). Exposed so
    the brute-force oracle and the distributed path share one formula."""
    u = (hash60(ids, seed).astype(np.float64) + 0.5) / SIXTY_BITS
    return logw - np.log(-np.log(u))


def dsir_resample(ds, target_lm: dict, raw_lm: dict, k: int | None = None,
                  fraction: float | None = None, col: str = "text",
                  id_col: str = "doc_id", seed: str = "dsir",
                  weight_col: str = "dsir_logw", **budget_kwargs):
    """DSIR selection: keep exactly min(k, n) docs, sampled without
    replacement with probability proportional to exp(importance weight) —
    the Gumbel-top-k construction, RNG-free via hash60(seed|id) uniforms.

    Distributed shape: weights + keys are computed in ONE full-corpus pass
    whose (id, key) projection — two scalar columns — is pinned; the key
    range (min/max aggregate) and the exact top-k boundary
    (token_budget_cut's recursive histogram, unit token weights, budget = k)
    then iterate over that tiny projection, never re-reading the text or
    re-running the weight actors. One final full pass recomputes the weight
    (deterministic) to attach ``weight_col`` and apply the membership filter
    — streaming scans only, never a global sort. Hand in a checkpointed/
    materialized Dataset when the upstream is expensive (the two full passes
    re-execute any lazy upstream, same contract as select_token_budget)."""
    import ray
    from ray.data.aggregate import Max, Min

    if (k is None) == (fraction is None):
        raise ValueError("pass exactly one of k / fraction")
    key_col = "__dsir_key"

    def add_key(batch: pa.Table) -> pa.Table:
        w = batch.column(weight_col).to_numpy(zero_copy_only=False)
        keys = gumbel_keys(batch.column(id_col).to_pylist(), w, seed)
        return (batch.append_column(key_col, pa.array(keys, pa.float64()))
                     .append_column("__one", pa.array(
                         np.ones(batch.num_rows, np.int64))))

    keyed = (dsir_log_weights(ds, target_lm, raw_lm, col=col,
                              weight_col=weight_col)
             .map_batches(add_key, batch_format="pyarrow"))
    # pin the 3-scalar-column projection ONCE: everything the boundary
    # search needs, at a fraction of the corpus width (the fraction-mode
    # count rides along for free instead of being its own pass)
    proj = keyed.select_columns([id_col, key_col, "__one"]).materialize()
    if fraction is not None:
        k = round(fraction * proj.count())
    rng = proj.aggregate(Min(key_col, alias_name="lo"),
                         Max(key_col, alias_name="hi"))
    lo, hi = float(rng["lo"]), float(rng["hi"])
    if not lo < hi:
        hi = lo + 1.0
    cut, boundary_ids = token_budget_cut(
        proj, int(k), score_col=key_col, token_col="__one", id_col=id_col,
        seed=seed, score_range=(lo, hi), **budget_kwargs)
    bid_ref = ray.put(boundary_ids)
    return keyed.map_batches(
        _membership_stage(cut, bid_ref, key_col, id_col,
                          drop_cols=[key_col, "__one"]),
        batch_format="pyarrow", concurrency=_pool())

# ---------------------------------------------------------------------------
# UniMax — domain-balanced token-budget selection (Chung et al. 2023)
# ---------------------------------------------------------------------------
# Allocate a global token budget across domains (the `source` column) with
# the UniMax waterfill — every domain gets an equal share of the remaining
# budget unless its cap (max_epochs x its token count) is smaller — then
# select each domain's allocation deterministically: within a domain, rows
# are taken in (hash60(seed|id) ASC, id ASC) order until the domain budget is
# exhausted (a uniform without-replacement draw, RNG-free, SQL-reproducible).
# The boundary search generalizes token_budget_cut: all domains refine their
# integer-hash-range histograms in the SAME streaming passes, so the whole
# selection costs max_depth column-pruned scans regardless of domain count —
# never a sort, never an all-to-all of data rows.


def domain_token_counts(ds, domain_col: str = "source",
                        token_col: str = "ws_tokens") -> dict:
    """Exact per-domain token totals: per-batch groupby-sum partials (one
    tiny (domain, tok) table per batch) folded driver-side. Rows shipped to
    the driver = blocks x distinct domains — never the corpus."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "d": batch.column(domain_col).to_pylist(),
            "t": batch.column(token_col).to_numpy(zero_copy_only=False)})
        g = df.groupby("d", sort=False)["t"].sum().reset_index()
        return pa.table({"d": pa.array(g["d"].tolist()),
                         "t": pa.array(g["t"].astype("int64"), pa.int64())})

    out: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        out[r["d"]] = out.get(r["d"], 0) + int(r["t"])
    return out


def unimax_budgets(token_counts: dict, total_budget: int,
                   max_epochs: float = 1.0) -> dict:
    """The UniMax waterfill (Chung et al. 2023): visit domains by
    (cap ASC, name ASC) with cap_d = floor(max_epochs x tokens_d); each
    domain receives b_d = min(cap_d, remaining // domains_left). Integer
    floor division throughout so the DuckDB recursive-CTE oracle reproduces
    the allocation bit-for-bit."""
    caps = {d: int(max_epochs * int(c)) for d, c in token_counts.items()}
    remaining = int(total_budget)
    m = len(caps)
    out = {}
    for d in sorted(caps, key=lambda d: (caps[d], str(d))):
        b = max(0, min(caps[d], remaining // m))
        out[d] = b
        remaining -= b
        m -= 1
    return out


def domain_budget_cuts(ds, budgets: dict, domain_col: str = "source",
                       token_col: str = "ws_tokens", id_col: str = "doc_id",
                       seed: str = "unimax", n_bins: int = 4096,
                       driver_limit: int = 262_144, max_depth: int = 4):
    """Per-domain exact token-budget boundary in deterministic hash order:
    within each domain, rows sorted by (hash60(seed|id) ASC, id ASC) are
    selected while the running token sum stays <= budgets[domain]. Returns
    ``(cuts, boundary_ids)`` — a row in domain d is selected iff
    ``hash60 < cuts[d]`` OR its id is in ``boundary_ids`` (ids are unique
    corpus-wide, so one flat set serves every domain).

    Distributed shape: every still-active domain refines its integer hash
    range in the SAME pass — one histogram map_batches + a packed
    (domain x bin)-key groupby-sum whose result is tiny — then narrows
    independently; domains whose boundary bin is driver-sized finalize with
    ONE shared filtered fetch per depth. Histogram bins live in exact
    integer hash space (no float edges), so membership is bit-stable."""
    import pandas as pd
    from ray.data.aggregate import Sum

    doms = list(budgets)
    idx = {d: i for i, d in enumerate(doms)}
    lo = {d: 0 for d in doms}
    hi = {d: SIXTY_BITS for d in doms}
    remaining = {d: int(budgets[d]) for d in doms}
    cuts = {d: 0 for d in doms}
    done = {d: remaining[d] <= 0 for d in doms}
    boundary: list = []

    for depth in range(max_depth):
        active = {d: (lo[d], hi[d]) for d in doms if not done[d]}
        if not active:
            break
        # ceil width so n_bins bins always cover the range
        ranges = {d: (l, h, max(1, -(-(h - l) // n_bins)))
                  for d, (l, h) in active.items()}

        def hist(batch: pa.Table, _r=ranges) -> pa.Table:
            ids = _ids(batch, id_col)
            h = hash60(ids, seed)
            t = (batch.column(token_col)
                 .to_numpy(zero_copy_only=False).astype(np.int64))
            dom = np.asarray(batch.column(domain_col).to_pylist(),
                             dtype=object)
            ks, toks, ns = [], [], []
            for d, (l, top, w) in _r.items():
                m = (dom == d) & (h >= l) & (h < top)
                if not m.any():
                    continue
                b = np.minimum((h[m] - l) // w, n_bins - 1)
                tok = np.bincount(b, weights=t[m].astype(np.float64),
                                  minlength=n_bins).astype(np.int64)
                cnt = np.bincount(b, minlength=n_bins)
                nz = np.nonzero(cnt)[0]
                ks.append((nz + idx[d] * n_bins).astype(np.int64))
                toks.append(tok[nz])
                ns.append(cnt[nz].astype(np.int64))
            if not ks:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "tok": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            return pa.table({"k": pa.array(np.concatenate(ks)),
                             "tok": pa.array(np.concatenate(toks)),
                             "n": pa.array(np.concatenate(ns))})

        hdf = (ds.map_batches(hist, batch_format="pyarrow")
               .groupby("k").aggregate(Sum("tok", alias_name="tok"),
                                       Sum("n", alias_name="n"))
               .to_pandas())
        finalize: dict = {}
        for d in list(active):
            l, top = active[d]
            w = ranges[d][2]
            di = idx[d]
            sub = hdf[(hdf["k"] >= di * n_bins)
                      & (hdf["k"] < (di + 1) * n_bins)].sort_values("k")
            if sub.empty:
                done[d] = True  # no rows left in range: selection complete
                continue
            cum = sub["tok"].cumsum()
            fits = cum <= remaining[d]
            if fits.all():
                cuts[d] = top  # the whole remaining range fits wholesale
                done[d] = True
                continue
            brow = sub[~fits].iloc[0]
            bin_id = int(brow["k"]) - di * n_bins
            fitted = sub[fits]
            cuts[d] = l + bin_id * w
            if len(fitted):
                remaining[d] -= int(fitted["tok"].sum())
            b_lo, b_hi = cuts[d], min(top, cuts[d] + w)
            if (int(brow["n"]) <= driver_limit or depth == max_depth - 1
                    or w == 1):
                finalize[d] = (b_lo, b_hi)
                done[d] = True
            else:
                lo[d], hi[d] = b_lo, b_hi

        if finalize:
            def in_bins(batch: pa.Table, _f=dict(finalize)) -> pa.Table:
                h = hash60(_ids(batch, id_col), seed)
                dom = np.asarray(batch.column(domain_col).to_pylist(),
                                 dtype=object)
                keep = np.zeros(batch.num_rows, bool)
                for d, (bl, bh) in _f.items():
                    keep |= (dom == d) & (h >= bl) & (h < bh)
                return batch.select([id_col, domain_col, token_col]).filter(
                    pa.array(keep))

            rows = ds.map_batches(in_bins, batch_format="pyarrow").take_all()
            df = pd.DataFrame(rows)
            if not df.empty:
                df["h"] = hash60(df[id_col].tolist(), seed)
                for d in finalize:
                    sub = df[df[domain_col] == d].sort_values(
                        ["h", id_col], kind="mergesort")
                    sel = sub[sub[token_col].cumsum() <= remaining[d]]
                    boundary.extend(sel[id_col].tolist())

    return cuts, np.asarray(boundary, dtype=object)


def _domain_membership_stage(cuts: dict, bid_ref, domain_col: str,
                             id_col: str, seed: str,
                             flag_col: str | None = None):
    """Actor-stage factory: per-row ``hash60 < cuts[domain]`` (exact int64
    compare — float64 would lose bits at 2^60) OR boundary-set membership;
    filter by default, append ``flag_col`` instead when given."""
    import pandas as pd

    import ray

    class Membership:
        def __init__(self):
            self.bids = ray.get(bid_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = _ids(batch, id_col)
            h = hash60(ids, seed)
            # vectorized cuts lookup: dictionary-encode the domain column
            # (one C++ pass), map the FEW distinct values through the dict,
            # fancy-index the codes — no per-row Python .get
            denc = pc.dictionary_encode(
                batch.column(domain_col).combine_chunks())
            per_val = np.fromiter(
                (cuts.get(v, 0) for v in denc.dictionary.to_pylist()),
                dtype=np.int64, count=len(denc.dictionary))
            if len(per_val) == 0:
                # all-null domain column: empty dictionary — every row gets
                # cut 0 (the old per-row .get(None, 0) behavior)
                cut = np.zeros(batch.num_rows, np.int64)
            else:
                codes = denc.indices.fill_null(-1).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                cut = np.where(codes >= 0, per_val[np.maximum(codes, 0)], 0)
            keep = h < cut
            if len(self.bids):
                keep = keep | pd.Series(ids).isin(self.bids).to_numpy()
            if flag_col is not None:
                return batch.append_column(flag_col, pa.array(keep))
            return batch.filter(pa.array(keep))

    return Membership


def _unimax_cuts(ds, total_budget: int, max_epochs: float, domain_col: str,
                 token_col: str, id_col: str, seed: str, **kwargs):
    """Shared UniMax shape: pin the 3-column projection once (the count pass
    + up to max_depth+1 boundary passes must not re-scan the corpus width or
    re-run upstream actors), waterfill, cut; ship the boundary ids once."""
    import ray

    proj = ds.select_columns([id_col, domain_col, token_col]).materialize()
    budgets = unimax_budgets(
        domain_token_counts(proj, domain_col, token_col),
        total_budget, max_epochs)
    cuts, boundary_ids = domain_budget_cuts(
        proj, budgets, domain_col=domain_col, token_col=token_col,
        id_col=id_col, seed=seed, **kwargs)
    return cuts, ray.put(boundary_ids), budgets


def unimax_select(ds, total_budget: int, max_epochs: float = 1.0,
                  domain_col: str = "source", token_col: str = "ws_tokens",
                  id_col: str = "doc_id", seed: str = "unimax", **kwargs):
    """Domain-balanced token-budget selection: UniMax waterfill over the
    per-domain token totals, then each domain keeps its allocation's worth
    of documents in deterministic hash order. Returns the filtered Dataset
    (original columns)."""
    cuts, bid_ref, _ = _unimax_cuts(ds, total_budget, max_epochs, domain_col,
                                    token_col, id_col, seed, **kwargs)
    return ds.map_batches(
        _domain_membership_stage(cuts, bid_ref, domain_col, id_col, seed),
        batch_format="pyarrow", concurrency=_pool())


def flag_unimax(ds, total_budget: int, max_epochs: float = 1.0,
                domain_col: str = "source", token_col: str = "ws_tokens",
                id_col: str = "doc_id", seed: str = "unimax",
                flag_col: str = "in_unimax", **kwargs):
    """Same selection as ``unimax_select`` but appends a boolean
    ``flag_col`` instead of filtering — the audit/composite form."""
    cuts, bid_ref, _ = _unimax_cuts(ds, total_budget, max_epochs, domain_col,
                                    token_col, id_col, seed, **kwargs)
    return ds.map_batches(
        _domain_membership_stage(cuts, bid_ref, domain_col, id_col, seed,
                                 flag_col=flag_col),
        batch_format="pyarrow", concurrency=_pool())


def select_domain_budgets(ds, budgets: dict, domain_col: str = "source",
                          token_col: str = "ws_tokens",
                          id_col: str = "doc_id", seed: str = "unimax",
                          flag_col: str | None = None, **kwargs):
    """Explicit per-domain token budgets (skip the waterfill — e.g. mixture
    weights from a config): each domain keeps its budget's worth of rows in
    deterministic hash order. Domains absent from ``budgets`` are dropped.
    ``flag_col`` switches to the audit form."""
    import ray

    proj = ds.select_columns([id_col, domain_col, token_col]).materialize()
    cuts, boundary_ids = domain_budget_cuts(
        proj, budgets, domain_col=domain_col, token_col=token_col,
        id_col=id_col, seed=seed, **kwargs)
    return ds.map_batches(
        _domain_membership_stage(cuts, ray.put(boundary_ids), domain_col,
                                 id_col, seed, flag_col=flag_col),
        batch_format="pyarrow", concurrency=_pool())


def temperature_budgets(token_counts: dict, alpha: float, total_budget: int,
                        max_epochs: float | None = 1.0) -> dict:
    """Temperature-based domain reweighting (the multilingual-sampling rule
    of mT5/Gopher/PaLM: sample domain d with p_d proportional to
    tokens_d^alpha). alpha=1 keeps natural proportions; alpha=0 is uniform;
    in between boosts small domains without drowning large ones.

    Returns integer per-domain token budgets summing to <= total_budget:
    allocation proportional to tokens^alpha, capped at
    floor(max_epochs x tokens_d) (no domain repeats data beyond max_epochs;
    None disables the cap), overflow redistributed among uncapped domains by
    the same alpha weights until stable (<= n_domains rounds). Deterministic
    — pure integer/float math on the (tiny) domain-count dict; feed the
    result to :func:`select_domain_budgets` for the actual corpus cut."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    toks = {d: int(c) for d, c in token_counts.items() if int(c) > 0}
    caps = {d: (int(max_epochs * toks[d]) if max_epochs is not None
                else int(total_budget)) for d in toks}
    w = {d: float(toks[d]) ** alpha for d in toks}
    budgets = {d: 0 for d in toks}
    remaining = int(total_budget)
    active = sorted(toks, key=str)
    while remaining > 0 and active:
        wsum = sum(w[d] for d in active)
        if wsum <= 0:
            break
        capped = []
        allocated = 0
        for d in active:
            share = int(remaining * w[d] / wsum)
            room = caps[d] - budgets[d]
            take = min(share, room)
            budgets[d] += take
            allocated += take
            if budgets[d] >= caps[d]:
                capped.append(d)
        remaining -= allocated
        if capped:
            active = [d for d in active if d not in capped]
        elif allocated == 0:
            # integer floors stalled: hand the tail out one token at a time
            # by descending weight (ties by name) until it is gone
            for d in sorted(active, key=lambda d: (-w[d], str(d))):
                if remaining <= 0:
                    break
                give = min(remaining, caps[d] - budgets[d])
                budgets[d] += give
                remaining -= give
            break
    return budgets


def temperature_select(ds, alpha: float, total_budget: int,
                       max_epochs: float | None = 1.0,
                       domain_col: str = "source",
                       token_col: str = "ws_tokens",
                       id_col: str = "doc_id", seed: str = "temp",
                       flag_col: str | None = None, **kwargs):
    """Temperature-balanced token-budget selection: per-domain budgets from
    :func:`temperature_budgets` over the exact domain token totals, then
    each domain keeps its allocation's worth of documents in deterministic
    hash order (the same histogram-refinement machinery as UniMax — never a
    global sort). ``flag_col`` switches to the audit form."""
    counts = domain_token_counts(ds, domain_col=domain_col,
                                 token_col=token_col)
    budgets = temperature_budgets(counts, alpha, total_budget,
                                  max_epochs=max_epochs)
    return select_domain_budgets(ds, budgets, domain_col=domain_col,
                                 token_col=token_col, id_col=id_col,
                                 seed=seed, flag_col=flag_col, **kwargs)


def _pool():
    """Cluster-sized actor-pool bounds (see functions/pool.py)."""
    from .pool import actor_pool
    return actor_pool()

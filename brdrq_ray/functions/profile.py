"""Dataset profiling — a distributed ``describe`` for 100 TB tables.

Before any curation decision (filter thresholds, dedup keys, domain
weights) someone has to LOOK at the table: row/null counts, cardinality,
ranges, length distributions, percentiles. At fixture scale that's one
``to_pandas().describe()``; at 100 TB it must be a streaming sketch pass —
so this module composes the engine's mergeable-sketch machinery into:

- **pass 1 (always, ONE fused scan)**: per batch, ONE partial row per
  column carrying count/nulls, numeric min/max/sum/sumsq, string length
  min/max/sum, and an HLL register sketch (functions/sketches.py) — all
  columns in the same pass, so the input is read once however wide the
  profile. Partials tree-merge in-cluster (``repartition(fanin)`` +
  fold, the hll_count_distinct shape); the driver folds only the fan-in
  roots.
- **pass 2 (opt-in, ``quantiles=``)**: deterministic binned-quantile
  histograms for every numeric column IN ONE fused scan — per batch one
  (column, bin, count) partial per occupied bin, one tiny
  groupby(column, bin) of histogram rows (never data rows), bin width
  derived from pass 1's min/max. Same floor/ceil formula as the
  driver-gated global sketch (sketches.quantiles_from_hist).

Sums of floats fold in partial order, so mean/std are reproducible only
to the usual accumulation ulp — this is a diagnostic surface, and
min/max/counts/quantiles (the decision inputs) are exact / deterministic.

No reference counterpart (SURVEY.md §6 training-data family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import (_MERGE_FANIN, _hll_estimate, _hll_registers,
                       quantiles_from_hist)

_QS = (0.5, 0.9, 0.99)


def _classify(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return "numeric"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return "other"


def _batch_partials(batch: pa.Table, cols, kinds, hll_p: int) -> pa.Table:
    out = {k: [] for k in ("column", "n", "nulls", "vmin", "vmax", "vsum",
                           "vsumsq", "lmin", "lmax", "lsum", "regs")}
    for name in cols:
        arr = batch.column(name)
        kind = kinds[name]
        n = len(arr)
        nulls = arr.null_count
        vmin = vmax = vsum = vsumsq = None
        lmin = lmax = lsum = None
        regs = b""
        if kind == "numeric":
            v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[np.isfinite(v)]
            if len(v):
                vmin, vmax = float(v.min()), float(v.max())
                vsum, vsumsq = float(v.sum()), float((v * v).sum())
        if kind in ("string", "binary"):
            ln = pc.binary_length(arr)
            if n - nulls:
                lmin = pc.min(ln).as_py()
                lmax = pc.max(ln).as_py()
                lsum = pc.sum(ln).as_py()
        if kind in ("numeric", "string"):
            s = pc.cast(arr.drop_null(), pa.string())
            vals = s.to_numpy(zero_copy_only=False)
            regs = _hll_registers(vals, hll_p).tobytes()
        out["column"].append(name)
        out["n"].append(n)
        out["nulls"].append(nulls)
        out["vmin"].append(vmin)
        out["vmax"].append(vmax)
        out["vsum"].append(vsum)
        out["vsumsq"].append(vsumsq)
        out["lmin"].append(lmin)
        out["lmax"].append(lmax)
        out["lsum"].append(lsum)
        out["regs"].append(regs)
    return pa.table({
        "column": pa.array(out["column"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "nulls": pa.array(out["nulls"], pa.int64()),
        "vmin": pa.array(out["vmin"], pa.float64()),
        "vmax": pa.array(out["vmax"], pa.float64()),
        "vsum": pa.array(out["vsum"], pa.float64()),
        "vsumsq": pa.array(out["vsumsq"], pa.float64()),
        "lmin": pa.array(out["lmin"], pa.int64()),
        "lmax": pa.array(out["lmax"], pa.int64()),
        "lsum": pa.array(out["lsum"], pa.int64()),
        "regs": pa.array(out["regs"], pa.binary()),
    })


def _merge_partials(t: pa.Table) -> pa.Table:
    """Fold partial rows per column (associative merges only)."""
    import pandas as pd

    df = t.to_pandas()

    def fold(g: pd.DataFrame) -> pd.Series:
        regs = None
        for buf in g["regs"]:
            if len(buf):
                r = np.frombuffer(buf, dtype=np.uint8)
                regs = r.copy() if regs is None else np.maximum(regs, r)
        return pd.Series({
            "n": g["n"].sum(), "nulls": g["nulls"].sum(),
            "vmin": g["vmin"].min(), "vmax": g["vmax"].max(),
            "vsum": g["vsum"].sum(min_count=1),
            "vsumsq": g["vsumsq"].sum(min_count=1),
            "lmin": g["lmin"].min(), "lmax": g["lmax"].max(),
            "lsum": g["lsum"].sum(min_count=1),
            "regs": b"" if regs is None else regs.tobytes(),
        })

    out = df.groupby("column", sort=True).apply(fold, include_groups=False)
    return pa.Table.from_pandas(out.reset_index(), preserve_index=False)


def profile_dataset(ds, columns: list[str] | None = None,
                    hll_p: int = 12, quantiles: bool = False,
                    qs=_QS, quantile_bins: int = 1024) -> pa.Table:
    """Profile ``ds``: one row per column with
    ``(column, dtype, kind, rows, nulls, approx_distinct, min, max, mean,
    std, len_min, len_max, len_mean[, q...])``. See the module docstring
    for the pass structure. Returns a small Arrow table (column-count
    rows), sorted by column name."""
    schema = ds.schema()
    names = list(schema.names)
    if columns is not None:
        missing = [c for c in columns if c not in names]
        if missing:
            raise ValueError(f"unknown columns: {missing}")
        names = [c for c in names if c in set(columns)]
    types = {n: t for n, t in zip(schema.names, schema.types)}
    kinds = {n: _classify(types[n]) for n in names}

    partials = (ds.map_batches(
                    lambda b: _batch_partials(b, names, kinds, hll_p),
                    batch_format="pyarrow")
                .repartition(_MERGE_FANIN)
                .map_batches(_merge_partials, batch_format="pyarrow"))
    merged = _merge_partials(
        pa.Table.from_pandas(partials.to_pandas(), preserve_index=False))
    df = merged.to_pandas().set_index("column")

    rows = {}
    for name in names:
        r = df.loc[name]
        kind = kinds[name]
        n, nulls = int(r["n"]), int(r["nulls"])
        valid = n - nulls
        regs = np.frombuffer(r["regs"], dtype=np.uint8) if len(r["regs"]) \
            else None
        distinct = (min(float(_hll_estimate(regs)), float(valid))
                    if regs is not None and valid else
                    (0.0 if kind in ("numeric", "string") else None))
        mean = std = None
        if kind == "numeric" and r["vsum"] == r["vsum"] and valid:
            # finite-value count is not tracked separately from nulls;
            # mean/std are over finite values, denominator approximated by
            # valid (exact when no NaN/inf slipped past the null mask)
            mean = float(r["vsum"]) / valid
            var = max(float(r["vsumsq"]) / valid - mean * mean, 0.0)
            std = float(np.sqrt(var))
        rows[name] = {
            "column": name, "dtype": str(types[name]), "kind": kind,
            "rows": n, "nulls": nulls, "approx_distinct": distinct,
            "min": None if r["vmin"] != r["vmin"] else float(r["vmin"]),
            "max": None if r["vmax"] != r["vmax"] else float(r["vmax"]),
            "mean": mean, "std": std,
            "len_min": None if r["lmin"] != r["lmin"] else int(r["lmin"]),
            "len_max": None if r["lmax"] != r["lmax"] else int(r["lmax"]),
            "len_mean": (float(r["lsum"]) / valid
                         if r["lsum"] == r["lsum"] and valid else None),
        }

    if quantiles:
        num_cols = [n for n in names if kinds[n] == "numeric"
                    and rows[n]["min"] is not None]
        widths = {}
        for n in num_cols:
            span = rows[n]["max"] - rows[n]["min"]
            widths[n] = (span / quantile_bins) if span > 0 else 1.0
        if num_cols:
            hists = _fused_histograms(ds, num_cols, widths)
            for n in num_cols:
                bins, counts = hists.get(n, (np.array([]), np.array([])))
                qr = quantiles_from_hist(bins, counts, widths[n], qs)
                for q in qs:
                    rows[n][f"p{int(float(q) * 100)}"] = \
                        qr["quantiles"][float(q)]
        for n in names:
            for q in qs:
                rows[n].setdefault(f"p{int(float(q) * 100)}", None)

    import pandas as pd
    return pa.Table.from_pandas(
        pd.DataFrame([rows[n] for n in sorted(names)]),
        preserve_index=False)


def _fused_histograms(ds, num_cols, widths) -> dict:
    """ONE scan emitting (column, bin, count) partials for every numeric
    column; one histogram-row groupby-sum. Returns
    {column: (sorted bins, counts)}."""
    from ray.data.aggregate import Sum

    def batch_hist(t: pa.Table) -> pa.Table:
        cols, bins, counts = [], [], []
        for name in num_cols:
            v = t.column(name).to_numpy(zero_copy_only=False).astype(
                np.float64)
            v = v[np.isfinite(v)]
            if not len(v):
                continue
            b = np.floor(v / widths[name]).astype(np.int64)
            u, c = np.unique(b, return_counts=True)
            cols.extend([name] * len(u))
            bins.extend(u.tolist())
            counts.extend(c.tolist())
        return pa.table({"column": pa.array(cols, pa.string()),
                         "bin": pa.array(bins, pa.int64()),
                         "c": pa.array(counts, pa.int64())})

    hist = (ds.map_batches(batch_hist, batch_format="pyarrow")
            .groupby(["column", "bin"])
            .aggregate(Sum("c", alias_name="csum"))
            .to_pandas())
    out = {}
    if not len(hist):
        return out
    for name, g in hist.groupby("column"):
        g = g.sort_values("bin")
        out[name] = (g["bin"].to_numpy(), g["csum"].to_numpy())
    return out

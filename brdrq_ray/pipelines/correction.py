"""Correction-layer build: source features joined with alignment results and
classified into BrdrQState.

Reference: ``generate_correction_layer`` (plugin/brdrq/brdrq_utils.py:
1210-1365) — builds theme_id -> (geometry, metrics, evaluation, metadata) maps
from the result layer, walks the source layer and joins by id, with:

* duplicate join keys (multiple predictions for one id) -> at least TO_REVIEW
  (brdrq_utils.py:1251-1254);
* a per-result elif chain (brdrq_utils.py:1259-1291): evaluation no_change ->
  NOT_CHANGED; equality evaluations -> bypass (AUTO_UPDATED); empty result
  geometry or stability == False -> TO_UPDATE; change % > review threshold ->
  TO_REVIEW; absolute SYMMETRICAL_AREA_CHANGE < 0.01 m2 -> NOT_CHANGED;
  otherwise AUTO_UPDATED;
* a final override cascade (brdrq_utils.py:1332-1347) with priority
  TO_UPDATE > TO_REVIEW > NOT_CHANGED > AUTO_UPDATED > NONE; TO_UPDATE keeps
  the original geometry and reports diff values of -1; every other state with
  a result adopts the result geometry.

Deliberate deviation (SEMANTICS.md): where the reference reports the LAST
result-layer occurrence's attributes/geometry for a duplicated key (QGIS
iteration order), this engine reports the BEST prediction (max score, ties to
the smaller relevant distance) — deterministic under distributed execution.

Ray-Data-first: Ray Data has no native keyed join, so the correction join is
the tagged-union-groupby pattern (SURVEY.md J3) — but grouped by a HASH BUCKET
of theme_id, not by theme_id itself: millions of features would otherwise mean
millions of per-group Python calls each building a 1-row Arrow table. Within a
bucket the join and state classification are vectorized pandas/numpy over the
whole bucket at once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# BrdrQState enum (reference: plugin/brdrq/brdrq_utils.py:199-209)
ST_NOT_CHANGED = "not_changed"
ST_AUTO_UPDATED = "auto_updated"
ST_MANUAL_UPDATED = "manual_updated"
ST_TO_REVIEW = "to_review"
ST_TO_UPDATE = "to_update"
ST_NONE = "none"

#: evaluations that bypass the chain straight to AUTO_UPDATED (reference
#: brdrq_utils.py:1266-1271)
EQUALITY_EVALS = ("equality_by_id", "equality_by_full_reference",
                  "equality_by_id_and_full_reference")

#: absolute symmetric-difference area below which a feature is NOT_CHANGED
#: (reference SYMMETRICAL_AREA_CHANGE threshold, brdrq_utils.py:1290: 0.01 m2)
NO_CHANGE_AREA_M2 = 0.01

CORRECTION_SCHEMA = pa.schema([
    ("theme_id", pa.string()),
    ("geometry_wkt", pa.string()),
    ("brdrq_state", pa.string()),
    ("brdrq_original_wkt", pa.string()),
    ("brdr_evaluation", pa.string()),
    ("brdr_relevant_distance", pa.float64()),
    ("brdr_prediction_score", pa.float64()),
    ("brdr_sym_diff_area_index", pa.float64()),
    ("brdr_sym_diff_area_index_perc", pa.float64()),
    ("brdr_metadata", pa.string()),
    ("props", pa.string()),
])


def _correct_bucket(group: pd.DataFrame, review_percentage: float) -> pa.Table:
    """One hash bucket of (source + result) rows: vectorized join on theme_id
    and state classification for EVERY feature in the bucket at once."""
    src = group[group["side"] == "source"]
    res = group[group["side"] == "result"]
    if len(src) == 0:
        return CORRECTION_SCHEMA.empty_table()

    if len(res):
        n_res = res.groupby("theme_id").size()
        # per-result-row chain classification (reference elif chain over the
        # whole results layer, brdrq_utils.py:1259-1291) — over ALL result
        # rows, not just the best: a duplicated key's other predictions still
        # contribute list membership in the reference.
        ev = res["brdr_evaluation"].fillna("not_evaluated").to_numpy(dtype=object)
        stab = res["brdr_stability"].where(res["brdr_stability"].notna(),
                                           False).to_numpy(dtype=bool)
        wkts = res["result_wkt"].fillna("")
        is_empty = ((wkts.str.len() == 0) | wkts.str.endswith("EMPTY")).to_numpy()
        perc_r = res["brdr_sym_diff_area_index_perc"].fillna(0.0).to_numpy(dtype=np.float64)
        abs_r = res["brdr_sym_diff_area_index"].fillna(0.0).to_numpy(dtype=np.float64)
        cls = np.select(
            [ev == "no_change",
             np.isin(ev, EQUALITY_EVALS),
             is_empty,
             ~stab,
             perc_r > review_percentage,
             abs_r < NO_CHANGE_AREA_M2],
            ["nc", "ok", "al", "al", "rv", "nc"],
            default="ok")
        flags = (pd.DataFrame({"theme_id": res["theme_id"].to_numpy(),
                               "al": cls == "al", "rv": cls == "rv",
                               "nc": cls == "nc"})
                 .groupby("theme_id").any())
        # best result per theme: max score, ties to the SMALLER relevant
        # distance (deterministic stand-in for the reference's last-occurrence)
        best = (res.sort_values(["theme_id", "brdr_prediction_score",
                                 "brdr_relevant_distance"],
                                ascending=[True, False, True])
                .groupby("theme_id", as_index=False).head(1))
    else:
        n_res = pd.Series(dtype=np.int64)
        flags = pd.DataFrame(columns=["al", "rv", "nc"])
        best = res
    m = src[["theme_id", "geometry_wkt", "props"]].merge(
        best[["theme_id", "result_wkt", "brdr_evaluation",
              "brdr_relevant_distance", "brdr_prediction_score",
              "brdr_sym_diff_area_index", "brdr_sym_diff_area_index_perc",
              "brdr_stability", "brdr_metadata"]],
        on="theme_id", how="left")
    nres = m["theme_id"].map(n_res).fillna(0).to_numpy(dtype=np.int64)
    has = nres >= 1
    multi = nres > 1

    def _flag(col: str) -> np.ndarray:
        if len(flags) == 0:
            return np.zeros(len(m), dtype=bool)
        # .eq(True): map over a bool dict yields object dtype with NaN; a
        # plain fillna(False) trips the pandas downcasting FutureWarning
        return m["theme_id"].map(flags[col]).eq(True).to_numpy(dtype=bool)

    al, rv, nc = _flag("al"), _flag("rv"), _flag("nc")

    # final override cascade (brdrq_utils.py:1332-1347): TO_UPDATE beats
    # TO_REVIEW beats NOT_CHANGED beats AUTO_UPDATED; a duplicated key is
    # always at least TO_REVIEW (brdrq_utils.py:1251-1254)
    state = np.select(
        [has & al, has & (rv | multi), has & nc, has],
        [ST_TO_UPDATE, ST_TO_REVIEW, ST_NOT_CHANGED, ST_AUTO_UPDATED],
        default=ST_NONE)
    to_update = state == ST_TO_UPDATE

    orig = m["geometry_wkt"].to_numpy(dtype=object)
    result_wkt = m["result_wkt"].to_numpy(dtype=object)
    # every state with a result adopts the result geometry EXCEPT TO_UPDATE
    # (reference: geometry_changes is set for any id not in ids_to_align,
    # brdrq_utils.py:1337-1339)
    geometry = np.where(has & ~al, result_wkt, orig)

    sym_abs = m["brdr_sym_diff_area_index"].fillna(0.0).to_numpy(dtype=np.float64)
    sym_perc = m["brdr_sym_diff_area_index_perc"].fillna(0.0).to_numpy(dtype=np.float64)
    evaluation = m["brdr_evaluation"].fillna("not_evaluated").to_numpy(dtype=object)

    return pa.table({
        "theme_id": pa.array(m["theme_id"].astype(str), pa.string()),
        "geometry_wkt": pa.array(geometry, pa.string()),
        "brdrq_state": pa.array(state.astype(object), pa.string()),
        "brdrq_original_wkt": pa.array(orig, pa.string()),
        "brdr_evaluation": pa.array(np.where(has, evaluation, "not_evaluated"),
                                    pa.string()),
        "brdr_relevant_distance": pa.array(
            np.where(has, m["brdr_relevant_distance"].fillna(0.0), 0.0),
            pa.float64()),
        "brdr_prediction_score": pa.array(
            np.where(has, m["brdr_prediction_score"].fillna(0.0), 0.0),
            pa.float64()),
        # TO_UPDATE reports -1 diff values (reference brdrq_utils.py:1345-1347)
        "brdr_sym_diff_area_index": pa.array(
            np.where(to_update, -1.0, np.where(has, sym_abs, 0.0)), pa.float64()),
        "brdr_sym_diff_area_index_perc": pa.array(
            np.where(to_update, -1.0, np.where(has, sym_perc, 0.0)), pa.float64()),
        "brdr_metadata": pa.array(
            np.where(has, m["brdr_metadata"].fillna(""), ""), pa.string()),
        "props": pa.array(m["props"].fillna("").astype(str), pa.string()),
    }, schema=CORRECTION_SCHEMA)


def _buckets_for(source: ray.data.Dataset, requested: int | None) -> int:
    """Scale-aware bucket count: ~2048 features per bucket, at least 64
    buckets (parallelism floor), derived from a cheap metadata count when the
    caller does not pin it."""
    if requested is not None:
        return requested
    try:
        n = source.count()
    except Exception:
        n = None
    if not n:
        return 64
    return max(64, int(np.ceil(n / 2048)))


def build_correction_layer(source: ray.data.Dataset, results: ray.data.Dataset,
                           review_percentage: float = 10.0,
                           n_buckets: int | None = None) -> ray.data.Dataset:
    """source: the original thematic table (theme_id, geometry_wkt, props?);
    results: the flat alignment result table. One output row per source row."""
    n_buckets = _buckets_for(source, n_buckets)

    from ..functions.vhash import bucket_i32

    def bucket_col(ids) -> pa.Array:
        return bucket_i32(ids, n_buckets)

    def src_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tid = batch.column("theme_id").cast(pa.string())
        return pa.table({
            "side": pa.array(["source"] * n),
            "bucket": bucket_col(tid),
            "theme_id": tid,
            "geometry_wkt": batch.column("geometry_wkt"),
            "props": (batch.column("props").cast(pa.string()) if "props" in batch.column_names
                      else pa.nulls(n, pa.string())),
            "result_wkt": pa.nulls(n, pa.string()),
            "brdr_evaluation": pa.nulls(n, pa.string()),
            "brdr_relevant_distance": pa.nulls(n, pa.float64()),
            "brdr_prediction_score": pa.nulls(n, pa.float64()),
            "brdr_sym_diff_area_index": pa.nulls(n, pa.float64()),
            "brdr_sym_diff_area_index_perc": pa.nulls(n, pa.float64()),
            "brdr_stability": pa.nulls(n, pa.bool_()),
            "brdr_metadata": pa.nulls(n, pa.string()),
        })

    def res_side(batch: pa.Table) -> pa.Table:
        from ..geom import core as g
        n = batch.num_rows
        tid = batch.column("theme_id").cast(pa.string())
        # batch unpack + batch WKT emission (one coord array, chunked
        # printf, one zero-strip pass per chunk)
        wkts = g.flat_wkts(g.unpack_geoms_flat(batch.column("result_geom")))
        return pa.table({
            "side": pa.array(["result"] * n),
            "bucket": bucket_col(tid),
            "theme_id": tid,
            "geometry_wkt": pa.nulls(n, pa.string()),
            "props": pa.nulls(n, pa.string()),
            "result_wkt": pa.array(wkts, pa.string()),
            "brdr_evaluation": batch.column("brdr_evaluation"),
            "brdr_relevant_distance": batch.column("brdr_relevant_distance"),
            "brdr_prediction_score": batch.column("brdr_prediction_score"),
            "brdr_sym_diff_area_index": batch.column("brdr_sym_diff_area_index"),
            "brdr_sym_diff_area_index_perc": batch.column("brdr_sym_diff_area_index_perc"),
            "brdr_stability": batch.column("brdr_stability"),
            "brdr_metadata": batch.column("brdr_metadata"),
        })

    tagged = (source.map_batches(src_side, batch_format="pyarrow")
              .union(results.map_batches(res_side, batch_format="pyarrow")))

    def correct(group: pd.DataFrame) -> pa.Table:
        return _correct_bucket(group, review_percentage)

    return tagged.groupby("bucket").map_groups(correct, batch_format="pandas")

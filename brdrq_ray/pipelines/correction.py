"""Correction-layer build: source features joined with alignment results and
classified into BrdrQState.

Reference: ``generate_correction_layer`` (plugin/brdrq/brdrq_utils.py:
1210-1365) — builds theme_id -> (geometry, metrics, evaluation, metadata) maps
from the result layer, walks the source layer and joins by id, with:

* duplicate join keys (multiple predictions for one id) -> state TO_REVIEW
  (brdrq_utils.py:1251-1254);
* evaluation in {equality_by_id, equality_by_full_reference} -> auto update
  (brdrq_utils.py:1264-1271);
* change % > review threshold -> TO_REVIEW, then absolute
  SYMMETRICAL_AREA_CHANGE < 0.01 m2 -> NOT_CHANGED (brdrq_utils.py:1288-1291
  — the review check runs first, and the no-change test is the ABSOLUTE
  symmetric-difference area, not a percentage).

Ray-Data-first: Ray Data has no native keyed join, so the correction join is
the tagged-union-groupby pattern (SURVEY.md J3) — but grouped by a HASH BUCKET
of theme_id, not by theme_id itself: millions of features would otherwise mean
millions of per-group Python calls each building a 1-row Arrow table. Within a
bucket the join and state classification are vectorized pandas/numpy over the
whole bucket at once.
"""

from __future__ import annotations

import zlib

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

AUTO_EVALS = {"equality_by_id", "equality_by_full_reference", "no_change"}

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

    n_res = res.groupby("theme_id").size() if len(res) else pd.Series(dtype=np.int64)
    # best result per theme: max score, ties to the SMALLER relevant distance
    if len(res):
        best = (res.sort_values(["theme_id", "brdr_prediction_score",
                                 "brdr_relevant_distance"],
                                ascending=[True, False, True])
                .groupby("theme_id", as_index=False).head(1))
    else:
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
    single = nres == 1

    sym_abs = m["brdr_sym_diff_area_index"].fillna(0.0).to_numpy(dtype=np.float64)
    sym_perc = m["brdr_sym_diff_area_index_perc"].fillna(0.0).to_numpy(dtype=np.float64)
    stability = m["brdr_stability"].where(m["brdr_stability"].notna(),
                                          False).to_numpy(dtype=bool)
    evaluation = m["brdr_evaluation"].fillna("not_evaluated").to_numpy(dtype=object)
    auto_ok = np.isin(evaluation, list(AUTO_EVALS)) | stability

    # reference order (brdrq_utils.py:1288-1291): review-percentage first,
    # then the ABSOLUTE no-change area, then the auto-update gate
    state = np.select(
        [multi,
         single & (sym_perc > review_percentage),
         single & (sym_abs < NO_CHANGE_AREA_M2),
         single & auto_ok,
         single],
        [ST_TO_REVIEW, ST_TO_REVIEW, ST_NOT_CHANGED, ST_AUTO_UPDATED,
         ST_TO_REVIEW],
        default=ST_NONE)

    orig = m["geometry_wkt"].to_numpy(dtype=object)
    result_wkt = m["result_wkt"].to_numpy(dtype=object)
    # multi-prediction keeps the ORIGINAL geometry (TO_REVIEW, reference
    # brdrq_utils.py:1251-1254); a single prediction adopts the result
    geometry = np.where(single, result_wkt, orig)

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
        "brdr_sym_diff_area_index": pa.array(np.where(single, sym_abs, 0.0),
                                             pa.float64()),
        "brdr_sym_diff_area_index_perc": pa.array(np.where(single, sym_perc, 0.0),
                                                  pa.float64()),
        "brdr_metadata": pa.array(
            np.where(single, m["brdr_metadata"].fillna(""), ""), pa.string()),
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

    def bucket_col(ids) -> pa.Array:
        return pa.array([zlib.crc32(str(t).encode()) % n_buckets for t in ids],
                        pa.int32())

    def src_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tid = batch.column("theme_id").cast(pa.string())
        return pa.table({
            "side": pa.array(["source"] * n),
            "bucket": bucket_col(tid.to_pylist()),
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
        wkts = [g.to_wkt(*g.unpack_geom(buf)) for buf in batch.column("result_geom").to_pylist()]
        return pa.table({
            "side": pa.array(["result"] * n),
            "bucket": bucket_col(tid.to_pylist()),
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

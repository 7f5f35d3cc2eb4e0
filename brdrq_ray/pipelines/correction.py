"""Correction-layer build: source features joined with alignment results and
classified into BrdrQState.

Reference: ``generate_correction_layer`` (plugin/brdrq/brdrq_utils.py:
1210-1365) — builds theme_id -> (geometry, metrics, evaluation, metadata) maps
from the result layer, walks the source layer and joins by id, with:

* duplicate join keys (multiple predictions for one id) -> state TO_REVIEW
  (brdrq_utils.py:1251-1254);
* evaluation in {equality_by_id, equality_by_full_reference} -> auto update
  (brdrq_utils.py:1264-1271);
* symmetric-area-change < 0.01 -> NOT_CHANGED, change % > review threshold ->
  TO_REVIEW (brdrq_utils.py:1288-1291).

Ray-Data-first: Ray Data has no native keyed join, so the correction join is
the tagged-union-groupby pattern — source rows and result rows tagged with a
``side`` column, one ``groupby(theme_id).map_groups`` emits the corrected row
(SURVEY.md J3). The result side carries only the columns the correction needs.
"""

from __future__ import annotations

import numpy as np
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

CORRECTION_SCHEMA = pa.schema([
    ("theme_id", pa.string()),
    ("geometry_wkt", pa.string()),
    ("brdrq_state", pa.string()),
    ("brdrq_original_wkt", pa.string()),
    ("brdr_evaluation", pa.string()),
    ("brdr_relevant_distance", pa.float64()),
    ("brdr_prediction_score", pa.float64()),
    ("brdr_sym_diff_area_index_perc", pa.float64()),
    ("brdr_metadata", pa.string()),
    ("props", pa.string()),
])


def _correct_group(group: pa.Table, review_percentage: float) -> pa.Table:
    side = np.asarray(group.column("side").to_pylist())
    src = np.nonzero(side == "source")[0]
    res = np.nonzero(side == "result")[0]
    if len(src) == 0:
        return CORRECTION_SCHEMA.empty_table()
    s = {c: group.column(c)[int(src[0])].as_py() for c in group.column_names}
    out = {
        "theme_id": s["theme_id"],
        "geometry_wkt": s["geometry_wkt"],
        "brdrq_state": ST_NONE,
        "brdrq_original_wkt": s["geometry_wkt"],
        "brdr_evaluation": "not_evaluated",
        "brdr_relevant_distance": 0.0,
        "brdr_prediction_score": 0.0,
        "brdr_sym_diff_area_index_perc": 0.0,
        "brdr_metadata": "",
        "props": s.get("props") or "",
    }
    if len(res) == 1:
        r = {c: group.column(c)[int(res[0])].as_py() for c in group.column_names}
        sym_perc = r["brdr_sym_diff_area_index_perc"] or 0.0
        out.update({
            "geometry_wkt": r["result_wkt"],
            "brdr_evaluation": r["brdr_evaluation"],
            "brdr_relevant_distance": r["brdr_relevant_distance"],
            "brdr_prediction_score": r["brdr_prediction_score"],
            "brdr_sym_diff_area_index_perc": sym_perc,
            "brdr_metadata": r["brdr_metadata"] or "",
        })
        if sym_perc < 0.01:
            out["brdrq_state"] = ST_NOT_CHANGED
        elif sym_perc > review_percentage:
            out["brdrq_state"] = ST_TO_REVIEW
        elif r["brdr_evaluation"] in AUTO_EVALS or r["brdr_stability"]:
            out["brdrq_state"] = ST_AUTO_UPDATED
        else:
            out["brdrq_state"] = ST_TO_REVIEW
    elif len(res) > 1:
        # multiple predictions for one id -> keep original geometry, TO_REVIEW
        out["brdrq_state"] = ST_TO_REVIEW
        best = max(res.tolist(),
                   key=lambda i: (group.column("brdr_prediction_score")[i].as_py() or 0.0,
                                  -(group.column("brdr_relevant_distance")[i].as_py() or 0.0)))
        out["brdr_evaluation"] = group.column("brdr_evaluation")[best].as_py()
        out["brdr_relevant_distance"] = group.column("brdr_relevant_distance")[best].as_py()
        out["brdr_prediction_score"] = group.column("brdr_prediction_score")[best].as_py()
    return pa.table({k: pa.array([v], CORRECTION_SCHEMA.field(k).type) for k, v in out.items()},
                    schema=CORRECTION_SCHEMA)


def build_correction_layer(source: ray.data.Dataset, results: ray.data.Dataset,
                           review_percentage: float = 10.0) -> ray.data.Dataset:
    """source: the original thematic table (theme_id, geometry_wkt, props?);
    results: the flat alignment result table. One output row per source row."""

    def src_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "side": pa.array(["source"] * n),
            "theme_id": batch.column("theme_id").cast(pa.string()),
            "geometry_wkt": batch.column("geometry_wkt"),
            "props": (batch.column("props").cast(pa.string()) if "props" in batch.column_names
                      else pa.nulls(n, pa.string())),
            "result_wkt": pa.nulls(n, pa.string()),
            "brdr_evaluation": pa.nulls(n, pa.string()),
            "brdr_relevant_distance": pa.nulls(n, pa.float64()),
            "brdr_prediction_score": pa.nulls(n, pa.float64()),
            "brdr_sym_diff_area_index_perc": pa.nulls(n, pa.float64()),
            "brdr_stability": pa.nulls(n, pa.bool_()),
            "brdr_metadata": pa.nulls(n, pa.string()),
        })

    def res_side(batch: pa.Table) -> pa.Table:
        from ..geom import core as g
        n = batch.num_rows
        wkts = [g.to_wkt(*g.unpack_geom(buf)) for buf in batch.column("result_geom").to_pylist()]
        return pa.table({
            "side": pa.array(["result"] * n),
            "theme_id": batch.column("theme_id"),
            "geometry_wkt": pa.nulls(n, pa.string()),
            "props": pa.nulls(n, pa.string()),
            "result_wkt": pa.array(wkts, pa.string()),
            "brdr_evaluation": batch.column("brdr_evaluation"),
            "brdr_relevant_distance": batch.column("brdr_relevant_distance"),
            "brdr_prediction_score": batch.column("brdr_prediction_score"),
            "brdr_sym_diff_area_index_perc": batch.column("brdr_sym_diff_area_index_perc"),
            "brdr_stability": batch.column("brdr_stability"),
            "brdr_metadata": batch.column("brdr_metadata"),
        })

    tagged = (source.map_batches(src_side, batch_format="pyarrow")
              .union(results.map_batches(res_side, batch_format="pyarrow")))

    def correct(group: pa.Table) -> pa.Table:
        return _correct_group(group, review_percentage)

    return tagged.groupby("theme_id").map_groups(correct, batch_format="pyarrow")

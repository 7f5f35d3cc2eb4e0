"""Ingest stages: WKT -> packed geometry + bbox + metrics, as
``map_batches``-compatible Arrow batch transforms.

Covers the reference's per-feature preprocessing chain — fixgeometries /
make_valid (plugin/brdrq/brdrq_utils.py:1536-1547), dropmzvalues (:1556-1568,
Z/M dropped in the WKT parser), multi-promotion (featurecollection_to_multi,
:935-961) and the original-geometry resolver (get_original_geometry,
:1165-1175) — in one vectorizable pass.  Geometry is parsed ONCE at ingest into
the engine's packed binary (Arrow ``binary`` column ``geom``) and WKT is only
re-emitted at the sinks (SURVEY.md section 1.4 / M4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import core as g


GEOM_COLS = ["geom", "geom_kind", "xmin", "ymin", "xmax", "ymax",
             "brdr_area", "brdr_perimeter", "brdr_shape_index"]


def parse_geometries(batch: pa.Table, wkt_col: str = "geometry_wkt",
                     prefer_original: bool = True, drop_wkt: bool = True) -> pa.Table:
    """Parse + normalize a WKT column into packed geometry and metric columns.

    When ``prefer_original`` and a non-null ``brdrq_original_wkt`` column is
    present, it wins over the current geometry (idempotent re-runs; reference:
    get_original_geometry, plugin/brdrq/brdrq_utils.py:1165-1175).
    """
    if wkt_col not in batch.column_names and \
            {"geom", "xmin", "ymin", "xmax", "ymax"} <= set(batch.column_names):
        # already-parsed input (e.g. rows read back from a persisted spatial
        # index): packed geometry AND the bbox columns the join planners
        # need are all present, nothing to do — lets the join family accept
        # parsed datasets without a WKT round-trip. A missing wkt_col
        # WITHOUT the full parsed shape still fails loudly below (a stray
        # 'geom' column must not silently skip parsing).
        return batch
    n = batch.num_rows
    wkts = batch.column(wkt_col).to_pylist()
    if prefer_original and "brdrq_original_wkt" in batch.column_names:
        orig = batch.column("brdrq_original_wkt").to_pylist()
        wkts = [o if o else w for o, w in zip(orig, wkts)]

    geom = np.empty(n, dtype=object)
    kind_a = np.zeros(n, dtype=np.int8)
    bbox = np.full((n, 4), np.nan)
    area = np.zeros(n)
    perim = np.zeros(n)
    for i, w in enumerate(wkts):
        if not w:
            kind, parts = g.GEOM_POLYGON, []
        else:
            kind, parts = g.parse_wkt(w)
            kind, parts = g.make_valid(kind, parts)
        geom[i] = g.pack_geom(kind, parts)
        kind_a[i] = kind
        bbox[i] = g.geom_bbox(parts)
        area[i] = g.geom_area(kind, parts)
        perim[i] = g.geom_perimeter(kind, parts)

    shape_idx = np.where(area > 0, perim / np.where(area > 0, area, 1.0), 0.0)
    out = batch
    if drop_wkt:
        out = out.drop_columns([wkt_col])
    cols = {
        "geom": pa.array(list(geom), pa.binary()),
        "geom_kind": pa.array(kind_a, pa.int8()),
        "xmin": pa.array(bbox[:, 0]), "ymin": pa.array(bbox[:, 1]),
        "xmax": pa.array(bbox[:, 2]), "ymax": pa.array(bbox[:, 3]),
        "brdr_area": pa.array(area), "brdr_perimeter": pa.array(perim),
        "brdr_shape_index": pa.array(shape_idx),
    }
    for name, arr in cols.items():
        out = out.append_column(name, arr)
    return out


def emit_wkt(batch: pa.Table, geom_col: str = "geom", out_col: str = "geometry_wkt",
             drop_geom: bool = False) -> pa.Table:
    """Inverse of parse_geometries for sinks: packed geometry -> canonical WKT.

    Batch unpack (one pass, one concatenated coordinate array, zero-copy
    views of the Arrow binary buffer) + per-ring formatting."""
    wkts = g.flat_wkts(g.unpack_geoms_flat(batch.column(geom_col)))
    out = batch.append_column(out_col, pa.array(wkts, pa.string()))
    if drop_geom:
        out = out.drop_columns([geom_col])
    return out

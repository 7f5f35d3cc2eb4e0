"""Raster <-> vector conversion on the engine's tile grid (a north-rule
component: 'H3/S2 index, point-in-polygon, kNN, raster<->vector').

* rasterize: polygon -> the set of level-L cells whose CENTER lies inside
  (the standard center-sample rasterization rule) — one (id, cell) row per
  occupied cell, computed per batch with the vectorized cover + PIP kernels.
* vectorize: (id, cell) rows -> one dissolved multipolygon per id (cell
  squares share edges exactly, so the tessellation dissolve is exact).

Roundtrip error is bounded by (perimeter * cell_size) — tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .. import tiles
from ..geom import core as g
from ..geom.boolean import dissolve


def rasterize_batch(batch: pa.Table, level: int, id_col: str = "theme_id",
                    geom_col: str = "geom") -> pa.Table:
    """Parsed geometry batch -> (id, cell) occupancy rows."""
    ids_out, cells_out = [], []
    cs = tiles.cell_size(level)
    for i in range(batch.num_rows):
        buf = batch.column(geom_col)[i].as_py()
        kind, parts = g.unpack_geom(buf)
        if kind != g.GEOM_POLYGON or not parts:
            continue
        xmin, ymin, xmax, ymax = g.geom_bbox(parts)
        cover = tiles.cover_bbox(xmin, ymin, xmax, ymax, level)
        lv, cx, cy = tiles.cell_xy(cover)
        centers = np.column_stack([
            tiles.WORLD_ORIGIN[0] + (cx + 0.5) * cs,
            tiles.WORLD_ORIGIN[1] + (cy + 0.5) * cs,
        ])
        inside = g.points_in_polygon(centers, parts)
        occ = cover[inside]
        ids_out.extend([batch.column(id_col)[i].as_py()] * len(occ))
        cells_out.extend(occ.tolist())
    return pa.table({id_col: pa.array(ids_out, pa.string()),
                     "cell": pa.array(cells_out, pa.int64())})


def rasterize(ds: ray.data.Dataset, level: int, id_col: str = "theme_id") -> ray.data.Dataset:
    """Dataset with (id, geometry_wkt) -> (id, cell) occupancy rows."""
    from ..stages.ingest import parse_geometries

    parsed = ds.map_batches(parse_geometries, batch_format="pyarrow")
    return parsed.map_batches(lambda b: rasterize_batch(b, level, id_col),
                              batch_format="pyarrow")


def _cell_square(cell: int) -> np.ndarray:
    x0, y0, x1, y1 = tiles.cell_bounds(cell)
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=np.float64)


def vectorize_cells(cells) -> list:
    """Cell ids -> dissolved multipolygon parts (exact: cell squares share
    edges on the grid lattice)."""
    parts = [[_cell_square(int(c))] for c in set(cells)]
    return dissolve(parts) if parts else []


_ZONAL_PARTIAL = pa.schema([
    ("zone", pa.string()), ("__b", pa.int32()), ("n", pa.int64()),
    ("s", pa.float64()), ("mn", pa.float64()), ("mx", pa.float64()),
])

_ZONAL_OUT = pa.schema([
    ("zone", pa.string()), ("cell_count", pa.int64()),
    ("value_sum", pa.float64()), ("value_mean", pa.float64()),
    ("value_min", pa.float64()), ("value_max", pa.float64()),
])


def zonal_stats(raster: ray.data.Dataset, zones: ray.data.Dataset, level: int,
                value_col: str = "value", id_col: str = "theme_id",
                n_buckets: int = 64) -> ray.data.Dataset:
    """Zonal statistics: per-zone count/sum/mean/min/max of raster cell
    values, one output row per zone with at least one covered cell.

    ``raster`` is a Dataset of (cell:int64, value) rows — the BIG side at
    scale; ``zones`` is a Dataset of (id_col, geometry_wkt) polygon features
    with unique ids (zones may overlap — a cell under k zones contributes to
    all k). Coverage uses the same center-sample rule as :func:`rasterize`
    at ``level``.

    Scale shape: zones rasterize to (zone, cell) occupancy rows; occupancy
    and raster rows co-locate through ONE tagged-union bucketed shuffle on
    hash(cell) (the semi_join/lookup_join machinery, relational.py); each
    bucket inner-merges locally and pre-aggregates per-zone PARTIALS, so the
    final exchange moves at most one tiny row per (zone, bucket) — the
    raster itself is never reshuffled or fanned out per zone. Output is
    deterministic under any partitioning: bucket-local rows are sorted
    before aggregation and the final fold sums partials in __b order.
    """
    import pandas as pd

    from .vhash import bucket_i32

    occ = rasterize(zones, level, id_col)
    if raster.schema() is None or zones.schema() is None:
        return ray.data.from_arrow(_ZONAL_OUT.empty_table())

    def raster_side(t: pa.Table) -> pa.Table:
        cells = t.column("cell").cast(pa.int64())
        return pa.table({
            "cell": cells,
            "val": t.column(value_col).cast(pa.float64()),
            "zone": pa.nulls(t.num_rows, pa.string()),
            "__mark": pa.array(np.zeros(t.num_rows, np.int8)),
            "__b": bucket_i32(cells, n_buckets),
        })

    def zone_side(t: pa.Table) -> pa.Table:
        cells = t.column("cell").cast(pa.int64())
        return pa.table({
            "cell": cells,
            "val": pa.nulls(t.num_rows, pa.float64()),
            "zone": t.column(id_col).cast(pa.string()),
            "__mark": pa.array(np.ones(t.num_rows, np.int8)),
            "__b": bucket_i32(cells, n_buckets),
        })

    unioned = (raster.map_batches(raster_side, batch_format="pyarrow")
               .union(occ.map_batches(zone_side, batch_format="pyarrow")))

    def per_bucket(gt: pa.Table) -> pa.Table:
        marks = gt.column("__mark").to_numpy(zero_copy_only=False)
        r = gt.filter(pa.array(marks == 0))
        z = gt.filter(pa.array(marks == 1))
        if r.num_rows == 0 or z.num_rows == 0:
            return _ZONAL_PARTIAL.empty_table()
        rdf = pd.DataFrame({
            "cell": r.column("cell").to_numpy(zero_copy_only=False),
            "val": r.column("val").to_numpy(zero_copy_only=False),
        }).sort_values(["cell", "val"], kind="mergesort")
        zdf = pd.DataFrame({
            "cell": z.column("cell").to_numpy(zero_copy_only=False),
            "zone": z.column("zone").to_pandas(),
        }).sort_values(["zone", "cell"], kind="mergesort")
        m = zdf.merge(rdf, on="cell", how="inner")
        if m.empty:
            return _ZONAL_PARTIAL.empty_table()
        agg = (m.groupby("zone", sort=True)["val"]
                .agg(n="count", s="sum", mn="min", mx="max").reset_index())
        agg["__b"] = np.int32(gt.column("__b")[0].as_py())
        return pa.Table.from_pandas(agg[["zone", "__b", "n", "s", "mn", "mx"]],
                                    schema=_ZONAL_PARTIAL, preserve_index=False)

    partials = unioned.groupby("__b").map_groups(per_bucket,
                                                 batch_format="pyarrow")

    def fold(gt: pa.Table) -> pa.Table:
        # sum partials in __b order so float accumulation is run-invariant
        gt = gt.sort_by("__b")
        n = int(pc.sum(gt.column("n")).as_py())
        s = float(np.sum(gt.column("s").to_numpy(zero_copy_only=False)))
        return pa.table({
            "zone": gt.column("zone").slice(0, 1),
            "cell_count": pa.array([n], pa.int64()),
            "value_sum": pa.array([s], pa.float64()),
            "value_mean": pa.array([s / n], pa.float64()),
            "value_min": pa.array([pc.min(gt.column("mn")).as_py()], pa.float64()),
            "value_max": pa.array([pc.max(gt.column("mx")).as_py()], pa.float64()),
        })

    return partials.groupby("zone").map_groups(fold, batch_format="pyarrow")


def vectorize(ds: ray.data.Dataset, id_col: str = "theme_id") -> ray.data.Dataset:
    """(id, cell) occupancy rows -> one (id, geometry_wkt, area) row per id."""
    import pandas as pd

    def per_id(grp: pd.DataFrame) -> pd.DataFrame:
        parts = vectorize_cells(grp["cell"].tolist())
        return pd.DataFrame({
            id_col: [grp[id_col].iloc[0]],
            "geometry_wkt": [g.to_wkt(g.GEOM_POLYGON, parts)],
            "raster_area": [round(g.geom_area(g.GEOM_POLYGON, parts), 6)],
        })

    return ds.groupby(id_col).map_groups(per_id, batch_format="pandas")

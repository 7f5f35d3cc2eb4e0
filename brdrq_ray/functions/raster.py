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

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
                n_buckets: int = 64,
                occupancy: ray.data.Dataset | None = None) -> ray.data.Dataset:
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

    ``occupancy`` lets a caller that already rasterized the zones at
    ``level`` (a (id_col, cell) Dataset from :func:`rasterize`) pass it in
    instead of paying the vector->raster scan a second time.
    """
    import pandas as pd

    from .vhash import bucket_i32

    occ = rasterize(zones, level, id_col) if occupancy is None else occupancy
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


_AGG_FOLDS = {
    "mean": lambda v: float(np.sum(v)) / len(v),
    "sum": lambda v: float(np.sum(v)),
    "min": lambda v: float(np.min(v)),
    "max": lambda v: float(np.max(v)),
    "count": lambda v: float(len(v)),
}


def downsample(raster: ray.data.Dataset, d: int = 1, agg: str = "mean",
               value_col: str = "value") -> ray.data.Dataset:
    """Raster pyramid step: (cell, value) rows at level L -> one row per
    occupied parent cell at level L-d, value aggregated by ``agg``
    (mean/sum/min/max/count).

    Scale shape: the parent id is a per-batch vectorized bit op, then ONE
    groupby(parent) exchange re-keys the raster (the unavoidable move of a
    resolution change); every reduce group is bounded by 4**d child rows.
    The fold sorts children by cell id before summing, so float output is
    bit-identical under any partitioning for the unique-cell raster
    contract (at most one row per cell — a raster, not a point cloud).
    """
    fold_fn = _AGG_FOLDS[agg]

    def key(t: pa.Table) -> pa.Table:
        cells = t.column("cell").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "parent": pa.array(tiles.parent_cells(cells, d), pa.int64()),
            "child": pa.array(cells, pa.int64()),
            "val": t.column(value_col).cast(pa.float64()),
        })

    def fold(gt: pa.Table) -> pa.Table:
        gt = gt.sort_by("child")
        v = gt.column("val").to_numpy(zero_copy_only=False)
        return pa.table({
            "cell": gt.column("parent").slice(0, 1),
            "value": pa.array([fold_fn(v)], pa.float64()),
        })

    return (raster.map_batches(key, batch_format="pyarrow")
            .groupby("parent").map_groups(fold, batch_format="pyarrow"))


def upsample(raster: ray.data.Dataset, d: int = 1,
             value_col: str = "value") -> ray.data.Dataset:
    """Raster pyramid inverse step: (cell, value) rows at level L -> the
    4**d child cells at level L+d, each carrying the parent's value
    (nearest-neighbor upsampling). Aligns a coarse raster to a finer one so
    :func:`map_algebra` can combine rasters built at different levels.

    Scale shape: pure map_batches — NO shuffle; bounded 4**d-fold row
    amplification of the compact (cell, value) projection. Exact inverse
    property: ``downsample(upsample(r, d), d, agg)`` == r for
    mean/min/max (all 4**d children carry one identical value); sum and
    count come back scaled by the 4**d fan-out."""
    def fan_out(t: pa.Table) -> pa.Table:
        cells = t.column("cell").cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = t.column(value_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        kids = tiles.child_cells(cells, d)
        return pa.table({
            "cell": pa.array(kids.ravel(), pa.int64()),
            "value": pa.array(np.repeat(vals, kids.shape[1]), pa.float64()),
        })

    return raster.map_batches(fan_out, batch_format="pyarrow")


def map_algebra(a: ray.data.Dataset, b: ray.data.Dataset, op: str = "add",
                value_col: str = "value", n_buckets: int = 64,
                fill: float | None = None) -> ray.data.Dataset:
    """Cell-aligned raster algebra: per-cell ``a op b`` (add/sub/mul/div/
    min/max) over two (cell, value) rasters at the same level.

    ``fill=None`` keeps only cells present in BOTH rasters (inner); a float
    ``fill`` substitutes for the missing side so the output covers the union
    of occupied cells. Scale shape: ONE tagged-union bucketed shuffle on
    hash(cell) co-locates matching cells (neither raster is broadcast or
    fanned out); each bucket does a vectorized pandas merge + numpy kernel.
    Unique-cell raster contract on both sides (duplicates join SQL-style).
    """
    import pandas as pd

    from .vhash import bucket_i32

    kernel = {
        "add": np.add, "sub": np.subtract, "mul": np.multiply,
        "div": np.divide, "min": np.minimum, "max": np.maximum,
    }[op]
    out_schema = pa.schema([("cell", pa.int64()), ("value", pa.float64())])
    if a.schema() is None or b.schema() is None:
        if fill is None or (a.schema() is None and b.schema() is None):
            return ray.data.from_arrow(out_schema.empty_table())

    def side(mark: int):
        def fn(t: pa.Table) -> pa.Table:
            cells = t.column("cell").cast(pa.int64())
            return pa.table({
                "cell": cells,
                "val": t.column(value_col).cast(pa.float64()),
                "__mark": pa.array(np.full(t.num_rows, mark, np.int8)),
                "__b": bucket_i32(cells, n_buckets),
            })
        return fn

    sides = []
    if a.schema() is not None:
        sides.append(a.map_batches(side(0), batch_format="pyarrow"))
    if b.schema() is not None:
        sides.append(b.map_batches(side(1), batch_format="pyarrow"))
    unioned = sides[0] if len(sides) == 1 else sides[0].union(sides[1])

    def per_bucket(gt: pa.Table) -> pa.Table:
        marks = gt.column("__mark").to_numpy(zero_copy_only=False)

        def df(m):
            part = gt.filter(pa.array(marks == m))
            return pd.DataFrame({
                "cell": part.column("cell").to_numpy(zero_copy_only=False),
                f"v{m}": part.column("val").to_numpy(zero_copy_only=False),
            })

        how = "inner" if fill is None else "outer"
        m = df(0).merge(df(1), on="cell", how=how,
                        indicator=fill is not None).sort_values(
            "cell", kind="mergesort")
        if m.empty:
            return out_schema.empty_table()
        va = m["v0"].to_numpy(dtype=np.float64)
        vb = m["v1"].to_numpy(dtype=np.float64)
        if fill is not None:
            # substitute fill ONLY where the cell was genuinely absent from
            # that side (merge indicator) — a present-but-NaN raster value
            # (upstream nodata / 0-div artifact) must propagate as NaN
            ind = m["_merge"].to_numpy()
            va = np.where(ind == "right_only", fill, va)
            vb = np.where(ind == "left_only", fill, vb)
        return pa.table({"cell": pa.array(m["cell"].to_numpy(), pa.int64()),
                         "value": pa.array(kernel(va, vb), pa.float64())})

    return unioned.groupby("__b").map_groups(per_bucket,
                                             batch_format="pyarrow")


def focal_mean(raster: ray.data.Dataset, radius: int = 1,
               value_col: str = "value") -> ray.data.Dataset:
    """Focal (moving-window) mean: for each OCCUPIED cell, the mean of the
    values of occupied cells in its (2*radius+1)^2 neighborhood (itself
    included) — the classic raster smoothing stencil.

    Scale shape: each input row emits one (target, source, value)
    contribution per neighbor it can reach (bounded (2r+1)^2-fold row
    amplification of the compact (cell, value) projection — never of any
    payload), then ONE groupby(target) exchange; a reduce group holds at
    most (2r+1)^2 rows. Targets that are not themselves occupied are
    dropped inside the fold (no output for empty cells). Deterministic:
    the fold sums contributions in source-cell order.
    """
    offs = [(di, dj) for di in range(-radius, radius + 1)
            for dj in range(-radius, radius + 1)]

    def contribute(t: pa.Table) -> pa.Table:
        cells = t.column("cell").cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = t.column(value_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        level, cx, cy = tiles.cell_xy(cells)
        if len(level) == 0:
            return pa.table({"target": pa.array([], pa.int64()),
                             "source": pa.array([], pa.int64()),
                             "val": pa.array([], pa.float64()),
                             "is_self": pa.array([], pa.bool_())})
        lv = int(level[0])
        if not (level == lv).all():
            # the stencil re-encodes neighbor cells at ONE grid level; a
            # mixed-level raster (e.g. a forgotten upsample) would silently
            # smear values across unrelated cells — error instead
            raise ValueError("focal_mean requires a single-level raster; "
                             f"saw levels {sorted(set(level.tolist()))}")
        n = 1 << lv
        tgt, src, out_v, selfs = [], [], [], []
        for di, dj in offs:
            tx, ty = cx + di, cy + dj
            ok = (tx >= 0) & (tx < n) & (ty >= 0) & (ty < n)
            if not ok.any():
                continue
            tgt.append(tiles.encode_cells(
                tiles.WORLD_ORIGIN[0] + (tx[ok] + 0.5) * tiles.cell_size(lv),
                tiles.WORLD_ORIGIN[1] + (ty[ok] + 0.5) * tiles.cell_size(lv),
                lv))
            src.append(cells[ok])
            out_v.append(vals[ok])
            selfs.append(np.full(int(ok.sum()), di == 0 and dj == 0, bool))
        return pa.table({
            "target": pa.array(np.concatenate(tgt), pa.int64()),
            "source": pa.array(np.concatenate(src), pa.int64()),
            "val": pa.array(np.concatenate(out_v), pa.float64()),
            "is_self": pa.array(np.concatenate(selfs), pa.bool_()),
        })

    def fold(gt: pa.Table) -> pa.Table:
        if not pc.any(gt.column("is_self")).as_py():
            return pa.schema([("cell", pa.int64()),
                              ("value", pa.float64())]).empty_table()
        gt = gt.sort_by("source")
        v = gt.column("val").to_numpy(zero_copy_only=False)
        return pa.table({
            "cell": gt.column("target").slice(0, 1),
            "value": pa.array([float(np.sum(v)) / len(v)], pa.float64()),
        })

    return (raster.map_batches(contribute, batch_format="pyarrow")
            .groupby("target").map_groups(fold, batch_format="pyarrow"))


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

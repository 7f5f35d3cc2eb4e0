"""Small geometry-adjacent operators rounding out SURVEY.md section 2:
M6 geometry-type splitter, M10 type sniffer, M16 partial-selection clip,
A7 difference-metrics series, O2/O3 listing limit + sort."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..geom import core as g
from ..geom.boolean import overlay


# --- M6: geometry-type splitter ---------------------------------------------

def split_by_geometry_type(ds: ray.data.Dataset) -> dict[str, ray.data.Dataset]:
    """Split a parsed dataset (geom_kind column) into one dataset per
    geometry type — the reference splits mixed FeatureCollections the same
    way (filter_geojson_by_geometry_type, plugin/brdrq/brdrq_utils.py:
    841-859, dispatched per output type)."""
    import pyarrow.compute as pc
    out = {}
    for kind, name in ((g.GEOM_POLYGON, "polygon"), (g.GEOM_LINESTRING, "line"),
                       (g.GEOM_POINT, "point")):
        out[name] = ds.map_batches(
            lambda t, k=kind: t.filter(pc.equal(t.column("geom_kind"), k)),
            batch_format="pyarrow")
    return out


# --- M10: type sniffer ------------------------------------------------------

def get_string_type(value: str) -> str:
    """Classify a string as int/float/string (reference: get_string_type,
    plugin/brdrq/brdrq_utils.py:435-444)."""
    if value is None:
        return "string"
    s = str(value).strip()
    try:
        int(s)
        return "int"
    except ValueError:
        pass
    try:
        float(s)
        return "float"
    except ValueError:
        return "string"


def sniff_column_types(ds: ray.data.Dataset, col: str) -> str:
    """Column-level inference: the narrowest type every non-null value fits
    (cast-with-fallback during schema inference)."""
    order = {"int": 0, "float": 1, "string": 2}

    def partial(batch: pa.Table) -> pa.Table:
        kinds = {get_string_type(v) for v in batch.column(col).to_pylist()
                 if v is not None}
        worst = max(kinds, key=lambda k: order[k]) if kinds else "int"
        return pa.table({"kind": pa.array([worst], pa.string())})

    kinds = set(ds.map_batches(partial, batch_format="pyarrow")
                .to_pandas()["kind"])
    return max(kinds, key=lambda k: order[k]) if kinds else "string"


# --- M16: partial-selection clip --------------------------------------------

def clip_to_polygon(ds: ray.data.Dataset, clip_wkt: str,
                    geom_col: str = "geom") -> ray.data.Dataset:
    """Clip parsed features to a selection polygon, keep non-empty
    intersections (reference: handlePartialSelection,
    plugin/brdrq/brdrq_dockwidget_featurealigner.py:932-958). The clip
    polygon is broadcast once (ray.put), never re-shipped per batch."""
    kind, clip_parts = g.parse_wkt(clip_wkt)
    _, clip_parts = g.make_valid(g.GEOM_POLYGON, clip_parts)
    clip_ref = ray.put(clip_parts)
    cbox = g.geom_bbox(clip_parts)

    class Clip:
        def __init__(self):
            self.clip = ray.get(clip_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep, new_geoms, areas = [], [], []
            xmin = batch.column("xmin").to_numpy(zero_copy_only=False)
            xmax = batch.column("xmax").to_numpy(zero_copy_only=False)
            ymin = batch.column("ymin").to_numpy(zero_copy_only=False)
            ymax = batch.column("ymax").to_numpy(zero_copy_only=False)
            bbox_hit = ((xmin <= cbox[2]) & (xmax >= cbox[0])
                        & (ymin <= cbox[3]) & (ymax >= cbox[1]))
            for i, buf in enumerate(batch.column(geom_col).to_pylist()):
                if not bbox_hit[i]:
                    keep.append(False)
                    new_geoms.append(None)
                    areas.append(0.0)
                    continue
                kind_i, parts = g.unpack_geom(buf)
                inter = overlay(parts, self.clip, "intersection") \
                    if kind_i == g.GEOM_POLYGON else []
                a = g.geom_area(g.GEOM_POLYGON, inter)
                keep.append(a > 0)
                new_geoms.append(g.pack_geom(g.GEOM_POLYGON, inter))
                areas.append(a)
            out = batch.filter(pa.array(keep))
            kept_geoms = [ge for ge, k in zip(new_geoms, keep) if k]
            kept_areas = [a for a, k in zip(areas, keep) if k]
            idx = out.column_names.index(geom_col)
            out = out.set_column(idx, geom_col, pa.array(kept_geoms, pa.binary()))
            return out.append_column("clipped_area", pa.array(kept_areas, pa.float64()))

    return ds.map_batches(Clip, batch_format="pyarrow", concurrency=(1, 4))


# --- A7: difference-metrics series ------------------------------------------

def difference_metrics(results: ray.data.Dataset) -> ray.data.Dataset:
    """Per feature: the ordered (rd -> symmetric-area-change) series feeding
    the reference's distance-vs-change plot (get_difference_metrics_...,
    call site plugin/brdrq/brdrq_dockwidget_featurealigner.py:1690-1692;
    plotted by plot_series, brdrq_utils.py:1084-1102)."""

    import pyarrow as pa

    from .vhash import bucket_i32

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "b", bucket_i32(batch.column("theme_id").cast(pa.string()), 64))

    def per_bucket(gdf: pd.DataFrame) -> pd.DataFrame:
        gdf = gdf.sort_values(["theme_id", "brdr_relevant_distance"])
        agg = (gdf.assign(
                   d=gdf["brdr_relevant_distance"].round(1),
                   s=gdf["brdr_sym_diff_area_index"].round(6))
               .groupby("theme_id", as_index=False)
               .agg(distances=("d", list), sym_diff_areas=("s", list)))
        return agg

    cols = results.select_columns(["theme_id", "brdr_relevant_distance",
                                   "brdr_sym_diff_area_index"])
    return (cols.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("b").map_groups(
                lambda g: per_bucket(g.drop(columns=["b"])),
                batch_format="pandas"))


# --- O2/O3: listing cap + presentation sort ---------------------------------

def listing(ds: ray.data.Dataset, sort_col: str, descending: bool = True,
            limit: int = 1000) -> ray.data.Dataset:
    """Presentation sort + cap (the reference lists at most 1000 of 5000
    features, plugin/brdrq/brdrq_dockwidget_featurealigner.py:144)."""
    return ds.sort(sort_col, descending=descending).limit(limit)


# --- geometry simplification (egress/prep; engine addition) -----------------

def simplify_geometries(ds: ray.data.Dataset, tolerance: float,
                        geom_col: str = "geom",
                        repair: bool = True) -> ray.data.Dataset:
    """Douglas-Peucker simplification of every feature at ``tolerance``
    (meters) — the standard egress reduction before shipping geometry to a
    viewer or a coarse-level analysis. Pure per-feature map_batches (no
    shuffle); DP output vertices are a subset of the input (snap grid
    preserved), except that ``repair=True`` (default, make_valid on
    simplified polygons because plain DP may self-intersect) can INSERT
    snapped crossing vertices when it splits a bowtie — the
    ``simplify_pts_removed`` audit column (n_before - n_after) then goes
    negative for that feature. Updates bbox columns when present
    (NaN bbox for a feature that degenerates away, matching ingest's
    empty-geometry convention)."""
    class Simplify:
        def __call__(self, batch: pa.Table) -> pa.Table:
            new_geoms, removed = [], []
            boxes = []
            for buf in batch.column(geom_col).to_pylist():
                kind, parts = g.unpack_geom(buf)
                n_before = sum(len(r) for rings in parts for r in rings)
                kind, parts = g.simplify_parts(kind, parts, tolerance)
                if repair and kind == g.GEOM_POLYGON:
                    kind, parts = g.make_valid(kind, parts)
                n_after = sum(len(r) for rings in parts for r in rings)
                new_geoms.append(g.pack_geom(kind, parts))
                removed.append(n_before - n_after)
                boxes.append(g.geom_bbox(parts))  # (nan,)*4 when empty
            idx = batch.column_names.index(geom_col)
            out = batch.set_column(idx, geom_col,
                                   pa.array(new_geoms, pa.binary()))
            for bi, name in enumerate(("xmin", "ymin", "xmax", "ymax")):
                if name in out.column_names:
                    out = out.set_column(
                        out.column_names.index(name), name,
                        pa.array([b[bi] for b in boxes], pa.float64()))
            return out.append_column("simplify_pts_removed",
                                     pa.array(removed, pa.int64()))

    from .pool import actor_pool
    return ds.map_batches(Simplify, batch_format="pyarrow",
                          concurrency=actor_pool())


def hausdorff_pairs(ds: ray.data.Dataset, col_a: str, col_b: str,
                    out_col: str = "hausdorff", densify: float = 0.0,
                    directed: bool = False) -> ray.data.Dataset:
    """Per-row Hausdorff distance between two geometry columns — the
    worst-point audit of an alignment run (e.g. result_geom vs the original
    geometry re-attached via lookup_join), complementing the reference's
    area-based diff metrics (geom/metrics.py module docstring for the exact
    semantics). Columns may hold packed geometry blobs (binary) or WKT
    (string) — sniffed per column from the Arrow type. Pure per-feature
    map_batches, NO shuffle; ``directed=True`` computes h(a -> b) only.
    Empty geometries yield NaN."""
    from ..geom import metrics as gm

    def _decode(col):
        vals = col.to_pylist()
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            return [g.unpack_geom(v) if v is not None else (g.GEOM_POLYGON, [])
                    for v in vals]
        return [g.parse_wkt(v) if v else (g.GEOM_POLYGON, []) for v in vals]

    class Hausdorff:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ga = _decode(batch.column(col_a).combine_chunks())
            gb = _decode(batch.column(col_b).combine_chunks())
            fn = (gm.directed_hausdorff if directed
                  else gm.hausdorff_distance)
            vals = [fn(ka, pa_, kb, pb_, densify)
                    for (ka, pa_), (kb, pb_) in zip(ga, gb)]
            return batch.append_column(out_col,
                                       pa.array(vals, pa.float64()))

    from .pool import actor_pool
    return ds.map_batches(Hausdorff, batch_format="pyarrow",
                          concurrency=actor_pool())


# --- CRS reprojection (ingress/egress; geom/crs.py chain) --------------------

def reproject_geometries(ds: ray.data.Dataset, src: str, dst: str,
                         geom_col: str = "geom") -> ray.data.Dataset:
    """Reproject every packed geometry from CRS ``src`` to ``dst``
    (supported pairs: geom/crs._TRANSFORMS — EPSG:31370 <-> EPSG:4326).

    This is an INGRESS/EGRESS operator: the interior of a pipeline runs in
    one projected meter CRS (the reference mandates it,
    plugin/brdrq/brdrq_utils.py:1498-1502; tiles.py assumes it), so
    reproject appears only at the boundary — load WGS84 interchange into
    the working grid, or ship results back out as lon/lat.

    Scale shape: pure map_batches, nothing shuffles. Per batch, EVERY ring
    of every geometry is concatenated into ONE (n, 2) coordinate array, the
    vectorized transform runs once, and the rings are re-sliced from the
    result — coordinate math never executes per row. Coordinates are
    emitted RAW (no snap): the 1e-6 snap grid is meaningful in meters only;
    a caller landing in the meter CRS re-snaps at ingest (parse path).
    Updates xmin/ymin/xmax/ymax columns when present (recomputed from the
    transformed rings — axis-aligned boxes do not commute with reprojection,
    so transforming the old corners would be wrong)."""
    from ..geom.crs import transform_fn

    fwd = transform_fn(src, dst)

    class Reproject:
        def __call__(self, batch: pa.Table) -> pa.Table:
            bufs = batch.column(geom_col).to_pylist()
            shapes = []          # (kind, [n_rings per part], [ring lens])
            chunks = []
            for buf in bufs:
                kind, parts = g.unpack_geom(buf)
                ring_lens = []
                part_lens = []
                for rings in parts:
                    part_lens.append(len(rings))
                    for ring in rings:
                        ring_lens.append(len(ring))
                        chunks.append(ring)
                shapes.append((kind, part_lens, ring_lens))
            if chunks:
                coords = np.concatenate(chunks, axis=0)
                tx, ty = fwd(coords[:, 0], coords[:, 1])
                coords = np.column_stack([tx, ty])
            else:
                coords = np.empty((0, 2))
            out_geoms, boxes = [], []
            off = 0
            for kind, part_lens, ring_lens in shapes:
                parts, ri = [], 0
                for n_rings in part_lens:
                    rings = []
                    for _ in range(n_rings):
                        n = ring_lens[ri]
                        rings.append(coords[off:off + n])
                        off += n
                        ri += 1
                    parts.append(rings)
                out_geoms.append(g.pack_geom(kind, parts))
                boxes.append(g.geom_bbox(parts))
            idx = batch.column_names.index(geom_col)
            out = batch.set_column(idx, geom_col,
                                   pa.array(out_geoms, pa.binary()))
            for bi, name in enumerate(("xmin", "ymin", "xmax", "ymax")):
                if name in out.column_names:
                    out = out.set_column(
                        out.column_names.index(name), name,
                        pa.array([b[bi] for b in boxes], pa.float64()))
            return out

    from .pool import actor_pool
    return ds.map_batches(Reproject, batch_format="pyarrow",
                          concurrency=actor_pool())


# --- convex hull (per feature + distributed per key) -------------------------

def convex_hull_geometries(ds: ray.data.Dataset,
                           geom_col: str = "geom") -> ray.data.Dataset:
    """Per-feature convex hull over a parsed dataset: ``geom`` is replaced
    by its hull polygon (ST_ConvexHull per row). Pure map_batches — nothing
    shuffles; bbox columns are unchanged by construction (the hull has the
    same coordinate extremes as its input). brdr_area/brdr_perimeter are
    recomputed when present. Features whose hull is degenerate (point /
    collinear inputs) become empty polygons — hull-as-polygon semantics,
    documented rather than silently emitting zero-area rings."""
    from .pool import actor_pool

    class HullFn:
        def __call__(self, batch: pa.Table) -> pa.Table:
            bufs = batch.column(geom_col).to_pylist()
            geoms, areas, perims = [], [], []
            for buf in bufs:
                _, parts = g.unpack_geom(buf)
                rings = [r for rr in parts for r in rr]
                hull = (g.convex_hull(np.vstack(rings)) if rings
                        else np.empty((0, 2)))
                hp = [[hull]] if len(hull) >= 3 else []
                geoms.append(g.pack_geom(g.GEOM_POLYGON, hp))
                areas.append(g.geom_area(g.GEOM_POLYGON, hp))
                perims.append(g.geom_perimeter(g.GEOM_POLYGON, hp))
            out = batch.set_column(batch.column_names.index(geom_col),
                                   geom_col, pa.array(geoms, pa.binary()))
            for name, vals in (("brdr_area", areas),
                               ("brdr_perimeter", perims)):
                if name in out.column_names:
                    out = out.set_column(out.column_names.index(name), name,
                                         pa.array(vals, pa.float64()))
            return out

    return ds.map_batches(HullFn, batch_format="pyarrow",
                          concurrency=actor_pool())


def convex_hull_by(ds: ray.data.Dataset, key_col: str,
                   wkt_col: str = "geometry_wkt") -> ray.data.Dataset:
    """Distributed per-key convex hull (ST_ConvexHull(ST_Collect(...))
    GROUP BY key) with an exact combiner: each batch pre-hulls its own
    vertices per key and ships ONLY the partial hull points — a point on a
    partial hull edge is inside the convex span of its endpoints, so it can
    never be a global extreme point and dropping it is lossless
    (hull(hull(A) ∪ hull(B)) == hull(A ∪ B)). The groupby(key) exchange
    therefore moves O(partial-hull vertices) rows, not O(total vertices) —
    the combiner-first aggregate shape, applied to geometry.

    Keys whose members are all empty geometries are dropped. Keys whose
    union is degenerate (all points collinear) emit an EMPTY polygon with
    area 0. Output: <key_col>, hull_wkt, hull_area, n_features."""
    from collections import defaultdict

    from ..stages.ingest import parse_geometries

    parsed = ds.map_batches(parse_geometries, batch_format="pyarrow",
                            fn_kwargs={"wkt_col": wkt_col})

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        geoms = batch.column("geom").to_pylist()
        pts_by: dict = defaultdict(list)
        cnt: dict = defaultdict(int)
        for k, buf in zip(keys, geoms):
            _, parts = g.unpack_geom(buf)
            cnt[k] += 1
            for rr in parts:
                pts_by[k].extend(rr)
        out_k, out_x, out_y, out_n = [], [], [], []
        for k in sorted(pts_by, key=str):
            hull = g.convex_hull(np.vstack(pts_by[k]))
            out_k.extend([k] * len(hull))
            out_x.extend(hull[:, 0].tolist())
            out_y.extend(hull[:, 1].tolist())
            # feature count rides on the FIRST hull row of each key (the
            # final fold sums the column, so the rest carry 0)
            out_n.extend([cnt[k]] + [0] * (len(hull) - 1))
        return pa.table({key_col: pa.array(out_k, pa.string()),
                         "x": pa.array(out_x, pa.float64()),
                         "y": pa.array(out_y, pa.float64()),
                         "n": pa.array(out_n, pa.int64())})

    def per_group(grp: pa.Table) -> pa.Table:
        pts = np.column_stack([
            grp.column("x").to_numpy(zero_copy_only=False),
            grp.column("y").to_numpy(zero_copy_only=False)])
        hull = g.convex_hull(pts)
        hp = [[hull]] if len(hull) >= 3 else []
        key = grp.column(key_col)[0].as_py()
        import pyarrow.compute as pc
        return pa.table({
            key_col: pa.array([str(key)], pa.string()),
            "hull_wkt": pa.array([g.to_wkt(g.GEOM_POLYGON, hp)], pa.string()),
            "hull_area": pa.array([g.geom_area(g.GEOM_POLYGON, hp)],
                                  pa.float64()),
            "n_features": pa.array([pc.sum(grp.column("n")).as_py()],
                                   pa.int64()),
        })

    return (parsed.map_batches(partial, batch_format="pyarrow")
            .groupby(key_col).map_groups(per_group, batch_format="pyarrow"))


# --- dissolve by attribute (per-key unary union) -----------------------------

def dissolve_by(ds: ray.data.Dataset, key_col: str,
                wkt_col: str = "geometry_wkt",
                id_col: str = "theme_id") -> ray.data.Dataset:
    """Per-key unary union (the ST_Union ... GROUP BY key verb; the
    reference dissolves included reference parcels per feature the same way
    — SURVEY.md D1, brdrq get_reference_union analog — here exposed over an
    arbitrary attribute key).

    Scale shape: ONE groupby(key) exchange; each reduce group unions its own
    members with the divide-&-conquer overlay union in CANONICAL id order
    (run- and partition-invariant float results — union_many's pairing is a
    pure function of the sorted member list). The skew assumption is the
    usual dissolve contract: members per key are bounded (a key that owns a
    whole region should be pre-clipped — union_area holds the distributed
    clip-to-cell shape for the global case).

    Columns out: <key_col>, geom_wkt (canonical MULTIPOLYGON), area,
    n_features."""
    from ..geom.boolean import union_many
    from ..stages.ingest import parse_geometries

    parsed = ds.map_batches(parse_geometries, batch_format="pyarrow",
                            fn_kwargs={"wkt_col": wkt_col})

    key_type = pa.string()

    def per_group(grp: pa.Table) -> pa.Table:
        ids = np.asarray(grp.column(id_col).to_pylist(), dtype="U")
        order = np.argsort(ids, kind="stable")
        geoms = grp.column("geom").take(pa.array(order)).to_pylist()
        parts_list = []
        for buf in geoms:
            kind, parts = g.unpack_geom(buf)
            if kind == g.GEOM_POLYGON and parts:
                parts_list.append(parts)
        merged = union_many(parts_list)
        key = grp.column(key_col)[0].as_py()
        return pa.table({
            key_col: pa.array([str(key)], key_type),
            "geom_wkt": pa.array([g.to_wkt(g.GEOM_POLYGON, merged)],
                                 pa.string()),
            "area": pa.array([g.geom_area(g.GEOM_POLYGON, merged)],
                             pa.float64()),
            "n_features": pa.array([grp.num_rows], pa.int64()),
        })

    return parsed.groupby(key_col).map_groups(per_group,
                                              batch_format="pyarrow")


# --- M15: exact union-area (admission guard, distributed) -------------------

def union_area(parsed: ray.data.Dataset, level: int = 13,
               n_buckets: int = 64) -> float:
    """EXACT area of the unary union of every polygon in a parsed dataset,
    distributed (reference analog: the admission guard unions the thematic
    layer before accepting a job, brdrq_algorithm_autocorrectborders.py's
    area cap). Each feature is clipped to its covering Morton cells — the
    cells PARTITION the plane, so no piece of the union is counted twice —
    pieces take ONE bucketed shuffle, each cell unions its own pieces
    exactly (cells owning a single piece skip the union), and the per-cell
    partial areas sum through a tiny aggregate. Scale: work and memory are
    per-cell; overlaps only cost where features actually overlap."""
    from ..tiles import cell_bounds, cover_bbox
    from .vhash import bucket_i32

    def clip_pieces(batch: pa.Table) -> pa.Table:
        cells_out, geoms_out = [], []
        xmin = batch.column("xmin").to_numpy()
        ymin = batch.column("ymin").to_numpy()
        xmax = batch.column("xmax").to_numpy()
        ymax = batch.column("ymax").to_numpy()
        geoms = batch.column("geom").to_pylist()
        for i in range(len(geoms)):
            kind, parts = g.unpack_geom(geoms[i])
            if kind != g.GEOM_POLYGON or not parts:
                continue
            for cell in cover_bbox(xmin[i], ymin[i], xmax[i], ymax[i],
                                   level).tolist():
                cx0, cy0, cx1, cy1 = cell_bounds(cell)
                rect = [[np.array([(cx0, cy0), (cx1, cy0),
                                   (cx1, cy1), (cx0, cy1)], float)]]
                piece = overlay(parts, rect, "intersection", validate=False)
                if piece:
                    cells_out.append(cell)
                    geoms_out.append(g.pack_geom(g.GEOM_POLYGON, piece))
        return pa.table({"cell": pa.array(cells_out, pa.int64()),
                         "piece": pa.array(geoms_out, pa.binary())})

    def cell_area(gdf: pd.DataFrame) -> pd.DataFrame:
        from ..geom.boolean import union_many
        total = 0.0
        for _, sub in gdf.groupby("cell"):
            pieces = [g.unpack_geom(b)[1] for b in sub["piece"]]
            if len(pieces) == 1:
                total += g.geom_area(g.GEOM_POLYGON, pieces[0])
            else:
                total += g.geom_area(g.GEOM_POLYGON, union_many(pieces))
        return pd.DataFrame({"area": [total]})

    pieces = parsed.map_batches(clip_pieces, batch_format="pyarrow")
    keyed = pieces.map_batches(
        lambda t: t.append_column(
            "b", bucket_i32(t.column("cell"), n_buckets)),
        batch_format="pyarrow")
    partials = keyed.groupby("b").map_groups(
        lambda df: cell_area(df.drop(columns=["b"])), batch_format="pandas")
    out = partials.sum("area")
    return float(out or 0.0)

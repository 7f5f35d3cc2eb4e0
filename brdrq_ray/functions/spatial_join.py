"""Standalone spatial join / lookup operators (SURVEY.md J1/J2) exposed
outside the alignment DAG: spatial semi-join counts and k-nearest reference
lookups — the candidate-pruning primitives as user-facing operators.

These route through the SAME planner as the alignment DAG (plan_tiles:
derived cell level + hot-cell salting) so a dense-city cell cannot become one
giant shuffle group at scale, and pull group columns to numpy ONCE per group
(no per-row ``.as_py()`` scalar access on the hot path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .. import tiles
from ..geom import core as g
from ..stages.ingest import parse_geometries
from ..stages.tiling import (assign_owner_cell, explode_cover, salt_reference,
                             salt_theme)


def _part_key(batch: pa.Table) -> pa.Table:
    """Same packing as the alignment DAG: part_key = cell | salt << 45."""
    cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
    salt = batch.column("salt").to_numpy(zero_copy_only=False).astype(np.int64)
    return batch.append_column("part_key", pa.array(cell | (salt << 45), pa.int64()))


def _tag_and_union(left: ray.data.Dataset, right: ray.data.Dataset,
                   reach: float, cell_level: int | None,
                   hot_threshold: int):
    """Co-partition two parsed geometry datasets on PLANNED tile cells: the
    planner derives the level from the left side's extents and salts hot
    cells; left rows get owner cell + salt, right rows are replicated to
    cover+ring and to every salt sub-key (same correctness argument as the
    alignment join)."""
    from ..pipelines.autocorrect import plan_tiles

    plan = plan_tiles(left, max_rd=max(reach, 0.0), cell_level=cell_level,
                      hot_threshold=hot_threshold)
    cs = tiles.cell_size(plan.level)

    def l_side(b: pa.Table) -> pa.Table:
        b = assign_owner_cell(b, plan.level)
        b = salt_theme(b, plan.salts)
        return b.append_column("side", pa.array(["l"] * b.num_rows))

    def r_side(b: pa.Table) -> pa.Table:
        b = explode_cover(b, plan.level, expand=cs)
        b = salt_reference(b, plan.salts)
        return b.append_column("side", pa.array(["r"] * b.num_rows))

    lt = left.map_batches(l_side, batch_format="pyarrow")
    rt = right.map_batches(r_side, batch_format="pyarrow")

    def unify(b: pa.Table) -> pa.Table:
        n = b.num_rows
        out = {}
        out["side"] = b.column("side")
        out["cell"] = b.column("cell")
        out["salt"] = b.column("salt")
        out["theme_id"] = (b.column("theme_id").cast(pa.string())
                           if "theme_id" in b.column_names else pa.nulls(n, pa.string()))
        out["ref_id"] = (b.column("ref_id").cast(pa.string())
                         if "ref_id" in b.column_names else pa.nulls(n, pa.string()))
        for c in ("geom", "xmin", "ymin", "xmax", "ymax"):
            out[c] = b.column(c)
        return _part_key(pa.table(out))

    return lt.map_batches(unify, batch_format="pyarrow").union(
        rt.map_batches(unify, batch_format="pyarrow"))


def _split_sides(grp: pa.Table):
    """Group columns -> numpy/py lists pulled ONCE (align_stage pattern):
    returns (theme dict, ref dict) or None when either side is empty."""
    side = np.asarray(grp.column("side").to_pylist())
    li = np.nonzero(side == "l")[0]
    ri = np.nonzero(side == "r")[0]
    if len(li) == 0 or len(ri) == 0:
        return None
    # canonical order on BOTH sides: the shuffle's within-group tie order is
    # run-dependent, and downstream kernels (kNN rank ties, dissolve
    # accumulation) must not inherit it
    li = li[np.argsort(np.asarray(
        grp.column("theme_id").take(pa.array(li)).to_pylist(), dtype="U"),
        kind="stable")]
    ri = ri[np.argsort(np.asarray(
        grp.column("ref_id").take(pa.array(ri)).to_pylist(), dtype="U"),
        kind="stable")]
    xmin = grp.column("xmin").to_numpy(zero_copy_only=False)
    xmax = grp.column("xmax").to_numpy(zero_copy_only=False)
    ymin = grp.column("ymin").to_numpy(zero_copy_only=False)
    ymax = grp.column("ymax").to_numpy(zero_copy_only=False)
    t = {
        "ids": grp.column("theme_id").take(pa.array(li)).to_pylist(),
        "geoms": grp.column("geom").take(pa.array(li)).to_pylist(),
        "xmin": xmin[li], "xmax": xmax[li], "ymin": ymin[li], "ymax": ymax[li],
    }
    r = {
        "ids": grp.column("ref_id").take(pa.array(ri)).to_pylist(),
        "geoms": grp.column("geom").take(pa.array(ri)).to_pylist(),
        "xmin": xmin[ri], "xmax": xmax[ri], "ymin": ymin[ri], "ymax": ymax[ri],
    }
    return t, r


def intersects_semi_join(thematic: ray.data.Dataset, reference: ray.data.Dataset,
                         buffer_m: float = 0.0, cell_level: int | None = None,
                         hot_threshold: int = 512) -> ray.data.Dataset:
    """J1 analog as a standalone operator: (theme_id, ref_id) pairs whose
    geometries' EXACT intersection is non-empty (bbox prefilter + overlay
    test inside the salted tile group). buffer_m expands the thematic bbox
    first (the reference buffers by 1.01*rd before extractbylocation)."""
    lt = thematic.map_batches(parse_geometries, batch_format="pyarrow")
    rt = reference.map_batches(parse_geometries, batch_format="pyarrow")
    unified = _tag_and_union(lt, rt, buffer_m, cell_level, hot_threshold)

    EMPTY = pa.table({"theme_id": pa.array([], pa.string()),
                      "ref_id": pa.array([], pa.string())})

    def per_group(grp: pa.Table) -> pa.Table:
        from ..geom.boolean import overlay
        sides = _split_sides(grp)
        if sides is None:
            return EMPTY
        t, r = sides
        r_order = sorted(range(len(r["ids"])), key=lambda j: r["ids"][j])
        r_cache: dict[int, list] = {}
        t_ids_out, r_ids_out = [], []
        for i in range(len(t["ids"])):
            x0, x1 = t["xmin"][i] - buffer_m, t["xmax"][i] + buffer_m
            y0, y1 = t["ymin"][i] - buffer_m, t["ymax"][i] + buffer_m
            hits = ((r["xmin"] <= x1) & (r["xmax"] >= x0)
                    & (r["ymin"] <= y1) & (r["ymax"] >= y0))
            if not hits.any():
                continue
            _, tparts = g.unpack_geom(t["geoms"][i])
            tid = t["ids"][i]
            for j in r_order:
                if not hits[j]:
                    continue
                if j not in r_cache:
                    r_cache[j] = g.unpack_geom(r["geoms"][j])[1]
                inter = overlay(tparts, r_cache[j], "intersection")
                if g.geom_area(g.GEOM_POLYGON, inter) > 0:
                    t_ids_out.append(tid)
                    r_ids_out.append(r["ids"][j])
        return pa.table({"theme_id": pa.array(t_ids_out, pa.string()),
                         "ref_id": pa.array(r_ids_out, pa.string())})

    return unified.groupby("part_key").map_groups(per_group,
                                                  batch_format="pyarrow")


def intersection_overlay_join(thematic: ray.data.Dataset,
                              reference: ray.data.Dataset,
                              cell_level: int | None = None,
                              hot_threshold: int = 512,
                              emit_wkt: bool = True,
                              emit_source_area: bool = False) -> ray.data.Dataset:
    """Pairwise intersection overlay (the ST_Intersection join): for every
    (theme, ref) pair whose geometries overlap with positive area, emit the
    intersection geometry and its area. This is the semi-join (J1) upgraded
    to carry the overlap geometry itself — the primitive behind the
    reference's per-pair intersection slots (SURVEY.md D1/D2: the aligner
    computes relevant intersections per candidate pair; here it is exposed
    as a standalone two-dataset operator).

    Scale shape: identical to :func:`intersects_semi_join` — ONE planned
    co-partition shuffle (owner cell + salted hot cells on the thematic
    side, cover replication on the reference side), per-group bbox
    prefilter, exact overlay only on surviving pairs. Each theme row lives
    in exactly one group, so a pair is tested (and emitted) at most once —
    no cross-tile dedup pass. Output is deterministic under any input
    partitioning: group rows are canonically ordered by id on both sides
    before any float accumulation.

    Columns out: theme_id, ref_id, inter_wkt (canonical MULTIPOLYGON,
    6-decimal grid; omitted when ``emit_wkt`` is False — consumers that
    only need areas skip the formatting cost), inter_area (m², on the same
    grid as geom_area everywhere else), and src_area (the reference
    feature's FULL area) when ``emit_source_area`` — the denominator
    areal_interpolate needs, computed here where the parts are already
    unpacked."""
    lt = thematic.map_batches(parse_geometries, batch_format="pyarrow")
    rt = reference.map_batches(parse_geometries, batch_format="pyarrow")
    unified = _tag_and_union(lt, rt, 0.0, cell_level, hot_threshold)

    empty_cols = {"theme_id": pa.array([], pa.string()),
                  "ref_id": pa.array([], pa.string())}
    if emit_wkt:
        empty_cols["inter_wkt"] = pa.array([], pa.string())
    empty_cols["inter_area"] = pa.array([], pa.float64())
    if emit_source_area:
        empty_cols["src_area"] = pa.array([], pa.float64())
    EMPTY = pa.table(empty_cols)

    def per_group(grp: pa.Table) -> pa.Table:
        from ..geom.boolean import overlay
        sides = _split_sides(grp)
        if sides is None:
            return EMPTY
        t, r = sides
        r_cache: dict[int, list] = {}
        r_area: dict[int, float] = {}
        t_out, r_out, w_out, a_out, s_out = [], [], [], [], []
        for i in range(len(t["ids"])):
            hits = ((r["xmin"] <= t["xmax"][i]) & (r["xmax"] >= t["xmin"][i])
                    & (r["ymin"] <= t["ymax"][i]) & (r["ymax"] >= t["ymin"][i]))
            if not hits.any():
                continue
            _, tparts = g.unpack_geom(t["geoms"][i])
            tid = t["ids"][i]
            for j in np.nonzero(hits)[0]:  # ref side already id-sorted
                j = int(j)
                if j not in r_cache:
                    r_cache[j] = g.unpack_geom(r["geoms"][j])[1]
                    r_area[j] = g.geom_area(g.GEOM_POLYGON, r_cache[j])
                inter = overlay(tparts, r_cache[j], "intersection")
                area = g.geom_area(g.GEOM_POLYGON, inter)
                if area > 0:
                    t_out.append(tid)
                    r_out.append(r["ids"][j])
                    if emit_wkt:
                        w_out.append(g.to_wkt(g.GEOM_POLYGON, inter))
                    a_out.append(area)
                    if emit_source_area:
                        s_out.append(r_area[j])
        cols = {"theme_id": pa.array(t_out, pa.string()),
                "ref_id": pa.array(r_out, pa.string())}
        if emit_wkt:
            cols["inter_wkt"] = pa.array(w_out, pa.string())
        cols["inter_area"] = pa.array(a_out, pa.float64())
        if emit_source_area:
            cols["src_area"] = pa.array(s_out, pa.float64())
        return pa.table(cols)

    return unified.groupby("part_key").map_groups(per_group,
                                                  batch_format="pyarrow")


def areal_interpolate(source: ray.data.Dataset, target: ray.data.Dataset,
                      value_cols: list[str],
                      cell_level: int | None = None,
                      hot_threshold: int = 512) -> ray.data.Dataset:
    """Area-weighted attribute transfer (areal interpolation — the
    population-reweighting verb): every source polygon's values are split
    across the target polygons it intersects, proportional to intersection
    area share of the SOURCE (w = |src ∩ tgt| / |src|), and each target
    sums its contributions. Mass is conserved over fully-covered sources:
    a source wholly inside the target layer contributes exactly its value.

    ``source`` carries (ref_id, geometry_wkt, <value_cols>...); ``target``
    is the thematic contract (theme_id, geometry_wkt).

    Scale shape: ONE planned co-partition shuffle produces the weight pair
    table (no WKT formatting — emit_wkt=False), one bounded tagged-union
    lookup-join shuffle per value column attaches source values to the
    PAIR table (pairs, never polygons, move), and the final
    groupby(theme_id) folds contributions in canonical ref_id order —
    deterministic float sums under any partitioning.

    Columns out: theme_id, one column per value_col (the interpolated
    sum), covered_area (the sum of pairwise intersection areas — equal to
    the covered target area when the source layer is a tessellation, the
    usual case; mutually-overlapping sources count each overlap once per
    source, like their values do)."""
    import pyarrow.compute as pc

    from .relational import lookup_join

    pairs = intersection_overlay_join(target, source, cell_level=cell_level,
                                      hot_threshold=hot_threshold,
                                      emit_wkt=False, emit_source_area=True)

    def weight(b: pa.Table) -> pa.Table:
        return b.append_column(
            "w", pc.divide(b.column("inter_area"), b.column("src_area")))

    pairs = pairs.map_batches(weight, batch_format="pyarrow")
    src_vals = source.select_columns(["ref_id"] + list(value_cols))
    for v in value_cols:
        pairs = lookup_join(pairs, src_vals.select_columns(["ref_id", v]),
                            on="ref_id", value_col=v)

    out_schema = pa.schema(
        [("theme_id", pa.string())]
        + [(v, pa.float64()) for v in value_cols]
        + [("covered_area", pa.float64())])

    def per_target(grp: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(grp.column("ref_id").to_pylist(),
                                      dtype="U"), kind="stable")
        take = pa.array(order)
        w = grp.column("w").take(take).to_numpy(zero_copy_only=False)
        cols = {"theme_id": pa.array([grp.column("theme_id")[0].as_py()],
                                     pa.string())}
        for v in value_cols:
            vals = grp.column(v).take(take).to_numpy(zero_copy_only=False)
            vals = np.nan_to_num(vals.astype(np.float64), nan=0.0)
            cols[v] = pa.array([float((vals * w).sum())], pa.float64())
        ia = grp.column("inter_area").take(take).to_numpy(
            zero_copy_only=False)
        cols["covered_area"] = pa.array([float(ia.sum())], pa.float64())
        return pa.table(cols, schema=out_schema)

    return pairs.groupby("theme_id").map_groups(per_target,
                                                batch_format="pyarrow")


def point_in_polygon_join(points: ray.data.Dataset,
                          polygons: ray.data.Dataset,
                          point_id_col: str = "point_id",
                          cell_level: int | None = None,
                          hot_threshold: int = 4096) -> ray.data.Dataset:
    """Point-in-polygon join (the geocode/tag primitive the north rule names
    as a first-class component): for every point contained in a polygon,
    emit (point_id, theme_id). Points inside k overlapping polygons emit k
    rows; points in none are dropped (inner-join semantics). Containment is
    the engine's winding rule (points_in_rings != 0); points exactly ON a
    boundary are implementation-defined, like every other boundary test in
    the engine (callers needing closed/open semantics offset their points).

    Inputs: ``points`` carries (point_id, x, y) columns — no geometry
    parsing on the big side; ``polygons`` is the standard thematic WKT
    contract (theme_id, geometry_wkt).

    Scale shape: the LEVEL comes from the polygon side (replication cost is
    driven by polygon extents — pick_level over the polygon histogram), the
    points side never replicates: each point gets exactly ONE owner cell
    from its own coordinates, so correctness holds at ANY level (point in
    polygon => point's cell is inside the polygon's bbox cover — no ring
    expansion needed). Hot cells are salted from the polygon histogram:
    points split across k sub-keys, polygons replicated k times, so a
    dense-city cell becomes k bounded groups. Per group the kernel loops
    over the FEW polygons and runs the vectorized winding test over the
    MANY bbox-surviving points at once — no per-point Python."""
    from ..pipelines.autocorrect import plan_tiles

    pg = polygons.map_batches(parse_geometries, batch_format="pyarrow")
    plan = plan_tiles(pg, max_rd=0.0, cell_level=cell_level,
                      hot_threshold=hot_threshold)

    def p_side(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False).astype(np.float64)
        y = b.column("y").to_numpy(zero_copy_only=False).astype(np.float64)
        cells = tiles.owner_cell(x, y, plan.level)
        b = b.append_column("cell", pa.array(cells, pa.int64()))
        b = salt_theme(b, plan.salts, id_col=point_id_col)
        n = b.num_rows
        return pa.table({
            "side": pa.array(["p"] * n),
            "cell": b.column("cell"), "salt": b.column("salt"),
            "point_id": b.column(point_id_col).cast(pa.string()),
            "theme_id": pa.nulls(n, pa.string()),
            "x": pa.array(x, pa.float64()), "y": pa.array(y, pa.float64()),
            "geom": pa.nulls(n, pa.binary()),
            "xmin": pa.nulls(n, pa.float64()), "ymin": pa.nulls(n, pa.float64()),
            "xmax": pa.nulls(n, pa.float64()), "ymax": pa.nulls(n, pa.float64()),
        })

    def g_side(b: pa.Table) -> pa.Table:
        b = explode_cover(b, plan.level, expand=0.0)
        b = salt_reference(b, plan.salts)
        n = b.num_rows
        return pa.table({
            "side": pa.array(["g"] * n),
            "cell": b.column("cell"), "salt": b.column("salt"),
            "point_id": pa.nulls(n, pa.string()),
            "theme_id": b.column("theme_id").cast(pa.string()),
            "x": pa.nulls(n, pa.float64()), "y": pa.nulls(n, pa.float64()),
            "geom": b.column("geom"),
            "xmin": b.column("xmin"), "ymin": b.column("ymin"),
            "xmax": b.column("xmax"), "ymax": b.column("ymax"),
        })

    unified = points.map_batches(p_side, batch_format="pyarrow").union(
        pg.map_batches(g_side, batch_format="pyarrow")).map_batches(
            _part_key, batch_format="pyarrow")

    EMPTY = pa.table({"point_id": pa.array([], pa.string()),
                      "theme_id": pa.array([], pa.string())})

    def per_group(grp: pa.Table) -> pa.Table:
        side = np.asarray(grp.column("side").to_pylist())
        pi = np.nonzero(side == "p")[0]
        gi = np.nonzero(side == "g")[0]
        if len(pi) == 0 or len(gi) == 0:
            return EMPTY
        # canonical order on both sides (run-deterministic output under any
        # partitioning; float math here is per-point so order only affects
        # row order, but the contract is uniform across the join family)
        pid = np.asarray(grp.column("point_id").take(pa.array(pi)).to_pylist(),
                         dtype="U")
        order = np.argsort(pid, kind="stable")
        pi, pid = pi[order], pid[order]
        gid = np.asarray(grp.column("theme_id").take(pa.array(gi)).to_pylist(),
                         dtype="U")
        gi = gi[np.argsort(gid, kind="stable")]
        px = grp.column("x").to_numpy(zero_copy_only=False)[pi]
        py = grp.column("y").to_numpy(zero_copy_only=False)[pi]
        pts = np.column_stack([px, py])
        geoms = grp.column("geom").take(pa.array(gi)).to_pylist()
        gids = grp.column("theme_id").take(pa.array(gi)).to_pylist()
        xmin = grp.column("xmin").to_numpy(zero_copy_only=False)[gi]
        xmax = grp.column("xmax").to_numpy(zero_copy_only=False)[gi]
        ymin = grp.column("ymin").to_numpy(zero_copy_only=False)[gi]
        ymax = grp.column("ymax").to_numpy(zero_copy_only=False)[gi]
        p_out, g_out = [], []
        for j in range(len(gids)):
            m = ((px >= xmin[j]) & (px <= xmax[j])
                 & (py >= ymin[j]) & (py <= ymax[j]))
            if not m.any():
                continue
            _, parts = g.unpack_geom(geoms[j])
            inside = g.points_in_polygon(pts[m], parts)
            if inside.any():
                hit_ids = pid[m][inside]
                p_out.extend(hit_ids.tolist())
                g_out.extend([gids[j]] * len(hit_ids))
        return pa.table({"point_id": pa.array(p_out, pa.string()),
                         "theme_id": pa.array(g_out, pa.string())})

    return unified.groupby("part_key").map_groups(per_group,
                                                  batch_format="pyarrow")


def dwithin_join(thematic: ray.data.Dataset, reference: ray.data.Dataset,
                 distance: float, cell_level: int | None = None,
                 hot_threshold: int = 512) -> ray.data.Dataset:
    """ST_DWithin join: (theme_id, ref_id, distance) for every pair whose
    exact set distance is <= ``distance`` (polygons are AREAS: containment
    and overlap are distance 0; geom/metrics.py::geom_distance). Same
    planned one-shuffle co-partition as intersects_semi_join, with the
    reference replicated to cover+ring at a level sized for ``distance``
    (reach drives pick_level, so every candidate within reach shares the
    theme's group); hot cells salted. Per group: bbox prefilter expanded by
    ``distance``, then the exact kernel per surviving pair in canonical
    (theme_id, ref_id) order — deterministic under any partitioning."""
    from ..geom import metrics as gm

    lt = thematic.map_batches(parse_geometries, batch_format="pyarrow")
    rt = reference.map_batches(parse_geometries, batch_format="pyarrow")
    unified = _tag_and_union(lt, rt, distance, cell_level, hot_threshold)

    EMPTY = pa.table({"theme_id": pa.array([], pa.string()),
                      "ref_id": pa.array([], pa.string()),
                      "distance": pa.array([], pa.float64())})

    def per_group(grp: pa.Table) -> pa.Table:
        sides = _split_sides(grp)
        if sides is None:
            return EMPTY
        t, r = sides
        r_cache: dict[int, tuple] = {}
        t_out, r_out, d_out = [], [], []
        for i in range(len(t["ids"])):
            x0, x1 = t["xmin"][i] - distance, t["xmax"][i] + distance
            y0, y1 = t["ymin"][i] - distance, t["ymax"][i] + distance
            hits = ((r["xmin"] <= x1) & (r["xmax"] >= x0)
                    & (r["ymin"] <= y1) & (r["ymax"] >= y0))
            if not hits.any():
                continue
            tk, tparts = g.unpack_geom(t["geoms"][i])
            for j in np.nonzero(hits)[0]:
                if j not in r_cache:
                    r_cache[j] = g.unpack_geom(r["geoms"][j])
                rk, rparts = r_cache[j]
                d = gm.geom_distance(tk, tparts, rk, rparts)
                if d <= distance:
                    t_out.append(t["ids"][i])
                    r_out.append(r["ids"][j])
                    d_out.append(d)
        return pa.table({"theme_id": pa.array(t_out, pa.string()),
                         "ref_id": pa.array(r_out, pa.string()),
                         "distance": pa.array(d_out, pa.float64())})

    return unified.groupby("part_key").map_groups(per_group,
                                                  batch_format="pyarrow")


def knn_reference_lookup(thematic: ray.data.Dataset, reference: ray.data.Dataset,
                         k: int = 3, max_distance: float = 100.0,
                         cell_level: int | None = None,
                         hot_threshold: int = 512) -> ray.data.Dataset:
    """J2 analog: for each thematic feature, the k nearest reference parcels
    (boundary distance, centroid-anchored) within max_distance. The reference
    does this with setFilterRect + exact distance filter
    (plugin/brdrq/brdrq_dockwidget_featurealigner.py:1653-1667)."""
    lt = thematic.map_batches(parse_geometries, batch_format="pyarrow")
    rt = reference.map_batches(parse_geometries, batch_format="pyarrow")
    unified = _tag_and_union(lt, rt, max_distance, cell_level, hot_threshold)

    EMPTY = pa.table({"theme_id": pa.array([], pa.string()),
                      "ref_id": pa.array([], pa.string()),
                      "distance": pa.array([], pa.float64()),
                      "rank": pa.array([], pa.int64())})

    def _per_seg(p, A, B):
        ab = B - A
        ab2 = (ab * ab).sum(axis=1)
        ab2[ab2 == 0] = 1e-300
        ap = p[None, :] - A
        t = np.clip((ap * ab).sum(axis=1) / ab2, 0.0, 1.0)
        proj = A + t[:, None] * ab
        return np.hypot(p[0] - proj[:, 0], p[1] - proj[:, 1])

    def per_group(grp: pa.Table) -> pa.Table:
        sides = _split_sides(grp)
        if sides is None:
            return EMPTY
        t, r = sides
        seg_a, seg_b, owner = [], [], []
        for jj, buf in enumerate(r["geoms"]):
            _, parts = g.unpack_geom(buf)
            a, b = g._poly_edges(parts)
            seg_a.append(a)
            seg_b.append(b)
            owner.extend([jj] * len(a))
        A = np.vstack(seg_a)
        B = np.vstack(seg_b)
        owner = np.asarray(owner)
        out = {"theme_id": [], "ref_id": [], "distance": [], "rank": []}
        for i in range(len(t["ids"])):
            _, tparts = g.unpack_geom(t["geoms"][i])
            cx, cy = g.geom_centroid(g.GEOM_POLYGON, tparts)
            # min distance per reference parcel (segment distances grouped by
            # owning parcel)
            per_ref = pd.DataFrame({"ref": owner,
                                    "d": _per_seg(np.array([cx, cy]), A, B)})
            best = per_ref.groupby("ref")["d"].min()
            # stable sort: equal distances rank in canonical ref_id order
            # (the index is the ref position, already ref_id-sorted)
            best = best[best <= max_distance].sort_values(kind="stable")
            tid = t["ids"][i]
            for rank, (jj, dist) in enumerate(best.head(k).items(), start=1):
                out["theme_id"].append(tid)
                out["ref_id"].append(r["ids"][int(jj)])
                out["distance"].append(round(float(dist), 6))
                out["rank"].append(rank)
        return pa.table({"theme_id": pa.array(out["theme_id"], pa.string()),
                         "ref_id": pa.array(out["ref_id"], pa.string()),
                         "distance": pa.array(out["distance"], pa.float64()),
                         "rank": pa.array(out["rank"], pa.int64())})

    return unified.groupby("part_key").map_groups(per_group,
                                                  batch_format="pyarrow")

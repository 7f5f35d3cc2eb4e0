"""Standalone spatial join / lookup operators (SURVEY.md J1/J2) exposed
outside the alignment DAG: spatial semi-join counts and k-nearest reference
lookups — the candidate-pruning primitives as user-facing operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .. import tiles
from ..geom import core as g
from ..stages.ingest import parse_geometries
from ..stages.tiling import assign_owner_cell, explode_cover


def _tag_and_union(left: ray.data.Dataset, right: ray.data.Dataset,
                   level: int, reach: float):
    """Co-partition two parsed geometry datasets on tile cells: left gets its
    owner cell, right is replicated to cover+ring (same correctness argument
    as the alignment join)."""
    cs = tiles.cell_size(level)

    def l_side(b: pa.Table) -> pa.Table:
        b = assign_owner_cell(b, level)
        return b.append_column("side", pa.array(["l"] * b.num_rows))

    def r_side(b: pa.Table) -> pa.Table:
        b = explode_cover(b, level, expand=cs)
        return b.append_column("side", pa.array(["r"] * b.num_rows))

    lt = left.map_batches(l_side, batch_format="pyarrow")
    rt = right.map_batches(r_side, batch_format="pyarrow")
    # schema align: keep the needed columns only
    cols = ["side", "cell", "theme_id", "ref_id", "geom", "xmin", "ymin", "xmax", "ymax"]

    def unify(b: pa.Table) -> pa.Table:
        n = b.num_rows
        out = {}
        out["side"] = b.column("side")
        out["cell"] = b.column("cell")
        out["theme_id"] = (b.column("theme_id").cast(pa.string())
                           if "theme_id" in b.column_names else pa.nulls(n, pa.string()))
        out["ref_id"] = (b.column("ref_id").cast(pa.string())
                         if "ref_id" in b.column_names else pa.nulls(n, pa.string()))
        for c in ("geom", "xmin", "ymin", "xmax", "ymax"):
            out[c] = b.column(c)
        return pa.table(out)

    return lt.map_batches(unify, batch_format="pyarrow").union(
        rt.map_batches(unify, batch_format="pyarrow"))


def intersects_semi_join(thematic: ray.data.Dataset, reference: ray.data.Dataset,
                         buffer_m: float = 0.0, level: int = 13) -> ray.data.Dataset:
    """J1 analog as a standalone operator: (theme_id, ref_id) pairs whose
    geometries' EXACT intersection is non-empty (bbox prefilter + overlay
    test inside the tile group). buffer_m expands the thematic bbox first
    (the reference buffers by 1.01*rd before extractbylocation)."""
    lt = thematic.map_batches(parse_geometries, batch_format="pyarrow")
    rt = reference.map_batches(parse_geometries, batch_format="pyarrow")
    unified = _tag_and_union(lt, rt, level, buffer_m)

    def per_cell(grp: pa.Table) -> pa.Table:
        from ..geom.boolean import overlay
        side = np.asarray(grp.column("side").to_pylist())
        li = np.nonzero(side == "l")[0]
        ri = np.nonzero(side == "r")[0]
        if len(li) == 0 or len(ri) == 0:
            return pa.table({"theme_id": pa.array([], pa.string()),
                             "ref_id": pa.array([], pa.string())})
        rx0 = grp.column("xmin").to_numpy(zero_copy_only=False)[ri]
        rx1 = grp.column("xmax").to_numpy(zero_copy_only=False)[ri]
        ry0 = grp.column("ymin").to_numpy(zero_copy_only=False)[ri]
        ry1 = grp.column("ymax").to_numpy(zero_copy_only=False)[ri]
        r_ids = grp.column("ref_id").take(pa.array(ri)).to_pylist()
        r_geoms = grp.column("geom").take(pa.array(ri)).to_pylist()
        r_cache: dict[int, list] = {}
        t_ids_out, r_ids_out = [], []
        for i in li.tolist():
            x0 = grp.column("xmin")[i].as_py() - buffer_m
            x1 = grp.column("xmax")[i].as_py() + buffer_m
            y0 = grp.column("ymin")[i].as_py() - buffer_m
            y1 = grp.column("ymax")[i].as_py() + buffer_m
            hits = np.nonzero((rx0 <= x1) & (rx1 >= x0) & (ry0 <= y1) & (ry1 >= y0))[0]
            if not len(hits):
                continue
            _, tparts = g.unpack_geom(grp.column("geom")[i].as_py())
            tid = grp.column("theme_id")[i].as_py()
            for j in sorted(hits.tolist(), key=lambda j: r_ids[j]):
                if j not in r_cache:
                    r_cache[j] = g.unpack_geom(r_geoms[j])[1]
                inter = overlay(tparts, r_cache[j], "intersection")
                if g.geom_area(g.GEOM_POLYGON, inter) > 0:
                    t_ids_out.append(tid)
                    r_ids_out.append(r_ids[j])
        return pa.table({"theme_id": pa.array(t_ids_out, pa.string()),
                         "ref_id": pa.array(r_ids_out, pa.string())})

    return unified.groupby("cell").map_groups(per_cell, batch_format="pyarrow")


def knn_reference_lookup(thematic: ray.data.Dataset, reference: ray.data.Dataset,
                         k: int = 3, max_distance: float = 100.0,
                         level: int = 13) -> ray.data.Dataset:
    """J2 analog: for each thematic feature, the k nearest reference parcels
    (boundary distance, centroid-anchored) within max_distance. The reference
    does this with setFilterRect + exact distance filter
    (plugin/brdrq/brdrq_dockwidget_featurealigner.py:1653-1667)."""
    lt = thematic.map_batches(parse_geometries, batch_format="pyarrow")
    rt = reference.map_batches(parse_geometries, batch_format="pyarrow")
    unified = _tag_and_union(lt, rt, level, max_distance)

    def per_cell(grp: pa.Table) -> pa.Table:
        side = np.asarray(grp.column("side").to_pylist())
        li = np.nonzero(side == "l")[0]
        ri = np.nonzero(side == "r")[0]
        empty = pa.table({"theme_id": pa.array([], pa.string()),
                          "ref_id": pa.array([], pa.string()),
                          "distance": pa.array([], pa.float64()),
                          "rank": pa.array([], pa.int64())})
        if len(li) == 0 or len(ri) == 0:
            return empty
        r_ids = grp.column("ref_id").take(pa.array(ri)).to_pylist()
        r_geoms = grp.column("geom").take(pa.array(ri)).to_pylist()
        seg_a, seg_b, owner = [], [], []
        for jj, buf in enumerate(r_geoms):
            _, parts = g.unpack_geom(buf)
            a, b = g._poly_edges(parts)
            seg_a.append(a)
            seg_b.append(b)
            owner.extend([jj] * len(a))
        A = np.vstack(seg_a)
        B = np.vstack(seg_b)
        owner = np.asarray(owner)
        out = {"theme_id": [], "ref_id": [], "distance": [], "rank": []}
        for i in li.tolist():
            _, tparts = g.unpack_geom(grp.column("geom")[i].as_py())
            cx, cy = g.geom_centroid(g.GEOM_POLYGON, tparts)
            # min distance per reference parcel (segment distances grouped by
            # owning parcel)
            per_ref = pd.DataFrame({"ref": owner, "d": _per_seg(np.array([cx, cy]), A, B)})
            best = per_ref.groupby("ref")["d"].min()
            best = best[best <= max_distance].sort_values()
            tid = grp.column("theme_id")[i].as_py()
            for rank, (jj, dist) in enumerate(best.head(k).items(), start=1):
                out["theme_id"].append(tid)
                out["ref_id"].append(r_ids[int(jj)])
                out["distance"].append(round(float(dist), 6))
                out["rank"].append(rank)
        return pa.table({"theme_id": pa.array(out["theme_id"], pa.string()),
                         "ref_id": pa.array(out["ref_id"], pa.string()),
                         "distance": pa.array(out["distance"], pa.float64()),
                         "rank": pa.array(out["rank"], pa.int64())})

    def _per_seg(p, A, B):
        ab = B - A
        ab2 = (ab * ab).sum(axis=1)
        ab2[ab2 == 0] = 1e-300
        ap = p[None, :] - A
        t = np.clip((ap * ab).sum(axis=1) / ab2, 0.0, 1.0)
        proj = A + t[:, None] * ab
        return np.hypot(p[0] - proj[:, 0], p[1] - proj[:, 1])

    return unified.groupby("cell").map_groups(per_cell, batch_format="pyarrow")

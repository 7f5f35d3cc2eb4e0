"""Topology-consistent alignment post-pass (the body behind the
``2024:topology2024a`` processor id).

The reference registers a topology processor but ships it disabled
(plugin/brdrq/brdrq_utils.py:102-110 keeps the id out of the enabled enum),
so there is no upstream semantic to match; the engine defines and freezes
its own (SEMANTICS.md "Topology processor"): after alignment, two ADJACENT
theme features can each snap to the same reference boundary region and
double-claim it — their aligned polygons overlap even though the thematic
inputs did not. The topology pass makes the aligned layer overlap-free by a
deterministic PRIORITY TESSELLATION:

- every contested region (pairwise intersection of aligned results) is kept
  by exactly one claimant — the pair's winner: higher ``priority_col`` when
  given, ties (and the default) by ascending ``theme_id``;
- each loser subtracts, from its ORIGINAL aligned geometry, the union of
  its pairwise intersections with every higher-priority overlapper. For any
  pair (w, l): final_l is disjoint from original_w (it subtracted w inter l)
  and final_w is a subset of original_w, so final results are PAIRWISE
  DISJOINT regardless of overlap chains — no iteration, no order
  sensitivity;
- union coverage is preserved: every point of the original aligned union
  remains covered by its highest-priority claimant.

Scale shape: results are replicated to the tile cells their bbox covers
(tiles.cover_bboxes at a level derived from the max result extent — the
same sizing rule as the alignment planner); each (cell, series) group finds
bbox-overlapping pairs with one vectorized prefilter and computes only
those intersections. A pair co-occurs in every cell both bboxes cover, so
the cell OWNING the pair (the cell containing the min corner of the two
bboxes' intersection — a point inside both covers by construction)
processes it exactly once. The contested-piece table (bounded by the
number of CONTESTED features, not the corpus) then applies back hybrid:
at or below ``broadcast_limit`` pieces it ships once via ray.put and each
batch attaches it with a hash probe — the result table never shuffles;
above it a distributed bucketed lookup join takes over.

Only polygon results participate; line/point results (snap/network
processors) and empty results pass through byte-identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .. import tiles
from ..geom import boolean as gb
from ..geom import core as g

#: intersections below this area (m^2) are touching artifacts, not claims
MIN_CONTESTED_AREA = 1e-9


def _series_key(batch: pa.Table, group_cols: tuple) -> pa.Array:
    """Composite string key for the resolution series (e.g. one relevant
    distance of an evaluate run) — resolution never crosses series."""
    if not group_cols:
        return pa.array([""] * batch.num_rows, pa.string())
    cols = [pc.cast(batch.column(c), pa.string()) for c in group_cols]
    out = cols[0]
    for c in cols[1:]:
        out = pc.binary_join_element_wise(out, c, "|")
    return out


def _level_for(results: ray.data.Dataset, geom_col: str) -> int:
    """One streaming pass: the max bbox extent of any polygon result ->
    tiles.pick_level (the alignment planner's sizing rule, without the rd
    expansion — the pass sees final geometry, not search regions)."""
    def extent(batch: pa.Table) -> pa.Table:
        m = 0.0
        for buf in batch.column(geom_col).to_pylist():
            if not buf:
                continue
            kind, parts = g.unpack_geom(buf)
            if kind != g.GEOM_POLYGON or not parts:
                continue
            xmin, ymin, xmax, ymax = g.geom_bbox(parts)
            m = max(m, xmax - xmin, ymax - ymin)
        return pa.table({"m": pa.array([m], pa.float64())})

    stats = results.map_batches(extent, batch_format="pyarrow").to_pandas()
    max_extent = float(stats["m"].max()) if len(stats) else 0.0
    if not np.isfinite(max_extent) or max_extent <= 0:
        max_extent = 1.0
    return tiles.pick_level(max_extent, 0.0)


def _cover_rows(batch: pa.Table, geom_col: str, id_col: str,
                priority_col: str | None, group_cols: tuple,
                level: int) -> pa.Table:
    """Replicate each polygon row to every cell its bbox covers.
    Ships only (cell, series, id, priority, bbox, geometry bytes)."""
    series = _series_key(batch, group_cols).to_pylist()
    ids = batch.column(id_col).cast(pa.string()).to_pylist()
    geoms = batch.column(geom_col).to_pylist()
    prios = (batch.column(priority_col).to_pylist()
             if priority_col else [0.0] * batch.num_rows)
    out = {"cell": [], "series": [], "tid": [], "prio": [],
           "xmin": [], "ymin": [], "xmax": [], "ymax": [], "geom": []}
    for i, buf in enumerate(geoms):
        if not buf:
            continue
        kind, parts = g.unpack_geom(buf)
        if kind != g.GEOM_POLYGON or not parts:
            continue
        xmin, ymin, xmax, ymax = g.geom_bbox(parts)
        for c in tiles.cover_bbox(xmin, ymin, xmax, ymax, level):
            out["cell"].append(int(c))
            out["series"].append(series[i])
            out["tid"].append(ids[i])
            out["prio"].append(float(prios[i]) if prios[i] is not None else 0.0)
            out["xmin"].append(xmin)
            out["ymin"].append(ymin)
            out["xmax"].append(xmax)
            out["ymax"].append(ymax)
            out["geom"].append(buf)
    return pa.table({"cell": pa.array(out["cell"], pa.int64()),
                     "series": pa.array(out["series"], pa.string()),
                     "tid": pa.array(out["tid"], pa.string()),
                     "prio": pa.array(out["prio"], pa.float64()),
                     "xmin": pa.array(out["xmin"], pa.float64()),
                     "ymin": pa.array(out["ymin"], pa.float64()),
                     "xmax": pa.array(out["xmax"], pa.float64()),
                     "ymax": pa.array(out["ymax"], pa.float64()),
                     "geom": pa.array(out["geom"], pa.binary())})


def _contested_in_cell(group: pa.Table, level: int) -> pa.Table:
    """One (cell, series) group: vectorized bbox pair prefilter, ownership
    dedupe (min corner of the bbox intersection must fall in THIS cell),
    exact intersection for surviving pairs, one (loser, piece) row each."""
    group = group.sort_by([("series", "ascending"), ("tid", "ascending")])
    cell = int(group.column("cell")[0].as_py())
    series = np.asarray(group.column("series").to_pylist())
    tid = np.asarray(group.column("tid").to_pylist())
    prio = group.column("prio").to_numpy(zero_copy_only=False)
    xmin = group.column("xmin").to_numpy(zero_copy_only=False)
    ymin = group.column("ymin").to_numpy(zero_copy_only=False)
    xmax = group.column("xmax").to_numpy(zero_copy_only=False)
    ymax = group.column("ymax").to_numpy(zero_copy_only=False)
    geoms = group.column("geom").to_pylist()
    n = len(tid)
    out_series, out_loser, out_piece = [], [], []
    if n > 1:
        # pairwise bbox-overlap matrix (features per cell are bounded by the
        # level sizing; the matrix is tiny) on the upper triangle only
        ov = ((xmin[:, None] <= xmax[None, :]) & (xmax[:, None] >= xmin[None, :])
              & (ymin[:, None] <= ymax[None, :]) & (ymax[:, None] >= ymin[None, :])
              & (series[:, None] == series[None, :])
              & (tid[:, None] < tid[None, :]))
        ii, jj = np.nonzero(ov)
        if len(ii):
            # ownership: the pair is processed only by the cell containing
            # the min corner of the bbox intersection
            ox = np.maximum(xmin[ii], xmin[jj])
            oy = np.maximum(ymin[ii], ymin[jj])
            own = tiles.owner_cell(ox, oy, level)
            keep = own == cell
            ii, jj = ii[keep], jj[keep]
        parts_cache: dict[int, list] = {}

        def parts_of(idx: int):
            if idx not in parts_cache:
                parts_cache[idx] = g.unpack_geom(geoms[idx])[1]
            return parts_cache[idx]

        for a, b in zip(ii.tolist(), jj.tolist()):
            piece = gb.overlay(parts_of(a), parts_of(b), "intersection",
                               validate=False)
            if not piece or gb._geom_area(piece) <= MIN_CONTESTED_AREA:
                continue
            # winner: higher priority; ties by ascending id (tid[a] < tid[b]
            # by the pairing predicate, so on a tie a wins and b loses)
            loser = a if prio[b] > prio[a] else b
            out_series.append(series[a])
            out_loser.append(tid[loser])
            out_piece.append(g.pack_geom(g.GEOM_POLYGON, piece))
    return pa.table({"series": pa.array(out_series, pa.string()),
                     "tid": pa.array(out_loser, pa.string()),
                     "piece": pa.array(out_piece, pa.binary())})


def _merge_pieces(group: pa.Table) -> pa.Table:
    """All contested pieces of one loser -> ONE packed union (pieces from
    different winners may overlap each other, so union_many, not dissolve).
    Deterministic: pieces are byte-sorted before the union."""
    group = group.sort_by([("piece", "ascending")])
    parts = [g.unpack_geom(b)[1] for b in group.column("piece").to_pylist()]
    merged = gb.union_many(parts)
    return pa.table({
        "series": group.column("series").slice(0, 1),
        "tid": group.column("tid").slice(0, 1),
        "__contested": pa.array([g.pack_geom(g.GEOM_POLYGON, merged)],
                                pa.binary())})


def topology_resolve(results: ray.data.Dataset, geom_col: str = "result_geom",
                     id_col: str = "theme_id",
                     priority_col: str | None = None,
                     group_cols: tuple = ("brdr_relevant_distance",),
                     cell_level: int | None = None,
                     recompute_cols: bool = True,
                     broadcast_limit: int = 200_000) -> ray.data.Dataset:
    """Make the aligned layer overlap-free (module docstring for the
    semantics). Returns the input table with ``geom_col`` replaced on losers,
    a ``topo_ceded_area`` audit column (0.0 for untouched rows), and —
    when ``recompute_cols`` and the standard brdr_* columns are present —
    brdr_area/brdr_perimeter/brdr_shape_index recomputed for changed rows.
    The six diff slots keep describing the PRE-topology alignment
    (SEMANTICS.md; the reference never defines post-topology diffs)."""
    schema_names = results.schema().names
    group_cols = tuple(c for c in group_cols if c in schema_names)
    level = cell_level if cell_level is not None \
        else _level_for(results, geom_col)

    covered = results.map_batches(
        lambda b: _cover_rows(b, geom_col, id_col, priority_col,
                              group_cols, level),
        batch_format="pyarrow")
    contested = covered.groupby(["cell", "series"]).map_groups(
        lambda grp: _contested_in_cell(grp, level), batch_format="pyarrow")
    pieces = contested.groupby(["series", "tid"]).map_groups(
        _merge_pieces, batch_format="pyarrow").materialize()

    def add_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            _series_key(batch, group_cols),
            pc.cast(batch.column(id_col), pa.string()), "#")
        return batch.append_column("__topo_key", key)

    def piece_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(batch.column("series"),
                                          batch.column("tid"), "#")
        return pa.table({"__topo_key": key,
                         "__contested": batch.column("__contested")})

    n_pieces = pieces.count()
    if n_pieces == 0:
        # nothing contested: append the audit column, touch nothing else
        def untouched(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "topo_ceded_area",
                pa.array(np.zeros(batch.num_rows), pa.float64()))
        return results.map_batches(untouched, batch_format="pyarrow")

    keyed = results.map_batches(add_key, batch_format="pyarrow")
    if n_pieces <= broadcast_limit:
        # contested features are the small side by construction: ship the
        # (key -> piece) table once via ray.put and attach per batch with a
        # hash probe — the result table itself NEVER shuffles
        import pandas as pd

        import ray as _ray
        chunks = [t for t in (_ray.get(r) for r in pieces.map_batches(
            piece_key, batch_format="pyarrow").to_arrow_refs()) if t.num_rows]
        tbl = pa.concat_tables(chunks).combine_chunks()
        map_ref = _ray.put(tbl)

        class Attach:
            def __init__(self):
                t = _ray.get(map_ref)
                self.idx = pd.Index(t.column("__topo_key").to_pylist())
                self.pieces = t.column("__contested").to_pylist()

            def __call__(self, batch: pa.Table) -> pa.Table:
                keys = batch.column("__topo_key").to_pylist()
                pos = self.idx.get_indexer(keys)
                vals = [self.pieces[p] if p >= 0 else None for p in pos]
                return batch.append_column("__contested",
                                           pa.array(vals, pa.binary()))

        joined = keyed.map_batches(Attach, batch_format="pyarrow",
                                   concurrency=_pool())
    else:
        from .relational import lookup_join
        joined = lookup_join(keyed, pieces.map_batches(
            piece_key, batch_format="pyarrow"),
            on="__topo_key", value_col="__contested")

    def subtract(batch: pa.Table) -> pa.Table:
        contested_col = batch.column("__contested").to_pylist()
        geoms = batch.column(geom_col).to_pylist()
        ceded = np.zeros(batch.num_rows, dtype=np.float64)
        changed = False
        areas = perims = None
        if recompute_cols and "brdr_area" in batch.column_names:
            areas = batch.column("brdr_area").to_numpy(
                zero_copy_only=False).copy()
            perims = batch.column("brdr_perimeter").to_numpy(
                zero_copy_only=False).copy()
        for i, cbuf in enumerate(contested_col):
            if cbuf is None or not geoms[i]:
                continue
            kind, parts = g.unpack_geom(geoms[i])
            if kind != g.GEOM_POLYGON:
                continue
            before = gb._geom_area(parts)
            new = gb.overlay(parts, g.unpack_geom(cbuf)[1], "difference",
                             validate=False)
            after = gb._geom_area(new)
            if abs(before - after) <= MIN_CONTESTED_AREA:
                continue
            geoms[i] = g.pack_geom(kind, new)
            ceded[i] = before - after
            changed = True
            if areas is not None:
                areas[i] = after
                perims[i] = g.geom_perimeter(kind, new)
        cols = {name: batch.column(name) for name in batch.column_names
                if name not in ("__topo_key", "__contested")}
        if changed:
            cols[geom_col] = pa.array(geoms, pa.binary())
            if areas is not None:
                cols["brdr_area"] = pa.array(areas, pa.float64())
                cols["brdr_perimeter"] = pa.array(perims, pa.float64())
                if "brdr_shape_index" in batch.column_names:
                    cols["brdr_shape_index"] = pa.array(
                        [g.shape_index(a, p) for a, p in zip(areas, perims)],
                        pa.float64())
        cols["topo_ceded_area"] = pa.array(ceded, pa.float64())
        return pa.table(cols)

    return joined.map_batches(subtract, batch_format="pyarrow")


def _pool():
    from .pool import actor_pool
    return actor_pool()

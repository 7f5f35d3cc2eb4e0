"""Distributed DBSCAN over point datasets (the ST_ClusterDBSCAN analog).

The reference engine has no clustering verb, but grouping thematic features
by spatial proximity is the standard precursor to the per-tile alignment it
does run (and the spatial counterpart of the near-dup clustering family in
functions/dedup.py — the output contract matches duplicate_clusters: one
(id, cluster) row per member, cluster = min member id).

Semantics (deterministic under ANY partitioning — stricter than sklearn):

- neighbors: Euclidean distance <= eps (inclusive), a point is not its own
  neighbor but DOES count itself toward ``min_pts`` (the published DBSCAN
  rule: core iff |N_eps(p)| >= min_pts with p included).
- core points always cluster; the cluster id is the minimum CORE member id
  (string order — ids are cast to string like every id in the join family).
- border points (non-core with >= 1 core neighbor) attach to the MINIMUM
  cluster id among their core neighbors. sklearn assigns border points to
  the first-discovered cluster (scan-order-dependent); the min rule is the
  deterministic refinement, so border assignment here is a pure function of
  the point set.
- noise points get a null cluster.

Scale shape (nothing big ever moves, no all-pairs):

1. **Pair generation** — ONE groupby(cell) exchange of the (id, x, y)
   projection. The grid level is the finest whose cell edge >= eps, so any
   pair within eps lives in the same or 8-adjacent cells. Each unordered
   cell pair is processed EXACTLY ONCE, in the lexicographically smaller
   cell (order by (cy, cx)): a point ghosts only into its 4 lex-smaller
   neighbors (W, SW, S, SE), so the projection replicates at most 5x.
   Inside a cell the kernel is chunked numpy distance blocks
   (geom.core.chunk_spans bounds temporaries to ~32 MB) over home x home
   (upper triangle) and home x ghost — the emitted pair table is bounded by
   the TRUE eps-neighbor count, the inherent DBSCAN output size.
2. **Degrees** — pair halves fan into a hash-bucketed groupby sum
   (id-projection rows only).
3. **Core flags / edge filter / border attach** — lookup_join shuffles of
   the pair table (pairs + tiny value columns).
4. **Components** — functions.dedup.duplicate_clusters over core-core
   edges + core self-edges: driver union-find below its edge cutoff,
   distributed min-label propagation with pointer jumping above it.

A cell denser than ``min_pts`` still pays pairwise work inside its group —
that is DBSCAN's intrinsic cost (every such pair is a real neighbor edge),
not a partitioning artifact; the chunking keeps it memory-bounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .. import tiles
from ..geom.core import chunk_spans
from .dedup import duplicate_clusters, _id_shuffle_bucket
from .relational import lookup_join, semi_join


def level_for_eps(eps: float) -> int:
    """Finest tile level whose cell edge is >= eps (so eps-neighbors are
    always in the same or 8-adjacent cells)."""
    if eps <= 0:
        raise ValueError("eps must be positive")
    level = int(np.floor(np.log2(tiles.WORLD_SIZE / eps)))
    return max(0, min(tiles.MAX_LEVEL, level))


#: ghost offsets (dx, dy) into the 4 lexicographically-smaller neighbors
#: under (cy, cx) order: same row west, and the full row below.
_GHOST_OFFSETS = ((-1, 0), (-1, -1), (0, -1), (1, -1))

_PAIR_SCHEMA = pa.schema([("id_a", pa.string()), ("id_b", pa.string())])


def _pair_rows(points: ray.data.Dataset, eps: float, level: int,
               point_id_col: str, x_col: str, y_col: str,
               n_buckets: int = 256) -> ray.data.Dataset:
    """(id_a, id_b) rows for every unordered point pair within eps,
    id_a < id_b, each pair emitted exactly once.

    The shuffle key is a HASH BUCKET of the cell, not the cell itself: point
    clouds occupy ~one cell per few points, and per-cell map_groups would
    pay one Python task per occupied cell (tens of thousands of tiny
    groups). One group per bucket, cells iterated inside via a sorted-span
    sweep — the repo's standard many-small-keys shape."""
    n_side = 1 << level
    eps2 = float(eps) * float(eps)

    def fan_out(b: pa.Table) -> pa.Table:
        ids = b.column(point_id_col).cast(pa.string()).combine_chunks()
        x = b.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = b.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        home = tiles.encode_cells(x, y, level)
        _, cx, cy = tiles.cell_xy(home)
        out_cell = [home]
        out_idx = [np.arange(len(x), dtype=np.int64)]
        out_role = [np.zeros(len(x), np.int8)]
        for dx, dy in _GHOST_OFFSETS:
            gx, gy = cx + dx, cy + dy
            ok = (gx >= 0) & (gx < n_side) & (gy >= 0) & (gy < n_side)
            if not ok.any():
                continue
            gcell = tiles.encode_cell_xy(gx[ok], gy[ok], level)
            out_cell.append(gcell)
            out_idx.append(np.nonzero(ok)[0].astype(np.int64))
            out_role.append(np.ones(int(ok.sum()), np.int8))
        cell = np.concatenate(out_cell)
        idx = np.concatenate(out_idx)
        role = np.concatenate(out_role)
        from .vhash import splitmix64
        bucket = (splitmix64(cell.astype(np.uint64))
                  % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "bucket": pa.array(bucket, pa.int32()),
            "cell": pa.array(cell, pa.int64()),
            "role": pa.array(role, pa.int8()),
            "pid": ids.take(pa.array(idx)),
            "x": pa.array(x[idx], pa.float64()),
            "y": pa.array(y[idx], pa.float64()),
        })

    def _cell_pairs(pid, xs, ys, role, a_out, b_out):
        hi = np.nonzero(role == 0)[0]
        if len(hi) == 0:
            return
        # canonical id order on both sides: home x home upper triangle then
        # emits id_a < id_b directly, and output row order is deterministic
        h = hi[np.argsort(pid[hi], kind="stable")]
        gi = np.nonzero(role == 1)[0]
        g = gi[np.argsort(pid[gi], kind="stable")]
        hx, hy, hid = xs[h], ys[h], pid[h]
        for s, e in chunk_spans(len(h), len(h)):
            d2 = ((hx[s:e, None] - hx[None, :]) ** 2
                  + (hy[s:e, None] - hy[None, :]) ** 2)
            ii, jj = np.nonzero(d2 <= eps2)
            keep = (ii + s) < jj  # strict upper triangle: no self, no dup
            if keep.any():
                a_out.append(hid[ii[keep] + s])
                b_out.append(hid[jj[keep]])
        if len(g):
            gx_, gy_, gid_ = xs[g], ys[g], pid[g]
            for s, e in chunk_spans(len(h), len(g)):
                d2 = ((hx[s:e, None] - gx_[None, :]) ** 2
                      + (hy[s:e, None] - gy_[None, :]) ** 2)
                ii, jj = np.nonzero(d2 <= eps2)
                if len(ii):
                    ha, gb = hid[ii + s], gid_[jj]
                    # ha == gb only under duplicate point ids (contract
                    # violation) — drop rather than emit an (id, id)
                    # self-pair that would inflate degree counts
                    ne = ha != gb
                    ha, gb = ha[ne], gb[ne]
                    a_first = ha < gb  # np.minimum has no unicode loop
                    a_out.append(np.where(a_first, ha, gb))
                    b_out.append(np.where(a_first, gb, ha))

    def per_bucket(grp: pa.Table) -> pa.Table:
        cells = grp.column("cell").to_numpy(zero_copy_only=False)
        role = grp.column("role").to_numpy(zero_copy_only=False)
        pid = np.asarray(grp.column("pid").to_pylist(), dtype="U")
        xs = grp.column("x").to_numpy(zero_copy_only=False)
        ys = grp.column("y").to_numpy(zero_copy_only=False)
        order = np.argsort(cells, kind="stable")
        cells = cells[order]
        starts = np.nonzero(np.diff(cells, prepend=cells[0] - 1))[0] \
            if len(cells) else np.array([], np.int64)
        bounds = np.append(starts, len(cells))
        a_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        for k in range(len(starts)):
            span = order[bounds[k]:bounds[k + 1]]
            _cell_pairs(pid[span], xs[span], ys[span], role[span],
                        a_out, b_out)
        if not a_out:
            return _PAIR_SCHEMA.empty_table()
        return pa.table({"id_a": pa.array(np.concatenate(a_out)),
                         "id_b": pa.array(np.concatenate(b_out))},
                        schema=_PAIR_SCHEMA)

    fanned = points.map_batches(fan_out, batch_format="pyarrow")
    return fanned.groupby("bucket").map_groups(per_bucket,
                                               batch_format="pyarrow")


def _degrees(pairs: ray.data.Dataset, n_buckets: int = 64) -> ray.data.Dataset:
    """(point_id, nbrs) — eps-neighbor count per point appearing in pairs."""
    import pandas as pd

    def halves(b: pa.Table) -> pa.Table:
        a = b.column("id_a").combine_chunks()
        bb = b.column("id_b").combine_chunks()
        node = pa.concat_arrays([a, bb])
        return pa.table({
            "__b": _id_shuffle_bucket(node.to_numpy(zero_copy_only=False),
                                      n_buckets=n_buckets),
            "node": node,
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        counts = g.groupby("node").size().sort_index()
        return pd.DataFrame({"point_id": counts.index.to_numpy(),
                             "nbrs": counts.to_numpy().astype(np.int64)})

    return (pairs.map_batches(halves, batch_format="pyarrow")
            .groupby("__b").map_groups(fold, batch_format="pandas"))


def dbscan_points(points: ray.data.Dataset, eps: float, min_pts: int,
                  point_id_col: str = "point_id",
                  x_col: str = "x", y_col: str = "y",
                  level: int | None = None,
                  include_noise: bool = True) -> ray.data.Dataset:
    """DBSCAN over a (point_id, x, y) dataset.

    Returns (point_id:string, cluster:string nullable, is_core:bool):
    cluster = min core-member id of the component for cores, min neighbor
    cluster id for borders, null for noise (noise rows omitted entirely
    when ``include_noise=False``).

    Precondition: ``point_id`` values must be UNIQUE. Duplicate ids are
    undefined behavior — they inflate eps-neighbor degree counts (coreness)
    and collapse distinct points in the output. (Self-pairs arising from a
    duplicated id are dropped in pair generation, but degrees of the shared
    id still merge.)
    """
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    lvl = level_for_eps(eps) if level is None else int(level)
    if tiles.cell_size(lvl) < eps:
        # a finer grid than eps breaks the 8-adjacency invariant: pairs
        # spanning 2+ cells would silently never form
        raise ValueError(
            f"level {lvl} has cell edge {tiles.cell_size(lvl)} < eps {eps}; "
            f"use level <= {level_for_eps(eps)}")

    ids_only = points.map_batches(
        lambda b: pa.table(
            {"point_id": b.column(point_id_col).cast(pa.string())}),
        batch_format="pyarrow")

    pairs = _pair_rows(points, eps, lvl, point_id_col, x_col, y_col)
    pairs = pairs.materialize()  # consumed by degrees + 2 flag joins + border

    if min_pts == 1:
        # every point is core (it counts itself) — no degree pass needed to
        # decide coreness; isolated points become singleton clusters
        cores = ids_only.map_batches(
            lambda b: b.append_column(
                "core", pa.array(np.ones(b.num_rows, np.int8))),
            batch_format="pyarrow").materialize()
    else:
        # min_pts >= 2: a core point has >= 1 neighbor, so the degree table
        # (points appearing in pairs) already contains every candidate —
        # no join back against the full point set
        degrees = _degrees(pairs)

        def core_filter(b: pa.Table) -> pa.Table:
            kept = b.filter(pc.greater_equal(
                pc.add(b.column("nbrs"), 1), min_pts))
            return pa.table({"point_id": kept.column("point_id"),
                             "core": pa.array(
                                 np.ones(kept.num_rows, np.int8))})

        cores = degrees.map_batches(core_filter,
                                    batch_format="pyarrow").materialize()

    def _as(name):
        # cores is exactly (point_id, core) by construction above; rename
        # its key column BY NAME so a column reorder can't swap id and flag
        return lambda b: pa.table({name: b.column("point_id"),
                                   "core": b.column("core")})

    def _rename(mapping):
        return lambda b: b.rename_columns(
            [mapping.get(n, n) for n in b.column_names])

    flagged = lookup_join(
        pairs, cores.map_batches(_as("id_a"), batch_format="pyarrow"),
        on="id_a", value_col="core")
    flagged = flagged.map_batches(_rename({"core": "core_a"}),
                                  batch_format="pyarrow")
    flagged = lookup_join(
        flagged, cores.map_batches(_as("id_b"), batch_format="pyarrow"),
        on="id_b", value_col="core")
    flagged = flagged.map_batches(_rename({"core": "core_b"}),
                                  batch_format="pyarrow").materialize()

    def core_edges(b: pa.Table) -> pa.Table:
        both = pc.and_kleene(pc.is_valid(b.column("core_a")),
                             pc.is_valid(b.column("core_b")))
        kept = b.filter(pc.fill_null(both, False))
        return pa.table({"id_a": kept.column("id_a"),
                         "id_b": kept.column("id_b")})

    def self_edges(b: pa.Table) -> pa.Table:
        return pa.table({"id_a": b.column("point_id"),
                         "id_b": b.column("point_id")})

    edges = (flagged.map_batches(core_edges, batch_format="pyarrow")
             .union(cores.map_batches(self_edges, batch_format="pyarrow")))
    clusters = duplicate_clusters(edges).materialize()
    # clusters: (doc_id, cluster_id) — every core point appears (self-edges)

    core_out = clusters.map_batches(
        lambda b: pa.table({"point_id": b.column("doc_id"),
                            "cluster": b.column("cluster_id"),
                            "is_core": pa.array(
                                np.ones(b.num_rows, np.bool_))}),
        batch_format="pyarrow")

    # border points: exactly one core endpoint; the non-core end attaches to
    # the min cluster label among its core neighbors
    def border_halves(b: pa.Table) -> pa.Table:
        ca = pc.is_valid(b.column("core_a"))
        cb = pc.is_valid(b.column("core_b"))
        a_border = b.filter(pc.and_kleene(pc.invert(ca), cb))
        b_border = b.filter(pc.and_kleene(ca, pc.invert(cb)))
        return pa.table({
            "point_id": pa.concat_arrays(
                [a_border.column("id_a").combine_chunks(),
                 b_border.column("id_b").combine_chunks()]),
            "doc_id": pa.concat_arrays(
                [a_border.column("id_b").combine_chunks(),
                 b_border.column("id_a").combine_chunks()]),
        })

    from ray.data.aggregate import Min

    border_pairs = flagged.map_batches(border_halves, batch_format="pyarrow")
    border_lab = lookup_join(border_pairs, clusters, on="doc_id",
                             value_col="cluster_id")
    borders = (border_lab.groupby("point_id")
               .aggregate(Min("cluster_id", alias_name="cluster")))
    border_out = borders.map_batches(
        lambda b: pa.table({"point_id": b.column("point_id"),
                            "cluster": b.column("cluster"),
                            "is_core": pa.array(
                                np.zeros(b.num_rows, np.bool_))}),
        batch_format="pyarrow")

    assigned = core_out.union(border_out)
    if not include_noise:
        return assigned
    assigned = assigned.materialize()
    noise = semi_join(ids_only, assigned, on="point_id", anti=True)
    noise_out = noise.map_batches(
        lambda b: pa.table({"point_id": b.column("point_id"),
                            "cluster": pa.nulls(b.num_rows, pa.string()),
                            "is_core": pa.array(
                                np.zeros(b.num_rows, np.bool_))}),
        batch_format="pyarrow")
    return assigned.union(noise_out)

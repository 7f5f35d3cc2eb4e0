"""Hierarchical spatial tile index (S2/H3-style, square cells, Morton ids).

The reference has no tiling — it prunes reference candidates with a buffered
bbox semi-join (reference: plugin/brdrq/brdrq_algorithm_autocorrectborders.py:
782-800) and chunks remote downloads per 1000 features. At 100 TB the engine
needs an explicit spatial partitioning key; this module provides it
(SURVEY.md section 7.0.2): a deterministic power-of-2 subdivision of a fixed
planar window, cell id = ``level << 58 | morton(x_cell, y_cell)``.

Why square Morton cells and not true H3 hexes: H3's value is uniform adjacency
on the sphere; in one projected CRS (the reference mandates a single projected
meter CRS, plugin/brdrq/brdrq_utils.py:1498-1502) square cells give the same
partition/shuffle semantics with a trivial, dependency-free, exactly testable
id scheme. The north rule requires *an* explicit spatial tiling with skew-aware
repartition, which this provides.

All functions are vectorized over numpy arrays so they run inside
``map_batches`` on Arrow columns without Python-per-row cost.
"""

from __future__ import annotations

import numpy as np

#: world window (meters). Covers projected national grids like EPSG:31370
#: (x,y in roughly [0, 300_000] m) with huge margin; configurable per job.
WORLD_ORIGIN = (0.0, 0.0)
WORLD_SIZE = float(1 << 22)  # 4,194,304 m

MAX_LEVEL = 22  # finest cell = 1 m at the default window


def cell_size(level: int) -> float:
    return WORLD_SIZE / (1 << level)


def _interleave_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of v so there is a zero bit between each
    (uint64 in/out) — one half of a Morton encode."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def encode_cell_xy(cx: np.ndarray, cy: np.ndarray, level: int) -> np.ndarray:
    """Cell id from integer grid coordinates at `level` (vectorized, int64).

    The single authority for the ``level << 58 | morton`` bit layout —
    encode_cells and any neighbor/ghost-cell construction route through it.
    """
    morton = (_interleave_bits(np.asarray(cx).astype(np.uint64))
              | (_interleave_bits(np.asarray(cy).astype(np.uint64))
                 << np.uint64(1)))
    return ((np.uint64(level) << np.uint64(58)) | morton).astype(np.int64)


def encode_cells(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """Cell id for each (x, y) point at `level` (vectorized, int64)."""
    cs = cell_size(level)
    n = 1 << level
    cx = np.clip(((np.asarray(x) - WORLD_ORIGIN[0]) / cs).astype(np.int64), 0, n - 1)
    cy = np.clip(((np.asarray(y) - WORLD_ORIGIN[1]) / cs).astype(np.int64), 0, n - 1)
    return encode_cell_xy(cx, cy, level)


def cell_xy(cell_ids: np.ndarray):
    """Inverse of encode: (level, cx, cy) arrays."""
    c = np.asarray(cell_ids).astype(np.uint64)
    level = (c >> np.uint64(58)).astype(np.int64)
    morton = c & np.uint64((1 << 58) - 1)

    def _deinterleave(v):
        v = v & np.uint64(0x5555555555555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return v.astype(np.int64)

    return level, _deinterleave(morton), _deinterleave(morton >> np.uint64(1))


def cell_bounds(cell_id: int):
    """(xmin, ymin, xmax, ymax) of one cell."""
    level, cx, cy = cell_xy(np.array([cell_id]))
    cs = cell_size(int(level[0]))
    x0 = WORLD_ORIGIN[0] + cx[0] * cs
    y0 = WORLD_ORIGIN[1] + cy[0] * cs
    return x0, y0, x0 + cs, y0 + cs


def parent_cells(cell_ids: np.ndarray, d: int = 1) -> np.ndarray:
    """Cell id at `d` levels coarser, for each input cell (vectorized pure
    bit op: level field decremented, Morton code shifted by 2 bits/level —
    the quadtree parent, the grid analog of H3 cellToParent)."""
    c = np.asarray(cell_ids).astype(np.uint64)
    level = c >> np.uint64(58)
    if d < 0 or np.any(level < np.uint64(d)):
        raise ValueError("d must be in [0, min cell level]")
    morton = c & np.uint64((1 << 58) - 1)
    return (((level - np.uint64(d)) << np.uint64(58))
            | (morton >> np.uint64(2 * d))).astype(np.int64)


def child_cells(cell_ids: np.ndarray, d: int = 1) -> np.ndarray:
    """All 4**d descendant cell ids at `d` levels finer, for each input cell:
    shape (len(cell_ids), 4**d), row i = children of cell_ids[i] in Morton
    order (pure bit op — the inverse fan-out of :func:`parent_cells`)."""
    c = np.asarray(cell_ids).astype(np.uint64)
    level = c >> np.uint64(58)
    if d < 0 or np.any(level + np.uint64(d) > np.uint64(MAX_LEVEL)):
        raise ValueError("d must keep level <= MAX_LEVEL")
    morton = c & np.uint64((1 << 58) - 1)
    suffix = np.arange(1 << (2 * d), dtype=np.uint64)
    return ((((level + np.uint64(d)) << np.uint64(58))[:, None]
             | (morton << np.uint64(2 * d))[:, None]
             | suffix[None, :]).astype(np.int64))


def owner_cell(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """The cell owning a feature = the cell containing its centroid/anchor.
    Exactly one owner per feature (SURVEY.md section 7.4.3)."""
    return encode_cells(x, y, level)


def cover_bbox(xmin, ymin, xmax, ymax, level: int, expand: float = 0.0):
    """Cell ids covering one bbox (optionally expanded by `expand` meters).
    Scalar bbox -> 1-D int64 array of cell ids."""
    cs = cell_size(level)
    n = 1 << level
    x0 = int(np.clip((xmin - expand - WORLD_ORIGIN[0]) / cs, 0, n - 1))
    x1 = int(np.clip((xmax + expand - WORLD_ORIGIN[0]) / cs, 0, n - 1))
    y0 = int(np.clip((ymin - expand - WORLD_ORIGIN[1]) / cs, 0, n - 1))
    y1 = int(np.clip((ymax + expand - WORLD_ORIGIN[1]) / cs, 0, n - 1))
    cx, cy = np.meshgrid(np.arange(x0, x1 + 1, dtype=np.int64),
                         np.arange(y0, y1 + 1, dtype=np.int64))
    cx = cx.ravel()
    cy = cy.ravel()
    morton = _interleave_bits(cx.astype(np.uint64)) | (_interleave_bits(cy.astype(np.uint64)) << np.uint64(1))
    return ((np.uint64(level) << np.uint64(58)) | morton).astype(np.int64)


def cover_bboxes(xmin, ymin, xmax, ymax, level: int, expand: float = 0.0):
    """Vectorized cover for many bboxes: returns (row_index, cell_id) arrays —
    the explode used by ``flat_map``-style tile assignment in a batch."""
    xmin = np.asarray(xmin, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)
    cs = cell_size(level)
    n = 1 << level
    x0 = np.clip(((xmin - expand - WORLD_ORIGIN[0]) / cs), 0, n - 1).astype(np.int64)
    x1 = np.clip(((xmax + expand - WORLD_ORIGIN[0]) / cs), 0, n - 1).astype(np.int64)
    y0 = np.clip(((ymin - expand - WORLD_ORIGIN[1]) / cs), 0, n - 1).astype(np.int64)
    y1 = np.clip(((ymax + expand - WORLD_ORIGIN[1]) / cs), 0, n - 1).astype(np.int64)
    counts = (x1 - x0 + 1) * (y1 - y0 + 1)
    total = int(counts.sum())
    rows = np.repeat(np.arange(len(xmin), dtype=np.int64), counts)
    # per-row local enumeration of the (w x h) grid
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
    w = np.repeat(x1 - x0 + 1, counts)
    cx = np.repeat(x0, counts) + local % w
    cy = np.repeat(y0, counts) + local // w
    morton = _interleave_bits(cx.astype(np.uint64)) | (_interleave_bits(cy.astype(np.uint64)) << np.uint64(1))
    cells = ((np.uint64(level) << np.uint64(58)) | morton).astype(np.int64)
    return rows, cells


def pick_level(max_extent: float, relevant_distance: float, target: float = 4.0) -> int:
    """Choose the coarsest level whose cell size >= target * (max feature
    extent + 2 * 1.01 * rd) so a feature's search region stays within the
    3x3 neighborhood of its owner cell (correctness condition for the
    one-shuffle co-partition join; see pipelines.autocorrect)."""
    need = max(max_extent + 2 * 1.01 * relevant_distance, 1.0) * target
    level = MAX_LEVEL
    while level > 0 and cell_size(level) < need:
        level -= 1
    return level


def salt_hot_cells(cell_counts: dict[int, int], threshold: int, max_salt: int = 64) -> dict[int, int]:
    """Skew handling: for cells whose row count exceeds `threshold`, return a
    salt factor k (theme rows of that cell are split into k sub-groups; the
    cell's reference slice is replicated to each). Cells not in the map use
    salt 1. This bounds the largest shuffle group without breaking the
    cell-size correctness guarantee (unlike re-leveling would)."""
    out = {}
    for cell, cnt in cell_counts.items():
        if cnt > threshold:
            out[int(cell)] = int(min(max_salt, -(-cnt // threshold)))
    return out

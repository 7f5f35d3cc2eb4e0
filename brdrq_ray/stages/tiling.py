"""Tiling stages: owner-cell assignment, cover explosion, hot-cell salting.

These are the batch transforms that turn the reference's driver-memory
candidate pruning (the buffered-bbox semi-join at
plugin/brdrq/brdrq_algorithm_autocorrectborders.py:782-800) into an explicit,
shuffle-ready spatial partitioning (SURVEY.md section 7.2.3):

* thematic features get exactly ONE owner cell (bbox-centroid rule) — one
  result row per feature, no cross-tile dedup needed;
* reference parcels are replicated to every cell their bbox-expanded-by-one-
  cell cover touches, which guarantees any theme in a cell sees every parcel
  its search region (bbox + 1.01*rd) can reach, provided
  cell_size >= max_theme_extent + 2*1.01*rd (see tiles.pick_level);
* hot cells are salted: theme rows split into k sub-keys, reference rows
  replicated k times — bounded shuffle groups without breaking the cell-size
  guarantee.

All operate on pyarrow batches with numpy vector math (no per-row Python on
the coordinate path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import tiles


def assign_owner_cell(batch: pa.Table, level: int) -> pa.Table:
    """Owner cell = cell containing the bbox center (exactly one per row)."""
    xmin = batch.column("xmin").to_numpy(zero_copy_only=False)
    xmax = batch.column("xmax").to_numpy(zero_copy_only=False)
    ymin = batch.column("ymin").to_numpy(zero_copy_only=False)
    ymax = batch.column("ymax").to_numpy(zero_copy_only=False)
    cx = (xmin + xmax) * 0.5
    cy = (ymin + ymax) * 0.5
    ok = np.isfinite(cx)
    cells = np.where(ok, tiles.owner_cell(np.nan_to_num(cx), np.nan_to_num(cy), level), -1)
    return batch.append_column("cell", pa.array(cells, pa.int64()))


def explode_cover(batch: pa.Table, level: int, expand: float = 0.0) -> pa.Table:
    """Replicate each row to every cell of its (expanded) bbox cover; adds a
    `cell` column. The reference side of the tile join uses
    expand = cell_size(level)."""
    xmin = batch.column("xmin").to_numpy(zero_copy_only=False)
    xmax = batch.column("xmax").to_numpy(zero_copy_only=False)
    ymin = batch.column("ymin").to_numpy(zero_copy_only=False)
    ymax = batch.column("ymax").to_numpy(zero_copy_only=False)
    ok = np.isfinite(xmin)
    rows, cells = tiles.cover_bboxes(np.nan_to_num(xmin), np.nan_to_num(ymin),
                                     np.nan_to_num(xmax), np.nan_to_num(ymax),
                                     level, expand=expand)
    keep = ok[rows]
    rows, cells = rows[keep], cells[keep]
    out = batch.take(pa.array(rows, pa.int64()))
    return out.append_column("cell", pa.array(cells, pa.int64()))


def _stable_hash_mod(ids: pa.Array, k: np.ndarray) -> np.ndarray:
    """Deterministic per-id salt in [0, k): crc32 over the id string (one
    C-level call per hot-cell row — no per-character Python loop)."""
    import zlib
    out = np.zeros(len(k), dtype=np.int64)
    hot = np.nonzero(k > 1)[0]
    if len(hot) == 0:
        return out
    id_list = ids.to_pylist()
    for i in hot:
        out[i] = zlib.crc32(str(id_list[i]).encode()) % int(k[i])
    return out


def salt_theme(batch: pa.Table, salts: dict[int, int], id_col: str = "theme_id") -> pa.Table:
    """Split hot-cell theme rows across k salt sub-keys."""
    cells = batch.column("cell").to_numpy(zero_copy_only=False)
    k = np.array([salts.get(int(c), 1) for c in cells], dtype=np.int64)
    salt = _stable_hash_mod(batch.column(id_col), k)
    return batch.append_column("salt", pa.array(salt, pa.int32()))


def salt_reference(batch: pa.Table, salts: dict[int, int]) -> pa.Table:
    """Replicate hot-cell reference rows once per salt sub-key."""
    cells = batch.column("cell").to_numpy(zero_copy_only=False)
    k = np.array([salts.get(int(c), 1) for c in cells], dtype=np.int64)
    rows = np.repeat(np.arange(len(cells), dtype=np.int64), k)
    salt = np.concatenate([np.arange(kk, dtype=np.int64) for kk in k]) if len(k) else np.array([], np.int64)
    out = batch.take(pa.array(rows, pa.int64()))
    return out.append_column("salt", pa.array(salt.astype(np.int32), pa.int32()))

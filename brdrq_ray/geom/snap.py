"""Vertex snapping for (Multi)LineString / (Multi)Point alignment.

The reference aligns lines and points with the SnapGeometryProcessor
(id '2024:snap2024a') instead of the polygon overlap processor (enum at
plugin/brdrq/brdrq_utils.py:102-110, factory :212-230), controlled by
SnapStrategy {NO_PREFERENCE, PREFER_VERTICES, PREFER_ENDS_AND_ANGLES,
ONLY_VERTICES} and ``snap_max_segment_length`` (default 2, docs at
docs/featurealigner.md:66-69; reference: plugin/brdrq/brdrq_settings.py:304).

Rebuilt semantics (frozen as the engine's, SURVEY.md section 7.4.2):

* segments longer than ``max_segment_length`` are densified first (extra
  vertices every <= max_segment_length along the segment);
* each vertex within ``relevant_distance`` of the reference boundary moves to
  its snap target; farther vertices stay;
* the target depends on the strategy: nearest point on the boundary
  (NO_PREFERENCE), the nearest reference VERTEX if one is within rd else the
  nearest boundary point (PREFER_VERTICES / PREFER_ENDS_AND_ANGLES — the
  ends-and-angles refinement treats reference corner vertices, which is what
  our parcel vertices are), or the nearest reference vertex only
  (ONLY_VERTICES — no snap if no vertex in range).

All distance math is vectorized (points x segments / points x vertices).
"""

from __future__ import annotations

import numpy as np

from . import core as g

SNAP_NO_PREFERENCE = "NO_PREFERENCE"
SNAP_PREFER_VERTICES = "PREFER_VERTICES"
SNAP_PREFER_ENDS_AND_ANGLES = "PREFER_ENDS_AND_ANGLES"
SNAP_ONLY_VERTICES = "ONLY_VERTICES"


def densify_line(coords: np.ndarray, max_seg: float) -> np.ndarray:
    """Insert vertices so no segment exceeds max_seg (keeps originals)."""
    if len(coords) < 2 or max_seg <= 0:
        return coords
    out = [coords[:1]]
    for a, b in zip(coords[:-1], coords[1:]):
        d = float(np.hypot(*(b - a)))
        n = int(np.ceil(d / max_seg))
        if n > 1:
            t = np.linspace(0, 1, n + 1)[1:-1]
            out.append(a[None, :] + t[:, None] * (b - a)[None, :])
        out.append(b[None, :])
    return g.snap(np.vstack(out))


def _reference_geometry_arrays(ref_parts_list):
    """Flatten reference boundaries to (seg_starts, seg_ends, vertices)."""
    a, b, v = [], [], []
    for parts in ref_parts_list:
        sa, sb = g._poly_edges(parts)
        if len(sa):
            a.append(sa)
            b.append(sb)
            v.append(np.vstack([r for rings in parts for r in rings]))
    if not a:
        z = np.zeros((0, 2))
        return z, z, z
    return np.vstack(a), np.vstack(b), np.vstack(v)


def snap_points(pts: np.ndarray, seg_a: np.ndarray, seg_b: np.ndarray,
                vertices: np.ndarray, rd: float,
                strategy: str = SNAP_NO_PREFERENCE) -> tuple[np.ndarray, np.ndarray]:
    """Snap each point per the strategy. Returns (new_pts, moved_mask)."""
    k = len(pts)
    out = pts.copy()
    moved = np.zeros(k, dtype=bool)
    if k == 0:
        return out, moved

    # nearest boundary projection — point axis chunked so the (k x n_segs)
    # temporaries stay bounded (~32 MB) for huge rings x dense references;
    # per-chunk argmins are independent, output bit-identical
    have_segs = len(seg_a) > 0
    if have_segs:
        ab = seg_b - seg_a
        ab2 = (ab * ab).sum(axis=1)
        ab2[ab2 == 0] = 1e-300
        best_proj = np.empty_like(pts)
        best_dseg = np.empty(k, dtype=np.float64)
        for s, e in g.chunk_spans(k, len(seg_a)):
            p = pts[s:e]
            ap = p[:, None, :] - seg_a[None, :, :]
            t = np.clip((ap * ab[None, :, :]).sum(axis=2) / ab2[None, :], 0.0, 1.0)
            proj = seg_a[None, :, :] + t[:, :, None] * ab[None, :, :]
            dseg = np.hypot(p[:, None, 0] - proj[:, :, 0],
                            p[:, None, 1] - proj[:, :, 1])
            jmin = dseg.argmin(axis=1)
            rows = np.arange(len(p))
            best_proj[s:e] = proj[rows, jmin]
            best_dseg[s:e] = dseg[rows, jmin]
    else:
        best_proj = pts
        best_dseg = np.full(k, np.inf)

    have_verts = len(vertices) > 0
    if have_verts:
        best_vert = np.empty_like(pts)
        best_dvert = np.empty(k, dtype=np.float64)
        for s, e in g.chunk_spans(k, len(vertices)):
            p = pts[s:e]
            dv = np.hypot(p[:, None, 0] - vertices[None, :, 0],
                          p[:, None, 1] - vertices[None, :, 1])
            vmin = dv.argmin(axis=1)
            best_vert[s:e] = vertices[vmin]
            best_dvert[s:e] = dv[np.arange(len(p)), vmin]
    else:
        best_vert = pts
        best_dvert = np.full(k, np.inf)

    if strategy == SNAP_ONLY_VERTICES:
        sel = best_dvert <= rd
        out[sel] = best_vert[sel]
        moved |= sel
    elif strategy in (SNAP_PREFER_VERTICES, SNAP_PREFER_ENDS_AND_ANGLES):
        use_v = best_dvert <= rd
        use_s = (~use_v) & (best_dseg <= rd)
        out[use_v] = best_vert[use_v]
        out[use_s] = best_proj[use_s]
        moved |= use_v | use_s
    else:  # NO_PREFERENCE: nearest boundary point
        sel = best_dseg <= rd
        out[sel] = best_proj[sel]
        moved |= sel
    return g.snap(out), moved


def snap_geometry(kind: int, parts, ref_parts_list, rd: float,
                  strategy: str = SNAP_NO_PREFERENCE,
                  max_segment_length: float = 2.0):
    """Snap a line/point geometry to the reference boundaries. Returns
    (kind, new_parts, n_moved)."""
    seg_a, seg_b, vertices = _reference_geometry_arrays(ref_parts_list)
    total_moved = 0
    out_parts = []
    for part in parts:
        new_rings = []
        for ring in part:
            coords = np.asarray(ring, dtype=np.float64)
            if kind == g.GEOM_LINESTRING and len(coords) >= 2:
                coords = densify_line(coords, max_segment_length)
            snapped, moved = snap_points(coords, seg_a, seg_b, vertices, rd, strategy)
            # collapse consecutive duplicates the snap may create
            if len(snapped) > 1:
                keep = np.ones(len(snapped), dtype=bool)
                keep[1:] = np.any(snapped[1:] != snapped[:-1], axis=1)
                snapped = snapped[keep]
            new_rings.append(snapped)
            total_moved += int(moved.sum())
        out_parts.append(new_rings)
    return kind, out_parts, total_moved

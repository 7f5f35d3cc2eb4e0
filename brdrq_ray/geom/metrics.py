"""Geometry distance metrics: discrete Hausdorff with optional densification.

The reference's quality audit is area-based (symmetric-difference metrics,
plugin/brdrq docs/autocorrectborders.md "diffs"); Hausdorff is the standard
complementary WORST-POINT metric — how far the aligned boundary ever strays
from the original — used by PostGIS ST_HausdorffDistance / GEOS
DiscreteHausdorffDistance.

Semantics (a deliberate refinement of GEOS's discrete form):

- polygons and linestrings are measured between their BOUNDARIES, points
  between the point sets (GEOS likewise walks coordinates).
- directed h(A -> B) = max over A's (optionally densified) vertices of the
  EXACT distance to B's boundary (point-to-SEGMENT, not point-to-vertex —
  GEOS discretizes both sides; here only the sup over A's continuum is
  discretized, so the value is always >= GEOS's at the same densification
  and converges from below to the true Hausdorff as densify -> 0).
- ``densify`` is an absolute max segment length in meters (the engine's
  snap_max_segment_length convention), not GEOS's densifyFrac fraction;
  0 disables densification (vertices only).

Everything is vectorized: densify_line per ring (numpy), then ONE
points_to_segments_distance call per direction (chunked to ~32 MB
temporaries regardless of geometry size).
"""

from __future__ import annotations

import numpy as np

from . import core as g
from .snap import densify_line


def _boundary_edges(kind: int, parts) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of all boundary segments; empty for point geometries."""
    if kind == g.GEOM_POLYGON:
        return g._poly_edges(parts)
    if kind == g.GEOM_LINESTRING:
        a, b = [], []
        for rings in parts:
            for r in rings:
                if len(r) >= 2:
                    a.append(r[:-1])
                    b.append(r[1:])
        if not a:
            return np.zeros((0, 2)), np.zeros((0, 2))
        return np.vstack(a), np.vstack(b)
    return np.zeros((0, 2)), np.zeros((0, 2))


def _sample_points(kind: int, parts, densify: float) -> np.ndarray:
    """All vertices of the geometry, densified to ``densify`` max segment
    length when > 0 (polygon rings are closed before densifying so the
    closing edge is sampled too)."""
    pts = []
    for rings in parts:
        for r in rings:
            if len(r) == 0:
                continue
            if densify > 0 and len(r) >= 2:
                closed = (np.vstack([r, r[:1]])
                          if kind == g.GEOM_POLYGON else r)
                pts.append(densify_line(closed, densify))
            else:
                pts.append(r)
    if not pts:
        return np.zeros((0, 2))
    return np.vstack(pts)


def directed_hausdorff(kind_a: int, parts_a, kind_b: int, parts_b,
                       densify: float = 0.0) -> float:
    """h(A -> B): max over A's sample points of the exact distance to B.
    NaN when either side is empty."""
    pa_ = _sample_points(kind_a, parts_a, densify)
    if len(pa_) == 0:
        return float("nan")
    sa, sb = _boundary_edges(kind_b, parts_b)
    if len(sa):
        d = g.points_to_segments_distance(pa_, sa, sb)
    else:
        vb = _sample_points(kind_b, parts_b, 0.0)
        if len(vb) == 0:
            return float("nan")
        d = np.full(len(pa_), np.inf)
        for s, e in g.chunk_spans(len(pa_), len(vb)):
            dv = np.hypot(pa_[s:e, None, 0] - vb[None, :, 0],
                          pa_[s:e, None, 1] - vb[None, :, 1])
            d[s:e] = dv.min(axis=1)
    return float(d.max())


def hausdorff_distance(kind_a: int, parts_a, kind_b: int, parts_b,
                       densify: float = 0.0) -> float:
    """Symmetric Hausdorff: max of the two directed distances."""
    return max(directed_hausdorff(kind_a, parts_a, kind_b, parts_b, densify),
               directed_hausdorff(kind_b, parts_b, kind_a, parts_a, densify))


def _any_proper_crossing(a1: np.ndarray, a2: np.ndarray,
                         b1: np.ndarray, b2: np.ndarray) -> bool:
    """True when any segment of A properly crosses any segment of B
    (interior x interior). Touch/collinear-overlap cases are NOT detected
    here — they have a zero vertex-to-segment distance and are caught by
    the distance minimum instead. Chunked pairwise orientation tests."""
    if len(a1) == 0 or len(b1) == 0:
        return False

    def _ccw(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    for s, e in g.chunk_spans(len(a1), len(b1), budget=1_000_000):
        p1, p2 = a1[s:e], a2[s:e]
        d1 = _ccw(p1[:, None, 0], p1[:, None, 1], p2[:, None, 0],
                  p2[:, None, 1], b1[None, :, 0], b1[None, :, 1])
        d2 = _ccw(p1[:, None, 0], p1[:, None, 1], p2[:, None, 0],
                  p2[:, None, 1], b2[None, :, 0], b2[None, :, 1])
        d3 = _ccw(b1[None, :, 0], b1[None, :, 1], b2[None, :, 0],
                  b2[None, :, 1], p1[:, None, 0], p1[:, None, 1])
        d4 = _ccw(b1[None, :, 0], b1[None, :, 1], b2[None, :, 0],
                  b2[None, :, 1], p2[:, None, 0], p2[:, None, 1])
        if np.any((d1 * d2 < 0) & (d3 * d4 < 0)):
            return True
    return False


def boundary_distance(kind_a: int, parts_a, kind_b: int, parts_b) -> float:
    """Exact min distance between the two BOUNDARIES (point sets for point
    geometries): min vertex-to-opposite-segment over both directions — the
    attained form for non-crossing segment sets — forced to 0 when any
    segment pair properly crosses. NaN when either side is empty."""
    va = _sample_points(kind_a, parts_a, 0.0)
    vb = _sample_points(kind_b, parts_b, 0.0)
    if len(va) == 0 or len(vb) == 0:
        return float("nan")
    sa1, sa2 = _boundary_edges(kind_a, parts_a)
    sb1, sb2 = _boundary_edges(kind_b, parts_b)
    best = np.inf
    if len(sb1):
        best = min(best, float(
            g.points_to_segments_distance(va, sb1, sb2).min()))
    if len(sa1):
        best = min(best, float(
            g.points_to_segments_distance(vb, sa1, sa2).min()))
    if not len(sa1) and not len(sb1):  # point vs point
        for s, e in g.chunk_spans(len(va), len(vb)):
            dv = np.hypot(va[s:e, None, 0] - vb[None, :, 0],
                          va[s:e, None, 1] - vb[None, :, 1])
            best = min(best, float(dv.min()))
    if best > 0 and _any_proper_crossing(sa1, sa2, sb1, sb2):
        return 0.0
    return best


def geom_distance(kind_a: int, parts_a, kind_b: int, parts_b) -> float:
    """Set distance between two geometries (the ST_Distance contract):
    boundary distance, except polygons are AREAS — a geometry inside a
    polygon (or a polygon inside it) is at distance 0 even though the
    boundaries are apart."""
    d = boundary_distance(kind_a, parts_a, kind_b, parts_b)
    if not (d > 0):  # 0 or NaN
        return d

    def _part_probes(parts):
        # boundaries are strictly apart (d > 0), so each PART is entirely
        # inside or outside the other polygon: one probe vertex per part
        pts = [rings[0][:1] for rings in parts if rings and len(rings[0])]
        return np.vstack(pts) if pts else np.zeros((0, 2))

    if kind_b == g.GEOM_POLYGON:
        probe = _part_probes(parts_a)
        if len(probe) and bool(np.any(g.points_in_polygon(probe, parts_b))):
            return 0.0
    if kind_a == g.GEOM_POLYGON:
        probe = _part_probes(parts_b)
        if len(probe) and bool(np.any(g.points_in_polygon(probe, parts_a))):
            return 0.0
    return d

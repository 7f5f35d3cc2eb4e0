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

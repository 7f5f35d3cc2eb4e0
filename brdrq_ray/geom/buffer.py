"""Morphological polygon operations: dilate / erode / opening / closing.

The reference buffers thematic geometries by ``1.01 * relevant_distance`` with
10 segments per quadrant to build the reference search region (reference:
plugin/brdrq/brdrq_utils.py:1571-1586) and applies a tiny closing with
``correction_distance = 0.01`` m to clean slivers (reference:
plugin/brdrq/brdrq_algorithm_autocorrectborders.py:192-193).  brdr's
relevant-distance method itself is an opening/closing-buffer construction
(reference: README.md:19-27).

Without GEOS we build buffers from the identity

    dilate(P, r) = P  UNION  (capsule(e, r) for every boundary edge e)
    erode(P, r)  = P  MINUS  (capsule(e, r) for every boundary edge e)

where a capsule is the Minkowski sum of a segment with a radius-r disc
(rectangle + two n-gon end caps, ``SEGMENTS_PER_QUADRANT`` = 10 like the
reference). Exact up to the circle discretization; runs on the overlay kernel.
Not on the alignment hot path (relevance uses the inradius test instead) —
used by the closing cleanup and exposed as an operator.
"""

from __future__ import annotations

import math

import numpy as np

from .core import GEOM_POLYGON, make_valid, snap
from .boolean import overlay, union_many

SEGMENTS_PER_QUADRANT = 10


def _disc(cx: float, cy: float, r: float, n_per_quad: int = SEGMENTS_PER_QUADRANT) -> np.ndarray:
    n = max(8, 4 * n_per_quad)
    ang = np.linspace(0.0, 2.0 * math.pi, n, endpoint=False)
    return snap(np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)]))


def _capsule(ax, ay, bx, by, r, n_per_quad=SEGMENTS_PER_QUADRANT):
    """Minkowski sum of segment (a,b) with a radius-r disc, as one CCW ring."""
    dx, dy = bx - ax, by - ay
    L = math.hypot(dx, dy)
    if L < 1e-12:
        return [_disc(ax, ay, r, n_per_quad)]
    ux, uy = dx / L, dy / L
    base = math.atan2(uy, ux)
    n = max(4, 2 * n_per_quad)
    # half circle around b from -90deg to +90deg (relative to direction)
    t1 = np.linspace(base - math.pi / 2, base + math.pi / 2, n)
    cap_b = np.column_stack([bx + r * np.cos(t1), by + r * np.sin(t1)])
    t2 = np.linspace(base + math.pi / 2, base + 3 * math.pi / 2, n)
    cap_a = np.column_stack([ax + r * np.cos(t2), ay + r * np.sin(t2)])
    ring = snap(np.vstack([cap_b, cap_a]))
    return [ring]


def _boundary_capsules(parts, r):
    caps = []
    for rings in parts:
        for ring in rings:
            nxt = np.roll(ring, -1, axis=0)
            for (ax, ay), (bx, by) in zip(ring, nxt):
                caps.append([_capsule(ax, ay, bx, by, r)])
    return caps


def dilate(parts, r: float):
    """Positive buffer of a multipolygon. r <= 0 delegates to erode."""
    if r == 0 or not parts:
        return parts
    if r < 0:
        return erode(parts, -r)
    caps = _boundary_capsules(parts, r)
    grown = union_many([parts] + caps)
    _, grown = make_valid(GEOM_POLYGON, grown)
    return grown


def erode(parts, r: float):
    """Negative buffer: remove everything within r of the boundary."""
    if r == 0 or not parts:
        return parts
    caps = _boundary_capsules(parts, r)
    carve = union_many(caps)
    out = overlay(parts, carve, "difference")
    _, out = make_valid(GEOM_POLYGON, out)
    return out


def opening(parts, r: float):
    """erode then dilate — removes protrusions/slivers thinner than 2r (the
    brdr relevance construction)."""
    return dilate(erode(parts, r), r)


def closing(parts, r: float):
    """dilate then erode — fills gaps/cracks thinner than 2r (the reference's
    correction_distance cleanup)."""
    return erode(dilate(parts, r), r)

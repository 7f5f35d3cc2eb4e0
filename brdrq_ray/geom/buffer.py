"""Morphological polygon operations: dilate / erode / opening / closing.

The reference buffers thematic geometries by ``1.01 * relevant_distance`` with
10 segments per quadrant to build the reference search region (reference:
plugin/brdrq/brdrq_utils.py:1571-1586) and applies a tiny closing with
``correction_distance = 0.01`` m to clean slivers (reference:
plugin/brdrq/brdrq_algorithm_autocorrectborders.py:192-193).  brdr's
relevant-distance method itself is an opening/closing-buffer construction
(reference: README.md:19-27).

Without GEOS we build buffers by the raw-offset-curve + winding-number
construction (Chen & McMains 2005, "Polygon Offsetting by Computing Winding
Numbers"): offset every ring by r to the proper side, insert circular arcs at
diverging vertices, connect directly at converging ones (creating crossing
swallowtail loops), then keep the POSITIVE-winding region via the same
winding-field trapezoid machinery the ring repair uses. One chain repair per
ring instead of one polygon union per boundary edge — ~50x cheaper than the
per-edge capsule construction (kept as _dilate_capsules/_erode_capsules for
the equivalence test), which is what makes the reference's always-on
correction_distance closing affordable per result.

Arcs use ``SEGMENTS_PER_QUADRANT`` = 10 like the reference. Exact up to the
circle discretization; runs on the overlay kernel only for multi-part unions
and hole subtraction.
"""

from __future__ import annotations

import math

import numpy as np

from .core import GEOM_POLYGON, make_valid, snap
from .boolean import overlay, union_many

SEGMENTS_PER_QUADRANT = 10


def _next_rows(a: np.ndarray) -> np.ndarray:
    """np.roll(a, -1, axis=0) element-for-element, without roll's overhead."""
    return np.concatenate((a[1:], a[:1]))


def _prev_rows(a: np.ndarray) -> np.ndarray:
    """np.roll(a, 1, axis=0) element-for-element."""
    return np.concatenate((a[-1:], a[:-1]))


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


def _dilate_capsules(parts, r: float):
    """Legacy per-edge capsule construction (one union per boundary edge);
    kept as the oracle for the raw-offset equivalence test."""
    caps = _boundary_capsules(parts, r)
    grown = union_many([parts] + caps)
    _, grown = make_valid(GEOM_POLYGON, grown)
    return grown


def _erode_capsules(parts, r: float):
    caps = _boundary_capsules(parts, r)
    carve = union_many(caps)
    out = overlay(parts, carve, "difference")
    _, out = make_valid(GEOM_POLYGON, out)
    return out


def _raw_offset_chain(ring: np.ndarray, r: float, side: int,
                      join: str = "round",
                      n_per_quad: int = SEGMENTS_PER_QUADRANT) -> np.ndarray:
    """Raw offset curve of a closed ring: every edge shifted r to ``side``
    (+1 = right of travel, -1 = left); at vertices where consecutive offset
    edges DIVERGE insert a circular arc (join='round') or the single miter
    intersection point capped at 2r (join='miter', bevel chord beyond the
    cap); where they converge connect directly (creating a crossing loop for
    the winding rule to drop).

    The miter join matters for closing(): a round dilate creates radius-r
    arcs that the subsequent radius-r erode must collapse back to a point —
    critically degenerate at snap precision (a cloud of crossings in one
    1e-6 cell). Mitered joins keep every edge long and every corner a single
    point, so erode(dilate(P)) is numerically exact on unchanged geometry."""
    pts: list = []
    d = _next_rows(ring) - ring
    L = np.hypot(d[:, 0], d[:, 1])
    keep = L > 1e-12
    ring = ring[keep]
    if len(ring) < 3:
        return np.empty((0, 2))
    d = _next_rows(ring) - ring
    L = np.hypot(d[:, 0], d[:, 1])
    u = d / L[:, None]
    nr = np.column_stack([u[:, 1], -u[:, 0]]) * side
    n = len(ring)
    for i in range(n):
        j = (i + 1) % n
        pts.append(ring[i] + r * nr[i])
        pts.append(ring[j] + r * nr[i])
        crossz = u[i, 0] * u[j, 1] - u[i, 1] * u[j, 0]
        diverge = (crossz > 0) if side > 0 else (crossz < 0)
        if not diverge:
            continue
        v = ring[j]
        if join == "miter":
            dot = float(nr[i] @ nr[j])
            denom = 1.0 + dot
            # miter length r*sqrt(2/denom); cap at 2r -> denom >= 0.5
            if denom >= 0.5:
                pts.append(v + r * (nr[i] + nr[j]) / denom)
            # else: bevel = the direct chord already formed by the two
            # offset endpoints
            continue
        a0 = math.atan2(nr[i, 1], nr[i, 0])
        a1 = math.atan2(nr[j, 1], nr[j, 0])
        delta = (a1 - a0) % (2 * math.pi)      # CCW sweep for side=+1
        if side < 0:
            delta = delta - 2 * math.pi        # CW sweep for side=-1
        k = max(1, int(math.ceil(abs(delta) / (math.pi / 2) * n_per_quad)))
        for t in np.linspace(a0, a0 + delta, k + 1)[1:-1]:
            pts.append(v + r * np.array([math.cos(t), math.sin(t)]))
    return snap(np.asarray(pts, dtype=np.float64))


def _simplify_ring(ring: np.ndarray, tol: float = 2e-6) -> np.ndarray:
    """Drop repair staircase artifacts: vertices whose perpendicular
    deviation from the (prev, next) chord is below ``tol``. The winding
    trapezoid pass adds a vertex on every boundary edge each slab line
    crosses — exactly collinear pre-snap, epsilon-off after — and offsetting
    those micro edges inward creates the tiny-edge storms that disintegrate
    the erode winding field. ``tol`` stays at snap scale (2*SNAP), so each
    removal moves the boundary by less than the 1e-6 snap grid."""
    while len(ring) > 3:
        prev = _prev_rows(ring)
        nxt = _next_rows(ring)
        chord = nxt - prev
        clen = np.hypot(chord[:, 0], chord[:, 1])
        mid = ring - prev
        dev = np.abs(chord[:, 0] * mid[:, 1] - chord[:, 1] * mid[:, 0])
        ok = clen > 1e-12
        dev[ok] = dev[ok] / clen[ok]
        dev[~ok] = 0.0          # prev == next: a zero-width spike, drop
        drop = dev < tol
        if not drop.any():
            break
        # never drop two ADJACENT vertices in one pass (each removal changes
        # its neighbours' chords); iterate instead
        keep = np.ones(len(ring), dtype=bool)
        prev_kept = True
        for i in range(len(ring)):
            if drop[i] and prev_kept:
                keep[i] = False
                prev_kept = False
            else:
                prev_kept = True
        if keep.all() or int(keep.sum()) < 3:
            break
        ring = ring[keep]
    return ring


def _simplify_parts(parts, tol: float = 2e-6):
    out = []
    for rings in parts:
        new_rings = []
        for k, ring in enumerate(rings):
            s = _simplify_ring(ring, tol)
            if len(s) >= 3:
                new_rings.append(s)
            elif k == 0:
                new_rings = None  # shell degenerated -> drop the part
                break
        if new_rings:
            out.append(new_rings)
    return out


def _chain_region(chain: np.ndarray):
    """Positive-winding region of a raw offset chain -> clean parts."""
    from .core import canon_ring, repair_ring, ring_is_simple, ring_signed_area
    if len(chain) < 3:
        return []
    if ring_is_simple(chain):
        # no crossings: the chain IS the region boundary (or nothing, when
        # an inward offset inverted the ring)
        if ring_signed_area(chain) > 0:
            return [[canon_ring(chain)]]
        return []
    return _simplify_parts(repair_ring(chain, rule="positive"))


def _grow_region(ring_ccw: np.ndarray, r: float, join: str = "round"):
    """dilate(filled CCW ring, r) via the right-side raw offset."""
    return _chain_region(_raw_offset_chain(ring_ccw, r, side=+1, join=join))


def _shrink_region(ring_ccw: np.ndarray, r: float, join: str = "round"):
    """erode(filled CCW ring, r) via the left-side raw offset (may vanish)."""
    return _chain_region(_raw_offset_chain(ring_ccw, r, side=-1, join=join))


def _ccw(ring: np.ndarray) -> np.ndarray:
    from .core import ring_signed_area
    return ring if ring_signed_area(ring) > 0 else ring[::-1].copy()


def dilate(parts, r: float, join: str = "round"):
    """Positive buffer of a multipolygon. r <= 0 delegates to erode.
    Per part: grow the shell, shrink each hole, subtract; union parts."""
    if r == 0 or not parts:
        return parts
    if r < 0:
        return erode(parts, -r, join=join)
    out = []
    for rings in parts:
        shell = _grow_region(_ccw(rings[0]), r, join=join)
        if not shell:
            continue
        holes = []
        for h in rings[1:]:
            holes.extend(_shrink_region(_ccw(h), r, join=join))
        if holes:
            shell = overlay(shell, union_many([[hh] for hh in holes])
                            if len(holes) > 1 else [holes[0]], "difference",
                            validate=False)
        out.extend(shell)
    if len(out) > 1:
        out = union_many([[p] for p in out])
    _, out = make_valid(GEOM_POLYGON, out)
    return out


def erode(parts, r: float, join: str = "round"):
    """Negative buffer: remove everything within r of the boundary.
    Per part: shrink the shell, grow each hole, subtract (parts only ever
    shrink, so no cross-part union is needed)."""
    if r == 0 or not parts:
        return parts
    out = []
    for rings in parts:
        shell = _shrink_region(_ccw(rings[0]), r, join=join)
        if not shell:
            continue
        holes = []
        for h in rings[1:]:
            holes.extend(_grow_region(_ccw(h), r, join=join))
        if holes:
            shell = overlay(shell, union_many([[hh] for hh in holes])
                            if len(holes) > 1 else [holes[0]], "difference",
                            validate=False)
        out.extend(shell)
    _, out = make_valid(GEOM_POLYGON, out)
    return out


def opening(parts, r: float):
    """erode then dilate — removes protrusions/slivers thinner than 2r (the
    brdr relevance construction)."""
    return dilate(erode(parts, r), r)


def _area(parts) -> float:
    from .core import geom_area
    return geom_area(GEOM_POLYGON, parts)


def _perimeter(parts) -> float:
    total = 0.0
    for rings in parts:
        for ring in rings:
            d = _next_rows(ring) - ring
            total += float(np.hypot(d[:, 0], d[:, 1]).sum())
    return total


def _dirty_parts(parts, r: float) -> set:
    """Indices of parts that closing(., r) could ALTER: a part is dirty when
    it has a vertex fold sharper than the miter cap, or any NON-ADJACENT
    boundary edge (its own or another part's) within 2r of one of its edges.
    A mitered closing only changes geometry where opposing boundary sections
    trap a crack thinner than 2r or a corner exceeds the cap, and a part more
    than 2r from everything cannot be touched by the others' dilations — so
    clean parts pass through byte-identical and only the dirty subset pays
    the offset construction. Empty set = provable global identity (the
    dominant case: clean results)."""
    lim = 2.0 * r
    A_list, B_list, ring_id, idx_in_ring, ring_len, part_id = [], [], [], [], [], []
    dirty: set = set()
    rid = 0
    for pid, rings in enumerate(parts):
        for ring in rings:
            n = len(ring)
            nxt = _next_rows(ring)
            A_list.append(ring)
            B_list.append(nxt)
            ring_id.append(np.full(n, rid))
            idx_in_ring.append(np.arange(n))
            ring_len.append(np.full(n, n))
            part_id.append(np.full(n, pid))
            # adjacent fold sharper than the miter cap (denom < 0.5)
            d = nxt - ring
            L = np.hypot(d[:, 0], d[:, 1])
            ok = L > 1e-12
            u = np.zeros_like(d)
            u[ok] = d[ok] / L[ok, None]
            dots = (u * _next_rows(u)).sum(axis=1)
            if (dots < -0.5).any():
                dirty.add(pid)
            rid += 1
    A = np.vstack(A_list)
    B = np.vstack(B_list)
    rI = np.concatenate(ring_id)
    iI = np.concatenate(idx_in_ring)
    nI = np.concatenate(ring_len)
    pI = np.concatenate(part_id)
    E = len(A)
    if E > 4096:        # bbox-pair matrix would be big; close everything
        return set(range(len(parts)))
    x0 = np.minimum(A[:, 0], B[:, 0]) - lim
    x1 = np.maximum(A[:, 0], B[:, 0]) + lim
    y0 = np.minimum(A[:, 1], B[:, 1]) - lim
    y1 = np.maximum(A[:, 1], B[:, 1]) + lim
    near = ((x0[:, None] <= x1[None, :]) & (x1[:, None] >= x0[None, :])
            & (y0[:, None] <= y1[None, :]) & (y1[:, None] >= y0[None, :]))
    same_ring = rI[:, None] == rI[None, :]
    di = np.abs(iI[:, None] - iI[None, :])
    adjacent = same_ring & ((di <= 1) | (di == nI[:, None] - 1))
    ii, jj = np.nonzero(np.triu(near & ~adjacent, k=1))
    for i, j in zip(ii.tolist(), jj.tolist()):
        if _seg_dist(A[i], B[i], A[j], B[j]) < lim:
            dirty.add(int(pI[i]))
            dirty.add(int(pI[j]))
    return dirty


def _seg_dist(a1, b1, a2, b2) -> float:
    """Min distance between two segments."""
    def pt_seg(p, a, b):
        ab = b - a
        t = float(np.dot(p - a, ab))
        den = float(np.dot(ab, ab))
        t = 0.0 if den <= 0 else max(0.0, min(1.0, t / den))
        q = a + t * ab
        return float(np.hypot(*(p - q)))
    # proper crossing -> 0 (cheap orientation test)
    d1 = np.cross(b1 - a1, a2 - a1), np.cross(b1 - a1, b2 - a1)
    d2 = np.cross(b2 - a2, a1 - a2), np.cross(b2 - a2, b1 - a2)
    if (d1[0] * d1[1] < 0) and (d2[0] * d2[1] < 0):
        return 0.0
    return min(pt_seg(a2, a1, b1), pt_seg(b2, a1, b1),
               pt_seg(a1, a2, b2), pt_seg(b1, a2, b2))


def closing(parts, r: float):
    """dilate then erode — fills gaps/cracks thinner than 2r (the reference's
    correction_distance cleanup, applied to every result with
    correction_distance = 0.01 m:
    plugin/brdrq/brdrq_algorithm_autocorrectborders.py:192-193).

    Identity fast path: when no two non-adjacent boundary edges come within
    2r and no fold exceeds the miter cap, closing is a provable no-op and the
    input is returned byte-identical (the dominant case for clean results).

    Offset path: MITER joins — unchanged geometry round-trips exactly (no
    radius-r arcs for the erode to critically collapse), cracks thinner than
    2r still fill. Corners sharper than ~60 deg are beveled at the 2r miter
    cap (SEMANTICS.md; centimeter-scale at r = 0.01 m, needle corners only).

    Soundness guard: closing is EXTENSIVE (closing(P) >= P) and the eroded
    result must stay inside the dilation. Raw-offset winding erosion can
    under-cover on pathological rings (tiny-edge storms whose inverted
    offset loops overlap valid territory), so any violation of either bound
    falls back to the exact capsule-subtraction erosion."""
    if not parts or r <= 0:
        return parts
    dirty = _dirty_parts(parts, r)
    if not dirty:
        return parts
    # only the dirty subset pays the offset construction: a clean part is
    # > 2r from every other edge, so no dilation can reach it — it passes
    # through byte-identical
    clean = [p for i, p in enumerate(parts) if i not in dirty]
    sub = [p for i, p in enumerate(parts) if i in dirty]
    a_in = _area(sub)
    tol = 2e-6 * _perimeter(sub) + r * r * sum(len(rg) for p in sub for rg in p)
    d = _simplify_parts(dilate(sub, r, join="miter"))
    if _area(d) + tol < a_in:           # dilation must also be extensive
        d = _dilate_capsules(sub, r)
    e = erode(d, r, join="miter")
    a_out = _area(e)
    if not (a_out + tol >= a_in and a_out <= _area(d) + tol):
        e = _erode_capsules(d, r)
    return clean + e

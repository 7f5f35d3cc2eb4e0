"""Polygon boolean operations (intersection / union / difference / symmetric
difference) and dissolve, from scratch on numpy — the engine's replacement for
the GEOS overlay the reference gets via shapely (brdr computes
``result_diff`` = symmetric difference, ``result_diff_plus/min`` = one-sided
differences; reference: plugin/brdrq/brdrq_utils.py:1146-1153 and
docs/autocorrectborders.md:122-127).

Algorithm ("overlay by subdivision"): snap inputs to the 1e-6 grid, split every
edge of A at its intersections with edges of B (and vice versa, using the SAME
computed intersection points so both sides agree bit-for-bit), classify each
sub-edge as inside / outside / shared w.r.t. the other polygon by a
winding-number test on its midpoint, select sub-edges per op, then stitch the
selected directed edges into rings (interior-on-the-left convention: shells
CCW, holes CW).  O((n+m)^2) per pair with bbox prefilter — parcel-scale
polygons have tens of vertices, so this is fast and much more robust than a
float sweep.  Degeneracies are contained by the fixed snap grid (SURVEY.md
section 7.4.1).
"""

from __future__ import annotations

import math

import numpy as np

from .core import (
    GEOM_POLYGON,
    SNAP,
    geom_bbox,
    make_valid,
    points_in_polygon,
    ring_signed_area,
    snap,
)

_QK = 1e6  # quantization for point keys (matches the snap grid)


def _key(x: float, y: float) -> tuple[int, int]:
    return (int(round(x * _QK)), int(round(y * _QK)))


def _edges_of(parts):
    """Directed edges [[ax, ay, bx, by], ...] of all rings, ring orientation
    preserved (shells CCW, holes CW — interior on the left). One numpy
    hstack per ring, not a Python loop per vertex."""
    out = []
    for rings in parts:
        for r in rings:
            nxt = np.concatenate([r[1:], r[:1]])
            neq = (r[:, 0] != nxt[:, 0]) | (r[:, 1] != nxt[:, 1])
            out.extend(np.hstack([r, nxt])[neq].tolist())
    return out


def _seg_intersections(e1, e2):
    """Intersection points of two segments, as params (t on e1, u on e2) lists.

    Returns a list of (t, u, x, y). Handles proper crossings, T-junctions and
    collinear overlaps (returns both overlap endpoints).
    """
    ax, ay, bx, by = e1
    cx, cy, dx, dy = e2
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy
    denom = rx * sy - ry * sx
    qpx, qpy = cx - ax, cy - ay
    if denom != 0.0:
        t = (qpx * sy - qpy * sx) / denom
        u = (qpx * ry - qpy * rx) / denom
        eps = 1e-12
        if -eps <= t <= 1 + eps and -eps <= u <= 1 + eps:
            t = min(max(t, 0.0), 1.0)
            u = min(max(u, 0.0), 1.0)
            x = ax + t * rx
            y = ay + t * ry
            return [(t, u, x, y)]
        return []
    # parallel: collinear?
    cross = qpx * ry - qpy * rx
    rlen2 = rx * rx + ry * ry
    if rlen2 == 0:
        return []
    # distance of c from line(a,b)
    if abs(cross) / math.sqrt(rlen2) > SNAP:
        return []
    # collinear: project c and d on e1
    t0 = (qpx * rx + qpy * ry) / rlen2
    t1 = ((dx - ax) * rx + (dy - ay) * ry) / rlen2
    lo, hi = min(t0, t1), max(t0, t1)
    lo, hi = max(lo, 0.0), min(hi, 1.0)
    if lo > hi:
        return []
    out = []
    slen2 = sx * sx + sy * sy
    for t in {lo, hi}:
        x = ax + t * rx
        y = ay + t * ry
        u = ((x - cx) * sx + (y - cy) * sy) / slen2 if slen2 else 0.0
        out.append((t, min(max(u, 0.0), 1.0), x, y))
    return out


#: above this Ea*Eb product the dense bbox-overlap matrix (the common-case
#: fast path for parcel-sized polygons) is replaced by a bbox-grid pairing —
#: two 100k-edge coastlines must never materialize 10^10 booleans
_MAX_DENSE_PAIRS = 4_000_000


def _grid_pairs(a_min_x, a_max_x, a_min_y, a_max_y,
                b_min_x, b_max_x, b_min_y, b_max_y):
    """Candidate (i, j) edge pairs via a uniform bbox grid — memory/time
    ~linear in edges + true overlaps instead of the dense Ea x Eb matrix.
    Returns EXACTLY the dense path's pair set in row-major order (grid
    candidates are a superset of bbox-overlapping pairs; an exact bbox
    filter + lexsort makes the result bit-identical)."""
    med = float(np.median(np.concatenate([
        np.maximum(a_max_x - a_min_x, a_max_y - a_min_y),
        np.maximum(b_max_x - b_min_x, b_max_y - b_min_y)])))
    cell = max(med, 1e-9)
    inv = 1.0 / cell
    bx0 = np.floor(b_min_x * inv).astype(np.int64)
    bx1 = np.floor(b_max_x * inv).astype(np.int64)
    by0 = np.floor(b_min_y * inv).astype(np.int64)
    by1 = np.floor(b_max_y * inv).astype(np.int64)
    span_b = (bx1 - bx0 + 1) * (by1 - by0 + 1)
    grid: dict = {}
    long_b: list = []  # edges spanning many cells: vectorized filter below,
    for j in range(len(bx0)):  # never flooded into the grid or pair lists
        if span_b[j] > 64:
            long_b.append(j)
            continue
        for cx in range(bx0[j], bx1[j] + 1):
            for cy in range(by0[j], by1[j] + 1):
                grid.setdefault((cx, cy), []).append(j)
    ax0 = np.floor(a_min_x * inv).astype(np.int64)
    ax1 = np.floor(a_max_x * inv).astype(np.int64)
    ay0 = np.floor(a_min_y * inv).astype(np.int64)
    ay1 = np.floor(a_max_y * inv).astype(np.int64)
    span_a = (ax1 - ax0 + 1) * (ay1 - ay0 + 1)
    ii_l: list = []
    jj_l: list = []
    long_a: list = []  # capped symmetrically — a long A edge must not walk
    for i in range(len(ax0)):  # its (possibly billions-of-cells) 2-D span
        if span_a[i] > 64:
            long_a.append(i)
            continue
        seen: set = set()
        for cx in range(ax0[i], ax1[i] + 1):
            for cy in range(ay0[i], ay1[i] + 1):
                js = grid.get((cx, cy))
                if js:
                    seen.update(js)
        if seen:
            ii_l.extend([i] * len(seen))
            jj_l.extend(seen)
    ii_parts = [np.array(ii_l, np.int64)]
    jj_parts = [np.array(jj_l, np.int64)]
    # long edges: ONE vectorized bbox pass over the whole other side per
    # long edge — O(long * other) time but bounded memory (one mask at a
    # time), never a Python cell walk or an unfiltered cross product
    for i in long_a:
        m = ((a_min_x[i] <= b_max_x) & (a_max_x[i] >= b_min_x)
             & (a_min_y[i] <= b_max_y) & (a_max_y[i] >= b_min_y))
        js = np.nonzero(m)[0]
        ii_parts.append(np.full(len(js), i, np.int64))
        jj_parts.append(js)
    for j in long_b:
        m = ((a_min_x <= b_max_x[j]) & (a_max_x >= b_min_x[j])
             & (a_min_y <= b_max_y[j]) & (a_max_y >= b_min_y[j]))
        is_ = np.nonzero(m)[0]
        ii_parts.append(is_)
        jj_parts.append(np.full(len(is_), j, np.int64))
    ii = np.concatenate(ii_parts)
    jj = np.concatenate(jj_parts)
    if len(ii) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # exact bbox filter -> the dense pair set precisely
    keep = ((a_min_x[ii] <= b_max_x[jj]) & (a_max_x[ii] >= b_min_x[jj])
            & (a_min_y[ii] <= b_max_y[jj]) & (a_max_y[ii] >= b_min_y[jj]))
    ii, jj = ii[keep], jj[keep]
    # dedupe (a long_a x long_b pair appears in both passes) + row-major
    # order: identical cut insertion order to the dense path
    flat = np.unique(ii * np.int64(len(bx0)) + jj)
    return flat // len(bx0), flat % len(bx0)


def _split_edges(edges_a, edges_b):
    """Split each edge list at mutual intersection points (shared float
    computation -> identical coordinates on both sides). Also splits at the
    other side's endpoints lying on an edge (T junctions are covered by
    _seg_intersections)."""
    if not edges_a or not edges_b:
        return [list(e) + [[]] for e in edges_a], [list(e) + [[]] for e in edges_b]
    A = np.array(edges_a, dtype=np.float64)
    B = np.array(edges_b, dtype=np.float64)
    # bbox prefilter
    a_min_x = np.minimum(A[:, 0], A[:, 2]) - SNAP
    a_max_x = np.maximum(A[:, 0], A[:, 2]) + SNAP
    a_min_y = np.minimum(A[:, 1], A[:, 3]) - SNAP
    a_max_y = np.maximum(A[:, 1], A[:, 3]) + SNAP
    b_min_x = np.minimum(B[:, 0], B[:, 2]) - SNAP
    b_max_x = np.maximum(B[:, 0], B[:, 2]) + SNAP
    b_min_y = np.minimum(B[:, 1], B[:, 3]) - SNAP
    b_max_y = np.maximum(B[:, 1], B[:, 3]) + SNAP
    cuts_a = [[] for _ in edges_a]
    cuts_b = [[] for _ in edges_b]
    if len(A) * len(B) <= _MAX_DENSE_PAIRS:
        ov = ((a_min_x[:, None] <= b_max_x[None, :]) & (a_max_x[:, None] >= b_min_x[None, :])
              & (a_min_y[:, None] <= b_max_y[None, :]) & (a_max_y[:, None] >= b_min_y[None, :]))
        ii, jj = np.nonzero(ov)
    else:
        ii, jj = _grid_pairs(a_min_x, a_max_x, a_min_y, a_max_y,
                             b_min_x, b_max_x, b_min_y, b_max_y)
    if len(ii):
        # vectorized proper-crossing solve over all candidate pairs; the rare
        # parallel/collinear pairs fall back to the scalar routine
        ax, ay = A[ii, 0], A[ii, 1]
        rx, ry = A[ii, 2] - ax, A[ii, 3] - ay
        cx, cy = B[jj, 0], B[jj, 1]
        sx, sy = B[jj, 2] - cx, B[jj, 3] - cy
        denom = rx * sy - ry * sx
        nz = denom != 0.0
        qpx, qpy = cx - ax, cy - ay
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(nz, (qpx * sy - qpy * sx) / np.where(nz, denom, 1.0), -1.0)
            u = np.where(nz, (qpx * ry - qpy * rx) / np.where(nz, denom, 1.0), -1.0)
        eps = 1e-12
        hit = nz & (t >= -eps) & (t <= 1 + eps) & (u >= -eps) & (u <= 1 + eps)
        tc = np.clip(t, 0.0, 1.0)
        uc = np.clip(u, 0.0, 1.0)
        xs = ax + tc * rx
        ys = ay + tc * ry
        for idx in np.nonzero(hit)[0].tolist():
            i, j = int(ii[idx]), int(jj[idx])
            cuts_a[i].append((float(tc[idx]), float(xs[idx]), float(ys[idx])))
            cuts_b[j].append((float(uc[idx]), float(xs[idx]), float(ys[idx])))
        for idx in np.nonzero(~nz)[0].tolist():
            i, j = int(ii[idx]), int(jj[idx])
            for t1, u1, x, y in _seg_intersections(edges_a[i], edges_b[j]):
                cuts_a[i].append((t1, x, y))
                cuts_b[j].append((u1, x, y))
    out_a = [list(e) + [c] for e, c in zip(edges_a, cuts_a)]
    out_b = [list(e) + [c] for e, c in zip(edges_b, cuts_b)]
    return out_a, out_b


def _apply_cuts(edges_with_cuts):
    """Expand edges into sub-edges at their cut params; dedupe by key.

    Fast path: edges WITHOUT cuts (the vast majority — only edges crossing
    the other geometry collect cuts) are keyed with one vectorized np.round
    over the whole block (np.round and Python round() are both half-even, so
    keys are identical); only cut edges walk the per-point chain."""
    out: list = []
    plain_pos: list[int] = []  # placeholder slots, filled vectorized below
    plain_rows: list = []      # (emission ORDER preserved — stitch tie-breaks
    for e in edges_with_cuts:  # are insertion-order-sensitive)
        if not e[4]:
            plain_pos.append(len(out))
            out.append(None)
            plain_rows.append(e[:4])
            continue
        ax, ay, bx, by, cuts = e
        pts = [(0.0, ax, ay), (1.0, bx, by)]
        pts.extend(cuts)
        pts.sort(key=lambda p: p[0])
        prev_key = None
        chain = []
        for t, x, y in pts:
            k = _key(x, y)
            if k != prev_key:
                chain.append((k, x, y))
                prev_key = k
        for (k1, x1, y1), (k2, x2, y2) in zip(chain, chain[1:]):
            out.append((k1, k2, x1, y1, x2, y2))
    if plain_rows:
        E = np.array(plain_rows, dtype=np.float64)
        K = np.round(E * _QK).astype(np.int64)
        for pos, krow, erow in zip(plain_pos, K.tolist(), E.tolist()):
            if krow[0] != krow[2] or krow[1] != krow[3]:
                out[pos] = ((krow[0], krow[1]), (krow[2], krow[3]),
                            erow[0], erow[1], erow[2], erow[3])
    return [e for e in out if e is not None]


def _classify(sub_edges, other_parts, other_edge_keys):
    """For each sub-edge return 'in', 'out', 'shared_same' or 'shared_opp'."""
    n = len(sub_edges)
    labels = [None] * n
    mids = np.empty((n, 2), dtype=np.float64)
    need = []
    for idx, (k1, k2, x1, y1, x2, y2) in enumerate(sub_edges):
        if (k1, k2) in other_edge_keys:
            labels[idx] = "shared_same"
        elif (k2, k1) in other_edge_keys:
            labels[idx] = "shared_opp"
        else:
            mids[idx] = ((x1 + x2) * 0.5, (y1 + y2) * 0.5)
            need.append(idx)
    if need:
        inside = points_in_polygon(mids[need], other_parts)
        for pos, idx in enumerate(need):
            labels[idx] = "in" if inside[pos] else "out"
    return labels


def _stitch(directed_edges):
    """Stitch directed edges (interior-on-left) into rings, then build parts.

    At a branching vertex the walker picks the outgoing edge that makes the
    sharpest clockwise turn from the reverse of the incoming direction —
    this traces minimal faces with the interior kept on the left.
    """
    # drop exact duplicate directed edges (can arise from shared selections)
    seen = set()
    edges = []
    for e in directed_edges:
        sig = (e[0], e[1])
        if sig in seen:
            continue
        seen.add(sig)
        edges.append(e)

    by_start: dict = {}
    for e in edges:
        by_start.setdefault(e[0], []).append(e)
    used = [False] * len(edges)
    index = {id(e): i for i, e in enumerate(edges)}

    def pick_next(cur):
        k1, k2, x1, y1, x2, y2 = cur
        cands = [e for e in by_start.get(k2, ()) if not used[index[id(e)]]]
        if not cands:
            return None
        if len(cands) == 1:
            return cands[0]
        # incoming reversed direction
        in_ang = math.atan2(y1 - y2, x1 - x2)
        best, best_d = None, None
        for e in cands:
            if e[1] == k1 and len(cands) > 1:
                # avoid immediate backtrack unless forced
                continue
            ang = math.atan2(e[5] - e[3], e[4] - e[2])
            d = (in_ang - ang) % (2 * math.pi)  # clockwise distance from reversed-in
            if d == 0:
                d = 2 * math.pi
            if best_d is None or d < best_d:
                best, best_d = e, d
        if best is None:
            best = cands[0]
        return best

    rings = []
    for i, e in enumerate(edges):
        if used[i]:
            continue
        path = [e]
        used[i] = True
        start_key = e[0]
        cur = e
        ok = False
        for _ in range(len(edges) + 1):
            if cur[1] == start_key:
                ok = True
                break
            nxt = pick_next(cur)
            if nxt is None:
                break
            used[index[id(nxt)]] = True
            path.append(nxt)
            cur = nxt
        if ok and len(path) >= 3:
            ring = np.array([(p[2], p[3]) for p in path], dtype=np.float64)
            rings.append(ring)
        elif not ok:
            # dead-end walk (a classification inconsistency at an
            # ill-conditioned crossing): release the consumed edges so other
            # walks can still close their rings — degrade locally, never
            # collapse the whole result. The starting edge stays consumed.
            for p in path[1:]:
                used[index[id(p)]] = False
    return _rings_to_parts(rings)


def _rings_to_parts(rings):
    """Classify stitched rings into shells (CCW) and holes (CW), assign holes
    to the smallest enclosing shell."""
    from .core import canon_ring
    shells, holes = [], []
    for r in rings:
        a = ring_signed_area(r)
        if abs(a) < SNAP * SNAP:
            continue
        (shells if a > 0 else holes).append((abs(a), canon_ring(r)))
    shells.sort(key=lambda t: (t[0], t[1][0, 0], t[1][0, 1]))  # smallest first, stable
    parts = [[s[1]] for s in shells]
    for ha, h in holes:
        # test point: first vertex nudged toward ring centroid
        c = h.mean(axis=0)
        p = h[0] * 0.999 + c * 0.001
        placed = False
        for i, (sa, s) in enumerate(shells):
            if sa >= ha and points_in_polygon(p[None, :], [[s]])[0]:
                parts[i].append(h)
                placed = True
                break
        if not placed and shells:
            parts[-1].append(h)
    return [p for p in parts if p]


def _bbox_disjoint(a_parts, b_parts) -> bool:
    ax0, ay0, ax1, ay1 = geom_bbox(a_parts)
    bx0, by0, bx1, by1 = geom_bbox(b_parts)
    if not (np.isfinite(ax0) and np.isfinite(bx0)):
        return True
    return ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0


def _geom_area(parts):
    from .core import geom_area, GEOM_POLYGON as GP
    return geom_area(GP, parts)


def _plausible(op: str, out, aa: float, ab: float) -> bool:
    """Coarse area bounds that every correct overlay satisfies — used to
    detect stitch collapse at ill-conditioned (near-parallel, shallow-angle)
    crossings, where float intersection points scramble local topology."""
    ao = _geom_area(out)
    eps = 1e-6 * (aa + ab) + 1e-9
    if op == "union":
        return max(aa, ab) - eps <= ao <= aa + ab + eps
    if op == "difference":
        return aa - ab - eps <= ao <= aa + eps
    if op == "intersection":
        return ao <= min(aa, ab) + eps
    return True


def _shift(parts, dx: float, dy: float):
    return [[r + np.array([dx, dy]) for r in rings] for rings in parts]


def overlay(a_parts, b_parts, op: str, validate: bool = True):
    """Boolean op between two multipolygons (parts as in geom.core).

    op: 'intersection' | 'union' | 'difference' | 'symdiff'.
    Returns multipolygon parts (shells CCW, holes CW).

    ``validate=False`` skips the input re-normalization (make_valid) — safe
    ONLY for parts that already went through make_valid (the packed-geometry
    hot path re-validates thousands of already-canonical inputs otherwise).

    Robustness: if the result violates coarse area bounds (a symptom of an
    ill-conditioned crossing), the op is retried with B perturbed by a few
    snap units (epsilon-perturbation fallback, SURVEY.md section 7.4.1) —
    deterministic, area change bounded by perimeter * 1e-6.
    """
    out = _overlay_once(a_parts, b_parts, op, validate)
    if op in ("union", "difference", "intersection"):
        aa = _geom_area(a_parts)
        ab = _geom_area(b_parts)
        if not _plausible(op, out, aa, ab):
            for k in (1, 2, 5):
                pert = _shift(b_parts, k * 1e-6, k * 1e-6)
                out2 = _overlay_once(a_parts, pert, op, validate)
                if _plausible(op, out2, aa, ab):
                    return out2
    return out


def _overlay_once(a_parts, b_parts, op: str, validate: bool = True):
    if validate:
        _, a_parts = make_valid(GEOM_POLYGON, a_parts)
        _, b_parts = make_valid(GEOM_POLYGON, b_parts)
    if not a_parts or not b_parts:
        if op == "intersection":
            return []
        if op == "difference":
            return a_parts
        return a_parts + b_parts  # union / symdiff with an empty side
    if _bbox_disjoint(a_parts, b_parts):
        if op == "intersection":
            return []
        if op == "difference":
            return a_parts
        return a_parts + b_parts

    if op == "symdiff":
        d1 = overlay(a_parts, b_parts, "difference", validate=False)
        d2 = overlay(b_parts, a_parts, "difference", validate=False)
        return dissolve(d1 + d2)

    ea = _edges_of(a_parts)
    eb = _edges_of(b_parts)
    ea_c, eb_c = _split_edges(ea, eb)
    if all(not e[4] for e in ea_c) and all(not e[4] for e in eb_c):
        # zero cuts = the boundaries never touch (endpoint contacts and
        # collinear overlaps all produce cuts): every ring lies wholly
        # inside or outside the other geometry. Select whole rings with ONE
        # edge-midpoint winding test per ring — ~25% of real alignment
        # overlays take this path, skipping per-sub-edge classify + stitch.
        return _containment_overlay(a_parts, b_parts, op)
    sub_a = _apply_cuts(ea_c)
    sub_b = _apply_cuts(eb_c)
    keys_a = {(e[0], e[1]) for e in sub_a}
    keys_b = {(e[0], e[1]) for e in sub_b}
    lab_a = _classify(sub_a, b_parts, keys_b)
    lab_b = _classify(sub_b, a_parts, keys_a)

    sel = []
    if op == "intersection":
        sel += [e for e, l in zip(sub_a, lab_a) if l in ("in", "shared_same")]
        sel += [e for e, l in zip(sub_b, lab_b) if l == "in"]
    elif op == "union":
        sel += [e for e, l in zip(sub_a, lab_a) if l in ("out", "shared_same")]
        sel += [e for e, l in zip(sub_b, lab_b) if l == "out"]
    elif op == "difference":
        sel += [e for e, l in zip(sub_a, lab_a) if l in ("out", "shared_opp")]
        # B edges inside A, reversed
        sel += [(e[1], e[0], e[4], e[5], e[2], e[3]) for e, l in zip(sub_b, lab_b) if l == "in"]
    else:
        raise ValueError(f"unknown op {op!r}")
    return _stitch(sel)


def _ring_key_dedupe(r: np.ndarray) -> np.ndarray:
    """Drop vertices whose quantized key equals the previous one (and a last
    vertex keying equal to the first) — the same collapse the sub-edge chain
    in _apply_cuts applies, so the containment fast path emits bit-identical
    rings to the stitch path."""
    K = np.round(r * _QK).astype(np.int64)
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = np.any(K[1:] != K[:-1], axis=1)
    idx = np.nonzero(keep)[0]
    if len(idx) > 1 and np.array_equal(K[idx[0]], K[idx[-1]]):
        keep[idx[-1]] = False
    return r[keep]


def _containment_overlay(a_parts, b_parts, op: str):
    """Overlay for the no-boundary-contact case: classification is per RING
    (one edge-midpoint winding test each — identical in/out result to the
    per-sub-edge path since every edge of an untouched ring shares the
    label), assembly via the same _rings_to_parts as the stitch path."""
    def rings_with_mids(parts):
        rs, mids = [], []
        for rings in parts:
            for r in rings:
                rr = _ring_key_dedupe(r)
                if len(rr) < 3:
                    continue
                rs.append(rr)
                mids.append(((rr[0, 0] + rr[1, 0]) * 0.5,
                             (rr[0, 1] + rr[1, 1]) * 0.5))
        return rs, np.asarray(mids, dtype=np.float64).reshape(-1, 2)

    ra, ma = rings_with_mids(a_parts)
    rb, mb = rings_with_mids(b_parts)
    in_b = points_in_polygon(ma, b_parts) if len(ra) else np.zeros(0, bool)
    in_a = points_in_polygon(mb, a_parts) if len(rb) else np.zeros(0, bool)
    rings = []
    if op == "intersection":
        rings += [r for r, i in zip(ra, in_b) if i]
        rings += [r for r, i in zip(rb, in_a) if i]
    elif op == "union":
        rings += [r for r, i in zip(ra, in_b) if not i]
        rings += [r for r, i in zip(rb, in_a) if not i]
    else:  # difference
        rings += [r for r, i in zip(ra, in_b) if not i]
        rings += [r[::-1].copy() for r, i in zip(rb, in_a) if i]
    return _rings_to_parts(rings)


def _vertex_edge_candidates(verts, ax, ay, bx, by):
    """(vertex, edge) index pairs whose bboxes come within the T-junction
    tolerance — a uniform bbox grid sized at the median edge extent, so the
    dense V x E proximity matrix never materializes. Edges spanning many
    cells go on a short 'always check' list instead of flooding the grid."""
    tol = SNAP * 4
    ex0 = np.minimum(ax, bx) - tol
    ex1 = np.maximum(ax, bx) + tol
    ey0 = np.minimum(ay, by) - tol
    ey1 = np.maximum(ay, by) + tol
    ne, nv = len(ax), len(verts)
    if ne == 0 or nv == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    med = float(np.median(np.maximum(ex1 - ex0, ey1 - ey0)))
    cell = max(med, 1e-9)
    inv = 1.0 / cell
    gx0 = np.floor(ex0 * inv).astype(np.int64)
    gx1 = np.floor(ex1 * inv).astype(np.int64)
    gy0 = np.floor(ey0 * inv).astype(np.int64)
    gy1 = np.floor(ey1 * inv).astype(np.int64)
    span = (gx1 - gx0 + 1) * (gy1 - gy0 + 1)
    grid: dict = {}
    always: list = []
    for e in range(ne):
        if span[e] > 32:
            always.append(e)
            continue
        for cx in range(gx0[e], gx1[e] + 1):
            for cy in range(gy0[e], gy1[e] + 1):
                grid.setdefault((cx, cy), []).append(e)
    vgx = np.floor(verts[:, 0] * inv).astype(np.int64)
    vgy = np.floor(verts[:, 1] * inv).astype(np.int64)
    vi_list: list = []
    ei_list: list = []
    for v in range(nv):
        es = grid.get((vgx[v], vgy[v]))
        if es:
            vi_list.extend([v] * len(es))
            ei_list.extend(es)
    if always:
        al = np.array(always, np.int64)
        vi_list.extend(np.repeat(np.arange(nv), len(al)).tolist())
        ei_list.extend(np.tile(al, nv).tolist())
    return np.array(vi_list, np.int64), np.array(ei_list, np.int64)


def dissolve(parts_list_or_parts):
    """Union of polygons with DISJOINT interiors that may share boundary edges
    (a tessellation — e.g. adjacent cadastral parcels): cancel opposite
    directed edges, stitch the survivors. Exact and fast; this is how the
    engine unions 'included reference parcels' (SURVEY.md section 7, D1).

    Accepts either multipolygon `parts` or a list of them (concatenated).
    Edges are first split at other polygons' vertices lying on them so
    T-junctions cancel correctly.
    """
    # drop empties FIRST: an empty parts object at index 0 (e.g. a partial
    # contribution whose opening vanished under erode) would defeat the
    # nesting sniff below and make a list-of-parts read as one parts object
    parts = [p for p in parts_list_or_parts if len(p)]
    if parts and not isinstance(parts[0][0], np.ndarray):
        # list of parts objects -> concatenate
        flat = []
        for p in parts:
            flat.extend(p)
        parts = flat
    if len(parts) <= 1:
        return parts
    edges = _edges_of(parts)
    # split at all vertices lying on other edges (T junctions)
    verts = np.array(sorted({(e[0], e[1]) for e in edges} | {(e[2], e[3]) for e in edges}))
    E = np.array(edges, dtype=np.float64)
    ax, ay, bx, by = E[:, 0], E[:, 1], E[:, 2], E[:, 3]
    cuts = [[] for _ in edges]
    rx, ry = bx - ax, by - ay
    len2 = rx * rx + ry * ry
    len2[len2 == 0] = 1e-300
    # candidate (vertex, edge) pairs from a bbox grid instead of the dense
    # V x E matrix: dissolve is the alignment hot path's inner kernel, and
    # the tessellations it unions are local — near-linear beats O(V*E)
    vi_a, ei_a = _vertex_edge_candidates(verts, ax, ay, bx, by)
    if len(vi_a):
        Vx, Vy = verts[vi_a, 0], verts[vi_a, 1]
        t = ((Vx - ax[ei_a]) * rx[ei_a] + (Vy - ay[ei_a]) * ry[ei_a]) / len2[ei_a]
        px = ax[ei_a] + t * rx[ei_a]
        py = ay[ei_a] + t * ry[ei_a]
        d = np.hypot(Vx - px, Vy - py)
        hit = (d <= SNAP * 4) & (t > 1e-9) & (t < 1 - 1e-9)
        for v, e, tv in zip(vi_a[hit].tolist(), ei_a[hit].tolist(),
                            t[hit].tolist()):
            cuts[e].append((tv, float(verts[v, 0]), float(verts[v, 1])))
    sub = _apply_cuts([list(e) + [c] for e, c in zip(edges, cuts)])
    # cancel opposite directed pairs: for key (u,v), net survivors =
    # count[(u,v)] - count[(v,u)] copies (if positive)
    from collections import Counter
    count = Counter((e[0], e[1]) for e in sub)
    first_of = {}
    for e in sub:
        first_of.setdefault((e[0], e[1]), e)
    survivors = []
    for key, n in count.items():
        net = n - count.get((key[1], key[0]), 0)
        if net > 0:
            survivors.extend([first_of[key]] * 1)  # one copy per key (simple rings)
    return _stitch(survivors)


def union_many(parts_list):
    """Union of arbitrarily overlapping multipolygons: divide & conquer over
    pairwise overlay unions. Used by buffer(); the alignment hot path uses
    dissolve() instead (disjoint interiors)."""
    items = [p for p in parts_list if p]
    if not items:
        return []
    while len(items) > 1:
        nxt = []
        for i in range(0, len(items) - 1, 2):
            nxt.append(overlay(items[i], items[i + 1], "union"))
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    return items[0]

"""Douglas-Peucker simplification (geom/core.py::dp_keep_mask /
simplify_parts, functions/geometry_ops.py::simplify_geometries):
recursive-DP oracle, the DP distance contract, degeneracy handling,
dataset operator invariants."""

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.geom import core as g


def _dp_recursive(pts, tol, i, j, keep):
    """Textbook recursive DP between anchors i..j (both kept)."""
    if j - i < 2:
        return
    seg = pts[j] - pts[i]
    L = np.hypot(seg[0], seg[1])
    best_d, best_k = -1.0, -1
    for k in range(i + 1, j):
        if L == 0:
            d = float(np.hypot(*(pts[k] - pts[i])))
        else:
            d = abs((pts[k, 0] - pts[i, 0]) * seg[1]
                    - (pts[k, 1] - pts[i, 1]) * seg[0]) / L
        if d > best_d:
            best_d, best_k = d, k
    if best_d > tol:
        keep[best_k] = True
        _dp_recursive(pts, tol, i, best_k, keep)
        _dp_recursive(pts, tol, best_k, j, keep)


def _oracle_open(pts, tol):
    keep = np.zeros(len(pts), bool)
    keep[0] = keep[-1] = True
    _dp_recursive(np.asarray(pts, float), tol, 0, len(pts) - 1, keep)
    return keep


def test_dp_mask_open_vs_recursive_oracle():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(2, 60))
        pts = np.cumsum(rng.normal(0, 1, size=(n, 2)), axis=0)
        tol = float(rng.uniform(0.1, 3.0))
        got = g.dp_keep_mask(pts, tol, closed=False)
        assert (got == _oracle_open(pts, tol)).all()


def test_dp_mask_closed_vs_recursive_oracle():
    rng = np.random.default_rng(11)
    for _ in range(50):
        n = int(rng.integers(4, 50))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(5, 10, n)
        ring = np.c_[r * np.cos(ang), r * np.sin(ang)]
        tol = float(rng.uniform(0.05, 2.0))
        got = g.dp_keep_mask(ring, tol, closed=True)
        # oracle: same anchor scheme on the closed ring
        ext = np.vstack([ring, ring[:1]])
        far = int(np.hypot(ext[:, 0] - ext[0, 0],
                           ext[:, 1] - ext[0, 1]).argmax())
        keep = np.zeros(n + 1, bool)
        keep[0] = keep[n] = True
        if far not in (0, n):
            keep[far] = True
            _dp_recursive(ext, tol, 0, far, keep)
            _dp_recursive(ext, tol, far, n, keep)
        assert (got == keep[:n]).all()


def test_dp_distance_contract():
    """Every dropped vertex lies within tol of the kept segment replacing
    its run — the DP guarantee, checked directly."""
    rng = np.random.default_rng(3)
    for _ in range(30):
        n = int(rng.integers(5, 80))
        pts = np.cumsum(rng.normal(0, 1, size=(n, 2)), axis=0)
        tol = float(rng.uniform(0.2, 2.0))
        keep = g.dp_keep_mask(pts, tol, closed=False)
        kept_idx = np.nonzero(keep)[0]
        for a, b in zip(kept_idx[:-1], kept_idx[1:]):
            seg = pts[b] - pts[a]
            L = np.hypot(seg[0], seg[1])
            for k in range(a + 1, b):
                if L == 0:
                    d = float(np.hypot(*(pts[k] - pts[a])))
                else:
                    d = abs((pts[k, 0] - pts[a, 0]) * seg[1]
                            - (pts[k, 1] - pts[a, 1]) * seg[0]) / L
                assert d <= tol + 1e-12


def test_simplify_parts_degeneracy():
    # a thin sliver collapses below tolerance -> part dropped
    sliver = [np.array([[0.0, 0.0], [10.0, 0.001], [10.0, 0.0]])]
    kind, parts = g.simplify_parts(g.GEOM_POLYGON, [sliver], tol=0.5)
    assert parts == []
    # a square survives exactly
    sq = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    kind, parts = g.simplify_parts(g.GEOM_POLYGON, [[sq]], tol=0.5)
    assert len(parts) == 1 and (parts[0][0] == sq).all()
    # a hole collapses -> hole dropped, shell kept
    hole = np.array([[4.0, 5.0], [5.0, 5.05], [6.0, 5.0]])[::-1]
    kind, parts = g.simplify_parts(g.GEOM_POLYGON, [[sq, hole]], tol=0.5)
    assert len(parts) == 1 and len(parts[0]) == 1
    # line below 2 points never happens; collinear line shrinks to ends
    line = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    kind, parts = g.simplify_parts(g.GEOM_LINESTRING, [[line]], tol=0.1)
    assert len(parts[0][0]) == 2
    # points pass through
    pt = [np.array([[1.0, 2.0]])]
    kind, parts = g.simplify_parts(g.GEOM_POINT, [pt], tol=5.0)
    assert (parts[0][0] == pt[0]).all()


def _wiggly_square(side=100.0, step=1.0, amp=0.3, seed=5):
    """A square with amp-scale vertex noise along each edge: DP at tol>amp
    should recover ~4 corners."""
    rng = np.random.default_rng(seed)
    pts = []
    n = int(side / step)
    for ex, ey, dx, dy in ((0, 0, 1, 0), (side, 0, 0, 1),
                           (side, side, -1, 0), (0, side, 0, -1)):
        for i in range(n):
            x = ex + dx * i * step
            y = ey + dy * i * step
            # noise perpendicular to the edge
            nx, ny = -dy, dx
            e = rng.uniform(-amp, amp)
            pts.append([x + nx * e, y + ny * e])
    return np.array(pts)


def test_simplify_geometries_operator(ray_session):
    import ray.data

    ring = _wiggly_square()
    buf = g.pack_geom(g.GEOM_POLYGON, [[g.snap(ring)]])
    b0 = g.geom_bbox([[g.snap(ring)]])
    tbl = pa.table({
        "theme_id": pa.array(["t1"], pa.string()),
        "geom": pa.array([buf], pa.binary()),
        "xmin": pa.array([b0[0]], pa.float64()),
        "ymin": pa.array([b0[1]], pa.float64()),
        "xmax": pa.array([b0[2]], pa.float64()),
        "ymax": pa.array([b0[3]], pa.float64()),
    })
    from brdrq_ray.functions.geometry_ops import simplify_geometries
    out = simplify_geometries(ray.data.from_arrow(tbl), tolerance=1.0)
    row = out.take_all()[0]
    kind, parts = g.unpack_geom(row["geom"])
    n_pts = sum(len(r) for rings in parts for r in rings)
    assert n_pts < 40  # 400 noisy points collapse near the 4 corners
    assert row["simplify_pts_removed"] == 400 - n_pts
    # area within the tolerance band of the original
    a0 = g.geom_area(g.GEOM_POLYGON, [[g.snap(ring)]])
    a1 = g.geom_area(kind, parts)
    assert abs(a1 - a0) < 4 * 100.0 * 1.0  # perimeter * tol bound
    # output is valid (repair ran): recompute make_valid is a no-op
    k2, p2 = g.make_valid(kind, parts)
    assert g.geom_area(k2, p2) == pytest.approx(a1, rel=1e-9)
    # bbox columns updated to the shrunken geometry
    bb = g.geom_bbox(parts)
    assert (row["xmin"], row["ymin"], row["xmax"], row["ymax"]) == bb
    # determinism across partitionings (trivially one row, but exercise
    # the actor pool path twice)
    again = simplify_geometries(ray.data.from_arrow(tbl), tolerance=1.0)
    assert again.take_all()[0]["geom"] == row["geom"]


def test_simplify_degenerate_feature_gets_nan_bbox(ray_session):
    """A feature that collapses entirely keeps the codebase's NaN-bbox
    convention for empty geometries (a (0,0,0,0) bbox would be a phantom
    point at WORLD_ORIGIN for bbox-window consumers)."""
    import math

    import ray.data

    from brdrq_ray.functions.geometry_ops import simplify_geometries

    sliver = np.array([[0.0, 0.0], [50.0, 0.001], [50.0, 0.0]])
    buf = g.pack_geom(g.GEOM_POLYGON, [[g.snap(sliver)]])
    b0 = g.geom_bbox([[g.snap(sliver)]])
    tbl = pa.table({
        "theme_id": pa.array(["s"], pa.string()),
        "geom": pa.array([buf], pa.binary()),
        "xmin": pa.array([b0[0]], pa.float64()),
        "ymin": pa.array([b0[1]], pa.float64()),
        "xmax": pa.array([b0[2]], pa.float64()),
        "ymax": pa.array([b0[3]], pa.float64()),
    })
    row = simplify_geometries(ray.data.from_arrow(tbl),
                              tolerance=1.0).take_all()[0]
    kind, parts = g.unpack_geom(row["geom"])
    assert parts == []
    assert all(math.isnan(row[c]) for c in ("xmin", "ymin", "xmax", "ymax"))

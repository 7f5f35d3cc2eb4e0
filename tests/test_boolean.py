import numpy as np
import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.geom.boolean import dissolve, overlay, union_many


def sq(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=float)


def area(parts):
    return g.geom_area(g.GEOM_POLYGON, parts)


A = [[sq(0, 0, 10, 10)]]
B = [[sq(5, 5, 15, 15)]]


def test_rect_intersection():
    out = overlay(A, B, "intersection")
    assert area(out) == pytest.approx(25.0)


def test_rect_union():
    out = overlay(A, B, "union")
    assert area(out) == pytest.approx(175.0)


def test_rect_difference():
    out = overlay(A, B, "difference")
    assert area(out) == pytest.approx(75.0)
    out2 = overlay(B, A, "difference")
    assert area(out2) == pytest.approx(75.0)


def test_rect_symdiff():
    out = overlay(A, B, "symdiff")
    assert area(out) == pytest.approx(150.0)


def test_disjoint():
    C = [[sq(100, 100, 110, 110)]]
    assert overlay(A, C, "intersection") == []
    assert area(overlay(A, C, "union")) == pytest.approx(200.0)
    assert area(overlay(A, C, "difference")) == pytest.approx(100.0)


def test_contained_difference_makes_hole():
    inner = [[sq(3, 3, 6, 6)]]
    out = overlay(A, inner, "difference")
    assert area(out) == pytest.approx(100 - 9)
    # one part with a hole
    assert len(out) == 1 and len(out[0]) == 2


def test_contained_intersection():
    inner = [[sq(3, 3, 6, 6)]]
    assert area(overlay(A, inner, "intersection")) == pytest.approx(9.0)
    assert area(overlay(inner, A, "intersection")) == pytest.approx(9.0)


def test_shared_edge_union_dissolve():
    # two parcels sharing an edge -> dissolve cancels it
    p1 = [[sq(0, 0, 5, 10)]]
    p2 = [[sq(5, 0, 10, 10)]]
    out = dissolve(p1 + p2)
    assert area(out) == pytest.approx(100.0)
    assert len(out) == 1 and len(out[0]) == 1
    # overlay union must agree
    out2 = overlay(p1, p2, "union")
    assert area(out2) == pytest.approx(100.0)


def test_shared_edge_intersection_empty_interior():
    p1 = [[sq(0, 0, 5, 10)]]
    p2 = [[sq(5, 0, 10, 10)]]
    out = overlay(p1, p2, "intersection")
    assert area(out) == pytest.approx(0.0)


def test_dissolve_t_junction():
    # parcel 2 + 3 stacked right of parcel 1: T junction at (5,5)
    p1 = [[sq(0, 0, 5, 10)]]
    p2 = [[sq(5, 0, 10, 5)]]
    p3 = [[sq(5, 5, 10, 10)]]
    out = dissolve(p1 + p2 + p3)
    assert area(out) == pytest.approx(100.0)
    assert len(out) == 1


def test_dissolve_with_interior_hole():
    # ring of 4 parcels around an empty middle -> union has a hole
    flat = [[sq(0, 0, 9, 3)], [sq(0, 3, 3, 9)], [sq(3, 6, 9, 9)], [sq(6, 3, 9, 6)]]
    out = dissolve(flat)
    assert area(out) == pytest.approx(9 * 9 - 9)
    assert any(len(rings) == 2 for rings in out)


def test_area_identity_random():
    rng = np.random.default_rng(7)
    for trial in range(25):
        # random convex-ish polygons: points on a circle with jittered radius
        def rand_poly(cx, cy):
            n = rng.integers(5, 12)
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            rad = rng.uniform(2, 6, n)
            pts = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
            return [[g.snap(pts)]]

        pa = rand_poly(0, 0)
        pb = rand_poly(rng.uniform(-4, 4), rng.uniform(-4, 4))
        ai = area(overlay(pa, pb, "intersection"))
        ad1 = area(overlay(pa, pb, "difference"))
        ad2 = area(overlay(pb, pa, "difference"))
        au = area(overlay(pa, pb, "union"))
        assert ai + ad1 + ad2 == pytest.approx(au, rel=1e-6, abs=1e-6), f"trial {trial}"
        assert ai + ad1 == pytest.approx(area(pa), rel=1e-6, abs=1e-6), f"trial {trial}"
        assert ai + ad2 == pytest.approx(area(pb), rel=1e-6, abs=1e-6), f"trial {trial}"


def test_union_many_overlapping():
    parts = [[[sq(i, 0, i + 2, 2)]] for i in range(0, 10)]  # overlapping strips
    out = union_many(parts)
    assert area(out) == pytest.approx(11 * 2.0)


def test_multipolygon_ops():
    mp = [[sq(0, 0, 4, 4)], [sq(6, 0, 10, 4)]]
    clip = [[sq(2, 0, 8, 4)]]
    out = overlay(mp, clip, "intersection")
    assert area(out) == pytest.approx(2 * 4 + 2 * 4)
    assert len(out) == 2


def test_dissolve_grid_long_edge_tjunctions():
    """The bbox-grid candidate search routes edges spanning many cells onto
    the always-check list — a long edge must still receive T-junction cuts
    from vertices far along it (regression guard for the r3 grid pruning)."""
    import numpy as np
    from brdrq_ray.geom.boolean import dissolve

    # one 1000-wide strip and 10 small squares sitting on its top edge:
    # every square contributes a T-junction in the middle of the long edge
    strip = [[np.array([(0, 0), (1000, 0), (1000, 5), (0, 5)], float)]]
    squares = [[[np.array([(x, 5), (x + 2, 5), (x + 2, 7), (x, 7)], float)]]
               for x in range(10, 1000, 100)]
    out = dissolve([strip] + squares)
    from brdrq_ray.geom import core as g
    total = g.geom_area(g.GEOM_POLYGON, out)
    assert total == pytest.approx(1000 * 5 + 10 * 4, abs=1e-6)

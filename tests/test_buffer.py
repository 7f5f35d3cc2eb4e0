import numpy as np
import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.geom.buffer import closing, dilate, erode, opening


def sq(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=float)


def area(parts):
    return g.geom_area(g.GEOM_POLYGON, parts)


def test_dilate_square():
    out = dilate([[sq(0, 0, 10, 10)]], 1.0)
    # area = 100 + perimeter*r + pi*r^2 (round corners, discretized slightly under)
    expect = 100 + 40 * 1.0 + np.pi
    assert area(out) == pytest.approx(expect, rel=0.01)


def test_erode_square():
    out = erode([[sq(0, 0, 10, 10)]], 1.0)
    assert area(out) == pytest.approx(64.0, rel=0.02)


def test_erode_kills_sliver():
    out = erode([[sq(0, 0, 100, 0.5)]], 1.0)
    assert area(out) == pytest.approx(0.0, abs=1e-6)


def test_opening_removes_thin_protrusion():
    # square with a thin spike attached
    body = [[sq(0, 0, 10, 10)], [sq(10, 4.8, 30, 5.2)]]
    out = opening(body, 1.0)
    assert area(out) == pytest.approx(100.0, rel=0.05)


def test_closing_fills_crack():
    # two squares separated by a 0.5 m crack; closing with r=1 bridges it
    body = [[sq(0, 0, 10, 10)], [sq(10.5, 0, 20, 10)]]
    out = closing(body, 1.0)
    assert area(out) >= 195.0 + 4.0  # crack (5 m2) mostly filled


def test_dissolve_tolerates_empty_first_parts_object():
    """Regression: an empty parts object at index 0 (an erode-consumed
    sliver contribution) must not defeat dissolve's nesting sniff —
    previously [[], partsA, partsB] was read as ONE parts object and
    crashed _edges_of with mixed array dims."""
    from brdrq_ray.geom.boolean import dissolve

    a = [[sq(0, 0, 10, 10)]]
    b = [[sq(10, 0, 20, 10)]]
    out = dissolve([[], a, b])
    assert area(out) == pytest.approx(200.0, abs=1e-6)
    # empty-only input stays empty
    assert dissolve([[], []]) == []


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_raw_offset_matches_capsule_oracle(seed):
    """The raw-offset (Chen-McMains winding) dilate/erode must agree with
    the exact per-edge capsule construction up to arc discretization."""
    from brdrq_ray.geom.buffer import _dilate_capsules, _erode_capsules

    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 12))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(3.0, 8.0, n)
    ring = np.column_stack([10 + rad * np.cos(ang), 10 + rad * np.sin(ang)])
    parts = [[ring]]
    r = float(rng.uniform(0.3, 1.2))
    a_fast, a_slow = area(dilate(parts, r)), area(_dilate_capsules(parts, r))
    assert a_fast == pytest.approx(a_slow, rel=2e-3)
    e_fast = area(erode(parts, r))
    e_slow = area(_erode_capsules(parts, r))
    assert e_fast == pytest.approx(e_slow, rel=2e-3, abs=1e-3)


def test_closing_preserves_clean_geometry_exactly():
    """Mitered closing must round-trip unchanged geometry byte-identically
    (the identity fast path) — the property that makes default-on
    apply_correction affordable."""
    parts = [[sq(0, 0, 10, 10)], [sq(30, 0, 40, 7)]]
    out = closing(parts, 0.01)
    assert out is parts

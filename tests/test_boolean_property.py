"""Property-based fuzz of the overlay kernel (hypothesis): the area identities
A∩B + A∖B + B∖A = A∪B and A∩B + A∖B = A must hold for random simple polygons
(SURVEY.md section 7.2.1 gate)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from brdrq_ray.geom import core as g
from brdrq_ray.geom.boolean import overlay


def star_polygon(cx, cy, radii, angles):
    """A guaranteed-simple polygon: points at sorted angles around a center."""
    pts = np.column_stack([cx + radii * np.cos(angles), cy + radii * np.sin(angles)])
    return [[g.snap(pts)]]


def area(parts):
    return g.geom_area(g.GEOM_POLYGON, parts)


poly_strategy = st.builds(
    lambda seed, cx, cy: _mk(seed, cx, cy),
    st.integers(0, 10_000),
    st.floats(-5, 5), st.floats(-5, 5),
)


def _mk(seed, cx, cy):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 14))
    # evenly spaced angles + bounded jitter: every angular gap stays < pi,
    # which guarantees the radial polygon is SIMPLE (a free-sorted angle set
    # can have a gap > pi whose closing edge self-intersects)
    step = 2 * np.pi / n
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False) \
        + rng.uniform(-0.45, 0.45, n) * step
    radii = rng.uniform(1.5, 6, n)
    return star_polygon(cx, cy, radii, angles)


@settings(max_examples=60, deadline=None)
@given(pa_=poly_strategy, pb_=poly_strategy)
def test_area_identities(pa_, pb_):
    ai = area(overlay(pa_, pb_, "intersection"))
    d1 = area(overlay(pa_, pb_, "difference"))
    d2 = area(overlay(pb_, pa_, "difference"))
    au = area(overlay(pa_, pb_, "union"))
    # tolerance = the snap-grid error budget: coordinates live on a 1e-6
    # lattice, so each overlay can move area by O(total perimeter * 1e-6) —
    # near-identical inputs produce hairline slivers right at that scale
    tol = 2e-6 * (g.geom_perimeter(g.GEOM_POLYGON, pa_)
                  + g.geom_perimeter(g.GEOM_POLYGON, pb_)) + 1e-9
    assert ai + d1 + d2 == pytest.approx(au, rel=1e-6, abs=tol)
    assert ai + d1 == pytest.approx(area(pa_), rel=1e-6, abs=tol)
    assert ai + d2 == pytest.approx(area(pb_), rel=1e-6, abs=tol)
    # symdiff consistency
    sd = area(overlay(pa_, pb_, "symdiff"))
    assert sd == pytest.approx(d1 + d2, rel=1e-6, abs=tol)


@settings(max_examples=40, deadline=None)
@given(p=poly_strategy)
def test_self_overlay(p):
    assert area(overlay(p, p, "intersection")) == pytest.approx(area(p), rel=1e-9)
    assert area(overlay(p, p, "difference")) == pytest.approx(0.0, abs=1e-9)
    assert area(overlay(p, p, "union")) == pytest.approx(area(p), rel=1e-9)


@settings(max_examples=40, deadline=None)
@given(p=poly_strategy)
def test_wkt_roundtrip_preserves_area(p):
    wkt = g.to_wkt(g.GEOM_POLYGON, p)
    kind, parts = g.parse_wkt(wkt)
    assert area(parts) == pytest.approx(area(p), rel=1e-9, abs=1e-9)


@settings(max_examples=40, deadline=None)
@given(seed_a=st.integers(0, 10_000), seed_b=st.integers(0, 10_000))
def test_area_identities_holes_and_multi(seed_a, seed_b):
    """Same identities for polygons with holes and multi-part inputs."""
    def mk(seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 12))
        step = 2 * np.pi / n
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False) + rng.uniform(-.45, .45, n) * step
        rad = rng.uniform(2, 6, n)
        cx, cy = rng.uniform(-4, 4, 2)
        shell = g.snap(np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)]))
        parts = [[shell]]
        if rng.random() < 0.5:
            hr = rng.uniform(0.3, 0.8)
            hole = g.snap(np.column_stack([cx + hr * np.cos(ang),
                                           cy + hr * np.sin(ang)]))[::-1].copy()
            parts = [[shell, hole]]
        if rng.random() < 0.3:
            off = rng.uniform(8, 12)
            parts.append([g.snap(shell + np.array([off, off]))])
        _, parts = g.make_valid(g.GEOM_POLYGON, parts)
        return parts

    A, B = mk(seed_a * 2 + 1), mk(seed_b * 2 + 2)
    ai = area(overlay(A, B, "intersection"))
    d1 = area(overlay(A, B, "difference"))
    d2 = area(overlay(B, A, "difference"))
    au = area(overlay(A, B, "union"))
    tol = 2e-6 * (g.geom_perimeter(g.GEOM_POLYGON, A)
                  + g.geom_perimeter(g.GEOM_POLYGON, B)) + 1e-9
    assert ai + d1 + d2 == pytest.approx(au, rel=1e-6, abs=tol)
    assert ai + d1 == pytest.approx(area(A), rel=1e-6, abs=tol)
    assert ai + d2 == pytest.approx(area(B), rel=1e-6, abs=tol)


@given(st.integers(0, 10_000))
@settings(max_examples=60, deadline=None)
def test_collinear_spike_fuzz(seed):
    """Random rectilinear ring with an injected zero-width collinear spike:
    make_valid must recover the spike-free area exactly."""
    rng = np.random.default_rng(seed)
    w, h = rng.uniform(4, 12), rng.uniform(4, 12)
    base = [(0.0, 0.0), (w, 0.0), (w, h), (0.0, h)]
    # spike: out-and-back along an edge-aligned line from a point on the top
    sx = float(rng.uniform(0.5, w - 0.5))
    slen = float(rng.uniform(0.5, 3.0))
    ring = np.array(base[:3] + [(sx, h), (sx, h + slen), (sx, h)] + base[3:],
                    float)
    k, parts = g.make_valid(g.GEOM_POLYGON, [[g.snap(ring)]])
    assert area(parts) == pytest.approx(w * h, rel=1e-6)


def test_containment_fast_path_matches_stitch_path():
    """Zero-cut overlays (boundaries never touch) take the per-ring
    containment fast path — its output must be BIT-IDENTICAL to the generic
    split/classify/stitch path on the same inputs (fuzzed: containment,
    hole-nesting, bbox-overlapping disjoint)."""
    import numpy as np
    from brdrq_ray.geom import boolean as bl
    from brdrq_ray.geom import core as g

    def sq(x0, y0, w, h):
        return np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                         [x0, y0 + h]], float)

    def slow(a, b, op):
        ea, eb = bl._edges_of(a), bl._edges_of(b)
        ea_c, eb_c = bl._split_edges(ea, eb)
        sub_a, sub_b = bl._apply_cuts(ea_c), bl._apply_cuts(eb_c)
        keys_a = {(e[0], e[1]) for e in sub_a}
        keys_b = {(e[0], e[1]) for e in sub_b}
        lab_a = bl._classify(sub_a, b, keys_b)
        lab_b = bl._classify(sub_b, a, keys_a)
        sel = []
        if op == "intersection":
            sel += [e for e, l in zip(sub_a, lab_a) if l in ("in", "shared_same")]
            sel += [e for e, l in zip(sub_b, lab_b) if l == "in"]
        elif op == "union":
            sel += [e for e, l in zip(sub_a, lab_a) if l in ("out", "shared_same")]
            sel += [e for e, l in zip(sub_b, lab_b) if l == "out"]
        else:
            sel += [e for e, l in zip(sub_a, lab_a) if l in ("out", "shared_opp")]
            sel += [(e[1], e[0], e[4], e[5], e[2], e[3])
                    for e, l in zip(sub_b, lab_b) if l == "in"]
        return bl._stitch(sel)

    def canon(parts):
        return [[r.tolist() for r in p] for p in parts]

    rng = np.random.default_rng(9)
    checked = 0
    for trial in range(120):
        big = sq(0, 0, 10, 10)
        k = rng.integers(0, 4)
        if k == 0:
            a, b = [[big]], [[sq(2 + rng.uniform(0, 2), 2 + rng.uniform(0, 2), 2, 2)]]
        elif k == 1:  # disjoint but bbox-overlapping
            a = [[np.array([[0, 0], [12, 0], [0, 6]], float)]]
            b = [[sq(8, 4, 2, 2)]]
        elif k == 2:  # b inside a's hole
            a, b = [[big, sq(3, 3, 4, 4)[::-1].copy()]], [[sq(4, 4, 1.5, 1.5)]]
        else:
            a, b = [[sq(3, 3, 2, 2)]], [[big]]
        dx, dy = g.snap(rng.uniform(0, 0.37, 2))
        a = [[g.snap(r + [dx, dy]) for r in p] for p in a]
        b = [[g.snap(r + [dx, dy]) for r in p] for p in b]
        if bl._bbox_disjoint(a, b):
            continue
        for op in ("intersection", "union", "difference"):
            assert canon(bl._containment_overlay(a, b, op)) == canon(slow(a, b, op)), \
                (trial, op)
            checked += 1
    assert checked > 200


def test_grid_pair_path_matches_dense(monkeypatch):
    """Above _MAX_DENSE_PAIRS the edge-pair prefilter switches from the
    dense Ea x Eb matrix to a bbox grid — the pair SET and cut insertion
    order (exact bbox filter + row-major lexsort) must make every overlay
    bit-identical to the dense path."""
    import numpy as np
    from brdrq_ray.geom import boolean as bl
    from brdrq_ray.geom import core as g

    def circle(cx, cy, r, n):
        a = np.linspace(0, 2 * np.pi, n, endpoint=False)
        return g.snap(np.column_stack([cx + r * np.cos(a), cy + r * np.sin(a)]))

    rng = np.random.default_rng(21)
    for trial in range(6):
        n1, n2 = int(rng.integers(40, 120)), int(rng.integers(40, 120))
        A = [[circle(0, 0, 10, n1)]]
        B = [[circle(rng.uniform(2, 14), rng.uniform(-3, 3), 8, n2)]]
        outs = {}
        for name, thresh in (("dense", 10**12), ("grid", 0)):
            monkeypatch.setattr(bl, "_MAX_DENSE_PAIRS", thresh)
            outs[name] = [
                [[r.tolist() for r in p]
                 for p in bl.overlay(A, B, op, validate=False)]
                for op in ("intersection", "union", "difference")]
        assert outs["dense"] == outs["grid"], f"trial {trial}"

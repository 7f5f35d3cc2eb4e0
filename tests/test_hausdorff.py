"""Hausdorff distance: exact known cases, a dense-sampling oracle for the
densified form, packed-vs-WKT input equivalence, and the error bound
|operator - true| <= densify/2."""

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.geom import metrics as gm
from brdrq_ray.geom.snap import densify_line


def sq(x0, y0, x1, y1):
    return [[np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)]]


def _sample_oracle(kind_a, parts_a, kind_b, parts_b, step=0.01):
    """max over fine samples of A of exact distance to B's segments."""
    pts = []
    for rings in parts_a:
        for r in rings:
            closed = np.vstack([r, r[:1]]) if kind_a == g.GEOM_POLYGON else r
            pts.append(densify_line(closed, step))
    pa_ = np.vstack(pts)
    sa, sb = gm._boundary_edges(kind_b, parts_b)
    return float(g.points_to_segments_distance(pa_, sa, sb).max())


def test_concentric_squares_exact():
    a, b = sq(-1, -1, 1, 1), sq(-2, -2, 2, 2)
    assert gm.directed_hausdorff(g.GEOM_POLYGON, a, g.GEOM_POLYGON, b) \
        == pytest.approx(1.0)
    assert gm.directed_hausdorff(g.GEOM_POLYGON, b, g.GEOM_POLYGON, a) \
        == pytest.approx(np.sqrt(2.0))
    assert gm.hausdorff_distance(g.GEOM_POLYGON, a, g.GEOM_POLYGON, b) \
        == pytest.approx(np.sqrt(2.0))


def test_disjoint_translated_squares():
    a, b = sq(0, 0, 1, 1), sq(3, 0, 4, 1)
    assert gm.hausdorff_distance(g.GEOM_POLYGON, a, g.GEOM_POLYGON, b) \
        == pytest.approx(3.0)


def test_densify_needed_for_midspan_sup():
    la = [[np.array([[0.0, 0.0], [10.0, 0.0]])]]
    lb = [[np.array([[0.0, 0.0], [5.0, 3.0], [10.0, 0.0]])]]
    # A's vertices lie ON B: vertices-only directed distance is 0
    assert gm.directed_hausdorff(g.GEOM_LINESTRING, la,
                                 g.GEOM_LINESTRING, lb) == pytest.approx(0.0)
    true = 15.0 / np.sqrt(34.0)  # midpoint (5,0) to the (0,0)-(5,3) line
    got = gm.directed_hausdorff(g.GEOM_LINESTRING, la,
                                g.GEOM_LINESTRING, lb, densify=0.01)
    assert got == pytest.approx(true, abs=0.01)
    # symmetric picks up B's apex (5,3) -> 3.0 even without densify
    assert gm.hausdorff_distance(g.GEOM_LINESTRING, la,
                                 g.GEOM_LINESTRING, lb) == pytest.approx(3.0)


def test_point_sets():
    mp_a = [[np.array([[0.0, 0.0]])], [np.array([[4.0, 0.0]])]]
    mp_b = [[np.array([[0.0, 1.0]])]]
    assert gm.hausdorff_distance(g.GEOM_POINT, mp_a, g.GEOM_POINT, mp_b) \
        == pytest.approx(np.hypot(4.0, 1.0))


def test_empty_is_nan():
    a = sq(0, 0, 1, 1)
    assert np.isnan(gm.hausdorff_distance(g.GEOM_POLYGON, a,
                                          g.GEOM_POLYGON, []))
    assert np.isnan(gm.directed_hausdorff(g.GEOM_POLYGON, [],
                                          g.GEOM_POLYGON, a))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_vs_sampling_oracle(seed):
    rng = np.random.default_rng(seed)

    def rand_poly():
        n = rng.integers(4, 9)
        ang = np.sort(rng.random(n)) * 2 * np.pi
        rad = 1.0 + rng.random(n) * 2.0
        ctr = rng.random(2) * 10
        ring = np.column_stack([ctr[0] + rad * np.cos(ang),
                                ctr[1] + rad * np.sin(ang)])
        return [[g.snap(ring)]]

    for _ in range(5):
        a, b = rand_poly(), rand_poly()
        densify = 0.05
        got = gm.hausdorff_distance(g.GEOM_POLYGON, a, g.GEOM_POLYGON, b,
                                    densify=densify)
        oracle = max(_sample_oracle(g.GEOM_POLYGON, a, g.GEOM_POLYGON, b),
                     _sample_oracle(g.GEOM_POLYGON, b, g.GEOM_POLYGON, a))
        # operator converges from below; both discretize at <= step/2 error
        assert got <= oracle + 0.005 + 1e-9
        assert got >= oracle - densify / 2 - 0.005


def test_dataset_operator_packed_and_wkt(ray_session):
    import ray.data
    from brdrq_ray.functions.geometry_ops import hausdorff_pairs

    a = sq(-1, -1, 1, 1)
    b = sq(-2, -2, 2, 2)
    c = sq(3, 0, 4, 1)
    packed = pa.table({
        "fid": pa.array(["r0", "r1"]),
        "ga": pa.array([g.pack_geom(g.GEOM_POLYGON, a)] * 2, pa.binary()),
        "gb": pa.array([g.pack_geom(g.GEOM_POLYGON, b),
                        g.pack_geom(g.GEOM_POLYGON, c)], pa.binary()),
    })
    got = (hausdorff_pairs(ray.data.from_arrow(packed), "ga", "gb")
           .to_pandas().sort_values("fid"))
    # r1: A=[-1,1]^2 far corner (-1,-1) to B=[3,4]x[0,1] nearest (3,0)
    assert got["hausdorff"].tolist() == pytest.approx([np.sqrt(2.0),
                                                       np.sqrt(17.0)])

    def wkt_sq(x0, y0, x1, y1):
        return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                f"{x0} {y1}, {x0} {y0}))")

    wkt = pa.table({
        "fid": pa.array(["r0", "r1"]),
        "ga": pa.array([wkt_sq(-1, -1, 1, 1)] * 2),
        "gb": pa.array([wkt_sq(-2, -2, 2, 2), wkt_sq(3, 0, 4, 1)]),
    })
    got_w = (hausdorff_pairs(ray.data.from_arrow(wkt), "ga", "gb")
             .to_pandas().sort_values("fid"))
    assert got_w["hausdorff"].tolist() == got["hausdorff"].tolist()

    # directed + densify flags pass through
    la = "LINESTRING (0 0, 10 0)"
    lb = "LINESTRING (0 0, 5 3, 10 0)"
    t = pa.table({"ga": pa.array([la]), "gb": pa.array([lb])})
    d = (hausdorff_pairs(ray.data.from_arrow(t), "ga", "gb",
                         directed=True, densify=0.01).to_pandas())
    assert d["hausdorff"][0] == pytest.approx(15 / np.sqrt(34), abs=0.01)

"""geom_distance kernel (exact set distance) + the dwithin join operator."""

import numpy as np
import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.geom import metrics as gm
from brdrq_ray.sources import fixtures as fx


def wkt_sq(x0, y0, x1, y1):
    return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
            f"{x0} {y1}, {x0} {y0}))")


def parsed(wkt):
    kind, parts = g.parse_wkt(wkt)
    return g.make_valid(kind, parts)


def dist(wa, wb):
    ka, pa_ = parsed(wa)
    kb, pb_ = parsed(wb)
    return gm.geom_distance(ka, pa_, kb, pb_)


def test_disjoint_and_touching_squares():
    assert dist(wkt_sq(0, 0, 1, 1), wkt_sq(3, 0, 4, 1)) == pytest.approx(2.0)
    assert dist(wkt_sq(0, 0, 1, 1), wkt_sq(2, 2, 3, 3)) \
        == pytest.approx(np.sqrt(2.0))
    assert dist(wkt_sq(0, 0, 1, 1), wkt_sq(1, 0, 2, 1)) == pytest.approx(0.0)
    assert dist(wkt_sq(0, 0, 2, 2), wkt_sq(1, 1, 3, 3)) == pytest.approx(0.0)


def test_containment_is_zero():
    assert dist(wkt_sq(4, 4, 6, 6), wkt_sq(0, 0, 10, 10)) == 0.0
    assert dist(wkt_sq(0, 0, 10, 10), wkt_sq(4, 4, 6, 6)) == 0.0


def test_multipart_one_part_inside():
    mp = ("MULTIPOLYGON (((20 20, 21 20, 21 21, 20 21, 20 20)), "
          "((4 4, 6 4, 6 6, 4 6, 4 4)))")
    assert dist(mp, wkt_sq(0, 0, 10, 10)) == 0.0


def test_hole_island_not_contained():
    donut = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
             "(4 4, 6 4, 6 6, 4 6, 4 4))")
    # the island sits INSIDE the hole: not contained, nearest boundary is
    # the hole ring at 0.5
    assert dist(wkt_sq(4.5, 4.5, 5.5, 5.5), donut) == pytest.approx(0.5)


def test_proper_crossing_lines():
    la = "LINESTRING (0 0, 2 2)"
    lb = "LINESTRING (0 2, 2 0)"
    # every vertex is sqrt(2)/1.414.. from the other line's segment, but the
    # interiors cross -> distance 0
    assert dist(la, lb) == 0.0
    assert dist(la, "LINESTRING (3 0, 3 2)") == pytest.approx(1.0)


def test_point_cases():
    assert dist("POINT (5 5)", wkt_sq(0, 0, 10, 10)) == 0.0
    assert dist("POINT (12 5)", wkt_sq(0, 0, 10, 10)) == pytest.approx(2.0)
    assert dist("MULTIPOINT (0 0, 7 0)", "MULTIPOINT (10 0)") \
        == pytest.approx(3.0)


def test_empty_is_nan():
    ka, pa_ = parsed(wkt_sq(0, 0, 1, 1))
    assert np.isnan(gm.geom_distance(ka, pa_, g.GEOM_POLYGON, []))


def test_dwithin_join_vs_per_pair_kernel(ray_session):
    import ray.data
    from brdrq_ray.functions.spatial_join import dwithin_join

    theme = fx.make_thematic_table(nx=10, ny=10, seed=42, n_features=15)
    ref = fx.make_reference_table(nx=10, ny=10, seed=42)
    D = 3.0
    got = (dwithin_join(ray.data.from_arrow(theme),
                        ray.data.from_arrow(ref), distance=D)
           .to_pandas().sort_values(["theme_id", "ref_id"])
           .reset_index(drop=True))
    assert not got.duplicated(["theme_id", "ref_id"]).any()

    # brute force: exact kernel over every (theme, ref) pair
    expect = {}
    parcels, _ = fx.make_reference_parts(nx=10, ny=10, seed=42)
    for i in range(theme.num_rows):
        tid = theme.column("theme_id")[i].as_py()
        tk, tparts = parsed(theme.column("geometry_wkt")[i].as_py())
        for rid, rparts in parcels.items():
            d = gm.geom_distance(tk, tparts, g.GEOM_POLYGON, rparts)
            if d <= D:
                expect[(tid, rid)] = d
    got_pairs = {(r.theme_id, r.ref_id): r.distance
                 for r in got.itertuples()}
    assert set(got_pairs) == set(expect)
    for k in expect:
        assert got_pairs[k] == pytest.approx(expect[k], abs=1e-12)
    # subset sanity: the intersects join is the distance<=0 slice
    assert (got["distance"] >= 0).all() and (got["distance"] <= D).all()
    assert (got["distance"] == 0).sum() > 0 and (got["distance"] > 0).sum() > 0


def test_dwithin_partition_invariance(ray_session):
    import ray.data
    from brdrq_ray.functions.spatial_join import dwithin_join

    theme = fx.make_thematic_table(nx=10, ny=10, seed=1, n_features=12)
    ref = fx.make_reference_table(nx=10, ny=10, seed=42)
    outs = []
    for nblocks in (1, 5):
        got = (dwithin_join(ray.data.from_arrow(theme).repartition(nblocks),
                            ray.data.from_arrow(ref).repartition(nblocks),
                            distance=2.0)
               .to_pandas().sort_values(["theme_id", "ref_id"])
               .reset_index(drop=True))
        outs.append(got)
    assert outs[0].equals(outs[1])

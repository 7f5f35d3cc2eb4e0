"""Dataset-level spatial verbs beyond the semi-join: intersection overlay
join (ST_Intersection), point-in-polygon join (geocode/tag), dissolve-by-key
(ST_Union GROUP BY). Brute-force oracles + partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.geom.boolean import overlay, union_many
from brdrq_ray.sources import fixtures as fx


@pytest.fixture(scope="module")
def spatial_tables():
    theme = fx.make_thematic_table(nx=10, ny=10, seed=42, n_features=15)
    ref = fx.make_reference_table(nx=10, ny=10, seed=42)
    return theme, ref


def test_intersection_overlay_join_vs_bruteforce(ray_session, spatial_tables):
    import ray.data
    from brdrq_ray.functions.spatial_join import intersection_overlay_join

    theme, ref = spatial_tables
    got = intersection_overlay_join(ray.data.from_arrow(theme),
                                    ray.data.from_arrow(ref)).to_pandas()
    # pairs unique (each theme lives in ONE group -> no cross-tile dupes)
    assert not got.duplicated(["theme_id", "ref_id"]).any()

    parcels, _ = fx.make_reference_parts(nx=10, ny=10, seed=42)
    expect = {}
    for i in range(theme.num_rows):
        tid = theme.column("theme_id")[i].as_py()
        _, tparts = g.parse_wkt(theme.column("geometry_wkt")[i].as_py())
        _, tparts = g.make_valid(g.GEOM_POLYGON, tparts)
        for rid, rparts in parcels.items():
            inter = overlay(tparts, rparts, "intersection")
            area = g.geom_area(g.GEOM_POLYGON, inter)
            if area > 0:
                expect[(tid, rid)] = (g.to_wkt(g.GEOM_POLYGON, inter), area)
    got_map = {(r.theme_id, r.ref_id): (r.inter_wkt, r.inter_area)
               for r in got.itertuples()}
    assert set(got_map) == set(expect)
    for k, (wkt, area) in expect.items():
        # bit-stable: the per-group overlay sees the same canonicalized
        # inputs as the driver-side oracle
        assert got_map[k][0] == wkt
        assert got_map[k][1] == area
    # intersection areas never exceed the theme's own area
    areas = {theme.column("theme_id")[i].as_py():
             theme.column("geometry_wkt")[i].as_py()
             for i in range(theme.num_rows)}
    for (tid, _rid), (_w, a) in got_map.items():
        _, tp = g.parse_wkt(areas[tid])
        assert a <= g.geom_area(g.GEOM_POLYGON, tp) + 1e-6


def _pip_fixture():
    """Overlapping polygons + scattered points with known memberships."""
    polys = {
        "A": "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0))",
        "B": "POLYGON ((20 20, 60 20, 60 60, 20 60, 20 20))",   # overlaps A
        "C": "POLYGON ((100 100, 140 100, 140 140, 100 140, 100 100))",
        "D": "POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))",   # inside A
    }
    rng = np.random.default_rng(1234)
    px = rng.uniform(-20.0, 160.0, 400)
    py = rng.uniform(-20.0, 160.0, 400)
    points = pa.table({
        "point_id": pa.array([f"pt{i:04d}" for i in range(len(px))]),
        "x": pa.array(px, pa.float64()),
        "y": pa.array(py, pa.float64()),
    })
    polygons = pa.table({
        "theme_id": pa.array(list(polys), pa.string()),
        "geometry_wkt": pa.array(list(polys.values()), pa.string()),
    })
    parts = {k: g.make_valid(*g.parse_wkt(w))[1] for k, w in polys.items()}
    expect = set()
    pts = np.column_stack([px, py])
    for k, p in parts.items():
        inside = g.points_in_polygon(pts, p)
        for i in np.nonzero(inside)[0]:
            expect.add((f"pt{int(i):04d}", k))
    return points, polygons, expect


def test_point_in_polygon_join_vs_bruteforce(ray_session):
    import ray.data
    from brdrq_ray.functions.spatial_join import point_in_polygon_join

    points, polygons, expect = _pip_fixture()
    got = point_in_polygon_join(ray.data.from_arrow(points),
                                ray.data.from_arrow(polygons)).to_pandas()
    got_pairs = set(zip(got["point_id"], got["theme_id"]))
    assert got_pairs == expect
    # the fixture guarantees multi-membership (D inside A; A/B overlap):
    # at least one point matched >1 polygon
    per_point = got.groupby("point_id").size()
    assert per_point.max() >= 2
    # and plenty of points matched none (inner-join semantics)
    assert got["point_id"].nunique() < points.num_rows


def test_point_in_polygon_join_partition_invariance(ray_session):
    import ray.data
    from brdrq_ray.functions.spatial_join import point_in_polygon_join

    points, polygons, expect = _pip_fixture()
    got = point_in_polygon_join(
        ray.data.from_arrow(points).repartition(7),
        ray.data.from_arrow(polygons).repartition(3)).to_pandas()
    assert set(zip(got["point_id"], got["theme_id"])) == expect


def test_point_in_polygon_join_forced_fine_level(ray_session):
    """Polygons replicate to their full bbox cover: correctness holds even
    at a cell level far finer than the polygons (many cells per polygon)."""
    import ray.data
    from brdrq_ray.functions.spatial_join import point_in_polygon_join

    points, polygons, expect = _pip_fixture()
    got = point_in_polygon_join(ray.data.from_arrow(points),
                                ray.data.from_arrow(polygons),
                                cell_level=22).to_pandas()
    assert set(zip(got["point_id"], got["theme_id"])) == expect


def test_areal_interpolate_known_shares(ray_session):
    import ray.data
    from brdrq_ray.functions.spatial_join import areal_interpolate

    # source: two 10x10 parcels with population; targets cut them up:
    #  - t_half covers the left half of s1        -> 0.5 * 100
    #  - t_all  covers all of s2 and right half of s1 -> 200 + 0.5 * 100
    #  - t_none covers nothing
    source = pa.table({
        "ref_id": pa.array(["s1", "s2"], pa.string()),
        "geometry_wkt": pa.array([
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
            "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"], pa.string()),
        "pop": pa.array([100.0, 200.0], pa.float64()),
        "jobs": pa.array([40.0, 80.0], pa.float64()),
    })
    target = pa.table({
        "theme_id": pa.array(["t_half", "t_all", "t_none"], pa.string()),
        "geometry_wkt": pa.array([
            "POLYGON ((0 0, 5 0, 5 10, 0 10, 0 0))",
            "POLYGON ((5 0, 20 0, 20 10, 5 10, 5 0))",
            "POLYGON ((100 100, 110 100, 110 110, 100 110, 100 100))"],
            pa.string()),
    })
    out = areal_interpolate(ray.data.from_arrow(source),
                            ray.data.from_arrow(target),
                            ["pop", "jobs"]).to_pandas().set_index("theme_id")
    assert out.loc["t_half", "pop"] == pytest.approx(50.0, abs=1e-9)
    assert out.loc["t_half", "jobs"] == pytest.approx(20.0, abs=1e-9)
    assert out.loc["t_all", "pop"] == pytest.approx(250.0, abs=1e-9)
    assert out.loc["t_all", "jobs"] == pytest.approx(100.0, abs=1e-9)
    assert "t_none" not in out.index
    assert out.loc["t_half", "covered_area"] == pytest.approx(50.0, abs=1e-9)
    # mass conservation: targets tile the sources exactly
    assert out["pop"].sum() == pytest.approx(300.0, abs=1e-9)
    assert out["jobs"].sum() == pytest.approx(120.0, abs=1e-9)


def test_areal_interpolate_partition_invariance(ray_session, spatial_tables):
    import ray.data
    from brdrq_ray.functions.spatial_join import areal_interpolate

    theme, ref = spatial_tables
    rng = np.random.default_rng(5)
    vals = pa.array(rng.uniform(10, 1000, ref.num_rows), pa.float64())
    src = ref.append_column("pop", vals)

    a = areal_interpolate(ray.data.from_arrow(src),
                          ray.data.from_arrow(theme),
                          ["pop"]).to_pandas()
    b = areal_interpolate(ray.data.from_arrow(src).repartition(4),
                          ray.data.from_arrow(theme).repartition(6),
                          ["pop"]).to_pandas()
    a = a.sort_values("theme_id").reset_index(drop=True)
    b = b.sort_values("theme_id").reset_index(drop=True)
    # canonical-order folds: bit-identical, not just approximately equal
    assert (a["pop"].to_numpy() == b["pop"].to_numpy()).all()
    assert (a["covered_area"].to_numpy() == b["covered_area"].to_numpy()).all()
    # every interpolated value within the global bounds
    assert (a["pop"] >= 0).all()


def test_convex_hull_kernel_pinned_and_properties():
    # pinned: square corners + interior/edge points -> exactly the 4 corners,
    # CCW, starting at the lexicographically smallest vertex
    pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10],
                    [5, 5], [3, 7], [5, 0], [0, 5]], dtype=float)
    hull = g.convex_hull(pts)
    np.testing.assert_array_equal(
        hull, np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float))
    # collinear -> the 2-point chain; singleton passes through
    np.testing.assert_array_equal(
        g.convex_hull(np.array([[0, 0], [1, 1], [2, 2], [3, 3]], float)),
        np.array([[0, 0], [3, 3]], float))
    assert len(g.convex_hull(np.array([[2, 2], [2, 2]], float))) == 1

    rng = np.random.default_rng(99)
    for trial in range(30):
        n = int(rng.integers(3, 60))
        p = rng.normal(size=(n, 2)) * 50
        h = g.convex_hull(p)
        assert len(h) >= 3 or n < 3
        # CCW + strictly convex
        closed = np.vstack([h, h[:1]])
        assert g.ring_signed_area(h) > 0
        e = np.diff(closed, axis=0)
        cross = e[:-1, 0] * e[1:, 1] - e[:-1, 1] * e[1:, 0]
        assert (cross > 0).all()
        # every input point on or inside every edge half-plane
        a, b = h, np.roll(h, -1, axis=0)
        cr = ((b[:, 0] - a[:, 0])[:, None] * (p[:, 1] - a[:, 1][:, None])
              - (b[:, 1] - a[:, 1])[:, None] * (p[:, 0] - a[:, 0][:, None]))
        assert (cr >= -1e-9).all()
        # hull vertices are input points
        assert all(any(np.array_equal(v, q) for q in p) for v in h)
        # combiner exactness: hull(hull(A) U hull(B)) == hull(A U B)
        k = int(rng.integers(1, n))
        ha, hb = g.convex_hull(p[:k]), g.convex_hull(p[k:])
        np.testing.assert_array_equal(
            g.convex_hull(np.vstack([ha, hb])), h)


def test_convex_hull_geometries_operator(ray_session, spatial_tables):
    import ray.data
    from brdrq_ray.functions.geometry_ops import convex_hull_geometries
    from brdrq_ray.stages.ingest import parse_geometries

    theme, _ = spatial_tables
    parsed = ray.data.from_arrow(theme).map_batches(parse_geometries,
                                                    batch_format="pyarrow")
    before = {r["theme_id"]: r for r in parsed.take_all()}
    out = convex_hull_geometries(parsed)
    for row in out.take_all():
        src = before[row["theme_id"]]
        _, sparts = g.unpack_geom(src["geom"])
        hull = g.convex_hull(np.vstack([r for rr in sparts for r in rr]))
        _, oparts = g.unpack_geom(row["geom"])
        np.testing.assert_array_equal(oparts[0][0], hull)
        # hull area >= source area, bbox untouched
        assert row["brdr_area"] >= src["brdr_area"] - 1e-9
        assert row["xmin"] == src["xmin"] and row["ymax"] == src["ymax"]


def test_convex_hull_by_distributed(ray_session, spatial_tables):
    import ray.data
    from brdrq_ray.functions.geometry_ops import convex_hull_by

    theme, _ = spatial_tables
    ids = theme.column("theme_id").to_pylist()
    zone = pa.array([f"z{i % 3}" for i in range(len(ids))], pa.string())
    t = theme.append_column("zone", zone)

    a = convex_hull_by(ray.data.from_arrow(t), "zone").to_pandas()
    b = convex_hull_by(ray.data.from_arrow(t).repartition(6),
                       "zone").to_pandas()
    a = a.sort_values("zone").reset_index(drop=True)
    b = b.sort_values("zone").reset_index(drop=True)
    assert (a["hull_wkt"] == b["hull_wkt"]).all()
    assert (a["hull_area"] == b["hull_area"]).all()
    assert (a["n_features"] == b["n_features"]).all()

    # driver oracle: hull over ALL member vertices
    for _, row in a.iterrows():
        members = [i for i, z in zip(ids, zone.to_pylist())
                   if z == row["zone"]]
        assert row["n_features"] == len(members)
        vts = []
        for tid in members:
            w = theme.column("geometry_wkt")[ids.index(tid)].as_py()
            _, parts = g.make_valid(*g.parse_wkt(w))
            vts.extend(r for rr in parts for r in rr)
        hull = g.convex_hull(np.vstack(vts))
        assert row["hull_wkt"] == g.to_wkt(g.GEOM_POLYGON, [[hull]])
        assert row["hull_area"] == g.geom_area(g.GEOM_POLYGON, [[hull]])

    # degenerate key: collinear segments -> EMPTY polygon, area 0
    deg = pa.table({
        "theme_id": pa.array(["l1", "l2"], pa.string()),
        "zone": pa.array(["deg", "deg"], pa.string()),
        "geometry_wkt": pa.array(["LINESTRING (0 0, 5 5)",
                                  "LINESTRING (5 5, 9 9)"], pa.string()),
    })
    out = convex_hull_by(ray.data.from_arrow(deg), "zone").to_pandas()
    assert out.loc[0, "hull_wkt"] == "MULTIPOLYGON EMPTY"
    assert out.loc[0, "hull_area"] == 0.0


def test_dissolve_by_known_unions(ray_session):
    import ray.data
    from brdrq_ray.functions.geometry_ops import dissolve_by

    # key "row": two adjacent unit squares -> one 2x1 rectangle (area 2)
    # key "ovl": two overlapping squares 10x10 shifted 5 -> area 175
    # key "solo": a lone square (area 100)
    t = pa.table({
        "theme_id": pa.array(["a1", "a2", "b1", "b2", "c1"], pa.string()),
        "zone": pa.array(["row", "row", "ovl", "ovl", "solo"], pa.string()),
        "geometry_wkt": pa.array([
            "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
            "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))",
            "POLYGON ((100 100, 110 100, 110 110, 100 110, 100 100))",
            "POLYGON ((105 105, 115 105, 115 115, 105 115, 105 105))",
            "POLYGON ((200 200, 210 200, 210 210, 200 210, 200 200))",
        ], pa.string()),
    })
    out = dissolve_by(ray.data.from_arrow(t), "zone").to_pandas()
    out = out.set_index("zone")
    assert len(out) == 3
    assert out.loc["row", "n_features"] == 2
    assert out.loc["row", "area"] == pytest.approx(2.0, abs=1e-9)
    assert out.loc["ovl", "area"] == pytest.approx(175.0, abs=1e-9)
    assert out.loc["solo", "area"] == pytest.approx(100.0, abs=1e-9)
    # dissolved geometry parses back to ONE part per key here
    for z in ("row", "ovl", "solo"):
        _, parts = g.parse_wkt(out.loc[z, "geom_wkt"])
        assert len(parts) == 1
        assert g.geom_area(g.GEOM_POLYGON, parts) == \
            pytest.approx(out.loc[z, "area"], abs=1e-9)


def test_dissolve_by_partition_invariant_and_matches_driver(ray_session,
                                                            spatial_tables):
    import ray.data
    from brdrq_ray.functions.geometry_ops import dissolve_by

    theme, _ = spatial_tables
    # synthetic key: 3 zones by round-robin over theme_id order
    ids = theme.column("theme_id").to_pylist()
    zone = pa.array([f"z{i % 3}" for i in range(len(ids))], pa.string())
    t = theme.append_column("zone", zone)

    a = dissolve_by(ray.data.from_arrow(t), "zone").to_pandas()
    b = dissolve_by(ray.data.from_arrow(t).repartition(5),
                    "zone").to_pandas()
    a = a.sort_values("zone").reset_index(drop=True)
    b = b.sort_values("zone").reset_index(drop=True)
    # bit-identical output under any input partitioning (canonical id-order
    # union inside each reduce group)
    assert (a["geom_wkt"] == b["geom_wkt"]).all()
    assert (a["area"] == b["area"]).all()

    # driver oracle: union_many over the SAME canonical order
    for _, row in a.iterrows():
        members = sorted(i for i, z in zip(ids, zone.to_pylist())
                         if z == row["zone"])
        parts_list = []
        for tid in members:
            w = theme.column("geometry_wkt")[ids.index(tid)].as_py()
            kind, parts = g.make_valid(*g.parse_wkt(w))
            if parts:
                parts_list.append(parts)
        merged = union_many(parts_list)
        assert row["geom_wkt"] == g.to_wkt(g.GEOM_POLYGON, merged)
        assert row["n_features"] == len(members)

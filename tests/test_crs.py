"""CRS transforms (geom/crs.py) against the PUBLISHED worked examples of
IOGP Guidance Note 7 part 2 (the EPSG dataset's own conversion examples) —
the external oracle in a sandbox without pyproj — plus roundtrip and
dataset-level reprojection contracts."""

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.geom import crs


# ---------------------------------------------------------------------------
# published worked examples
# ---------------------------------------------------------------------------

def _texas_projection():
    # EPSG method 9802 example: NAD27 / Texas South Central (US survey feet)
    return crs.LambertConformal2SP.from_degrees(
        crs.CLARKE_1866_USFT,
        lat_f=27 + 50 / 60, lon_f=-99.0,
        lat_1=28 + 23 / 60, lat_2=30 + 17 / 60,
        fe=2000000.00, fn=0.0)


def test_lcc2sp_epsg_worked_example_forward():
    p = _texas_projection()
    east, north = p.forward(-96.0, 28.5)
    assert east == pytest.approx(2963503.91, abs=0.01)
    assert north == pytest.approx(254759.80, abs=0.01)


def test_lcc2sp_epsg_worked_example_inverse():
    p = _texas_projection()
    lon, lat = p.inverse(2963503.91, 254759.80)
    assert lon == pytest.approx(-96.0, abs=1e-7)
    assert lat == pytest.approx(28.5, abs=1e-7)


def test_geodetic_geocentric_epsg_worked_example():
    # EPSG method 9602 example (WGS84): 53d48'33.82"N, 2d07'46.38"E, h=73 m
    lat = 53 + 48 / 60 + 33.82 / 3600
    lon = 2 + 7 / 60 + 46.38 / 3600
    x, y, z = crs.geodetic_to_geocentric(crs.WGS84, lon, lat, 73.0)
    assert x == pytest.approx(3771793.968, abs=1e-3)
    assert y == pytest.approx(140253.342, abs=1e-3)
    assert z == pytest.approx(5124304.349, abs=1e-3)
    lo, la, h = crs.geocentric_to_geodetic(crs.WGS84, x, y, z)
    assert lo == pytest.approx(lon, abs=1e-11)
    assert la == pytest.approx(lat, abs=1e-11)
    assert h == pytest.approx(73.0, abs=1e-6)


def test_helmert_epsg_worked_example_position_vector():
    # EPSG method 9606 example: WGS72 -> WGS84
    hm = crs.Helmert(0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219,
                     "position_vector")
    x, y, z = hm.apply(3657660.66, 255768.55, 5201382.11)
    assert x == pytest.approx(3657660.78, abs=0.01)
    assert y == pytest.approx(255778.43, abs=0.01)
    assert z == pytest.approx(5201387.75, abs=0.01)


def test_helmert_exact_inverse_and_conventions():
    hm = crs.BD72_TO_WGS84
    pts = np.array([[4027893.0, 307045.0, 4919475.0],
                    [4100000.0, 250000.0, 4850000.0]])
    x, y, z = hm.apply(pts[:, 0], pts[:, 1], pts[:, 2])
    xs, ys, zs = hm.apply_inverse(x, y, z)
    np.testing.assert_allclose(
        np.stack([xs, ys, zs], axis=1), pts, rtol=0, atol=1e-8)
    # coordinate_frame(r) == position_vector(-r)
    pv = crs.Helmert(hm.dx, hm.dy, hm.dz, -hm.rx_sec, -hm.ry_sec,
                     -hm.rz_sec, hm.ds_ppm, "position_vector")
    x2, y2, z2 = pv.apply(pts[:, 0], pts[:, 1], pts[:, 2])
    np.testing.assert_allclose([x, y, z], [x2, y2, z2], rtol=0, atol=1e-9)
    with pytest.raises(ValueError):
        crs.Helmert(0, 0, 0, 0, 0, 0, 0, "bogus")._matrix()


# ---------------------------------------------------------------------------
# the Belgian chain
# ---------------------------------------------------------------------------

def test_lambert72_roundtrip_grid():
    east = np.linspace(20000.0, 290000.0, 25)
    north = np.linspace(20000.0, 245000.0, 25)
    ee, nn = np.meshgrid(east, north)
    lon, lat = crs.lambert72_to_wgs84(ee.ravel(), nn.ravel())
    # Belgium sits in roughly [2.3, 6.5] x [49.4, 51.6]
    assert lon.min() > 1.5 and lon.max() < 7.5
    assert lat.min() > 48.9 and lat.max() < 52.0
    e2, n2 = crs.wgs84_to_lambert72(lon, lat)
    err = np.hypot(e2 - ee.ravel(), n2 - nn.ravel())
    # h=0-on-source convention in both directions: < 1 mm, not exact
    assert err.max() < 1e-3


def test_lambert72_brussels_sanity():
    # Brussels (Grand-Place neighbourhood) lands near (148.9 km, 170.7 km)
    e, n = crs.wgs84_to_lambert72(4.3517, 50.8466)
    assert 147000 < e < 151000
    assert 168000 < n < 173000
    # BD72 vs WGS84 datum shift over Belgium is roughly 90-130 m on the
    # ground: project the SAME lon/lat without the datum shift and compare
    eb, nb = crs.BELGIAN_LAMBERT_72.forward(4.3517, 50.8466)
    shift = float(np.hypot(e - eb, n - nb))
    assert 60.0 < shift < 180.0


def test_transform_fn_registry():
    assert crs.transform_fn("epsg:31370", "EPSG:4326") is \
        crs.lambert72_to_wgs84
    with pytest.raises(KeyError):
        crs.transform_fn("EPSG:31370", "EPSG:3857")


def test_scalar_and_vector_paths_agree():
    e = np.array([150000.0, 200000.0])
    n = np.array([170000.0, 120000.0])
    lon_v, lat_v = crs.lambert72_to_wgs84(e, n)
    for i in range(2):
        lon_s, lat_s = crs.lambert72_to_wgs84(float(e[i]), float(n[i]))
        assert float(lon_s) == lon_v[i]
        assert float(lat_s) == lat_v[i]


# ---------------------------------------------------------------------------
# dataset-level reprojection
# ---------------------------------------------------------------------------

def test_reproject_geometries_dataset(ray_session):
    import ray.data

    from brdrq_ray.functions.geometry_ops import reproject_geometries
    from brdrq_ray.stages.ingest import parse_geometries

    wkts = [
        "POLYGON ((150000 170000, 150100 170000, 150100 170100, "
        "150000 170100, 150000 170000))",
        "LINESTRING (200000 120000, 200500 120500)",
        "POINT (150000.013 170000)",
        "MULTIPOLYGON (((30000 30000, 30100 30000, 30100 30100, "
        "30000 30000)), ((250000 200000, 250100 200000, 250100 200100, "
        "250000 200000)))",
    ]
    t = pa.table({"theme_id": [f"t{i}" for i in range(len(wkts))],
                  "geometry_wkt": wkts})
    ds = ray.data.from_arrow(t).map_batches(parse_geometries,
                                            batch_format="pyarrow")
    out = reproject_geometries(ds, "EPSG:31370", "EPSG:4326")
    rows = {r["theme_id"]: r for r in out.take_all()}
    src = {r["theme_id"]: r for r in ds.take_all()}
    assert set(rows) == set(src)
    for tid, row in rows.items():
        kind_s, parts_s = g.unpack_geom(src[tid]["geom"])
        kind_o, parts_o = g.unpack_geom(row["geom"])
        assert kind_o == kind_s
        assert [len(r) for p in parts_o for r in p] == \
            [len(r) for p in parts_s for r in p]
        for ps, po in zip(parts_s, parts_o):
            for rs, ro in zip(ps, po):
                lon, lat = crs.lambert72_to_wgs84(rs[:, 0], rs[:, 1])
                np.testing.assert_array_equal(ro[:, 0], lon)
                np.testing.assert_array_equal(ro[:, 1], lat)
        # bbox columns recomputed from transformed rings
        all_pts = np.concatenate(
            [r for p in parts_o for r in p], axis=0)
        assert row["xmin"] == all_pts[:, 0].min()
        assert row["ymax"] == all_pts[:, 1].max()
    # roundtrip through the inverse dataset op lands back on the grid
    back = reproject_geometries(out, "EPSG:4326", "EPSG:31370")
    for row in back.take_all():
        _, parts_b = g.unpack_geom(row["geom"])
        _, parts_s = g.unpack_geom(src[row["theme_id"]]["geom"])
        for pb, ps in zip(parts_b, parts_s):
            for rb, rs in zip(pb, ps):
                assert np.hypot(*(rb - rs).T).max() < 1e-3

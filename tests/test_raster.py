import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray import tiles
from brdrq_ray.geom import core as g
from brdrq_ray.sources import fixtures as fx


def test_rasterize_square(ray_session):
    import ray.data
    from brdrq_ray.functions.raster import rasterize, vectorize

    level = 16  # 64 m cells
    cs = tiles.cell_size(level)
    # an axis-aligned square covering exactly 4x4 cells, grid-aligned
    x0 = cs * 100
    wkt = f"POLYGON (({x0} {x0}, {x0+4*cs} {x0}, {x0+4*cs} {x0+4*cs}, {x0} {x0+4*cs}, {x0} {x0}))"
    t = pa.table({"theme_id": ["sq"], "geometry_wkt": [wkt]})
    occ = rasterize(ray.data.from_arrow(t), level).to_pandas()
    assert len(occ) == 16
    vec = vectorize(ray.data.from_arrow(pa.Table.from_pandas(occ))).to_pandas()
    assert vec.iloc[0]["raster_area"] == pytest.approx((4 * cs) ** 2)
    kind, parts = g.parse_wkt(vec.iloc[0]["geometry_wkt"])
    assert g.geom_area(kind, parts) == pytest.approx((4 * cs) ** 2)


def test_raster_roundtrip_error_bound(ray_session):
    import ray.data
    from brdrq_ray.functions.raster import rasterize, vectorize

    theme = fx.make_thematic_table(nx=8, ny=8, seed=42, n_features=6)
    level = 19  # 8 m cells
    cs = tiles.cell_size(level)
    occ = rasterize(ray.data.from_arrow(theme), level)
    vec = vectorize(occ).to_pandas().set_index("theme_id")
    for i in range(theme.num_rows):
        tid = theme.column("theme_id")[i].as_py()
        kind, parts = g.parse_wkt(theme.column("geometry_wkt")[i].as_py())
        a = g.geom_area(kind, parts)
        perim = g.geom_perimeter(kind, parts)
        got = vec.loc[tid, "raster_area"]
        assert abs(got - a) <= perim * cs  # center-sampling error bound


def _zonal_brute_force(raster_cells, raster_vals, zone_wkts, level):
    """Independent oracle: PIP of every raster cell CENTER against every
    zone polygon, aggregated with plain Python."""
    cs = tiles.cell_size(level)
    _, cx, cy = tiles.cell_xy(np.asarray(raster_cells, dtype=np.int64))
    centers = np.column_stack([
        tiles.WORLD_ORIGIN[0] + (cx + 0.5) * cs,
        tiles.WORLD_ORIGIN[1] + (cy + 0.5) * cs,
    ])
    out = {}
    for zone, wkt in zone_wkts.items():
        kind, parts = g.parse_wkt(wkt)
        inside = g.points_in_polygon(centers, parts)
        vals = np.asarray(raster_vals, dtype=np.float64)[inside]
        if len(vals):
            out[zone] = (len(vals), vals.sum(), vals.mean(),
                         vals.min(), vals.max())
    return out


def _zonal_fixture(level):
    cs = tiles.cell_size(level)
    ox, oy = tiles.WORLD_ORIGIN
    # raster: a 12x12 cell block with a deterministic value per cell
    gx, gy = np.meshgrid(np.arange(100, 112), np.arange(200, 212))
    gx, gy = gx.ravel(), gy.ravel()
    cells = tiles.encode_cells(ox + (gx + 0.5) * cs, oy + (gy + 0.5) * cs, level)
    vals = (gx * 31 + gy * 7).astype(np.float64)
    def rect(i0, j0, ni, nj):
        x0, y0 = ox + i0 * cs, oy + j0 * cs
        x1, y1 = x0 + ni * cs, y0 + nj * cs
        return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                f"{x0} {y1}, {x0} {y0}))")
    zones = {
        "za": rect(100, 200, 4, 4),           # 16 cells
        "zb": rect(102, 202, 6, 3),           # overlaps za
        "zc": rect(108, 208, 4, 4),           # disjoint corner
        "zd": rect(150, 250, 3, 3),           # outside the raster entirely
    }
    return cells, vals, zones


def test_zonal_stats_vs_brute_force(ray_session):
    import ray.data
    from brdrq_ray.functions.raster import zonal_stats

    level = 16
    cells, vals, zones = _zonal_fixture(level)
    want = _zonal_brute_force(cells, vals, zones, level)
    assert set(want) == {"za", "zb", "zc"}  # zd covers no raster cells

    raster = ray.data.from_arrow(pa.table({
        "cell": pa.array(cells, pa.int64()),
        "value": pa.array(vals, pa.float64()),
    }))
    zt = ray.data.from_arrow(pa.table({
        "theme_id": list(zones), "geometry_wkt": list(zones.values()),
    }))
    got = (zonal_stats(raster, zt, level)
           .to_pandas().set_index("zone").sort_index())
    assert list(got.index) == sorted(want)
    for zone, (n, s, mean, mn, mx) in want.items():
        row = got.loc[zone]
        assert row["cell_count"] == n
        assert row["value_sum"] == pytest.approx(s, abs=0)
        assert row["value_mean"] == pytest.approx(mean)
        assert row["value_min"] == mn and row["value_max"] == mx


def test_zonal_stats_partition_invariance(ray_session):
    import ray.data
    from brdrq_ray.functions.raster import zonal_stats

    level = 16
    cells, vals, zones = _zonal_fixture(level)
    rt = pa.table({"cell": pa.array(cells, pa.int64()),
                   "value": pa.array(vals, pa.float64())})
    zt = pa.table({"theme_id": list(zones),
                   "geometry_wkt": list(zones.values())})
    outs = []
    for blocks, nb in ((1, 8), (7, 3), (32, 64)):
        got = zonal_stats(ray.data.from_arrow(rt).repartition(blocks),
                          ray.data.from_arrow(zt), level, n_buckets=nb)
        outs.append(got.to_pandas().sort_values("zone").reset_index(drop=True))
    for other in outs[1:]:
        # bit-identical under any partitioning / bucket count
        assert outs[0].equals(other)


def test_zonal_stats_empty_sides(ray_session):
    import ray.data
    from brdrq_ray.functions.raster import zonal_stats

    level = 16
    cells, vals, zones = _zonal_fixture(level)
    rt = pa.table({"cell": pa.array(cells, pa.int64()),
                   "value": pa.array(vals, pa.float64())})
    zt = pa.table({"theme_id": list(zones),
                   "geometry_wkt": list(zones.values())})
    empty_r = ray.data.from_arrow(rt).filter(lambda r: False)
    assert zonal_stats(empty_r, ray.data.from_arrow(zt), level).count() == 0
    empty_z = ray.data.from_arrow(zt).filter(lambda r: False)
    assert zonal_stats(ray.data.from_arrow(rt), empty_z, level).count() == 0


def _grid_raster(level, i0=100, j0=200, ni=12, nj=12):
    cs = tiles.cell_size(level)
    ox, oy = tiles.WORLD_ORIGIN
    gx, gy = np.meshgrid(np.arange(i0, i0 + ni), np.arange(j0, j0 + nj))
    gx, gy = gx.ravel(), gy.ravel()
    cells = tiles.encode_cells(ox + (gx + 0.5) * cs, oy + (gy + 0.5) * cs, level)
    vals = (gx * 13 + gy * 3).astype(np.float64)
    return gx, gy, cells, vals


def test_parent_cells_roundtrip():
    level = 16
    gx, gy, cells, _ = _grid_raster(level)
    for d in (0, 1, 3):
        parents = tiles.parent_cells(cells, d)
        lv, px, py = tiles.cell_xy(parents)
        assert (lv == level - d).all()
        assert (px == gx >> d).all() and (py == gy >> d).all()
    with pytest.raises(ValueError):
        tiles.parent_cells(cells, level + 1)


def test_downsample_vs_brute_force(ray_session):
    import ray.data
    from brdrq_ray.functions.raster import downsample

    level = 16
    gx, gy, cells, vals = _grid_raster(level)
    ds = ray.data.from_arrow(pa.table({
        "cell": pa.array(cells, pa.int64()),
        "value": pa.array(vals, pa.float64()),
    }))
    for d, agg in ((1, "mean"), (2, "sum"), (1, "min"), (2, "max"),
                   (1, "count")):
        got = (downsample(ds, d, agg).to_pandas()
               .set_index("cell").sort_index())
        # brute force: group child values by (gx>>d, gy>>d)
        want = {}
        for x, y, v in zip(gx >> d, gy >> d, vals):
            want.setdefault((x, y), []).append(v)
        assert len(got) == len(want)
        for (x, y), vs in want.items():
            ox, oy = tiles.WORLD_ORIGIN
            cs = tiles.cell_size(level - d)
            pid = int(tiles.encode_cells(np.array([ox + (x + 0.5) * cs]),
                                         np.array([oy + (y + 0.5) * cs]),
                                         level - d)[0])
            exp = {"mean": np.mean, "sum": np.sum, "min": np.min,
                   "max": np.max, "count": len}[agg](vs)
            assert got.loc[pid, "value"] == pytest.approx(float(exp), rel=1e-12)
    # partition invariance: bit-identical across block layouts
    a = downsample(ds, 1, "mean").to_pandas().sort_values("cell").reset_index(drop=True)
    b = (downsample(ds.repartition(13), 1, "mean").to_pandas()
         .sort_values("cell").reset_index(drop=True))
    assert a.equals(b)


def test_map_algebra_vs_brute_force(ray_session):
    import ray.data
    from brdrq_ray.functions.raster import map_algebra

    level = 16
    gx, gy, cells, vals = _grid_raster(level)
    # raster b covers a shifted window: partial overlap with a
    gx2, gy2, cells2, vals2 = _grid_raster(level, i0=106, j0=206)
    a = ray.data.from_arrow(pa.table({"cell": pa.array(cells, pa.int64()),
                                      "value": pa.array(vals, pa.float64())}))
    b = ray.data.from_arrow(pa.table({"cell": pa.array(cells2, pa.int64()),
                                      "value": pa.array(vals2 * 0.5, pa.float64())}))
    av = dict(zip(cells.tolist(), vals.tolist()))
    bv = dict(zip(cells2.tolist(), (vals2 * 0.5).tolist()))

    # inner: only the 6x6 overlap window
    got = map_algebra(a, b, "add").to_pandas().set_index("cell")["value"]
    inner = set(av) & set(bv)
    assert set(got.index) == inner and len(inner) == 36
    for c in inner:
        assert got[c] == av[c] + bv[c]

    # outer with fill: union of occupied cells
    got = map_algebra(a, b, "mul", fill=1.0).to_pandas().set_index("cell")["value"]
    assert set(got.index) == set(av) | set(bv)
    for c in got.index:
        assert got[c] == av.get(c, 1.0) * bv.get(c, 1.0)

    # each op kernel on the overlap
    for op, fn in (("sub", lambda x, y: x - y), ("div", lambda x, y: x / y),
                   ("min", min), ("max", max)):
        got = map_algebra(a, b, op).to_pandas().set_index("cell")["value"]
        for c in inner:
            assert got[c] == pytest.approx(fn(av[c], bv[c]), rel=1e-12)

    # empty sides
    empty = ray.data.from_arrow(pa.table({"cell": pa.array([], pa.int64()),
                                          "value": pa.array([], pa.float64())}
                                         )).filter(lambda r: False)
    assert map_algebra(a, empty, "add").count() == 0
    assert map_algebra(a, empty, "add", fill=0.0).count() == len(av)


def test_focal_mean_vs_brute_force(ray_session):
    import ray.data
    from brdrq_ray.functions.raster import focal_mean

    level = 16
    gx, gy, cells, vals = _grid_raster(level, ni=8, nj=8)
    # punch a hole so the stencil sees missing neighbors mid-grid
    keep = ~((gx == 103) & (gy == 203))
    gx, gy, cells, vals = gx[keep], gy[keep], cells[keep], vals[keep]
    ds = ray.data.from_arrow(pa.table({
        "cell": pa.array(cells, pa.int64()),
        "value": pa.array(vals, pa.float64()),
    }))
    for radius in (1, 2):
        got = (focal_mean(ds, radius).to_pandas()
               .set_index("cell")["value"])
        # brute force over occupied cells
        occ = {(x, y): v for x, y, v in zip(gx, gy, vals)}
        assert set(got.index) == set(cells.tolist())
        for (x, y), _ in occ.items():
            neigh = [occ[(x + di, y + dj)]
                     for di in range(-radius, radius + 1)
                     for dj in range(-radius, radius + 1)
                     if (x + di, y + dj) in occ]
            ox, oy = tiles.WORLD_ORIGIN
            cs = tiles.cell_size(level)
            cid = int(tiles.encode_cells(np.array([ox + (x + 0.5) * cs]),
                                         np.array([oy + (y + 0.5) * cs]),
                                         level)[0])
            assert got[cid] == pytest.approx(np.mean(neigh), rel=1e-12)
    # partition invariance
    a = focal_mean(ds, 1).to_pandas().sort_values("cell").reset_index(drop=True)
    b = (focal_mean(ds.repartition(11), 1).to_pandas()
         .sort_values("cell").reset_index(drop=True))
    assert a.equals(b)


def test_child_cells_roundtrip():
    level = 14
    gx, gy, cells, _ = _grid_raster(level, ni=5, nj=5)
    for d in (1, 2):
        kids = tiles.child_cells(cells, d)
        assert kids.shape == (len(cells), 4 ** d)
        # every child's parent is its source cell
        back = tiles.parent_cells(kids.ravel(), d).reshape(kids.shape)
        assert (back == cells[:, None]).all()
        # children tile the parent exactly: distinct, and their (x, y)
        # ranges cover [gx<<d, (gx+1)<<d)
        lv, kx, ky = tiles.cell_xy(kids.ravel())
        assert (lv == level + d).all()
        assert len(np.unique(kids.ravel())) == kids.size
        assert (kx.reshape(kids.shape) >> d == gx[:, None]).all()
        assert (ky.reshape(kids.shape) >> d == gy[:, None]).all()
    with pytest.raises(ValueError):
        tiles.child_cells(cells, tiles.MAX_LEVEL - level + 1)


def test_upsample_inverse_of_downsample(ray_session):
    import ray.data
    from brdrq_ray.functions.raster import downsample, upsample

    level = 14
    gx, gy, cells, vals = _grid_raster(level, ni=6, nj=6)
    ds = ray.data.from_arrow(pa.table({
        "cell": pa.array(cells, pa.int64()),
        "value": pa.array(vals, pa.float64()),
    }))
    for d in (1, 2):
        up = upsample(ds, d)
        assert up.count() == len(cells) * 4 ** d
        for agg in ("mean", "min", "max"):
            back = (downsample(up, d, agg).to_pandas()
                    .sort_values("cell").reset_index(drop=True))
            orig = (ds.to_pandas().sort_values("cell")
                    .reset_index(drop=True))
            assert back.equals(orig)
        # sum/count scale by the fan-out
        s = (downsample(up, d, "sum").to_pandas().set_index("cell")["value"]
             .sort_index())
        o = ds.to_pandas().set_index("cell")["value"].sort_index()
        assert np.allclose(s.to_numpy(), o.to_numpy() * 4 ** d)


def test_upsample_cross_level_algebra(ray_session):
    """The composition upsample enables: combine a fine raster with a
    coarse one via map_algebra after aligning levels."""
    import ray.data
    from brdrq_ray.functions.raster import map_algebra, upsample

    level = 14
    gx, gy, cells, vals = _grid_raster(level, ni=4, nj=4)
    fine = ray.data.from_arrow(pa.table({
        "cell": pa.array(cells, pa.int64()),
        "value": pa.array(vals, pa.float64())}))
    coarse_cells = np.unique(tiles.parent_cells(cells, 1))
    coarse = ray.data.from_arrow(pa.table({
        "cell": pa.array(coarse_cells, pa.int64()),
        "value": pa.array(np.full(len(coarse_cells), 100.0), pa.float64())}))
    got = (map_algebra(fine, upsample(coarse, 1), "add").to_pandas()
           .set_index("cell")["value"])
    assert set(got.index) == set(cells.tolist())
    want = dict(zip(cells.tolist(), (vals + 100.0).tolist()))
    for c, v in want.items():
        assert got[c] == v


def test_map_algebra_nan_propagates_with_fill(ray_session):
    """A present-but-NaN raster value must propagate as NaN under fill
    semantics; fill applies only to genuinely absent cells (merge
    indicator, not isnan)."""
    import ray.data
    from brdrq_ray.functions.raster import map_algebra

    level = 16
    _, _, cells, _ = _grid_raster(level, ni=3, nj=1)
    a = ray.data.from_arrow(pa.table({
        "cell": pa.array(cells, pa.int64()),
        "value": pa.array([1.0, np.nan, 3.0], pa.float64())}))
    b = ray.data.from_arrow(pa.table({
        "cell": pa.array(cells[:2], pa.int64()),
        "value": pa.array([10.0, 20.0], pa.float64())}))
    got = (map_algebra(a, b, "add", fill=0.0).to_pandas()
           .set_index("cell")["value"])
    assert got[cells[0]] == 11.0
    assert np.isnan(got[cells[1]])          # NaN + 20 stays NaN
    assert got[cells[2]] == 3.0             # absent in b -> fill 0.0


def test_focal_mean_rejects_mixed_levels(ray_session):
    import ray.data
    from brdrq_ray.functions.raster import focal_mean, upsample

    _, _, cells, vals = _grid_raster(14, ni=3, nj=3)
    ds = ray.data.from_arrow(pa.table({
        "cell": pa.array(cells, pa.int64()),
        "value": pa.array(vals, pa.float64())}))
    mixed = ds.union(upsample(ds, 1))
    with pytest.raises(Exception, match="single-level"):
        focal_mean(mixed.repartition(1), radius=1).count()

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

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.sources import fixtures as fx


def test_get_string_type():
    from brdrq_ray.functions.geometry_ops import get_string_type

    assert get_string_type("42") == "int"
    assert get_string_type("4.5") == "float"
    assert get_string_type("4e3") == "float"
    assert get_string_type("abc") == "string"
    assert get_string_type(None) == "string"


def test_sniff_column_types(ray_session):
    import ray.data
    from brdrq_ray.functions.geometry_ops import sniff_column_types

    t = pa.table({"a": ["1", "2", "3"], "b": ["1", "2.5", "3"], "c": ["1", "x", "3"]})
    ds = ray.data.from_arrow(t)
    assert sniff_column_types(ds, "a") == "int"
    assert sniff_column_types(ds, "b") == "float"
    assert sniff_column_types(ds, "c") == "string"


def test_split_by_geometry_type(ray_session):
    import ray.data
    from brdrq_ray.functions.geometry_ops import split_by_geometry_type
    from brdrq_ray.stages.ingest import parse_geometries

    t = pa.table({"theme_id": ["a", "b", "c"],
                  "geometry_wkt": ["POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
                                   "LINESTRING (0 0, 5 5)",
                                   "POINT (2 3)"]})
    ds = ray.data.from_arrow(t).map_batches(parse_geometries, batch_format="pyarrow")
    split = split_by_geometry_type(ds)
    assert split["polygon"].count() == 1
    assert split["line"].count() == 1
    assert split["point"].count() == 1


def test_clip_to_polygon(ray_session):
    import ray.data
    from brdrq_ray.functions.geometry_ops import clip_to_polygon
    from brdrq_ray.stages.ingest import parse_geometries

    t = pa.table({"theme_id": ["in", "half", "out"],
                  "geometry_wkt": ["POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",
                                   "POLYGON ((8 8, 12 8, 12 12, 8 12, 8 8))",
                                   "POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))"]})
    ds = ray.data.from_arrow(t).map_batches(parse_geometries, batch_format="pyarrow")
    out = clip_to_polygon(ds, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))").to_pandas()
    assert sorted(out["theme_id"]) == ["half", "in"]
    by_id = dict(zip(out["theme_id"], out["clipped_area"]))
    assert by_id["in"] == pytest.approx(4.0)
    assert by_id["half"] == pytest.approx(4.0)  # 2x2 corner overlap


def test_difference_metrics(ray_session):
    import ray.data
    from brdrq_ray.alignment import AlignConfig, OD_EXCLUDE
    from brdrq_ray.functions.geometry_ops import difference_metrics
    from brdrq_ray.pipelines.autocorrect import run_alignment

    theme = fx.make_thematic_table(nx=8, ny=8, seed=42, n_features=6)
    ref = fx.make_reference_table(nx=8, ny=8, seed=42)
    res = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                        AlignConfig(od_strategy=OD_EXCLUDE, max_predictions=-1),
                        mode="evaluate", max_rd=2.0)
    series = difference_metrics(res).to_pandas()
    assert len(series) == 6
    row = series.iloc[0]
    assert list(row["distances"]) == sorted(row["distances"])
    assert len(row["distances"]) == len(row["sym_diff_areas"])


def test_listing(ray_session):
    import ray.data
    from brdrq_ray.functions.geometry_ops import listing

    ds = ray.data.range(5000).map_batches(
        lambda b: pa.table({"v": pa.array(b["id"])}), batch_format="numpy")
    out = listing(ds, "v", descending=True, limit=1000).to_pandas()
    assert len(out) == 1000
    assert out["v"].iloc[0] == 4999
    assert (out["v"].diff().dropna() <= 0).all()


def test_union_area_exact_on_overlaps(ray_session):
    """M15 exact admission guard: overlapping features are counted ONCE
    (the r2 sum-of-areas guard double-counted them), and features spanning
    several Morton cells are not double-counted either (clip-to-cell is a
    partition of the plane)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.geometry_ops import union_area
    from brdrq_ray.geom import core as g

    def sq(x0, y0, w, h):
        return np.array([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                         (x0, y0 + h)], float)

    # two 10x10 squares overlapping by a 5x10 strip: union area 150, sum 200
    geoms, boxes = [], []
    for ring in (sq(0, 0, 10, 10), sq(5, 0, 10, 10)):
        geoms.append(g.pack_geom(g.GEOM_POLYGON, [[ring]]))
        boxes.append((ring[:, 0].min(), ring[:, 1].min(),
                      ring[:, 0].max(), ring[:, 1].max()))
    t = pa.table({
        "geom": pa.array(geoms, pa.binary()),
        "xmin": pa.array([b[0] for b in boxes]),
        "ymin": pa.array([b[1] for b in boxes]),
        "xmax": pa.array([b[2] for b in boxes]),
        "ymax": pa.array([b[3] for b in boxes]),
    })
    got = union_area(ray.data.from_arrow(t))
    assert got == pytest.approx(150.0, abs=1e-6)

    # a single LARGE square spanning many cells at a fine level: still exact
    big = sq(0, 0, 500, 500)
    t2 = pa.table({
        "geom": pa.array([g.pack_geom(g.GEOM_POLYGON, [[big]])], pa.binary()),
        "xmin": pa.array([0.0]), "ymin": pa.array([0.0]),
        "xmax": pa.array([500.0]), "ymax": pa.array([500.0]),
    })
    assert union_area(ray.data.from_arrow(t2), level=15) == pytest.approx(
        250000.0, rel=1e-9)

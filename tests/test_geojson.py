import json

import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.sources import fixtures as fx
from brdrq_ray.sources.geojson import read_geojson, write_geojson


def test_geojson_roundtrip(tmp_path):
    theme = fx.make_thematic_table(nx=8, ny=8, seed=42, n_features=8)
    path = str(tmp_path / "theme.geojson")
    write_geojson(theme, path)
    doc = json.load(open(path))
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == 8
    assert doc["features"][0]["geometry"]["type"] == "MultiPolygon"

    back = read_geojson(path, id_field="nope")  # falls back to feature id
    assert back.num_rows == 8
    assert sorted(back.column("theme_id").to_pylist()) == \
           sorted(theme.column("theme_id").to_pylist())
    # area preserved through the roundtrip
    for i in range(8):
        orig_wkt = theme.column("geometry_wkt")[i].as_py()
        tid = theme.column("theme_id")[i].as_py()
        j = back.column("theme_id").to_pylist().index(tid)
        a1 = g.geom_area(*g.parse_wkt(orig_wkt))
        a2 = g.geom_area(*g.parse_wkt(back.column("geometry_wkt")[j].as_py()))
        assert a2 == pytest.approx(a1, rel=1e-9)


def test_geojson_id_field_and_props(tmp_path):
    fc = {"type": "FeatureCollection", "features": [{
        "type": "Feature",
        "properties": {"CAPAKEY": "24126B0009/00Y010", "OPPERVL": 123.4},
        "geometry": {"type": "Polygon",
                     "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]},
    }]}
    path = str(tmp_path / "ref.geojson")
    json.dump(fc, open(path, "w"))
    t = read_geojson(path, id_field="CAPAKEY")
    assert t.column("theme_id")[0].as_py() == "24126B0009/00Y010"
    props = json.loads(t.column("props")[0].as_py())
    assert props["OPPERVL"] == 123.4
    kind, parts = g.parse_wkt(t.column("geometry_wkt")[0].as_py())
    assert g.geom_area(kind, parts) == pytest.approx(100.0)


def test_geojson_line_point(tmp_path):
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"id": "l1"},
         "geometry": {"type": "LineString", "coordinates": [[0, 0], [3, 4]]}},
        {"type": "Feature", "properties": {"id": "p1"},
         "geometry": {"type": "MultiPoint", "coordinates": [[1, 2], [3, 4]]}},
    ]}
    path = str(tmp_path / "mixed.geojson")
    json.dump(fc, open(path, "w"))
    t = read_geojson(path)
    wkts = dict(zip(t.column("theme_id").to_pylist(),
                    t.column("geometry_wkt").to_pylist()))
    assert wkts["l1"].startswith("MULTILINESTRING")
    assert wkts["p1"].startswith("MULTIPOINT")


def test_dataset_to_geojson_streams_blocks(ray_session, tmp_path):
    """The Dataset sink streams iter_batches into ONE FeatureCollection with
    bounded driver memory — byte-identical to the single-table writer even
    when the dataset spans multiple blocks."""
    import ray.data

    from brdrq_ray.sources.geojson import dataset_to_geojson

    theme = fx.make_thematic_table(nx=8, ny=8, seed=42, n_features=12)
    ds = ray.data.from_arrow(theme).repartition(4).materialize()
    assert ds.num_blocks() > 1  # the streaming path actually sees >1 block

    p_stream = str(tmp_path / "stream.geojson")
    dataset_to_geojson(ds, p_stream)
    p_single = str(tmp_path / "single.geojson")
    write_geojson(theme, p_single)

    doc = json.load(open(p_stream))
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == 12
    # same features regardless of block layout (row order may differ after
    # repartition -> compare as id-keyed sets); single-table path stays
    # byte-parseable and identical in content
    by_id = lambda d: {f["id"]: f for f in d["features"]}
    assert by_id(doc) == by_id(json.load(open(p_single)))

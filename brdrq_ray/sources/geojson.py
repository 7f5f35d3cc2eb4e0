"""GeoJSON FeatureCollection interchange.

The reference's fixtures and its brdr<->QGIS interchange are GeoJSON
FeatureCollections (SURVEY.md section 1.1: one FC per result type,
get_results_as_geojson; fixture corpus plugin/brdrq/test/*.geojson). The
engine's storage layer is parquet, but users of the reference arrive with
GeoJSON — this module converts both ways:

* ``read_geojson(path, id_field)`` -> pyarrow table (id, geometry_wkt, props)
* ``write_geojson(table, path)`` <- rows with a geometry_wkt column
* Dataset-level: ``geojson_to_dataset`` / ``dataset_to_geojson`` (the writer
  streams per-block newline-delimited features then assembles one FC).

Geometry conversion goes through the engine's own WKT codec (no external
geo libs)."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..geom import core as g


def _coords_to_parts(kind: str, coords):
    if kind in ("Polygon", "MultiPolygon"):
        polys = [coords] if kind == "Polygon" else coords
        parts = []
        for rings in polys:
            rr = [g._dedupe_ring(g.snap(np.asarray(r, dtype=np.float64)[:, :2]))
                  for r in rings]
            rr = [r for r in rr if len(r) >= 3]
            if rr:
                parts.append(rr)
        return g.GEOM_POLYGON, parts
    if kind in ("LineString", "MultiLineString"):
        lines = [coords] if kind == "LineString" else coords
        return g.GEOM_LINESTRING, [[g.snap(np.asarray(l, dtype=np.float64)[:, :2])]
                                   for l in lines if len(l) >= 2]
    if kind in ("Point", "MultiPoint"):
        pts = [coords] if kind == "Point" else coords
        return g.GEOM_POINT, [[g.snap(np.asarray([p], dtype=np.float64)[:, :2])]
                              for p in pts]
    raise ValueError(f"unsupported GeoJSON geometry type {kind!r}")


def _parts_to_geojson(kind: int, parts):
    def ring_closed(r):
        return np.vstack([r, r[:1]]).tolist()

    if not parts:
        return {"type": "MultiPolygon", "coordinates": []}
    if kind == g.GEOM_POLYGON:
        return {"type": "MultiPolygon",
                "coordinates": [[ring_closed(r) for r in rings] for rings in parts]}
    if kind == g.GEOM_LINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [p[0].tolist() for p in parts]}
    return {"type": "MultiPoint",
            "coordinates": [p[0][0].tolist() for p in parts]}


def read_geojson(path: str, id_field: str = "id") -> pa.Table:
    """FeatureCollection file -> (theme_id, geometry_wkt, props) table. The
    id comes from ``id_field`` in properties (falling back to the feature
    'id' member, then the positional index) — mirroring the reference's
    user-chosen unique id (COMBOBOX_ID_THEME)."""
    with open(path) as f:
        fc = json.load(f)
    ids, wkts, props = [], [], []
    for i, feat in enumerate(fc.get("features", [])):
        p = feat.get("properties") or {}
        fid = p.get(id_field, feat.get("id", i))
        geom = feat.get("geometry")
        if not geom:
            continue
        kind, parts = _coords_to_parts(geom["type"], geom["coordinates"])
        kind, parts = g.make_valid(kind, parts)
        ids.append(str(fid))
        wkts.append(g.to_wkt(kind, parts))
        props.append(json.dumps({k: v for k, v in p.items() if k != id_field},
                                sort_keys=True, default=str))
    return pa.table({"theme_id": pa.array(ids, pa.string()),
                     "geometry_wkt": pa.array(wkts, pa.string()),
                     "props": pa.array(props, pa.string())})


def _features_of(table: pa.Table, id_col: str, wkt_col: str, start: int = 0):
    """Yield GeoJSON feature dicts for one table (one block's worth)."""
    scalar_cols = [c for c in table.column_names
                   if c not in (wkt_col, "props") and
                   not pa.types.is_binary(table.schema.field(c).type)]
    for i in range(table.num_rows):
        kind, parts = g.parse_wkt(table.column(wkt_col)[i].as_py())
        properties = {c: table.column(c)[i].as_py() for c in scalar_cols}
        if "props" in table.column_names:
            raw = table.column("props")[i].as_py()
            if raw:
                try:
                    properties.update(json.loads(raw))
                except ValueError:
                    properties["props"] = raw
        yield {
            "type": "Feature",
            "id": (table.column(id_col)[i].as_py()
                   if id_col in table.column_names else start + i),
            "properties": properties,
            "geometry": _parts_to_geojson(kind, parts),
        }


def write_geojson_stream(tables, path: str, id_col: str = "theme_id",
                         wkt_col: str = "geometry_wkt"):
    """Stream an iterable of tables/blocks into ONE FeatureCollection file —
    bounded driver memory (one block resident at a time), byte-identical to
    json.dump of the assembled collection (same key order and separators)."""
    row_base = 0
    with open(path, "w") as f:
        f.write('{"features": [')
        first = True
        for table in tables:
            if not isinstance(table, pa.Table):
                table = pa.Table.from_pandas(table)
            for feat in _features_of(table, id_col, wkt_col, start=row_base):
                if not first:
                    f.write(", ")
                f.write(json.dumps(feat, sort_keys=True, default=str))
                first = False
            row_base += table.num_rows
        f.write('], "type": "FeatureCollection"}')


def write_geojson(table: pa.Table, path: str, id_col: str = "theme_id",
                  wkt_col: str = "geometry_wkt"):
    """Rows with a WKT column -> one FeatureCollection file. Scalar columns
    (plus a JSON 'props' column, flattened) become feature properties."""
    write_geojson_stream([table], path, id_col=id_col, wkt_col=wkt_col)


def geojson_to_dataset(path: str, id_field: str = "id"):
    import ray.data
    return ray.data.from_arrow(read_geojson(path, id_field))


def dataset_to_geojson(ds, path: str, **kwargs):
    """Presentation sink: STREAMS blocks into the file via iter_batches —
    the driver holds one block at a time, never the whole dataset (parquet
    remains the scale sink; a 100 TB result is not one FeatureCollection,
    but the writer must not be the thing that materializes it)."""
    write_geojson_stream(ds.iter_batches(batch_format="pyarrow"),
                         path, **kwargs)

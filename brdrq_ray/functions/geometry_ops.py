"""Small geometry-adjacent operators rounding out SURVEY.md section 2:
M6 geometry-type splitter, M10 type sniffer, M16 partial-selection clip,
A7 difference-metrics series, O2/O3 listing limit + sort."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..geom import core as g
from ..geom.boolean import overlay


# --- M6: geometry-type splitter ---------------------------------------------

def split_by_geometry_type(ds: ray.data.Dataset) -> dict[str, ray.data.Dataset]:
    """Split a parsed dataset (geom_kind column) into one dataset per
    geometry type — the reference splits mixed FeatureCollections the same
    way (filter_geojson_by_geometry_type, plugin/brdrq/brdrq_utils.py:
    841-859, dispatched per output type)."""
    import pyarrow.compute as pc
    out = {}
    for kind, name in ((g.GEOM_POLYGON, "polygon"), (g.GEOM_LINESTRING, "line"),
                       (g.GEOM_POINT, "point")):
        out[name] = ds.map_batches(
            lambda t, k=kind: t.filter(pc.equal(t.column("geom_kind"), k)),
            batch_format="pyarrow")
    return out


# --- M10: type sniffer ------------------------------------------------------

def get_string_type(value: str) -> str:
    """Classify a string as int/float/string (reference: get_string_type,
    plugin/brdrq/brdrq_utils.py:435-444)."""
    if value is None:
        return "string"
    s = str(value).strip()
    try:
        int(s)
        return "int"
    except ValueError:
        pass
    try:
        float(s)
        return "float"
    except ValueError:
        return "string"


def sniff_column_types(ds: ray.data.Dataset, col: str) -> str:
    """Column-level inference: the narrowest type every non-null value fits
    (cast-with-fallback during schema inference)."""
    order = {"int": 0, "float": 1, "string": 2}

    def partial(batch: pa.Table) -> pa.Table:
        kinds = {get_string_type(v) for v in batch.column(col).to_pylist()
                 if v is not None}
        worst = max(kinds, key=lambda k: order[k]) if kinds else "int"
        return pa.table({"kind": pa.array([worst], pa.string())})

    kinds = set(ds.map_batches(partial, batch_format="pyarrow")
                .to_pandas()["kind"])
    return max(kinds, key=lambda k: order[k]) if kinds else "string"


# --- M16: partial-selection clip --------------------------------------------

def clip_to_polygon(ds: ray.data.Dataset, clip_wkt: str,
                    geom_col: str = "geom") -> ray.data.Dataset:
    """Clip parsed features to a selection polygon, keep non-empty
    intersections (reference: handlePartialSelection,
    plugin/brdrq/brdrq_dockwidget_featurealigner.py:932-958). The clip
    polygon is broadcast once (ray.put), never re-shipped per batch."""
    kind, clip_parts = g.parse_wkt(clip_wkt)
    _, clip_parts = g.make_valid(g.GEOM_POLYGON, clip_parts)
    clip_ref = ray.put(clip_parts)
    cbox = g.geom_bbox(clip_parts)

    class Clip:
        def __init__(self):
            self.clip = ray.get(clip_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep, new_geoms, areas = [], [], []
            xmin = batch.column("xmin").to_numpy(zero_copy_only=False)
            xmax = batch.column("xmax").to_numpy(zero_copy_only=False)
            ymin = batch.column("ymin").to_numpy(zero_copy_only=False)
            ymax = batch.column("ymax").to_numpy(zero_copy_only=False)
            bbox_hit = ((xmin <= cbox[2]) & (xmax >= cbox[0])
                        & (ymin <= cbox[3]) & (ymax >= cbox[1]))
            for i, buf in enumerate(batch.column(geom_col).to_pylist()):
                if not bbox_hit[i]:
                    keep.append(False)
                    new_geoms.append(None)
                    areas.append(0.0)
                    continue
                kind_i, parts = g.unpack_geom(buf)
                inter = overlay(parts, self.clip, "intersection") \
                    if kind_i == g.GEOM_POLYGON else []
                a = g.geom_area(g.GEOM_POLYGON, inter)
                keep.append(a > 0)
                new_geoms.append(g.pack_geom(g.GEOM_POLYGON, inter))
                areas.append(a)
            out = batch.filter(pa.array(keep))
            kept_geoms = [ge for ge, k in zip(new_geoms, keep) if k]
            kept_areas = [a for a, k in zip(areas, keep) if k]
            idx = out.column_names.index(geom_col)
            out = out.set_column(idx, geom_col, pa.array(kept_geoms, pa.binary()))
            return out.append_column("clipped_area", pa.array(kept_areas, pa.float64()))

    return ds.map_batches(Clip, batch_format="pyarrow", concurrency=(1, 4))


# --- A7: difference-metrics series ------------------------------------------

def difference_metrics(results: ray.data.Dataset) -> ray.data.Dataset:
    """Per feature: the ordered (rd -> symmetric-area-change) series feeding
    the reference's distance-vs-change plot (get_difference_metrics_...,
    call site plugin/brdrq/brdrq_dockwidget_featurealigner.py:1690-1692;
    plotted by plot_series, brdrq_utils.py:1084-1102)."""

    import pyarrow as pa

    from .vhash import bucket_i32

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "b", bucket_i32(batch.column("theme_id").cast(pa.string()), 64))

    def per_bucket(gdf: pd.DataFrame) -> pd.DataFrame:
        gdf = gdf.sort_values(["theme_id", "brdr_relevant_distance"])
        agg = (gdf.assign(
                   d=gdf["brdr_relevant_distance"].round(1),
                   s=gdf["brdr_sym_diff_area_index"].round(6))
               .groupby("theme_id", as_index=False)
               .agg(distances=("d", list), sym_diff_areas=("s", list)))
        return agg

    cols = results.select_columns(["theme_id", "brdr_relevant_distance",
                                   "brdr_sym_diff_area_index"])
    return (cols.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("b").map_groups(
                lambda g: per_bucket(g.drop(columns=["b"])),
                batch_format="pandas"))


# --- O2/O3: listing cap + presentation sort ---------------------------------

def listing(ds: ray.data.Dataset, sort_col: str, descending: bool = True,
            limit: int = 1000) -> ray.data.Dataset:
    """Presentation sort + cap (the reference lists at most 1000 of 5000
    features, plugin/brdrq/brdrq_dockwidget_featurealigner.py:144)."""
    return ds.sort(sort_col, descending=descending).limit(limit)

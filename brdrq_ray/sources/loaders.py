"""Reference-data loaders — the engine's analog of brdr's loader plugin API.

The reference feeds its Aligner through loader objects (SURVEY.md S1-S6):
DictLoader (in-memory dicts), GRBActualLoader / GRBFiscalParcelLoader
(download GRB parcels, chunked per 1000, the fiscal one time-versioned),
OSMLoader (Overpass nodes+ways assembled into polygons),
BeCadastralParcelLoader/BRKLoader. There is no network here, so every remote
loader becomes "read a pre-materialized parquet table" — which is also the
right 100 TB design: reference acquisition is an ingest job, not an inline
HTTP call (reference call sites:
plugin/brdrq/brdrq_algorithm_autocorrectborders.py:578-604).

Registry contract: ``make_reference_dataset(spec) -> ray.data.Dataset`` with
columns (ref_id, geometry_wkt, version_date?). New loaders = one register()
call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_LOADERS: dict[str, object] = {}


def register_loader(kind: str, fn):
    _LOADERS[kind] = fn


def make_reference_dataset(spec: dict) -> ray.data.Dataset:
    """spec: {'loader': <kind>, ...loader args}. The single entry point the
    pipelines use (mirrors load_reference_data dispatch)."""
    kind = spec.get("loader", "parquet")
    if kind not in _LOADERS:
        raise KeyError(f"unknown loader {kind!r}; registered: {sorted(_LOADERS)}")
    return _LOADERS[kind](spec)


# --- S1: dict / in-memory --------------------------------------------------

def _dict_loader(spec):
    """DictLoader analog: {'geoms': {ref_id: wkt}, 'props': {...}} in
    memory -> Dataset (reference: DictLoader at
    brdrq_algorithm_autocorrectborders.py:567-572)."""
    geoms = spec["geoms"]
    ids = sorted(geoms)
    tbl = pa.table({"ref_id": pa.array([str(i) for i in ids], pa.string()),
                    "geometry_wkt": pa.array([geoms[i] for i in ids], pa.string())})
    return ray.data.from_arrow(tbl)


# --- S2/S5/S6: parquet snapshot (GRB actual / BE / BRK / local layer) -------

def _parquet_loader(spec):
    """Actual-snapshot loader: read + optional bbox predicate pushdown
    (replaces the remote bbox-chunked download; partitioning = Ray blocks)."""
    import pyarrow.compute as pc
    ds = ray.data.read_parquet(spec["path"], columns=spec.get("columns"))
    bbox = spec.get("bbox")
    if bbox:
        xmin, ymin, xmax, ymax = bbox

        def in_bbox(batch: pa.Table) -> pa.Table:
            from ..stages.ingest import parse_geometries
            t = parse_geometries(batch, drop_wkt=False)
            keep = ((t.column("xmin").to_numpy(zero_copy_only=False) <= xmax)
                    & (t.column("xmax").to_numpy(zero_copy_only=False) >= xmin)
                    & (t.column("ymin").to_numpy(zero_copy_only=False) <= ymax)
                    & (t.column("ymax").to_numpy(zero_copy_only=False) >= ymin))
            return batch.filter(pa.array(keep))

        ds = ds.map_batches(in_bbox, batch_format="pyarrow")
    return ds


# --- S3: time-versioned fiscal snapshot -------------------------------------

def _fiscal_loader(spec):
    """GRBFiscalParcelLoader analog: as-of selection on a version-partitioned
    table — filter(version_year == y) instead of a year-specific download
    (reference: brdrq_algorithm_autocorrectborders.py:578-582)."""
    import pyarrow.compute as pc
    year = int(spec["year"])
    ds = ray.data.read_parquet(spec["path"])

    def for_year(batch: pa.Table) -> pa.Table:
        vd = batch.column("version_date")
        years = pc.year(vd)
        return batch.filter(pc.less_equal(years, year))

    # latest version per ref_id with version_year <= y (as-of semantics)
    import pandas as pd

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("version_date").tail(1)

    return (ds.map_batches(for_year, batch_format="pyarrow")
            .groupby("ref_id").map_groups(latest, batch_format="pandas"))


# --- S4: OSM-style nodes + ways assembly ------------------------------------

def assemble_ways(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                  closed_only: bool = True) -> ray.data.Dataset:
    """Overpass-style assembly: nodes (node_id, x, y) + ways (way_id,
    node_refs list<int64>) -> (ref_id, geometry_wkt). The reference gets this
    from brdr's OSMLoader over the Overpass JSON (cached fixture
    cache/ccb528....json); the engine expresses it as a broadcast node lookup
    + per-way coordinate gather (node table is the small side)."""
    import ray as _ray
    from ..geom import core as g

    node_tbl = nodes.to_pandas()
    lookup_ref = _ray.put(dict(zip(node_tbl["node_id"].astype(np.int64),
                                   zip(node_tbl["x"], node_tbl["y"]))))

    class Assemble:
        def __init__(self):
            self.nodes = _ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, wkts = [], []
            for wid, refs in zip(batch.column("way_id").to_pylist(),
                                 batch.column("node_refs").to_pylist()):
                coords = [self.nodes.get(int(r)) for r in refs]
                if any(c is None for c in coords) or len(coords) < 2:
                    continue
                arr = g.snap(np.asarray(coords, dtype=np.float64))
                closed = len(arr) >= 4 and np.array_equal(arr[0], arr[-1])
                if closed:
                    kind, parts = g.make_valid(g.GEOM_POLYGON, [[arr[:-1]]])
                    if not parts:
                        continue
                    wkts.append(g.to_wkt(kind, parts))
                elif not closed_only:
                    wkts.append(g.to_wkt(g.GEOM_LINESTRING, [[arr]]))
                else:
                    continue
                ids.append(f"way/{wid}")
            return pa.table({"ref_id": pa.array(ids, pa.string()),
                             "geometry_wkt": pa.array(wkts, pa.string())})

    return ways.map_batches(Assemble, batch_format="pyarrow", concurrency=(1, 8))


def _osm_loader(spec):
    nodes = ray.data.read_parquet(spec["nodes_path"])
    ways = ray.data.read_parquet(spec["ways_path"])
    return assemble_ways(nodes, ways, closed_only=spec.get("closed_only", True))


register_loader("dict", _dict_loader)
register_loader("parquet", _parquet_loader)
register_loader("grb_actual", _parquet_loader)     # same shape, semantic alias
register_loader("fiscal", _fiscal_loader)
register_loader("osm", _osm_loader)

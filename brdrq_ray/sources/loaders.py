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

    # latest version per ref_id with version_year <= y (as-of semantics) —
    # shuffled by a hash bucket of ref_id (one Python call per bucket, not
    # per parcel — reference tables are the big side), vectorized inside
    import pandas as pd

    from ..functions.vhash import bucket_i32

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "b", bucket_i32(batch.column("ref_id").cast(pa.string()), 64))

    def latest_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["ref_id", "version_date"])
                .drop_duplicates("ref_id", keep="last").drop(columns=["b"]))

    return (ds.map_batches(for_year, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("b").map_groups(latest_bucket, batch_format="pandas"))


# --- S4: OSM-style nodes + ways assembly ------------------------------------

def _way_to_wkt(wid, coords, closed_only: bool):
    """(way_id, ordered coords) -> (ref_id, wkt) or None."""
    from ..geom import core as g

    if any(c is None for c in coords) or len(coords) < 2:
        return None
    arr = g.snap(np.asarray(coords, dtype=np.float64))
    closed = len(arr) >= 4 and np.array_equal(arr[0], arr[-1])
    if closed:
        kind, parts = g.make_valid(g.GEOM_POLYGON, [[arr[:-1]]])
        if not parts:
            return None
        return f"way/{wid}", g.to_wkt(kind, parts)
    if not closed_only:
        return f"way/{wid}", g.to_wkt(g.GEOM_LINESTRING, [[arr]])
    return None


def assemble_ways(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                  closed_only: bool = True,
                  broadcast_limit: int = 5_000_000) -> ray.data.Dataset:
    """Overpass-style assembly: nodes (node_id, x, y) + ways (way_id,
    node_refs list<int64>) -> (ref_id, geometry_wkt). The reference gets this
    from brdr's OSMLoader over the Overpass JSON (cached fixture
    cache/ccb528....json).

    Hybrid join: below ``broadcast_limit`` nodes the node table broadcasts
    once (ray.put) and ways gather per batch; above it (a planet file's node
    table dwarfs the ways) the assembly is fully distributed — explode way
    refs, one groupby over a HASH BUCKET of node_id to attach coordinates
    (one vectorized pandas merge per bucket), one groupby over a hash bucket
    of way_id to reassemble in ref order (the per-way WKT build loops only
    over the ways in that bucket). Nothing node-table-sized touches the
    driver on that path, and the shuffle granularity is per-bucket — never
    one Python call per node/way (millions of calls at planet scale)."""
    import ray as _ray

    try:
        n_nodes = nodes.count()
    except Exception:
        n_nodes = None

    if n_nodes is not None and n_nodes <= broadcast_limit:
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
                    got = _way_to_wkt(wid, [self.nodes.get(int(r)) for r in refs],
                                      closed_only)
                    if got:
                        ids.append(got[0])
                        wkts.append(got[1])
                return pa.table({"ref_id": pa.array(ids, pa.string()),
                                 "geometry_wkt": pa.array(wkts, pa.string())})

        return ways.map_batches(Assemble, batch_format="pyarrow", concurrency=_pool())

    # distributed path: explode refs -> attach coords on node_id -> reassemble
    import pandas as pd

    n_buckets = 256

    def _bucket(ids: np.ndarray) -> pa.Array:
        mixed = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return pa.array((mixed % n_buckets).astype(np.int32), pa.int32())

    def explode_refs(batch: pa.Table) -> pa.Table:
        refs = batch.column("node_refs")
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        offsets = refs.offsets.to_numpy(zero_copy_only=False)
        offsets = offsets - offsets[0]
        n_per = np.diff(offsets)
        wid = batch.column("way_id").to_numpy(zero_copy_only=False)
        flat = refs.flatten().cast(pa.int64())
        seq = np.arange(len(flat)) - np.repeat(offsets[:-1], n_per)
        return pa.table({
            "nb": _bucket(flat.to_numpy(zero_copy_only=False)),
            "node_id": flat,
            "way_id": pa.array(np.repeat(wid, n_per), pa.int64()),
            "seq": pa.array(seq, pa.int32()),
            "x": pa.nulls(len(flat), pa.float64()),
            "y": pa.nulls(len(flat), pa.float64()),
        })

    def node_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        nid = batch.column("node_id").cast(pa.int64())
        return pa.table({
            "nb": _bucket(nid.to_numpy(zero_copy_only=False)),
            "node_id": nid,
            "way_id": pa.nulls(n, pa.int64()),
            "seq": pa.nulls(n, pa.int32()),
            "x": batch.column("x").cast(pa.float64()),
            "y": batch.column("y").cast(pa.float64()),
        })

    tagged = (ways.map_batches(explode_refs, batch_format="pyarrow")
              .union(nodes.map_batches(node_side, batch_format="pyarrow")))

    def attach(grp: pd.DataFrame) -> pd.DataFrame:
        coords = grp[grp["way_id"].isna()][["node_id", "x", "y"]]
        refs = grp[grp["way_id"].notna()][["node_id", "way_id", "seq"]]
        if refs.empty:
            return pd.DataFrame({"way_id": pd.Series(dtype="int64"),
                                 "seq": pd.Series(dtype="int64"),
                                 "x": pd.Series(dtype="float64"),
                                 "y": pd.Series(dtype="float64")})
        # dangling refs (no node row) keep NaN coords -> way dropped later
        m = refs.merge(coords, on="node_id", how="left")
        return pd.DataFrame({"way_id": m["way_id"].astype("int64"),
                             "seq": m["seq"].astype("int64"),
                             "x": m["x"], "y": m["y"]})

    placed = tagged.groupby("nb").map_groups(attach, batch_format="pandas")

    def add_way_bucket(t: pa.Table) -> pa.Table:
        w = t.column("way_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("wb", _bucket(w))

    def reassemble(grp: pd.DataFrame) -> pa.Table:
        grp = grp.sort_values(["way_id", "seq"])
        ids_out, wkts = [], []
        for wid, g in grp.groupby("way_id", sort=False):
            coords = [None if (np.isnan(x) or np.isnan(y)) else (x, y)
                      for x, y in zip(g["x"], g["y"])]
            got = _way_to_wkt(int(wid), coords, closed_only)
            if got:
                ids_out.append(got[0])
                wkts.append(got[1])
        return pa.table({"ref_id": pa.array(ids_out, pa.string()),
                         "geometry_wkt": pa.array(wkts, pa.string())})

    return (placed.map_batches(add_way_bucket, batch_format="pyarrow")
            .groupby("wb").map_groups(reassemble, batch_format="pandas"))


def _osm_loader(spec):
    nodes = ray.data.read_parquet(spec["nodes_path"])
    ways = ray.data.read_parquet(spec["ways_path"])
    return assemble_ways(nodes, ways, closed_only=spec.get("closed_only", True))


register_loader("dict", _dict_loader)
register_loader("parquet", _parquet_loader)
register_loader("grb_actual", _parquet_loader)     # same shape, semantic alias
register_loader("fiscal", _fiscal_loader)
register_loader("osm", _osm_loader)

def _pool():
    """Cluster-sized actor-pool bounds (see functions/pool.py)."""
    from ..functions.pool import actor_pool
    return actor_pool()

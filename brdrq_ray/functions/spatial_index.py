"""Persistent cell-partitioned spatial index: build once, probe many.

The join family (functions/spatial_join.py) re-tiles the reference on every
run — right for one-shot batch jobs, wrong for the interactive shape the
reference plugin actually serves (a user aligns a handful of features at a
time against the SAME national parcel table, reference fetching per request:
GRBActualLoader bbox download at its call sites
plugin/brdrq/brdrq_dockwidget_featurealigner.py:1546 and
plugin/brdrq/brdrq_algorithm_autocorrectborders.py:599). This is
the spatial analog of the IVF inverted file (similarity.py::ivf_build):

- **build** — ONE streaming pass: parse, derive the tile level from the
  bbox histogram (plan_tiles with rd=0) unless given, explode every feature
  to its bbox-cover SHARDS and MATERIALIZE as parquet partitioned by
  ``shard``. A shard is the parent cell ``shard_depth`` levels above the
  index level (default 3 -> 64 index cells per shard): hive dirs stay
  bounded per write task (pyarrow caps 1024 partitions/fragment) and a
  feature spanning k shards is stored k times — NOT k-cells times — so
  cover replication is cheaper than per-cell dirs too. The (level,
  shard_depth) pair is persisted in ``_meta.json``.
- **probe** — queries are a driver-sized WKT dict (the interactive
  contract, like ivf_probe's query matrix). Only the shards covering the
  queries' bboxes are read — I/O proportional to the touched area (at
  shard granularity), never a corpus scan — then one actor-pool pass
  bbox-prefilters and runs the EXACT intersection test per
  (query, candidate), and the driver dedupes shard-replicated pairs.
  Output matches intersects_semi_join on the same inputs.

Incremental growth: appends are new files under existing/new shard
directories (``spatial_index_append``) — no rebuild, same contract as the
persisted MinHash band index.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .. import tiles
from ..geom import core as g
from ..stages.ingest import parse_geometries
from .pool import actor_pool

_META = "_meta.json"


def _shards_of_cells(cells: np.ndarray, shard_depth: int) -> np.ndarray:
    if shard_depth <= 0:
        return np.asarray(cells, np.int64)
    return tiles.parent_cells(cells, shard_depth)


def _explode_to_shards(level: int, shard_depth: int, id_col: str):
    shard_level = level - shard_depth

    def fn(b: pa.Table) -> pa.Table:
        xmin = b.column("xmin").to_numpy(zero_copy_only=False)
        ymin = b.column("ymin").to_numpy(zero_copy_only=False)
        xmax = b.column("xmax").to_numpy(zero_copy_only=False)
        ymax = b.column("ymax").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(xmin)  # empty geometries index nowhere
        # cover directly at the SHARD level: one row per (feature, shard)
        rows, shards = tiles.cover_bboxes(np.where(ok, xmin, 0.0),
                                          np.where(ok, ymin, 0.0),
                                          np.where(ok, xmax, 0.0),
                                          np.where(ok, ymax, 0.0),
                                          shard_level)
        keep = ok[rows]
        rows, shards = rows[keep], shards[keep]
        idx = pa.array(rows, pa.int64())
        return pa.table({
            "ref_id": b.column(id_col).cast(pa.string()).take(idx),
            "geom": b.column("geom").take(idx),
            "xmin": b.column("xmin").take(idx),
            "ymin": b.column("ymin").take(idx),
            "xmax": b.column("xmax").take(idx),
            "ymax": b.column("ymax").take(idx),
            "shard": pa.array(shards, pa.int64()),
        })
    return fn


def spatial_index_build(reference: ray.data.Dataset,
                        index_dir: str | None = None,
                        level: int | None = None,
                        shard_depth: int = 3,
                        id_col: str = "ref_id",
                        wkt_col: str = "geometry_wkt") -> dict:
    """Materialize the index; returns the probe handle
    {'index_dir', 'level', 'shard_depth'}. ``level=None`` derives it from
    the feature-size histogram (coarse enough that no feature spans many
    cells); ``shard_depth`` trades probe granularity (deeper = coarser
    reads) against directory count and replication."""
    import shutil

    if index_dir is None:
        import tempfile
        index_dir = tempfile.mkdtemp(prefix="brdrq_sidx_", dir="/tmp")
    elif os.path.isdir(index_dir):
        shutil.rmtree(index_dir)

    parsed = reference.map_batches(parse_geometries, batch_format="pyarrow",
                                   fn_kwargs={"wkt_col": wkt_col})
    if level is None:
        from ..pipelines.autocorrect import plan_tiles
        level = plan_tiles(parsed, max_rd=0.0).level
    level = int(level)
    shard_depth = int(min(shard_depth, level))

    (parsed.map_batches(_explode_to_shards(level, shard_depth, id_col),
                        batch_format="pyarrow")
           .write_parquet(index_dir, partition_cols=["shard"]))
    os.makedirs(index_dir, exist_ok=True)  # empty input writes nothing
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump({"level": level, "shard_depth": shard_depth}, f)
    return {"index_dir": index_dir, "level": level,
            "shard_depth": shard_depth}


def spatial_index_load(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    return {"index_dir": index_dir, "level": int(meta["level"]),
            "shard_depth": int(meta["shard_depth"])}


def spatial_index_append(index: dict, reference: ray.data.Dataset,
                         id_col: str = "ref_id",
                         wkt_col: str = "geometry_wkt") -> dict:
    """Add features to an existing index at ITS layout — appends are new
    parquet files under the shard directories, no rebuild, no rewrite."""
    parsed = reference.map_batches(parse_geometries, batch_format="pyarrow",
                                   fn_kwargs={"wkt_col": wkt_col})
    (parsed.map_batches(_explode_to_shards(index["level"],
                                           index["shard_depth"], id_col),
                        batch_format="pyarrow")
           .write_parquet(index["index_dir"], partition_cols=["shard"]))
    return index


def _shard_files(index_dir: str, shards) -> list[str]:
    files: list[str] = []
    for c in sorted(set(int(x) for x in shards)):
        files.extend(sorted(glob.glob(f"{index_dir}/shard={c}/*.parquet")))
    return files


def spatial_index_probe(index: dict, queries: dict[str, str],
                        buffer_m: float = 0.0) -> pd.DataFrame:
    """(query_id, ref_id) pairs for a driver-sized {query_id: wkt} dict:
    exact non-empty intersection at ``buffer_m=0`` (the default), exact set
    distance <= buffer_m otherwise (the reference's 1.01*rd buffered
    extractbylocation fetch — geom/metrics.py::geom_distance, so the buffer
    genuinely widens the result, not just the prefilter). Null/empty query
    WKT is the empty geometry (no pairs), matching parse_geometries. Reads
    ONLY the queries' cover-shard partitions."""
    shard_level = index["level"] - index["shard_depth"]
    qids = sorted(queries)
    q_packed: dict[str, bytes] = {}
    q_bbox: dict[str, tuple] = {}
    q_shards: dict[str, np.ndarray] = {}
    for qid in qids:
        wkt = queries[qid]
        kind, parts = g.parse_wkt(wkt) if wkt else (g.GEOM_POLYGON, [])
        kind, parts = g.make_valid(kind, parts)
        q_packed[qid] = g.pack_geom(kind, parts)
        bb = g.geom_bbox(parts)
        q_bbox[qid] = bb
        if np.isnan(bb[0]):
            q_shards[qid] = np.array([], np.int64)
        else:
            q_shards[qid] = tiles.cover_bbox(bb[0], bb[1], bb[2], bb[3],
                                             shard_level, expand=buffer_m)
    needed = sorted({int(c) for cells in q_shards.values() for c in cells})
    files = _shard_files(index["index_dir"], needed)
    if not files:
        return pd.DataFrame({"query_id": pd.Series([], dtype=str),
                             "ref_id": pd.Series([], dtype=str)})

    # shard -> query ids probing it (shipped once in the actor closure)
    shard_queries: dict[int, list[str]] = {}
    for qid in qids:
        for c in q_shards[qid].tolist():
            shard_queries.setdefault(int(c), []).append(qid)
    q_blob = ray.put((q_packed, q_bbox))

    class ProbeStage:
        def __init__(self):
            packed, bbox = ray.get(q_blob)
            self.geoms = {qid: g.unpack_geom(buf)
                          for qid, buf in packed.items()}
            self.bbox = bbox

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..geom import metrics as gm
            from ..geom.boolean import overlay
            shards = batch.column("shard").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            ids = np.asarray(batch.column("ref_id").to_pylist(), dtype=object)
            geoms = batch.column("geom").to_pylist()
            xmin = batch.column("xmin").to_numpy(zero_copy_only=False)
            ymin = batch.column("ymin").to_numpy(zero_copy_only=False)
            xmax = batch.column("xmax").to_numpy(zero_copy_only=False)
            ymax = batch.column("ymax").to_numpy(zero_copy_only=False)
            out_q, out_r = [], []
            seen_local: set[tuple] = set()  # a ref can sit in 2+ shards
            for c in np.unique(shards):
                for qid in shard_queries.get(int(c), ()):
                    bb = self.bbox[qid]
                    rows = np.nonzero(
                        (shards == c)
                        & (xmin <= bb[2] + buffer_m)
                        & (xmax >= bb[0] - buffer_m)
                        & (ymin <= bb[3] + buffer_m)
                        & (ymax >= bb[1] - buffer_m))[0]
                    qkind, qparts = self.geoms[qid]
                    for i in rows:
                        key = (qid, ids[i])
                        if key in seen_local:
                            continue
                        seen_local.add(key)
                        rk, rparts = g.unpack_geom(geoms[i])
                        if buffer_m > 0:
                            hit = (gm.geom_distance(qkind, qparts,
                                                    rk, rparts) <= buffer_m)
                        else:
                            inter = overlay(qparts, rparts, "intersection")
                            hit = g.geom_area(g.GEOM_POLYGON, inter) > 0
                        if hit:
                            out_q.append(qid)
                            out_r.append(ids[i])
            return pa.table({"query_id": pa.array(out_q, pa.string()),
                             "ref_id": pa.array(out_r, pa.string())})

    df = (ray.data.read_parquet(files)
          .map_batches(ProbeStage, batch_format="pyarrow",
                       concurrency=actor_pool())
          .to_pandas())
    if len(df) == 0:
        # an all-miss probe can come back schema-less (zero-row blocks)
        return pd.DataFrame({"query_id": pd.Series([], dtype=str),
                             "ref_id": pd.Series([], dtype=str)})
    # cross-batch/shard dedupe of replicated pairs; deterministic order
    df = (df.drop_duplicates(["query_id", "ref_id"])
            .sort_values(["query_id", "ref_id"])
            .reset_index(drop=True))
    return df


_PAIR_SCHEMA = pa.schema([("query_id", pa.string()),
                          ("ref_id", pa.string())])


def spatial_index_probe_dataset(index: dict, queries: ray.data.Dataset,
                                buffer_m: float = 0.0,
                                id_col: str = "query_id",
                                wkt_col: str = "geometry_wkt",
                                cell_level: int | None = None,
                                hot_threshold: int = 512,
                                n_buckets: int = 64) -> ray.data.Dataset:
    """Dataset-scale probe: same pair semantics as :func:`spatial_index_probe`
    (exact non-empty intersection at ``buffer_m=0``, exact set distance <=
    buffer_m otherwise) but the query side is a Dataset — nothing
    query-sized or pair-sized ever lands on the driver.

    Shape: parse the query side once; ONE bounded metadata pass derives the
    set of index shards the queries' (expanded) bboxes cover (driver list
    bounded by the index's directory count, not by query rows); read ONLY
    those shard partitions; first-per-ref_id bucketed dedupe of the
    shard-replicated rows; then the standard planned co-partition join
    (:func:`~brdrq_ray.functions.spatial_join.intersects_semi_join` /
    ``dwithin_join``) — hot-cell salting, per-group bbox prefilter, exact
    kernels, each pair tested exactly once (the query side lives in exactly
    one salted owner group). Returns a streaming Dataset
    (query_id, ref_id)."""
    from .spatial_join import dwithin_join, intersects_semi_join

    shard_level = index["level"] - index["shard_depth"]
    parsed_q = queries.map_batches(
        parse_geometries, batch_format="pyarrow",
        fn_kwargs={"wkt_col": wkt_col}).materialize()

    def shards_of(b: pa.Table) -> pa.Table:
        xmin = b.column("xmin").to_numpy(zero_copy_only=False)
        ymin = b.column("ymin").to_numpy(zero_copy_only=False)
        xmax = b.column("xmax").to_numpy(zero_copy_only=False)
        ymax = b.column("ymax").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(xmin)
        _, cells = tiles.cover_bboxes(xmin[ok], ymin[ok], xmax[ok], ymax[ok],
                                      shard_level, expand=buffer_m)
        return pa.table({"shard": pa.array(np.unique(cells), pa.int64())})

    empty = ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    if parsed_q.count() == 0:
        return empty
    needed = parsed_q.map_batches(shards_of,
                                  batch_format="pyarrow").unique("shard")
    files = _shard_files(index["index_dir"], needed)
    if not files:
        return empty

    ref = ray.data.read_parquet(files)

    # a ref spanning k shards is stored k times; keep one row per ref_id
    # (bucketed shuffle of the candidate rows only — never driver pandas)
    def bucketed(b: pa.Table) -> pa.Table:
        from .vhash import bucket_i32
        b = b.drop_columns(["shard"])
        return b.append_column("__b",
                               bucket_i32(b.column("ref_id"), n_buckets))

    def first_per_ref(grp: pa.Table) -> pa.Table:
        import pandas as pd

        df = grp.to_pandas()
        # shard copies are byte-identical after dropping `shard`, so
        # any-first is deterministic; sort for stable output order
        df = (df.drop_duplicates("ref_id")
                .sort_values("ref_id", kind="mergesort"))
        return pa.Table.from_pandas(df.drop(columns="__b"),
                                    preserve_index=False)

    ref = (ref.map_batches(bucketed, batch_format="pyarrow")
              .groupby("__b").map_groups(first_per_ref,
                                         batch_format="pyarrow"))

    def as_theme(b: pa.Table) -> pa.Table:
        names = [("theme_id" if c == id_col else c) for c in b.column_names]
        return b.rename_columns(names)

    qt = parsed_q.map_batches(as_theme, batch_format="pyarrow")
    if buffer_m > 0:
        pairs = dwithin_join(qt, ref, distance=buffer_m,
                             cell_level=cell_level,
                             hot_threshold=hot_threshold)
        pairs = pairs.select_columns(["theme_id", "ref_id"])
    else:
        pairs = intersects_semi_join(qt, ref, cell_level=cell_level,
                                     hot_threshold=hot_threshold)

    return pairs.map_batches(
        lambda b: b.rename_columns(["query_id", "ref_id"]),
        batch_format="pyarrow")

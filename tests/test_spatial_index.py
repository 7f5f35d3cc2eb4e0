"""Persistent cell-partitioned spatial index: probe results equal the
brute-force overlay join, probe I/O touches only cover-cell partitions,
append grows the index without a rebuild."""

import glob
import os

import numpy as np
import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.geom.boolean import overlay
from brdrq_ray.sources import fixtures as fx
from brdrq_ray.functions.spatial_index import (
    _shard_files, spatial_index_append, spatial_index_build,
    spatial_index_load, spatial_index_probe)


@pytest.fixture(scope="module")
def ref_table():
    return fx.make_reference_table(nx=10, ny=10, seed=42)


def _brute_pairs(queries: dict, parcels: dict) -> set:
    out = set()
    for qid, wkt in queries.items():
        kind, qparts = g.parse_wkt(wkt)
        _, qparts = g.make_valid(kind, qparts)
        for rid, rparts in parcels.items():
            inter = overlay(qparts, rparts, "intersection")
            if g.geom_area(g.GEOM_POLYGON, inter) > 0:
                out.add((qid, rid))
    return out


def _queries_from_theme(n=6):
    theme = fx.make_thematic_table(nx=10, ny=10, seed=7, n_features=n)
    return {theme.column("theme_id")[i].as_py():
            theme.column("geometry_wkt")[i].as_py()
            for i in range(theme.num_rows)}


def test_probe_matches_bruteforce(ray_session, ref_table, tmp_path):
    import ray.data

    idx = spatial_index_build(ray.data.from_arrow(ref_table),
                              index_dir=str(tmp_path / "sidx"))
    queries = _queries_from_theme()
    got = spatial_index_probe(idx, queries)
    got_pairs = set(zip(got["query_id"], got["ref_id"]))

    parcels, _ = fx.make_reference_parts(nx=10, ny=10, seed=42)
    assert got_pairs == _brute_pairs(queries, parcels)
    # deterministic presentation order + no replicated duplicates
    assert not got.duplicated(["query_id", "ref_id"]).any()
    assert got.equals(got.sort_values(["query_id", "ref_id"])
                      .reset_index(drop=True))


def test_probe_reads_only_cover_cells(ray_session, ref_table, tmp_path):
    import ray.data

    # force a fine level so the table spans many shards
    idx = spatial_index_build(ray.data.from_arrow(ref_table),
                              index_dir=str(tmp_path / "fine"), level=22,
                              shard_depth=5)
    all_files = glob.glob(os.path.join(idx["index_dir"],
                                       "shard=*", "*.parquet"))
    assert len(all_files) > 4
    # one tiny query in a corner of the fixture grid
    queries = {"q0": ("POLYGON ((100001 150001, 100020 150001, "
                  "100020 150020, 100001 150020, 100001 150001))")}
    kind, parts = g.parse_wkt(queries["q0"])
    bb = g.geom_bbox(parts)
    from brdrq_ray import tiles
    shards = tiles.cover_bbox(*bb, idx["level"] - idx["shard_depth"])
    touched = _shard_files(idx["index_dir"], shards)
    assert 0 < len(touched) < len(all_files)  # I/O strictly partial

    got = spatial_index_probe(idx, queries)
    parcels, _ = fx.make_reference_parts(nx=10, ny=10, seed=42)
    assert set(zip(got["query_id"], got["ref_id"])) \
        == _brute_pairs(queries, parcels)


def test_append_equals_full_build(ray_session, ref_table, tmp_path):
    import ray.data

    n = ref_table.num_rows
    half_a, half_b = ref_table.slice(0, n // 2), ref_table.slice(n // 2)
    idx = spatial_index_build(ray.data.from_arrow(half_a),
                              index_dir=str(tmp_path / "grow"), level=11)
    spatial_index_append(idx, ray.data.from_arrow(half_b))

    full = spatial_index_build(ray.data.from_arrow(ref_table),
                               index_dir=str(tmp_path / "full"), level=11)
    queries = _queries_from_theme()
    a = spatial_index_probe(idx, queries)
    b = spatial_index_probe(full, queries)
    assert a.equals(b)


def test_probe_buffer_is_dwithin(ray_session, ref_table, tmp_path):
    """buffer_m > 0 switches the exact test to set-distance <= buffer_m —
    the buffered probe must be a strict superset on a near-miss query."""
    import ray.data
    from brdrq_ray.geom import metrics as gm

    idx = spatial_index_build(ray.data.from_arrow(ref_table),
                              index_dir=str(tmp_path / "buf"))
    parcels, _ = fx.make_reference_parts(nx=10, ny=10, seed=42)
    # a thin query just OUTSIDE the fixture extent (gap ~2 m to x=100000)
    q = {"near": ("POLYGON ((99990 150005, 99998 150005, 99998 150030, "
                  "99990 150030, 99990 150005))")}
    plain = spatial_index_probe(idx, q)
    assert len(plain) == 0
    buffered = spatial_index_probe(idx, q, buffer_m=5.0)
    assert len(buffered) > 0
    kind, qparts = g.parse_wkt(q["near"])
    for rid in buffered["ref_id"]:
        d = gm.geom_distance(kind, qparts, g.GEOM_POLYGON, parcels[rid])
        assert d <= 5.0
    # and completeness: every parcel within 5 m is returned
    want = {rid for rid, rparts in parcels.items()
            if gm.geom_distance(kind, qparts, g.GEOM_POLYGON, rparts) <= 5.0}
    assert set(buffered["ref_id"]) == want


def test_probe_null_and_empty_wkt(ray_session, ref_table, tmp_path):
    import ray.data

    idx = spatial_index_build(ray.data.from_arrow(ref_table),
                              index_dir=str(tmp_path / "nulls"))
    got = spatial_index_probe(idx, {"q0": None, "q1": "",
                                    "q2": "POLYGON EMPTY"})
    assert len(got) == 0


def test_load_roundtrip_and_misses(ray_session, ref_table, tmp_path):
    import ray.data

    built = spatial_index_build(ray.data.from_arrow(ref_table),
                                index_dir=str(tmp_path / "rt"))
    idx = spatial_index_load(built["index_dir"])
    assert idx["level"] == built["level"]
    # far outside the fixture extent -> no partitions read, empty result
    got = spatial_index_probe(
        idx, {"qq": "POLYGON ((90000 90000, 90001 90000, 90001 90001, "
                    "90000 90001, 90000 90000))"})
    assert len(got) == 0 and list(got.columns) == ["query_id", "ref_id"]


def _queries_table(queries: dict):
    import pyarrow as pa
    qids = sorted(queries)
    return pa.table({"query_id": pa.array(qids, pa.string()),
                     "geometry_wkt": pa.array([queries[q] for q in qids],
                                              pa.string())})


def test_probe_dataset_matches_dict_probe(ray_session, ref_table, tmp_path):
    """The Dataset-queries overload returns exactly the dict probe's pairs
    (== brute force) — intersect mode and buffered (dwithin) mode — with no
    replicated duplicates, via the planned co-partition join."""
    import ray.data
    from brdrq_ray.functions.spatial_index import spatial_index_probe_dataset

    idx = spatial_index_build(ray.data.from_arrow(ref_table),
                              index_dir=str(tmp_path / "dsq"))
    queries = _queries_from_theme(n=8)
    queries["near"] = ("POLYGON ((99990 150005, 99998 150005, 99998 150030, "
                       "99990 150030, 99990 150005))")
    queries["qnull"] = None
    queries["qempty"] = "POLYGON EMPTY"
    qds = ray.data.from_arrow(_queries_table(queries))

    for buf in (0.0, 5.0):
        want_df = spatial_index_probe(idx, queries, buffer_m=buf)
        want = set(zip(want_df["query_id"], want_df["ref_id"]))
        got_df = spatial_index_probe_dataset(idx, qds,
                                             buffer_m=buf).to_pandas()
        got = set(zip(got_df["query_id"], got_df["ref_id"]))
        assert got == want, f"buffer_m={buf}"
        assert len(got_df) == len(got)  # no replicated duplicates


def test_probe_dataset_partition_invariance(ray_session, ref_table, tmp_path):
    """Same pairs under different query-side partitionings (repartition
    must not change the result set)."""
    import ray.data
    from brdrq_ray.functions.spatial_index import spatial_index_probe_dataset

    idx = spatial_index_build(ray.data.from_arrow(ref_table),
                              index_dir=str(tmp_path / "dsp"))
    queries = _queries_from_theme(n=10)
    qtab = _queries_table(queries)
    a = (spatial_index_probe_dataset(idx, ray.data.from_arrow(qtab))
         .to_pandas())
    b = (spatial_index_probe_dataset(
            idx, ray.data.from_arrow(qtab).repartition(7))
         .to_pandas())
    key = lambda df: sorted(zip(df["query_id"], df["ref_id"]))
    assert key(a) == key(b)
    assert len(a) > 0


def test_probe_dataset_empty_and_miss(ray_session, ref_table, tmp_path):
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.spatial_index import spatial_index_probe_dataset

    idx = spatial_index_build(ray.data.from_arrow(ref_table),
                              index_dir=str(tmp_path / "dse"))
    empty = ray.data.from_arrow(pa.table(
        {"query_id": pa.array([], pa.string()),
         "geometry_wkt": pa.array([], pa.string())}))
    assert spatial_index_probe_dataset(idx, empty).count() == 0
    far = ray.data.from_arrow(_queries_table(
        {"qq": "POLYGON ((90000 90000, 90001 90000, 90001 90001, "
               "90000 90001, 90000 90000))"}))
    got = spatial_index_probe_dataset(idx, far)
    assert got.count() == 0

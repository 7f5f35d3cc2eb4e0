"""Topology-consistent alignment post-pass (functions/topology.py +
the 2024:topology2024a processor wiring).

Engine-defined semantics (the reference ships the id disabled —
brdrq_utils.py:102-110): deterministic priority tessellation. Oracles here
are closed-form: hand-built rectangles whose pairwise overlap areas are
exact."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from brdrq_ray.functions.topology import topology_resolve
from brdrq_ray.geom import boolean as gb
from brdrq_ray.geom import core as g


def _rect(x0, y0, x1, y1):
    wkt = (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, "
           f"{x0} {y0}))")
    kind, parts = g.parse_wkt(wkt)
    return g.pack_geom(kind, parts)


def _area(buf):
    kind, parts = g.unpack_geom(buf)
    return g.geom_area(kind, parts)


def _results_table(rows):
    return pa.table({
        "theme_id": pa.array([r[0] for r in rows], pa.string()),
        "brdr_relevant_distance": pa.array([r[1] for r in rows], pa.float64()),
        "result_geom": pa.array([r[2] for r in rows], pa.binary()),
        "brdr_area": pa.array([_area(r[2]) for r in rows], pa.float64()),
        "brdr_perimeter": pa.array([0.0] * len(rows), pa.float64()),
        "brdr_shape_index": pa.array([0.0] * len(rows), pa.float64()),
    })


def _resolve(tbl, **kw):
    out = topology_resolve(ray.data.from_arrow(tbl), **kw).to_pandas()
    return out.sort_values("theme_id").reset_index(drop=True)


def _pairwise_overlap_area(bufs):
    total = 0.0
    for i in range(len(bufs)):
        for j in range(i + 1, len(bufs)):
            pi = g.unpack_geom(bufs[i])[1]
            pj = g.unpack_geom(bufs[j])[1]
            if pi and pj:
                total += gb._geom_area(gb.overlay(pi, pj, "intersection"))
    return total


def test_two_overlapping_results_smaller_id_wins(ray_session):
    # T1 [0,10]x[0,10], T2 [8,18]x[0,10]: 2x10 strip contested; T3 disjoint
    tbl = _results_table([
        ("T1", 2.0, _rect(0, 0, 10, 10)),
        ("T2", 2.0, _rect(8, 0, 18, 10)),
        ("T3", 2.0, _rect(30, 30, 34, 34)),
    ])
    out = _resolve(tbl)
    assert list(out.columns)[-1] == "topo_ceded_area"
    t1, t2, t3 = out.iloc[0], out.iloc[1], out.iloc[2]
    assert t1.topo_ceded_area == 0.0
    assert _area(t1.result_geom) == pytest.approx(100.0)
    assert t2.topo_ceded_area == pytest.approx(20.0)
    assert _area(t2.result_geom) == pytest.approx(80.0)
    assert t2.brdr_area == pytest.approx(80.0)      # recomputed
    assert t3.topo_ceded_area == 0.0
    # untouched rows keep their exact bytes
    assert t3.result_geom == _rect(30, 30, 34, 34)
    assert _pairwise_overlap_area(list(out.result_geom)) == pytest.approx(0.0, abs=1e-9)
    # union coverage preserved: 100 + 100 - 20 + 16
    assert sum(_area(b) for b in out.result_geom) == pytest.approx(196.0)


def test_priority_column_overrides_id_order(ray_session):
    tbl = _results_table([
        ("T1", 2.0, _rect(0, 0, 10, 10)),
        ("T2", 2.0, _rect(8, 0, 18, 10)),
    ]).append_column("score", pa.array([1.0, 5.0], pa.float64()))
    out = _resolve(tbl, priority_col="score")
    t1, t2 = out.iloc[0], out.iloc[1]
    assert t1.topo_ceded_area == pytest.approx(20.0)   # T2 outranks by score
    assert t2.topo_ceded_area == 0.0
    assert _area(t2.result_geom) == pytest.approx(100.0)


def test_overlap_chain_stays_pairwise_disjoint(ray_session):
    # A-B overlap and B-C overlap (no A-C overlap): every loser subtracts
    # pieces of the ORIGINAL winners, so the chain needs no iteration
    tbl = _results_table([
        ("A", 2.0, _rect(0, 0, 10, 10)),
        ("B", 2.0, _rect(8, 0, 18, 10)),
        ("C", 2.0, _rect(16, 0, 26, 10)),
    ])
    out = _resolve(tbl)
    a, b, c = out.iloc[0], out.iloc[1], out.iloc[2]
    assert a.topo_ceded_area == 0.0
    assert b.topo_ceded_area == pytest.approx(20.0)    # ceded [8,10] to A
    assert c.topo_ceded_area == pytest.approx(20.0)    # ceded [16,18] to ORIGINAL B
    assert _pairwise_overlap_area(list(out.result_geom)) == pytest.approx(0.0, abs=1e-9)
    assert sum(_area(b_) for b_ in out.result_geom) == pytest.approx(260.0)


def test_series_resolve_independently(ray_session):
    # same ids at two relevant distances: each rd resolves on its own
    tbl = _results_table([
        ("T1", 1.0, _rect(0, 0, 10, 10)),
        ("T2", 1.0, _rect(8, 0, 18, 10)),
        ("T1", 2.0, _rect(0, 0, 10, 10)),
        ("T2", 2.0, _rect(40, 0, 50, 10)),   # disjoint at rd=2
    ])
    out = topology_resolve(ray.data.from_arrow(tbl)).to_pandas()
    out = out.sort_values(["brdr_relevant_distance", "theme_id"]).reset_index(drop=True)
    assert out.iloc[1].topo_ceded_area == pytest.approx(20.0)  # rd=1 T2
    assert out.iloc[3].topo_ceded_area == 0.0                  # rd=2 T2


def test_partition_invariance_and_distributed_leg(ray_session):
    rows = [(f"T{i:02d}", 2.0, _rect(i * 8, 0, i * 8 + 10, 10))
            for i in range(12)]                       # every neighbor overlaps
    tbl = _results_table(rows)
    a = _resolve(tbl)
    b = topology_resolve(ray.data.from_arrow(tbl).repartition(5)) \
        .to_pandas().sort_values("theme_id").reset_index(drop=True)
    c = topology_resolve(ray.data.from_arrow(tbl).repartition(3),
                         broadcast_limit=0) \
        .to_pandas().sort_values("theme_id").reset_index(drop=True)
    for other in (b, c):
        assert (a.theme_id == other.theme_id).all()
        assert np.allclose(a.topo_ceded_area, other.topo_ceded_area)
        assert list(a.result_geom) == list(other.result_geom)
    # all strips ceded to the left neighbor except the first
    assert a.iloc[0].topo_ceded_area == 0.0
    assert np.allclose(a.topo_ceded_area.iloc[1:], 20.0)
    assert _pairwise_overlap_area(list(a.result_geom)) == pytest.approx(0.0, abs=1e-9)


def test_non_polygon_and_empty_pass_through(ray_session):
    kind, parts = g.parse_wkt("LINESTRING (0 0, 5 5)")
    line = g.pack_geom(kind, parts)
    tbl = _results_table([
        ("T1", 2.0, _rect(0, 0, 10, 10)),
        ("T2", 2.0, _rect(8, 0, 18, 10)),
    ])
    tbl = pa.concat_tables([tbl, pa.table({
        "theme_id": pa.array(["T0line"], pa.string()),
        "brdr_relevant_distance": pa.array([2.0], pa.float64()),
        "result_geom": pa.array([line], pa.binary()),
        "brdr_area": pa.array([0.0], pa.float64()),
        "brdr_perimeter": pa.array([0.0], pa.float64()),
        "brdr_shape_index": pa.array([0.0], pa.float64()),
    })])
    out = _resolve(tbl)
    row = out[out.theme_id == "T0line"].iloc[0]
    assert row.result_geom == line
    assert row.topo_ceded_area == 0.0


def test_no_contest_appends_audit_only(ray_session):
    tbl = _results_table([
        ("T1", 2.0, _rect(0, 0, 10, 10)),
        ("T2", 2.0, _rect(20, 0, 30, 10)),
    ])
    out = _resolve(tbl)
    assert (out.topo_ceded_area == 0.0).all()
    assert list(out.result_geom) == [_rect(0, 0, 10, 10), _rect(20, 0, 30, 10)]


def test_processor_wiring_end_to_end(ray_session):
    from brdrq_ray.alignment import OD_EXCLUDE, AlignConfig
    from brdrq_ray.pipelines.autocorrect import run_alignment
    from brdrq_ray.processors import PROCESSOR_TOPOLOGY
    from brdrq_ray.sources import fixtures as fx

    theme = fx.make_thematic_table(nx=8, ny=8, seed=7, n_features=12)
    ref = fx.make_reference_table(nx=8, ny=8, seed=7)
    cfg = AlignConfig(relevant_distance=2.0, od_strategy=OD_EXCLUDE,
                      processor_id=PROCESSOR_TOPOLOGY)
    res = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                        cfg).to_pandas()
    assert "topo_ceded_area" in res.columns
    assert (res.topo_ceded_area >= 0).all()
    # the aligned layer is overlap-free
    assert _pairwise_overlap_area(list(res.result_geom)) == pytest.approx(0.0, abs=1e-6)
    # equal to the default processor wherever nothing was ceded
    base = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                         AlignConfig(relevant_distance=2.0,
                                     od_strategy=OD_EXCLUDE)).to_pandas()
    merged = res.merge(base, on="theme_id", suffixes=("_t", "_b"))
    untouched = merged[merged.topo_ceded_area == 0.0]
    assert len(untouched) > 0
    assert (untouched.result_geom_t == untouched.result_geom_b).all()

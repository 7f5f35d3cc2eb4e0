import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.sources import fixtures as fx


def test_dict_loader(ray_session):
    from brdrq_ray.sources.loaders import make_reference_dataset

    ds = make_reference_dataset({"loader": "dict", "geoms": {
        "A": "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"}})
    pdf = ds.to_pandas()
    assert list(pdf["ref_id"]) == ["A"]


def test_parquet_loader_bbox(ray_session, tmp_path):
    from brdrq_ray.sources.loaders import make_reference_dataset

    ref = fx.make_reference_table(nx=8, ny=8, seed=42)
    path = str(tmp_path / "ref.parquet")
    pq.write_table(ref, path)
    all_ds = make_reference_dataset({"loader": "parquet", "path": path})
    assert all_ds.count() == ref.num_rows
    clipped = make_reference_dataset({"loader": "parquet", "path": path,
                                      "bbox": (100000, 150000, 100050, 150050)})
    n = clipped.count()
    assert 0 < n < ref.num_rows


def test_fiscal_loader_asof(ray_session, tmp_path):
    from brdrq_ray.sources.loaders import make_reference_dataset

    # two versions per parcel: 2019 and 2022
    tbl = pa.table({
        "ref_id": ["P1", "P1", "P2"],
        "geometry_wkt": ["POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"] * 3,
        "version_date": pa.array(np.array(["2019-05-01", "2022-03-01", "2021-01-01"],
                                          dtype="datetime64[s]")),
    })
    path = str(tmp_path / "fiscal.parquet")
    pq.write_table(tbl, path)
    ds = make_reference_dataset({"loader": "fiscal", "path": path, "year": 2020})
    pdf = ds.to_pandas()
    assert len(pdf) == 1  # P1@2019 only; P2's first version is 2021
    assert str(pdf.iloc[0]["version_date"])[:4] == "2019"


def test_osm_assembly(ray_session):
    import ray.data
    from brdrq_ray.sources.loaders import assemble_ways

    nodes = pa.table({"node_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                      "x": [0.0, 10.0, 10.0, 0.0, 50.0],
                      "y": [0.0, 0.0, 10.0, 10.0, 50.0]})
    ways = pa.table({"way_id": pa.array([7, 8], pa.int64()),
                     "node_refs": pa.array([[1, 2, 3, 4, 1], [1, 5]],
                                           pa.list_(pa.int64()))})
    out = assemble_ways(ray.data.from_arrow(nodes), ray.data.from_arrow(ways)).to_pandas()
    assert list(out["ref_id"]) == ["way/7"]  # open way dropped (closed_only)
    kind, parts = g.parse_wkt(out.iloc[0]["geometry_wkt"])
    assert g.geom_area(kind, parts) == pytest.approx(100.0)
    out2 = assemble_ways(ray.data.from_arrow(nodes), ray.data.from_arrow(ways),
                         closed_only=False).to_pandas()
    assert len(out2) == 2

    # distributed path (planet-scale node tables): identical output
    for closed in (True, False):
        bc = (assemble_ways(ray.data.from_arrow(nodes), ray.data.from_arrow(ways),
                            closed_only=closed)
              .to_pandas().sort_values("ref_id").reset_index(drop=True))
        dist = (assemble_ways(ray.data.from_arrow(nodes), ray.data.from_arrow(ways),
                              closed_only=closed, broadcast_limit=0)
                .to_pandas().sort_values("ref_id").reset_index(drop=True))
        assert bc.equals(dist)


def test_align_job_end_to_end(ray_session, tmp_path):
    from brdrq_ray.config import AlignJob, run_job

    theme = fx.make_thematic_table(nx=8, ny=8, seed=42, n_features=10)
    ref = fx.make_reference_table(nx=8, ny=8, seed=42)
    tpath = str(tmp_path / "theme.parquet")
    rpath = str(tmp_path / "ref.parquet")
    pq.write_table(theme, tpath)
    pq.write_table(ref, rpath)

    job = AlignJob(input_thematic=tpath,
                   reference={"loader": "parquet", "path": rpath},
                   relevant_distance=2.0, od_strategy="EXCLUDE",
                   workfolder=str(tmp_path / "out"))
    # config json roundtrip (the settings-store analog, S8)
    job2 = AlignJob.from_json(job.to_json())
    assert job2 == job

    stats = run_job(job)
    # 5-output contract: result + 3 diffs + correction
    assert set(stats["outputs"]) == {"result", "result_diff", "result_diff_plus",
                                     "result_diff_min", "correction"}
    import ray.data
    res = ray.data.read_parquet(stats["outputs"]["result"]).to_pandas()
    assert len(res) == 10
    corr = ray.data.read_parquet(stats["outputs"]["correction"]).to_pandas()
    assert len(corr) == 10
    # diff layers have no zero-perimeter rows (M7)
    for slot in ("result_diff", "result_diff_plus", "result_diff_min"):
        pdf = ray.data.read_parquet(stats["outputs"][slot]).to_pandas()
        assert (pdf["brdr_perimeter"] >= 0).all()

    # predictions-ALL: row multiplication + NO correction output (F5 contract)
    job_all = AlignJob(input_thematic=tpath,
                       reference={"loader": "parquet", "path": rpath},
                       predictions="ALL", max_relevant_distance=2.0,
                       od_strategy="EXCLUDE", checkpoint=False,
                       workfolder=str(tmp_path / "out_all"))
    stats_all = run_job(job_all)
    assert "correction" not in stats_all["outputs"]
    res_all = ray.data.read_parquet(stats_all["outputs"]["result"]).to_pandas()
    assert len(res_all) >= 10

    # predictions-BEST: exactly one scored prediction per feature, with a
    # checkpointed run (evaluate mode through the resume machinery)
    job_best = AlignJob(input_thematic=tpath,
                        reference={"loader": "parquet", "path": rpath},
                        predictions="BEST", max_relevant_distance=2.0,
                        od_strategy="EXCLUDE", checkpoint=True,
                        workfolder=str(tmp_path / "out_best"))
    stats_best = run_job(job_best)
    res_best = ray.data.read_parquet(stats_best["outputs"]["result"]).to_pandas()
    assert len(res_best) == 10
    assert (res_best["brdr_prediction_score"] > 0).all()
    assert res_best["theme_id"].is_unique
    corr_best = ray.data.read_parquet(stats_best["outputs"]["correction"]).to_pandas()
    assert len(corr_best) == 10


def test_admission_guard(ray_session, tmp_path):
    from brdrq_ray.config import AlignJob, run_job

    theme = fx.make_thematic_table(nx=8, ny=8, seed=42, n_features=10)
    ref = fx.make_reference_table(nx=8, ny=8, seed=42)
    tpath = str(tmp_path / "theme.parquet")
    rpath = str(tmp_path / "ref.parquet")
    pq.write_table(theme, tpath)
    pq.write_table(ref, rpath)
    job = AlignJob(input_thematic=tpath,
                   reference={"loader": "parquet", "path": rpath},
                   max_union_area_m2=1.0,
                   workfolder=str(tmp_path / "out2"))
    with pytest.raises(ValueError, match="admission cap"):
        run_job(job)


def test_align_job_simplify_tolerance(ray_session, tmp_path):
    """Egress simplification knob: same rows, fewer-or-equal vertices per
    result geometry, default run byte-identical to the knob at None."""
    from brdrq_ray.config import AlignJob, run_job
    from brdrq_ray.geom import core as g

    theme = fx.make_thematic_table(nx=8, ny=8, seed=42, n_features=10)
    ref = fx.make_reference_table(nx=8, ny=8, seed=42)
    tpath = str(tmp_path / "theme.parquet")
    rpath = str(tmp_path / "ref.parquet")
    pq.write_table(theme, tpath)
    pq.write_table(ref, rpath)

    base = dict(input_thematic=tpath,
                reference={"loader": "parquet", "path": rpath},
                relevant_distance=2.0, od_strategy="EXCLUDE",
                checkpoint=False)
    plain = run_job(AlignJob(**base, workfolder=str(tmp_path / "o0")))
    simp = run_job(AlignJob(**base, simplify_tolerance=1.0,
                            workfolder=str(tmp_path / "o1")))

    import ray.data

    def verts(path):
        df = (ray.data.read_parquet(path).to_pandas()
              .sort_values("theme_id").reset_index(drop=True))
        n = []
        for w in df["geometry_wkt"]:
            kind, parts = g.parse_wkt(w)
            n.append(sum(len(r) for rings in parts for r in rings))
        return df, n

    d0, n0 = verts(plain["outputs"]["result"])
    d1, n1 = verts(simp["outputs"]["result"])
    assert list(d0["theme_id"]) == list(d1["theme_id"])  # same rows
    assert all(b <= a for a, b in zip(n0, n1))
    assert sum(n1) < sum(n0)  # something actually simplified
    # simplified geometries stay valid: make_valid is a no-op on them
    for w in d1["geometry_wkt"]:
        kind, parts = g.parse_wkt(w)
        k2, p2 = g.make_valid(kind, parts)
        assert g.geom_area(k2, p2) == pytest.approx(
            g.geom_area(kind, parts), rel=1e-9)
    # knob at None is the default path (JSON roundtrip carries the field)
    job = AlignJob(**base, workfolder="x")
    assert AlignJob.from_json(job.to_json()) == job

import numpy as np
import pyarrow as pa
import pytest

import brdrq_ray.alignment as al
from brdrq_ray.geom import core as g
from brdrq_ray.sources import fixtures as fx


@pytest.fixture(scope="module")
def synth_tables():
    ref = fx.make_reference_table(nx=12, ny=12, seed=42)
    theme = fx.make_thematic_table(nx=12, ny=12, seed=42, n_features=25)
    return theme, ref


def test_fixture_determinism(synth_tables):
    theme, ref = synth_tables
    theme2 = fx.make_thematic_table(nx=12, ny=12, seed=42, n_features=25)
    assert theme.equals(theme2)
    assert ref.num_rows > 100
    assert theme.num_rows == 25


def test_alignment_pipeline_predict(ray_session, synth_tables):
    import ray.data
    from brdrq_ray.pipelines.autocorrect import run_alignment, select_result_type

    theme, ref = synth_tables
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)
    results = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                            cfg, mode="predict")
    tbl = pa.Table.from_pandas(results.to_pandas())
    # one row per thematic feature (owner-cell rule -> no duplicates)
    assert tbl.num_rows == theme.num_rows
    assert sorted(tbl.column("theme_id").to_pylist()) == sorted(theme.column("theme_id").to_pylist())
    # jittered unions of parcels must be recovered as full parcels
    full = tbl.column("brdr_full_actual").to_pylist()
    assert sum(full) >= theme.num_rows * 0.8
    # brute-force oracle: same result per feature with ALL parcels as candidates
    parcels, _ = fx.make_reference_parts(nx=12, ny=12, seed=42)
    cands = sorted(parcels.items())
    by_id = {}
    for i in range(theme.num_rows):
        tid = theme.column("theme_id")[i].as_py()
        _, parts = g.parse_wkt(theme.column("geometry_wkt")[i].as_py())
        _, parts = g.make_valid(g.GEOM_POLYGON, parts)
        pr = al.align_one(parts, cands, 2.0, cfg)
        by_id[tid] = g.geom_area(g.GEOM_POLYGON, pr.result)
    for i in range(tbl.num_rows):
        tid = tbl.column("theme_id")[i].as_py()
        got = tbl.column("brdr_area")[i].as_py()
        assert got == pytest.approx(by_id[tid], rel=1e-6, abs=1e-4), tid
    # result projection emits WKT and keeps all rows
    res_layer = select_result_type(
        run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref), cfg), "result")
    pdf = res_layer.to_pandas()
    assert "geometry_wkt" in pdf.columns
    assert len(pdf) == theme.num_rows


def test_alignment_pipeline_evaluate(ray_session, synth_tables):
    import ray.data
    from brdrq_ray.pipelines.autocorrect import run_alignment

    theme, ref = synth_tables
    cfg = al.AlignConfig(od_strategy=al.OD_EXCLUDE, max_predictions=4)
    results = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                            cfg, mode="evaluate", max_rd=3.0)
    pdf = results.to_pandas()
    # every feature got at least one prediction
    assert set(pdf["theme_id"]) == set(theme.column("theme_id").to_pylist())
    assert (pdf["brdr_prediction_score"] > 0).all()
    assert pdf["brdr_evaluation"].isin([
        al.EV_PREDICTION_UNIQUE, al.EV_TO_CHECK_MULTI, al.EV_NO_CHANGE,
        al.EV_EQUALITY_BY_ID, al.EV_EQUALITY_FULL_REF]).all()
    # distances are 0.1-rounded keys
    assert (np.round(pdf["brdr_relevant_distance"] * 10) ==
            pdf["brdr_relevant_distance"] * 10).all()
    # per-feature prediction_count consistent with rows
    counts = pdf.groupby("theme_id").size()
    reported = pdf.groupby("theme_id")["brdr_prediction_count"].first()
    assert (counts == reported).all()


def test_shuffle_and_broadcast_paths_agree(ray_session, synth_tables):
    """The 100-TB shuffle-replication path and the small-reference broadcast
    fast path must produce identical results."""
    import ray.data
    from brdrq_ray.pipelines.autocorrect import run_alignment

    theme, ref = synth_tables
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)
    a = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                      cfg, broadcast_reference=False).to_pandas()
    b = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                      cfg, broadcast_reference=True).to_pandas()
    a = a.sort_values("theme_id").reset_index(drop=True)
    b = b.sort_values("theme_id").reset_index(drop=True)
    assert (a["theme_id"] == b["theme_id"]).all()
    assert (a["brdr_area"] == b["brdr_area"]).all()          # bit-identical
    assert (a["result_geom"] == b["result_geom"]).all()
    assert (a["brdr_metadata"] == b["brdr_metadata"]).all()


def test_sampled_planning(ray_session, synth_tables):
    """plan_sample < 1 plans from a seeded sample; results identical to the
    full-scan plan (level may be coarser via the safety margin — never finer),
    with a runtime guard against missed oversized features."""
    import ray.data
    from brdrq_ray.pipelines.autocorrect import prepare_aligned_inputs, run_alignment
    from brdrq_ray.stages.align_stage import AlignGroupFn

    theme, ref = synth_tables
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)
    unified, plan, handle, _ = prepare_aligned_inputs(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref), 2.0,
        plan_sample=0.5, broadcast_reference=False)
    fn = AlignGroupFn(cfg, ref_broadcast=handle)
    res = unified.groupby("part_key").map_groups(
        lambda g: fn(g), batch_format="pyarrow").to_pandas()
    assert len(res) == theme.num_rows
    # same per-feature areas as the exact-plan run
    exact = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                          cfg, broadcast_reference=False).to_pandas()
    a = res.sort_values("theme_id")["brdr_area"].to_numpy()
    b = exact.sort_values("theme_id")["brdr_area"].to_numpy()
    assert (a == b).all()


def test_oversized_feature_routing(ray_session, synth_tables):
    """A feature the sampled plan missed is ROUTED through its own exact-plan
    fallback DAG instead of failing fast: the union result is identical to
    the exact full-scan plan (sampled planning is total)."""
    import ray.data
    from brdrq_ray.pipelines.autocorrect import (
        TilePlan, plan_tiles, prepare_aligned_inputs, run_alignment)
    from brdrq_ray.stages.ingest import parse_geometries

    theme, ref = synth_tables
    # add one giant feature spanning many cells (the kind a sample misses)
    giant_wkt = ("POLYGON ((100000 150000, 105000 150000, 105000 155000, "
                 "100000 155000, 100000 150000))")
    theme_g = pa.table({
        "theme_id": theme.column("theme_id").to_pylist() + ["GIANT"],
        "geometry_wkt": theme.column("geometry_wkt").to_pylist() + [giant_wkt],
    })
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)

    exact = (run_alignment(ray.data.from_arrow(theme_g), ray.data.from_arrow(ref),
                           cfg, broadcast_reference=False)
             .to_pandas().sort_values("theme_id").reset_index(drop=True))

    # deterministically force the miss: plan for the SMALL features only, then
    # feed the full table with that plan's level via plan_override + sampling
    parsed_small = ray.data.from_arrow(theme).map_batches(
        parse_geometries, batch_format="pyarrow")
    small_plan = plan_tiles(parsed_small, 2.0)
    override = TilePlan(level=small_plan.level, salts=small_plan.salts,
                        max_extent=small_plan.max_extent,
                        n_features=small_plan.n_features)
    unified, _, handle, oversized = prepare_aligned_inputs(
        ray.data.from_arrow(theme_g), ray.data.from_arrow(ref), 2.0,
        plan_sample=0.99, plan_override=override, oversize_policy="route",
        broadcast_reference=False)
    assert oversized is not None
    over_ids = oversized.to_pandas()["theme_id"].tolist()
    assert over_ids == ["GIANT"]  # exactly the violator routed

    # end-to-end: sampled plan + routing reproduces the exact-plan result
    routed = (run_alignment(ray.data.from_arrow(theme_g), ray.data.from_arrow(ref),
                            cfg, broadcast_reference=False, plan_sample=0.5)
              .to_pandas().sort_values("theme_id").reset_index(drop=True))
    assert (routed["theme_id"] == exact["theme_id"]).all()
    assert (routed["brdr_area"] == exact["brdr_area"]).all()
    assert (routed["result_geom"] == exact["result_geom"]).all()


def test_slots_projection_reduces_schema_and_bytes(ray_session, synth_tables):
    """slots= selects which geometry result columns are materialized
    (reference emits relevant_intersection/diff only under
    SHOW_INTERMEDIATE_LAYERS, brdrq_algorithm_autocorrectborders.py:671-689):
    the reduced schema drops exactly the unselected *_geom columns, the
    shared columns are byte-identical to the default run, and the packed
    payload shrinks."""
    import ray.data
    from brdrq_ray.pipelines.autocorrect import run_alignment
    from brdrq_ray.stages.align_stage import ALL_SLOTS, result_schema

    theme, ref = synth_tables
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)
    full = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                         cfg).to_pandas().sort_values("theme_id").reset_index(drop=True)
    lean = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                         cfg, slots=("result",)).to_pandas() \
        .sort_values("theme_id").reset_index(drop=True)

    assert list(full.columns) == list(result_schema(ALL_SLOTS).names)
    assert list(lean.columns) == list(result_schema(("result",)).names)
    dropped = {f"{s}_geom" for s in ALL_SLOTS} - {"result_geom"}
    assert dropped.isdisjoint(lean.columns) and dropped <= set(full.columns)
    # shared columns identical (the projection changes bytes, not values)
    for c in lean.columns:
        assert full[c].equals(lean[c]), c
    # real byte savings on the packed geometry payload
    full_bytes = sum(full[c].map(len).sum() for c in full.columns
                     if c.endswith("_geom"))
    lean_bytes = lean["result_geom"].map(len).sum()
    assert lean_bytes < full_bytes


def test_select_result_type_on_reduced_slots_raises(ray_session, synth_tables):
    """Requesting a slot that the alignment did not materialize fails with a
    clear message instead of a KeyError deep in a batch task."""
    import ray.data
    from brdrq_ray.pipelines.autocorrect import run_alignment, select_result_type

    theme, ref = synth_tables
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)
    lean = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                         cfg, slots=("result",))
    with pytest.raises(ValueError, match="not materialized"):
        select_result_type(lean, "result_diff")
    # the materialized slot still projects fine
    out = select_result_type(lean, "result").to_pandas()
    assert "geometry_wkt" in out.columns and len(out) > 0


def test_unknown_slot_rejected_driver_side():
    """A misspelled slots= entry fails fast in result_schema with the valid
    names, never as a KeyError inside a remote group task."""
    from brdrq_ray.stages.align_stage import result_schema

    with pytest.raises(ValueError, match="unknown result slot"):
        result_schema(("result_dif",))

import numpy as np
import pytest

from brdrq_ray import alignment as al
from brdrq_ray.geom import core as g


def sq(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=float)


def area(parts):
    return g.geom_area(g.GEOM_POLYGON, parts)


P1 = [[sq(0, 0, 10, 10)]]
P2 = [[sq(10, 0, 20, 10)]]
CANDS = [("P1", P1), ("P2", P2)]
CFG = al.AlignConfig(relevant_distance=2.0)


def test_identity_at_zero():
    theme = [[sq(0.5, 0.3, 9.4, 9.6)]]
    pr = al.align_one(theme, CANDS, 0.0, CFG)
    assert pr.fingerprint == ("identity",)
    assert area(pr.result) == pytest.approx(area(theme))


def test_jittered_parcel_recovers_reference():
    theme = [[sq(0.5, -0.5, 9.6, 10.4)]]  # jittered P1
    pr = al.align_one(theme, CANDS, 2.0, al.AlignConfig(od_strategy=al.OD_EXCLUDE))
    assert pr.used_refs == [("P1", "full")]
    assert area(pr.result) == pytest.approx(100.0)
    assert pr.full_actual
    # diff slots are consistent: diff = plus + min
    assert area(pr.result_diff) == pytest.approx(
        area(pr.result_diff_plus) + area(pr.result_diff_min), rel=1e-6)


def test_sliver_overlap_excluded():
    # covers P1 deeply, pokes 0.4 m into P2
    theme = [[sq(0.2, 0.1, 10.4, 9.9)]]
    pr = al.align_one(theme, CANDS, 2.0, al.AlignConfig(od_strategy=al.OD_EXCLUDE))
    assert ("P1", "full") in pr.used_refs
    assert all(r[0] != "P2" for r in pr.used_refs)
    assert area(pr.relevant_diff) > 0  # the sliver was classified irrelevant
    assert area(pr.result) == pytest.approx(100.0)


def test_two_parcels_covered():
    theme = [[sq(-0.3, 0.4, 20.2, 9.8)]]
    pr = al.align_one(theme, CANDS, 2.0, al.AlignConfig(od_strategy=al.OD_EXCLUDE))
    assert sorted(r[0] for r in pr.used_refs) == ["P1", "P2"]
    assert area(pr.result) == pytest.approx(200.0)


def test_open_domain_as_is_vs_exclude():
    # theme extends 5 m left of P1 into no-reference land
    theme = [[sq(-5, 0, 9.8, 10)]]
    pr_ex = al.align_one(theme, CANDS, 2.0, al.AlignConfig(od_strategy=al.OD_EXCLUDE))
    pr_as = al.align_one(theme, CANDS, 2.0, al.AlignConfig(od_strategy=al.OD_AS_IS))
    assert area(pr_ex.result) == pytest.approx(100.0)
    assert area(pr_as.result) == pytest.approx(150.0, rel=0.01)
    assert not pr_as.full_actual
    assert "od_excluded" in pr_ex.remark


def test_threshold_overlap_fallback():
    # shallow pancake overlap over most of P2: inradius small relative to rd
    # but overlap 60% of parcel -> included by threshold rule
    theme = [[sq(10, 0, 16, 10)]]  # covers 60% of P2, deep though
    cfg = al.AlignConfig(od_strategy=al.OD_EXCLUDE, threshold_overlap_percentage=50.0)
    pr = al.align_one(theme, [("P2", P2)], 8.0, cfg)  # rd=8 -> inradius 3 < 4
    assert pr.used_refs and pr.used_refs[0][0] == "P2"


def test_no_candidates():
    theme = [[sq(100, 100, 105, 105)]]
    pr = al.align_one(theme, [], 2.0, al.AlignConfig(od_strategy=al.OD_AS_IS))
    assert area(pr.result) == pytest.approx(25.0)
    pr2 = al.align_one(theme, [], 2.0, al.AlignConfig(od_strategy=al.OD_EXCLUDE))
    assert pr2.result == []


def test_distance_grid():
    grid = al.distance_grid(3.0)
    assert grid[0] == 0.0 and grid[-1] == 3.0
    assert len(grid) == 31
    assert al.distance_grid(1.0, step_cm=50) == [0.0, 0.5, 1.0]


def test_escalated_step():
    assert al.escalated_step_cm(50_000, 3.0) == 10
    assert al.escalated_step_cm(200_000, 3.0) == 20
    assert al.escalated_step_cm(50_000, 8.0) == 20
    assert al.escalated_step_cm(2_000_000, 3.0) == 50


def test_evaluate_series_stable_prediction():
    theme = [[sq(0.4, -0.4, 9.7, 10.3)]]
    grid = al.distance_grid(3.0)
    cfg = al.AlignConfig(od_strategy=al.OD_EXCLUDE, max_predictions=4)
    results, preds = al.evaluate_series("T1", theme, CANDS, grid, cfg,
                                        materialize_all=True)
    assert len(results) == len(grid)
    assert preds, "expected at least one stable prediction"
    best = preds[0]
    assert best.pr.used_refs == [("P1", "full")]
    assert best.score > 50
    assert best.evaluation in (al.EV_EQUALITY_FULL_REF, al.EV_PREDICTION_UNIQUE,
                               al.EV_TO_CHECK_MULTI)
    assert all(p.prediction_count == len(preds) for p in preds)


def test_evaluate_no_change_label():
    # theme exactly equals P1 -> aligned result == original -> no_change
    results, preds = al.evaluate_series(
        "T1", P1, CANDS, al.distance_grid(1.0), al.AlignConfig(od_strategy=al.OD_EXCLUDE))
    assert preds
    assert preds[0].evaluation == al.EV_NO_CHANGE


def test_max_predictions_cut():
    theme = [[sq(0.4, -0.4, 9.7, 10.3)]]
    grid = al.distance_grid(3.0)
    _, all_preds = al.evaluate_series("T1", theme, CANDS, grid,
                                      al.AlignConfig(max_predictions=-1, od_strategy=al.OD_EXCLUDE))
    _, one = al.evaluate_series("T1", theme, CANDS, grid,
                                al.AlignConfig(max_predictions=1, od_strategy=al.OD_EXCLUDE))
    assert len(one) == 1
    assert len(all_preds) >= len(one)


def test_od_snap_inner_collapses_sliver_overhang():
    """SNAP_INNER_SIDE: a thin open-domain overhang hugging the reference
    border snaps onto it (collapses); AS_IS keeps it. The two strategies must
    differ (r1 approximated SNAP_* as AS_IS)."""
    # P1 plus a 0.3 m strip overhanging into open domain
    theme = [[sq(0, 0, 10.3, 10)]]
    cands = [("P1", P1)]
    as_is = al.align_one(theme, cands, 1.0,
                         al.AlignConfig(od_strategy=al.OD_AS_IS))
    inner = al.align_one(theme, cands, 1.0,
                         al.AlignConfig(od_strategy=al.OD_SNAP_INNER_SIDE))
    assert area(as_is.result) == pytest.approx(103.0)
    assert area(inner.result) == pytest.approx(100.0)  # sliver snapped away
    assert "od_snapped" in inner.remark
    assert "approximated" not in inner.remark


def test_od_snap_all_smooths_every_side():
    """SNAP_ALL_SIDE additionally removes sub-rd features on the OUTWARD
    boundary (rd-scale opening); SNAP_INNER_SIDE keeps them."""
    # P1 + a 4 m-thick od blob + a 0.2 m-thin spike sticking far out
    ring = np.array([(0, 0), (14, 0), (14, 4.9), (16, 4.9), (16, 5.1),
                     (14, 5.1), (14, 10), (0, 10)], dtype=float)
    theme = [[ring]]
    cands = [("P1", P1)]
    inner = al.align_one(theme, cands, 1.0,
                         al.AlignConfig(od_strategy=al.OD_SNAP_INNER_SIDE))
    al_all = al.align_one(theme, cands, 1.0,
                          al.AlignConfig(od_strategy=al.OD_SNAP_ALL_SIDE))
    # the spike (0.2 m thin, far from the reference) survives INNER but not ALL
    assert area(inner.result) > area(al_all.result)
    assert area(al_all.result) > 100.0  # the thick blob itself survives


def test_od_snap_fingerprints_rd_dependent():
    """Snapped od varies with rd -> fingerprint_at must carry rd (and agree
    with align_prepared's fingerprint) so plateaus never conflate distinct
    snapped geometries."""
    theme = [[sq(0, 0, 10.3, 10)]]
    cands = [("P1", P1)]
    cfg = al.AlignConfig(od_strategy=al.OD_SNAP_INNER_SIDE)
    prepared, od = al.prepare_candidates(theme, cands, rd_cap=2.0)
    for rd in (0.5, 1.0, 2.0):
        fp_cheap = al.fingerprint_at(prepared, od, rd, cfg)
        fp_real = al.align_prepared(theme, prepared, od, rd, cfg).fingerprint
        assert fp_cheap == fp_real
    assert (al.fingerprint_at(prepared, od, 0.5, cfg)
            != al.fingerprint_at(prepared, od, 1.0, cfg))


def test_multi_as_single_differs_from_whole_geometry():
    """A14 multi_as_single_modus: a 2-part multipolygon whose parts each
    cover < threshold of a parcel (excluded part-wise) but together cover
    nearly all of it (relevant + full whole-geometry) must produce DIFFERENT
    results on the two paths — and the part-wise path is the reference
    default (brdrq_algorithm_common.py:89-97)."""
    theme = [[sq(0, 0, 10, 4.9)], [sq(0, 5.1, 10, 10)]]  # 49% + 49% of P1
    cfg = al.AlignConfig(relevant_distance=12.0, od_strategy=al.OD_EXCLUDE,
                         threshold_overlap_percentage=50.0)
    whole = al.align_one(theme, CANDS, 12.0, cfg)
    # combined 98% >= 50% threshold -> relevant; uncovered gap is thin -> full
    assert area(whole.result) == pytest.approx(100.0)
    pw = al.align_one_multi(theme, CANDS, 12.0, cfg)
    # each part: not deep (inradius 2.45 < rd/2) and 49% < 50% -> excluded
    assert area(pw.result) == pytest.approx(0.0)
    assert "multi_as_single" in pw.remark
    assert pw.fingerprint != whole.fingerprint


def test_multi_as_single_flag_routes_in_pipeline(ray_session):
    """The AlignConfig flag reproduces the part-wise result through the full
    alignment DAG; turning it off reproduces the whole-geometry result."""
    import pyarrow as pa
    import ray.data
    from brdrq_ray.pipelines.autocorrect import run_alignment

    theme_wkt = ("MULTIPOLYGON (((0 0, 10 0, 10 4.9, 0 4.9, 0 0)), "
                 "((0 5.1, 10 5.1, 10 10, 0 10, 0 5.1)))")
    ref_wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    theme = pa.table({"theme_id": ["T1"], "geometry_wkt": [theme_wkt]})
    ref = pa.table({"ref_id": ["R1"], "geometry_wkt": [ref_wkt]})

    def run(flag):
        cfg = al.AlignConfig(relevant_distance=12.0, od_strategy=al.OD_EXCLUDE,
                             threshold_overlap_percentage=50.0,
                             multi_as_single_modus=flag)
        return run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                             cfg).to_pandas()

    part_wise = run(True)
    whole = run(False)
    assert part_wise["brdr_area"].iloc[0] == pytest.approx(0.0)
    assert whole["brdr_area"].iloc[0] == pytest.approx(100.0)
    assert "multi_as_single" in part_wise["brdr_remark"].iloc[0]


def test_multi_as_single_merges_shared_parcel():
    """Two parts that BOTH relevantly claim the same parcel merge cleanly
    (union_many, not tessellation dissolve): result equals the parcel once."""
    theme = [[sq(0, 0, 10, 4.8)], [sq(0, 5.2, 10, 10)]]  # 48% + 48%, deep
    cfg = al.AlignConfig(relevant_distance=1.0, od_strategy=al.OD_EXCLUDE)
    pw = al.align_one_multi(theme, CANDS, 1.0, cfg)
    whole = al.align_one(theme, CANDS, 1.0, cfg)
    # both paths are partial-contribution unions; part-wise must not
    # double-count the shared parcel
    assert area(pw.result) <= 100.0 + 1e-6
    assert area(pw.result) == pytest.approx(area(whole.result), abs=1e-6)


def test_evaluate_series_multi_plateaus():
    """Part-wise evaluate: a 2-part theme jittered around two parcels finds a
    stable full-parcel prediction just like the single-part path does."""
    theme = [[sq(0.3, -0.2, 9.8, 10.3)], [sq(10.4, 0.2, 19.7, 9.8)]]
    grid = al.distance_grid(2.0)
    cfg = al.AlignConfig(od_strategy=al.OD_EXCLUDE)
    _, preds = al.evaluate_series_multi("T", theme, CANDS, grid, cfg)
    assert preds
    best = max(preds, key=lambda p: p.score)
    assert area(best.pr.result) == pytest.approx(200.0)  # both parcels, once


def test_build_metadata():
    meta = al.build_metadata("T9", [("P1", "full")], {"P1": "2021-05-01"})
    import json
    d = json.loads(meta)
    rg = d["actuation"]["reference_geometries"]
    assert rg[0]["derived_from"]["id"] == "P1"
    assert rg[0]["version_date"] == "2021-05-01"

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


def test_build_metadata():
    meta = al.build_metadata("T9", [("P1", "full")], {"P1": "2021-05-01"})
    import json
    d = json.loads(meta)
    rg = d["actuation"]["reference_geometries"]
    assert rg[0]["derived_from"]["id"] == "P1"
    assert rg[0]["version_date"] == "2021-05-01"

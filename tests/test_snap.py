import numpy as np
import pytest

from brdrq_ray import processors as procs
from brdrq_ray.alignment import AlignConfig
from brdrq_ray.geom import core as g
from brdrq_ray.geom import snap as sn


def sq(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=float)


REF = [("P1", [[sq(0, 0, 10, 10)]])]


def test_densify():
    line = np.array([(0.0, 0.0), (10.0, 0.0)])
    out = sn.densify_line(line, 2.0)
    assert len(out) == 6
    assert np.allclose(np.diff(out[:, 0]), 2.0)


def test_snap_no_preference_projects_to_boundary():
    pts = np.array([(5.0, 0.4), (5.0, 5.0)])  # near bottom edge; deep inside
    kind, parts, moved = sn.snap_geometry(
        g.GEOM_POINT, [[pts[:1]], [pts[1:]]], [REF[0][1]], rd=1.0,
        strategy=sn.SNAP_NO_PREFERENCE)
    assert moved == 1
    assert np.allclose(parts[0][0][0], (5.0, 0.0))   # projected to edge
    assert np.allclose(parts[1][0][0], (5.0, 5.0))   # too far -> unchanged


def test_snap_prefer_vertices():
    pts = np.array([(0.5, 0.6)])  # near corner (0,0) and edges
    kind, parts, moved = sn.snap_geometry(
        g.GEOM_POINT, [[pts]], [REF[0][1]], rd=1.0,
        strategy=sn.SNAP_PREFER_VERTICES)
    assert np.allclose(parts[0][0][0], (0.0, 0.0))   # vertex wins


def test_snap_only_vertices_no_target():
    pts = np.array([(5.0, 0.4)])  # near an edge but no vertex within rd
    kind, parts, moved = sn.snap_geometry(
        g.GEOM_POINT, [[pts]], [REF[0][1]], rd=1.0,
        strategy=sn.SNAP_ONLY_VERTICES)
    assert moved == 0
    assert np.allclose(parts[0][0][0], (5.0, 0.4))


def test_snap_line_follows_border():
    # a line roughly along the bottom border, jittered by ~0.3
    line = np.array([(1.0, 0.3), (4.0, -0.25), (8.0, 0.2), (9.0, -0.3)])
    kind, parts, moved = sn.snap_geometry(
        g.GEOM_LINESTRING, [[line]], [REF[0][1]], rd=1.0,
        strategy=sn.SNAP_NO_PREFERENCE, max_segment_length=2.0)
    snapped = parts[0][0]
    assert moved >= 4
    assert np.abs(snapped[:, 1]).max() < 1e-9  # all on y=0 edge


def test_processor_registry():
    cfg = AlignConfig()
    assert isinstance(procs.get_processor_by_id("2024:aligner2024a")(cfg),
                      procs.OverlapProcessor)
    assert isinstance(procs.get_processor_by_id("2024:network2024a")(cfg),
                      procs.NetworkProcessor)
    with pytest.raises(KeyError):
        procs.get_processor_by_id("nope")
    # dieussaert has a real body since r4 session 5 (engine-defined: the
    # overlap kernel with od_strategy forced to EXCLUDE — SEMANTICS.md 14c)
    dieu = procs.get_processor_by_id("2024:dieussaert2024a")(cfg)
    assert isinstance(dieu, procs.OverlapProcessor)
    assert dieu.cfg.od_strategy == "EXCLUDE"
    with pytest.raises(TypeError):
        dieu.align("L0", g.GEOM_LINESTRING, [], [], 1.0)
    # topology has a real body since r4 session 5 (engine-defined semantics)
    topo = procs.get_processor_by_id("2024:topology2024a")
    assert isinstance(topo(cfg), procs.OverlapProcessor)
    assert topo.post_pass == "topology"


def test_snap_processor_via_align_stage(ray_session):
    import pyarrow as pa
    import ray.data
    from brdrq_ray.pipelines.autocorrect import run_alignment
    from brdrq_ray.sources import fixtures as fx

    ref = fx.make_reference_table(nx=8, ny=8, seed=42)
    # build line themes from jittered reference parcel bottom edges
    parcels, _ = fx.make_reference_parts(nx=8, ny=8, seed=42)
    rng = np.random.default_rng(1)
    ids, wkts = [], []
    for k, (rid, parts) in enumerate(sorted(parcels.items())[:10]):
        ring = parts[0][0]
        line = ring[:3] + rng.uniform(-0.3, 0.3, size=(3, 2))
        ids.append(f"L{k}")
        wkts.append(g.to_wkt(g.GEOM_LINESTRING, [[g.snap(line)]]))
    theme = pa.table({"theme_id": ids, "geometry_wkt": wkts})
    cfg = AlignConfig(relevant_distance=1.0, snap_strategy="PREFER_VERTICES")
    res = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref), cfg)
    pdf = res.to_pandas()
    assert len(pdf) == 10
    assert pdf["brdr_remark"].str.startswith("snapped:").all()
    assert (pdf["brdr_perimeter"] > 0).all()
    assert (pdf["brdr_area"] == 0).all()  # lines have no area

def test_partial_snapping_polygon_alignment():
    """A7/A14 adjunct — partial_snapping (reference ProcessorConfig fields,
    brdrq_dockwidget_featurealigner.py:1513-1522; flag hardcoded off in the
    reference UI, brdrq_settings.py:294): when ON, the aligned boundary's
    vertices within rd are additionally snapped onto reference vertices and
    the remark records the move count; default OFF is byte-identical to the
    pre-feature behavior."""
    from brdrq_ray.alignment import align_one

    # theme slightly overhangs parcel P1 (10x10) -> 'partial' contribution;
    # its corners sit within rd of P1's corners
    theme = [[sq(0.3, 0.4, 9.6, 9.5)]]
    cands = [("P1", [[sq(0, 0, 10, 10)]])]

    base_cfg = AlignConfig(relevant_distance=1.0, od_strategy="EXCLUDE")
    pr_off = align_one(theme, cands, 1.0, base_cfg)
    assert "partial_snap" not in pr_off.remark

    cfg = AlignConfig(relevant_distance=1.0, od_strategy="EXCLUDE",
                      partial_snapping=True,
                      partial_snap_strategy="PREFER_VERTICES")
    pr_on = align_one(theme, cands, 1.0, cfg)
    assert "partial_snap:" in pr_on.remark
    # every result vertex within rd of a P1 vertex landed exactly on it
    ref_corners = sq(0, 0, 10, 10)
    res_pts = np.vstack([r for p in pr_on.result for r in p])
    d = np.min(np.hypot(res_pts[:, None, 0] - ref_corners[None, :, 0],
                        res_pts[:, None, 1] - ref_corners[None, :, 1]), axis=1)
    assert (d < 1e-9).any()          # some vertices snapped onto corners
    # diff slots were recomputed against the snapped result
    a_plus = g.geom_area(g.GEOM_POLYGON, pr_on.result_diff_plus)
    a_min = g.geom_area(g.GEOM_POLYGON, pr_on.result_diff_min)
    a_sym = g.geom_area(g.GEOM_POLYGON, pr_on.result_diff)
    assert a_sym == pytest.approx(a_plus + a_min, abs=1e-6)
    # the fingerprint stays the PRE-SNAP core outcome (plateau detection
    # needs it rd-stable); geometry caches must not share across a plateau
    # instead — covered by test_partial_snapping_evaluate_materializes_per_rd
    assert pr_on.fingerprint == align_one(theme, cands, 0.8, cfg).fingerprint
    assert [r.tolist() for p in pr_on.result for r in p] != \
        [r.tolist() for p in align_one(theme, cands, 0.4, cfg).result for r in p]


def test_partial_snapping_job_roundtrip():
    """AlignJob carries the partial-snap fields through align_config()."""
    from brdrq_ray.config import AlignJob

    job = AlignJob(partial_snapping=True, partial_snap_strategy="ONLY_VERTICES",
                   partial_snap_max_segment_length=1.5)
    cfg = job.align_config()
    assert cfg.partial_snapping is True
    assert cfg.partial_snap_strategy == "ONLY_VERTICES"
    assert cfg.partial_snap_max_segment_length == 1.5
    job2 = AlignJob.from_json(job.to_json())
    assert job2.partial_snapping is True


def test_partial_snapping_evaluate_materializes_per_rd():
    """Regression: evaluate-mode plateau caching must NOT share one rd's
    snapped geometry across the grid — with partial_snapping ON the cheap
    fingerprint is rd-dependent (same conservative rule as align_prepared),
    so every materialized result equals align_one at its exact rd."""
    from brdrq_ray.alignment import AlignConfig, align_one, evaluate_series

    theme = [[sq(0.3, 0.4, 9.6, 9.5)]]
    cands = [("P1", [[sq(0, 0, 10, 10)]])]
    cfg = AlignConfig(relevant_distance=1.0, od_strategy="EXCLUDE",
                      partial_snapping=True,
                      partial_snap_strategy="PREFER_VERTICES")
    distances = [0.2, 0.4, 0.6, 0.8, 1.0]
    all_results, _ = evaluate_series("T1", theme, cands, distances, cfg,
                                     materialize_all=True)
    assert len(all_results) == len(distances)
    moved = 0
    for rd, pr in zip(distances, all_results):
        ref = align_one(theme, cands, rd, cfg)
        assert pr.rd == ref.rd
        got = [r.tolist() for p in pr.result for r in p]
        want = [r.tolist() for p in ref.result for r in p]
        assert got == want, f"rd={rd}: plateau cache leaked another rd's snap"
        if "partial_snap" in ref.remark:
            moved += 1
    assert moved >= 2  # the fixture actually snaps at several distances

    # predictions mode: plateau detection runs on the PRE-SNAP core
    # fingerprint, so stability plateaus (and therefore predictions) still
    # exist with partial_snapping on — the rd-forced-fingerprint variant
    # would emit zero predictions for every feature with candidates
    _, preds = evaluate_series("T1", theme, cands, distances, cfg,
                               materialize_all=False)
    assert len(preds) >= 1
    # and the prediction geometry is snapped at its own representative rd
    rep = preds[0]
    ref = align_one(theme, cands, rep.rd, cfg)
    assert [r.tolist() for p in rep.pr.result for r in p] == \
           [r.tolist() for p in ref.result for r in p]


def test_dieussaert_processor_end_to_end(ray_session):
    """Engine-defined semantic (SEMANTICS.md 14c): the Dieussaert id runs
    the overlap kernel with od_strategy forced to EXCLUDE, regardless of
    the configured strategy."""
    import pyarrow as pa
    import ray.data

    from brdrq_ray.pipelines.autocorrect import run_alignment
    from brdrq_ray.sources import fixtures as fx

    theme = fx.make_thematic_table(nx=8, ny=8, seed=11, n_features=12)
    ref = fx.make_reference_table(nx=8, ny=8, seed=11)
    dieu = run_alignment(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref),
        AlignConfig(relevant_distance=2.0, od_strategy="AS_IS",
                    processor_id=procs.PROCESSOR_DIEUSSAERT)).to_pandas()
    excl = run_alignment(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref),
        AlignConfig(relevant_distance=2.0, od_strategy="EXCLUDE")).to_pandas()
    asis = run_alignment(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref),
        AlignConfig(relevant_distance=2.0, od_strategy="AS_IS")).to_pandas()
    key = ["theme_id"]
    dieu = dieu.sort_values(key).reset_index(drop=True)
    excl = excl.sort_values(key).reset_index(drop=True)
    asis = asis.sort_values(key).reset_index(drop=True)
    assert list(dieu.result_geom) == list(excl.result_geom)
    # and the forced EXCLUDE is load-bearing: AS_IS differs on this fixture
    assert list(dieu.result_geom) != list(asis.result_geom)

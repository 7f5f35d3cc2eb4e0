import os
import shutil

import pytest

from brdrq_ray import alignment as al
from brdrq_ray.sources import fixtures as fx


def test_checkpoint_resume(ray_session, tmp_path):
    import ray.data
    from brdrq_ray.state.checkpoint import (
        read_manifest, read_results, run_alignment_checkpointed)

    ref = fx.make_reference_table(nx=12, ny=12, seed=42)
    theme = fx.make_thematic_table(nx=12, ny=12, seed=42, n_features=25)
    out = str(tmp_path / "ckpt")
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)

    stats1 = run_alignment_checkpointed(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref), out, cfg)
    assert stats1["rows"] == theme.num_rows
    assert stats1["skipped_parts"] == []
    full = read_results(out).to_pandas().sort_values("theme_id").reset_index(drop=True)
    assert len(full) == theme.num_rows

    # immediate re-run: everything skipped, nothing recomputed
    stats2 = run_alignment_checkpointed(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref), out, cfg)
    assert stats2["processed_parts"] == []
    assert set(stats2["skipped_parts"]) == set(stats1["processed_parts"])

    # kill simulation: destroy two partitions' data (manifest rows survive but
    # point at missing files -> treated as unfinished)
    victims = stats1["processed_parts"][:2]
    for pk in victims:
        shutil.rmtree(os.path.join(out, f"part={pk}"))
    stats3 = run_alignment_checkpointed(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref), out, cfg)
    assert sorted(stats3["processed_parts"]) == sorted(victims)
    # final result identical to the pre-kill full run
    again = read_results(out).to_pandas().sort_values("theme_id").reset_index(drop=True)
    assert sorted(again["theme_id"]) == sorted(full["theme_id"])
    assert (again.set_index("theme_id")["brdr_area"].round(6)
            == full.set_index("theme_id")["brdr_area"].round(6)).all()

    # changed params -> old checkpoints invalid, everything recomputed
    cfg2 = al.AlignConfig(relevant_distance=1.0, od_strategy=al.OD_EXCLUDE)
    stats4 = run_alignment_checkpointed(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref), out, cfg2)
    assert stats4["skipped_parts"] == []
    assert len(stats4["processed_parts"]) > 0


def test_checkpoint_param_change_no_stale_mix(ray_session, tmp_path):
    """A re-run with changed params in the SAME out_dir must purge old-param
    part dirs: read_results returns exactly the fresh rows, never a mix
    (ADVICE r1: listdir-based read_results leaked stale partitions)."""
    import ray.data
    from brdrq_ray.state.checkpoint import (
        read_results, run_alignment_checkpointed)

    ref = fx.make_reference_table(nx=12, ny=12, seed=42)
    theme = fx.make_thematic_table(nx=12, ny=12, seed=42, n_features=25)
    out = str(tmp_path / "ckpt")

    run_alignment_checkpointed(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref), out,
        al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE))
    # different params -> different phash AND (via a different plan in
    # general) possibly different part keys; the old dirs must not survive
    stats2 = run_alignment_checkpointed(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref), out,
        al.AlignConfig(relevant_distance=1.0, od_strategy=al.OD_EXCLUDE))
    df = read_results(out, phash=stats2["params_hash"]).to_pandas()
    assert len(df) == theme.num_rows
    assert not df["theme_id"].duplicated().any()
    assert (df["brdr_relevant_distance"] == 1.0).all()
    # read_results without a phash filter must ALSO be clean (purge removed
    # the stale dirs physically)
    df_all = read_results(out).to_pandas()
    assert len(df_all) == theme.num_rows
    assert (df_all["brdr_relevant_distance"] == 1.0).all()


def test_checkpoint_midrun_kill_without_driver_manifest(ray_session, tmp_path):
    """A kill before the driver-side jsonl append must still resume from the
    per-partition _rec.json records: only genuinely unfinished tiles replay
    (ADVICE r1: driver-only manifest made every kill a full recompute)."""
    import os
    import shutil

    import ray.data
    from brdrq_ray.state.checkpoint import (
        read_results, run_alignment_checkpointed)

    ref = fx.make_reference_table(nx=12, ny=12, seed=42)
    theme = fx.make_thematic_table(nx=12, ny=12, seed=42, n_features=25)
    out = str(tmp_path / "ckpt")
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)

    stats1 = run_alignment_checkpointed(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref), out, cfg)
    full = read_results(out, phash=stats1["params_hash"]).to_pandas()

    # simulate the kill: the driver never appended the jsonl, and one tile
    # never finished (its dir is gone)
    os.remove(os.path.join(out, "_manifest.jsonl"))
    victim = stats1["processed_parts"][0]
    shutil.rmtree(os.path.join(out, f"part={victim}"))

    stats2 = run_alignment_checkpointed(
        ray.data.from_arrow(theme), ray.data.from_arrow(ref), out, cfg)
    assert stats2["processed_parts"] == [victim]
    assert sorted(stats2["skipped_parts"]) == sorted(
        pk for pk in stats1["processed_parts"] if pk != victim)
    again = (read_results(out, phash=stats2["params_hash"]).to_pandas()
             .sort_values("theme_id").reset_index(drop=True))
    full = full.sort_values("theme_id").reset_index(drop=True)
    assert sorted(again["theme_id"]) == sorted(full["theme_id"])
    assert (again.set_index("theme_id")["brdr_area"].round(6)
            == full.set_index("theme_id")["brdr_area"].round(6)).all()


def test_checkpoint_sampled_plan_with_oversized_routing(ray_session, tmp_path):
    """A checkpointed run with a sampled plan routes sample-missed giants
    through the exact-plan fallback DAG into the SAME checkpoint dir (keys
    disjoint via the level bits), resumes either DAG's tiles, and matches the
    exact-plan run row for row."""
    import pyarrow as pa
    import ray.data
    from brdrq_ray.state.checkpoint import (
        read_results, run_alignment_checkpointed)

    ref = fx.make_reference_table(nx=12, ny=12, seed=42)
    theme = fx.make_thematic_table(nx=12, ny=12, seed=42, n_features=25)
    giant_wkt = ("POLYGON ((100000 150000, 105000 150000, 105000 155000, "
                 "100000 155000, 100000 150000))")
    theme_g = pa.table({
        "theme_id": theme.column("theme_id").to_pylist() + ["GIANT"],
        "geometry_wkt": theme.column("geometry_wkt").to_pylist() + [giant_wkt],
    })
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)

    exact_dir = str(tmp_path / "exact")
    se = run_alignment_checkpointed(ray.data.from_arrow(theme_g),
                                    ray.data.from_arrow(ref), exact_dir, cfg)
    exact = (read_results(exact_dir, phash=se["params_hash"]).to_pandas()
             .sort_values("theme_id").reset_index(drop=True))

    out = str(tmp_path / "sampled")
    s1 = run_alignment_checkpointed(ray.data.from_arrow(theme_g),
                                    ray.data.from_arrow(ref), out, cfg,
                                    plan_sample=0.5)
    got = (read_results(out, phash=s1["params_hash"]).to_pandas()
           .sort_values("theme_id").reset_index(drop=True))
    assert sorted(got["theme_id"]) == sorted(exact["theme_id"])
    assert (got.set_index("theme_id")["brdr_area"].round(6)
            == exact.set_index("theme_id")["brdr_area"].round(6)).all()

    # find the GIANT's partition; kill it; resume must replay only that part
    import os
    import shutil

    import pyarrow.parquet as ppq
    giant_part = None
    for pk in s1["processed_parts"]:
        t = ppq.read_table(os.path.join(out, f"part={pk}", "part.parquet"),
                           columns=["theme_id"])
        if "GIANT" in t.column("theme_id").to_pylist():
            giant_part = pk
    if giant_part is not None:  # sampling may have caught the giant (coarse plan)
        shutil.rmtree(os.path.join(out, f"part={giant_part}"))
        s2 = run_alignment_checkpointed(ray.data.from_arrow(theme_g),
                                        ray.data.from_arrow(ref), out, cfg,
                                        plan_sample=0.5)
        assert s2["processed_parts"] == [giant_part]
        again = (read_results(out, phash=s2["params_hash"]).to_pandas()
                 .sort_values("theme_id").reset_index(drop=True))
        assert sorted(again["theme_id"]) == sorted(exact["theme_id"])


def test_manifest_appends_stream_during_run(ray_session, tmp_path, monkeypatch):
    """The driver jsonl must GROW during the run (one append per finished
    batch of partitions), not arrive as a single post-hoc append — a mid-run
    kill then keeps every finished partition's driver-side lineage."""
    import ray.data
    from brdrq_ray.state import checkpoint as ck

    ref = fx.make_reference_table(nx=12, ny=12, seed=7)
    theme = fx.make_thematic_table(nx=12, ny=12, seed=7, n_features=25)
    out = str(tmp_path / "ckpt_stream")
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)

    calls = []
    real_append = ck.append_manifest
    monkeypatch.setattr(ck, "append_manifest",
                        lambda d, recs: (calls.append(len(recs)),
                                         real_append(d, recs)))
    # several input blocks -> several shuffle output blocks -> the stream
    # yields (and appends) more than once
    stats = ck.run_alignment_checkpointed(
        ray.data.from_arrow(theme).repartition(6),
        ray.data.from_arrow(ref), out, cfg)
    n_parts = len(stats["processed_parts"])
    assert n_parts > 1
    # streamed: multiple incremental appends, none carrying the whole run
    assert len(calls) > 1
    assert sum(calls) >= n_parts
    assert max(calls) < n_parts or len(calls) > 1

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

"""Self-golden fixtures (FIXTURES.md F5 / SURVEY.md section 5d): the engine's
own verified outputs on the synthetic corpus are committed as parquet and
asserted bit-for-bit thereafter — rows, WKT geometry, and tile (cell)
assignments. brdr itself cannot run in this sandbox, so these freeze OUR
semantics against regressions. Regenerate intentionally with:
    python tests/test_golden.py regen
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN_PATH = os.path.join(GOLDEN_DIR, "align_predict_nx12.parquet")

COLS = ["theme_id", "brdr_relevant_distance", "result_wkt", "result_diff_wkt",
        "brdr_area_r6", "brdr_full_actual", "brdr_evaluation", "cell"]


def _compute():
    import ray.data

    from brdrq_ray import alignment as al
    from brdrq_ray.geom import core as g
    from brdrq_ray.pipelines.autocorrect import run_alignment
    from brdrq_ray.sources import fixtures as fx

    theme = fx.make_thematic_table(nx=12, ny=12, seed=42, n_features=25)
    ref = fx.make_reference_table(nx=12, ny=12, seed=42)
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)
    res = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref), cfg)

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        wkts = [g.to_wkt(*g.unpack_geom(b)) for b in batch.column("result_geom").to_pylist()]
        dwkts = [g.to_wkt(*g.unpack_geom(b)) for b in batch.column("result_diff_geom").to_pylist()]
        return pa.table({
            "theme_id": batch.column("theme_id"),
            "brdr_relevant_distance": batch.column("brdr_relevant_distance"),
            "result_wkt": pa.array(wkts, pa.string()),
            "result_diff_wkt": pa.array(dwkts, pa.string()),
            "brdr_area_r6": pc.round(batch.column("brdr_area"), 6),
            "brdr_full_actual": batch.column("brdr_full_actual"),
            "brdr_evaluation": batch.column("brdr_evaluation"),
            "cell": batch.column("cell"),
        })

    out = res.map_batches(project, batch_format="pyarrow").to_pandas()
    out = out.sort_values("theme_id").reset_index(drop=True)
    return pa.Table.from_pandas(out[COLS], preserve_index=False)


GOLDEN_EVAL_PATH = os.path.join(GOLDEN_DIR, "align_evaluate_nx12.parquet")

EVAL_COLS = ["theme_id", "brdr_relevant_distance", "brdr_prediction_score",
             "brdr_prediction_count", "brdr_evaluation", "brdr_stability",
             "brdr_full_actual", "cell"]


def _compute_eval():
    import ray.data

    from brdrq_ray import alignment as al
    from brdrq_ray.pipelines.autocorrect import run_alignment
    from brdrq_ray.sources import fixtures as fx

    theme = fx.make_thematic_table(nx=12, ny=12, seed=42, n_features=25)
    ref = fx.make_reference_table(nx=12, ny=12, seed=42)
    cfg = al.AlignConfig(od_strategy=al.OD_EXCLUDE, max_predictions=4)
    res = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                        cfg, mode="evaluate", max_rd=3.0)
    out = res.select_columns(EVAL_COLS).to_pandas()
    out = out.sort_values(["theme_id", "brdr_relevant_distance"]).reset_index(drop=True)
    out["brdr_prediction_score"] = out["brdr_prediction_score"].round(4)
    return pa.Table.from_pandas(out[EVAL_COLS], preserve_index=False)


def _check_golden(got, path, cols):
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        pq.write_table(got, path)
        raise AssertionError(f"golden file {path} created on first run — commit and re-run")
    want = pq.read_table(path)
    assert got.schema.equals(want.schema), f"{got.schema}\n!=\n{want.schema}"
    assert got.num_rows == want.num_rows
    for col in cols:
        assert got.column(col).equals(want.column(col)), f"column {col} drifted"


def test_golden_bit_stable(ray_session):
    _check_golden(_compute(), GOLDEN_PATH, COLS)


def test_golden_evaluate_bit_stable(ray_session):
    _check_golden(_compute_eval(), GOLDEN_EVAL_PATH, EVAL_COLS)


if __name__ == "__main__" and "regen" in sys.argv:
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    pq.write_table(_compute(), GOLDEN_PATH)
    print(f"regenerated {GOLDEN_PATH}")
    ray.shutdown()

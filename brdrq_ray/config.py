"""Declarative job config — the engine's analog of the reference's processing
provider parameter surface (SURVEY.md section 2.10).

The reference exposes its algorithms through QGIS processing parameters
(full dict shape documented at docs/autocorrectborders.md:136-161:
INPUT_THEMATIC, COMBOBOX_ID_THEME, ENUM_REFERENCE, RELEVANT_DISTANCE,
OD_STRATEGY, THRESHOLD_OVERLAP_PERCENTAGE, ADD_ATTRIBUTES, ADD_METADATA,
PREDICTIONS, SHOW_INTERMEDIATE_LAYERS, WORKFOLDER...). This module mirrors
those names in a JSON-serializable dataclass so a pipeline run is one config
file + ``python -m brdrq_ray.run_job job.json`` (the ray-job-submit entry).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

from .alignment import AlignConfig


@dataclass
class AlignJob:
    # inputs
    input_thematic: str = ""                 # parquet path (INPUT_THEMATIC)
    combobox_id_theme: str = "theme_id"      # id column (COMBOBOX_ID_THEME)
    reference: dict = field(default_factory=dict)  # loader spec (ENUM_REFERENCE)
    # algorithm parameters (same names, same defaults where the docs give one)
    relevant_distance: float = 2.0
    od_strategy: str = "AS_IS"
    threshold_overlap_percentage: float = 50.0
    predictions: str = "NO"                  # NO | BEST | ALL (strategy enum)
    max_relevant_distance: float = 3.0       # grid end for predictions
    add_attributes: bool = True
    add_metadata: bool = True
    show_intermediate_layers: bool = False   # emit relevant_intersection/diff
    processor_id: str = "2024:aligner2024a"
    snap_strategy: str = "NO_PREFERENCE"
    snap_max_segment_length: float = 2.0
    # partial snapping (reference ProcessorConfig fields,
    # brdrq_dockwidget_featurealigner.py:1513-1522; the reference UI
    # hardcodes the flag off, brdrq_settings.py:294 — same default here)
    partial_snapping: bool = False
    partial_snap_strategy: str = "PREFER_VERTICES"
    partial_snap_max_segment_length: float = 2.0
    # engine/scale knobs (no reference analog — the parallel execution layer)
    #: Douglas-Peucker egress simplification (meters); None/0 = off
    #: (byte-identical to pre-knob output). Applied inside the sink
    #: projection pass, make_valid-repaired.
    simplify_tolerance: float | None = None
    workfolder: str = "/tmp/brdrq_out"
    cell_level: int | None = None
    hot_threshold: int = 256
    checkpoint: bool = True
    #: < 1 plans tiles from a seeded sample (cheaper ingest at 100 TB);
    #: sample-missed oversized features route through an exact-plan fallback
    plan_sample: float = 1.0
    # admission guard (reference cap 550_000_000 m2,
    # brdrq_algorithm_autocorrectborders.py:195) — kept as a sanity check
    max_union_area_m2: float | None = None

    def align_config(self) -> AlignConfig:
        max_pred, multi_best = {"NO": (-1, True), "BEST": (1, True),
                                "ALL": (-1, False)}.get(self.predictions, (-1, True))
        return AlignConfig(
            relevant_distance=self.relevant_distance,
            od_strategy=self.od_strategy,
            threshold_overlap_percentage=self.threshold_overlap_percentage,
            max_predictions=max_pred,
            multi_to_best_prediction=multi_best,
            processor_id=self.processor_id,
            snap_strategy=self.snap_strategy,
            snap_max_segment_length=self.snap_max_segment_length,
            partial_snapping=self.partial_snapping,
            partial_snap_strategy=self.partial_snap_strategy,
            partial_snap_max_segment_length=self.partial_snap_max_segment_length,
        )

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True, indent=2)

    @classmethod
    def from_json(cls, text: str) -> "AlignJob":
        return cls(**json.loads(text))


def run_job(job: AlignJob) -> dict:
    """Execute one AlignJob end-to-end: read -> align (checkpointed) ->
    per-result-type parquet sinks + correction layer. Returns run stats.
    Ray must already be initialised by the caller (driver/CLI contract)."""
    import os

    import ray.data

    from .pipelines.autocorrect import RESULT_TYPES, run_alignment, select_result_type
    from .pipelines.correction import build_correction_layer
    from .sources.loaders import make_reference_dataset
    from .state.checkpoint import read_results, run_alignment_checkpointed

    thematic = ray.data.read_parquet(job.input_thematic)
    if job.combobox_id_theme != "theme_id":
        ren = job.combobox_id_theme

        def rename(batch):
            names = [("theme_id" if c == ren else c) for c in batch.column_names]
            return batch.rename_columns(names)

        thematic = thematic.map_batches(rename, batch_format="pyarrow")
    reference = make_reference_dataset(job.reference)
    cfg = job.align_config()
    mode = "predict" if job.predictions == "NO" else "evaluate"

    if job.max_union_area_m2 is not None:
        from .functions.geometry_ops import union_area
        from .stages.ingest import parse_geometries
        # EXACT unary-union area (M15), distributed: clip-to-cell partition,
        # one bucketed shuffle, per-cell union — matches the reference's
        # union-then-measure admission guard instead of the r2 sum-of-areas
        # approximation (which double-counted overlapping features)
        total = union_area(
            thematic.map_batches(parse_geometries, batch_format="pyarrow"))
        if total and total > job.max_union_area_m2:
            raise ValueError(
                f"thematic union area {total:.0f} m2 exceeds the admission "
                f"cap {job.max_union_area_m2:.0f} m2 (reference guard analog)")

    os.makedirs(job.workfolder, exist_ok=True)
    stats: dict = {}
    if job.checkpoint:
        ck = os.path.join(job.workfolder, "checkpoint")
        stats = run_alignment_checkpointed(
            thematic, reference, ck, cfg, mode=mode,
            max_rd=job.max_relevant_distance if mode == "evaluate" else None,
            cell_level=job.cell_level, plan_sample=job.plan_sample)
        results = read_results(ck, phash=stats["params_hash"])
    else:
        results = run_alignment(thematic, reference, cfg, mode=mode,
                                max_rd=job.max_relevant_distance if mode == "evaluate" else None,
                                cell_level=job.cell_level,
                                hot_threshold=job.hot_threshold,
                                plan_sample=job.plan_sample)

    # one parquet sink per result type (reference writes one gpkg per FC,
    # overwrite semantics D5)
    slots = list(RESULT_TYPES)
    if not job.show_intermediate_layers:
        slots = [s for s in slots if "relevant" not in s]
    written = {}
    for slot in slots:
        out_dir = os.path.join(job.workfolder, slot)
        # overwrite semantics (D5, the reference removes same-named layers
        # before re-adding, brdrq_utils.py:793-799) — a re-run must not
        # append duplicate part files
        if os.path.isdir(out_dir):
            import shutil
            shutil.rmtree(out_dir)
        layer = select_result_type(results, slot,
                                   simplify_tolerance=job.simplify_tolerance)
        if not job.add_attributes and "props" in (layer.schema().names or []):
            layer = layer.drop_columns(["props"])
        layer.write_parquet(out_dir)
        written[slot] = out_dir
    # correction layer unless predictions-ALL (reference skips it there,
    # test_autocorrectborders.py:341-383)
    if job.predictions != "ALL":
        corr = build_correction_layer(ray.data.read_parquet(job.input_thematic)
                                      if job.combobox_id_theme == "theme_id" else thematic,
                                      results)
        out_dir = os.path.join(job.workfolder, "correction")
        if os.path.isdir(out_dir):
            import shutil
            shutil.rmtree(out_dir)
        corr.write_parquet(out_dir)
        written["correction"] = out_dir
    stats["outputs"] = written
    return stats

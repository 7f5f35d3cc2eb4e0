"""The per-tile alignment stage: one Arrow group (all theme + reference rows
of one (cell, salt) partition) in, flat ProcessResult rows out.

This is the engine's analog of the reference's stateful ``Aligner`` object
(constructed per run at plugin/brdrq/brdrq_algorithm_common.py:105-120, holding
thematic dict + reference dict + spatial index in driver memory, SURVEY.md
section 3 state note) — except the state lives for exactly one shuffle group:
the group IS the per-tile feature dictionary, and the candidate index is a
numpy bbox table over the group's reference rows.

Output schema is fixed (RESULT_SCHEMA) so empty groups still produce typed
blocks and ``union``/``write_parquet`` never see schema drift.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .. import alignment as al
from ..geom import core as g

#: geometry result slots (ProcessResult attribute per output column); a
#: reduced ``slots=`` selection (SURVEY section 7.4.5: the reference emits
#: relevant_intersection/diff only under SHOW_INTERMEDIATE_LAYERS) skips the
#: pack + Arrow bytes of the unselected ones — metric columns always stay
GEOM_SLOTS = {
    "result": "result",
    "result_diff": "result_diff",
    "result_diff_plus": "result_diff_plus",
    "result_diff_min": "result_diff_min",
    "result_relevant_intersection": "relevant_intersection",
    "result_relevant_diff": "relevant_diff",
}

ALL_SLOTS = tuple(GEOM_SLOTS)


def result_schema(slots: tuple = ALL_SLOTS) -> pa.Schema:
    """The flat result-table schema for a slot selection. Fixed per job so
    empty groups still produce typed blocks and union/write_parquet never
    see schema drift. Unknown slot names fail HERE (driver-side), not as a
    KeyError deep inside a remote group task."""
    bad = [s for s in slots if s not in GEOM_SLOTS]
    if bad:
        raise ValueError(f"unknown result slot(s) {bad}; "
                         f"valid slots: {list(GEOM_SLOTS)}")
    fields = [("theme_id", pa.string()),
              ("brdr_id", pa.int64()),
              ("brdr_relevant_distance", pa.float64())]
    fields += [(f"{s}_geom", pa.binary()) for s in ALL_SLOTS if s in slots]
    fields += [
        ("brdr_area", pa.float64()),
        ("brdr_perimeter", pa.float64()),
        ("brdr_shape_index", pa.float64()),
        ("brdr_stability", pa.bool_()),
        ("brdr_prediction_score", pa.float64()),
        ("brdr_prediction_count", pa.int32()),
        ("brdr_evaluation", pa.string()),
        ("brdr_sym_diff_area_index", pa.float64()),
        ("brdr_sym_diff_area_index_perc", pa.float64()),
        ("brdr_diff_area_index", pa.float64()),
        ("brdr_diff_length_index", pa.float64()),
        ("brdr_full_actual", pa.bool_()),
        ("brdr_remark", pa.string()),
        ("brdr_metadata", pa.string()),
        ("cell", pa.int64()),
        ("props", pa.string()),
        # passthrough identity columns (null unless the caller supplies them):
        # the interleaved-document pipeline carries (doc_id, span_idx) as real
        # columns so the stitch never re-parses a composite key string
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
    ]
    return pa.schema(fields)


RESULT_SCHEMA = result_schema()


def _brdr_id(theme_id: str) -> int:
    """Deterministic internal id (the reference's brdr_id is a sequential int,
    docs/autocorrectborders.md:202; ours must be reproducible across shuffles
    so it is a CRC of the user key)."""
    return zlib.crc32(str(theme_id).encode())


def _emit_row(out: dict, theme_id, cell, props, pr: al.ProcessResult,
              theme_area: float, theme_perim: float,
              stability: bool, score: float, count: int, evaluation: str,
              metadata: str, kind: int = g.GEOM_POLYGON,
              slots: tuple = ALL_SLOTS, doc_id=None, span_idx=None):
    def _pack(parts) -> bytes:
        return g.pack_geom(kind, parts)

    res_area = g.geom_area(kind, pr.result)
    res_perim = g.geom_perimeter(kind, pr.result)
    sym = g.geom_area(kind, pr.result_diff)
    out["theme_id"].append(str(theme_id))
    out["brdr_id"].append(_brdr_id(theme_id))
    out["brdr_relevant_distance"].append(pr.rd)
    for s in slots:
        out[f"{s}_geom"].append(_pack(getattr(pr, GEOM_SLOTS[s])))
    out["brdr_area"].append(res_area)
    out["brdr_perimeter"].append(res_perim)
    out["brdr_shape_index"].append(g.shape_index(res_area, res_perim))
    out["brdr_stability"].append(bool(stability))
    out["brdr_prediction_score"].append(float(score))
    out["brdr_prediction_count"].append(int(count))
    out["brdr_evaluation"].append(evaluation)
    out["brdr_sym_diff_area_index"].append(sym)
    out["brdr_sym_diff_area_index_perc"].append(100.0 * sym / theme_area if theme_area > 0 else 0.0)
    out["brdr_diff_area_index"].append(res_area - theme_area)
    out["brdr_diff_length_index"].append(res_perim - theme_perim)
    out["brdr_full_actual"].append(bool(pr.full_actual))
    out["brdr_remark"].append(pr.remark)
    out["brdr_metadata"].append(metadata)
    out["cell"].append(int(cell))
    out["props"].append(props if props is not None else "")
    out["doc_id"].append(doc_id)
    out["span_idx"].append(span_idx)


class AlignGroupFn:
    """Callable for ``groupby(part_key).map_groups`` — constructed once per
    actor/task with the job config; ``__call__`` processes one tile group."""

    def __init__(self, cfg: al.AlignConfig, mode: str = "predict",
                 max_rd: float | None = None, add_metadata: bool = True,
                 ref_broadcast=None, slots: tuple | None = None):
        # the selected processor may transform the config for the polygon
        # kernel (e.g. Dieussaert forces od_strategy=EXCLUDE, SEMANTICS.md
        # 14c) — resolve ONCE here so every downstream cfg read agrees
        from ..processors import get_processor_by_id
        proc_cls = get_processor_by_id(cfg.processor_id)
        eff = getattr(proc_cls, "effective_config", None)
        self.cfg = eff(cfg) if eff is not None else cfg
        self.mode = mode
        self.max_rd = max_rd if max_rd is not None else cfg.relevant_distance
        self.add_metadata = add_metadata
        self.ref_broadcast = ref_broadcast
        self.slots = tuple(slots) if slots is not None else ALL_SLOTS
        self.schema = result_schema(self.slots)
        self._slices = None

    def _broadcast_slices(self):
        if self._slices is None:
            import ray as _ray
            self._slices = _ray.get(self.ref_broadcast)
        return self._slices

    def __call__(self, group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side").to_pylist())
        is_ref = side == "ref"
        is_theme = side == "theme"
        if not is_theme.any():
            return self.schema.empty_table()

        if self.ref_broadcast is not None:
            # broadcast fast path: the reference slice for this group's cell
            # is a zero-copy Arrow slice out of the shared-memory table
            # (shipped once via ray.put), not the shuffle
            cell = int(group.column("cell")[int(np.nonzero(is_theme)[0][0])].as_py())
            ref_tbl, cell_index = self._broadcast_slices()
            start, n = cell_index.get(cell, (0, 0))
            sub = ref_tbl.slice(start, n)
            ref_ids = sub.column("ref_id").to_pylist()
            ref_geoms = sub.column("geom").to_pylist()
            ref_vers = sub.column("version_date").to_pylist()
            rxmin = sub.column("xmin").to_numpy(zero_copy_only=False)
            rxmax = sub.column("xmax").to_numpy(zero_copy_only=False)
            rymin = sub.column("ymin").to_numpy(zero_copy_only=False)
            rymax = sub.column("ymax").to_numpy(zero_copy_only=False)
        else:
            ref_idx = np.nonzero(is_ref)[0]
            ref_ids = group.column("ref_id").take(pa.array(ref_idx)).to_pylist()
            # canonical candidate order: within a part_key group the shuffle's
            # tie order is run-dependent, and union/intersection accumulation
            # order shifts last-bit floats (a brdr_area on a rounding boundary
            # then flips between runs). Sort by ref_id — the same order the
            # broadcast table is built with — so results are deterministic
            # and identical across both reference-distribution paths.
            if len(ref_ids) > 1:
                order = np.argsort(np.asarray(ref_ids, dtype="U"), kind="stable")
                ref_idx = ref_idx[order]
                ref_ids = [ref_ids[i] for i in order]
            ref_geoms = group.column("geom").take(pa.array(ref_idx)).to_pylist()
            ref_vers = group.column("version_date").take(pa.array(ref_idx)).to_pylist()
            rxmin = group.column("xmin").to_numpy(zero_copy_only=False)[ref_idx]
            rxmax = group.column("xmax").to_numpy(zero_copy_only=False)[ref_idx]
            rymin = group.column("ymin").to_numpy(zero_copy_only=False)[ref_idx]
            rymax = group.column("ymax").to_numpy(zero_copy_only=False)[ref_idx]
        ref_parts_cache: dict[int, list] = {}
        versions = {rid: v for rid, v in zip(ref_ids, ref_vers) if v}

        t_idx = np.nonzero(is_theme)[0]
        t_ids = group.column("theme_id").take(pa.array(t_idx)).to_pylist()
        t_geoms = group.column("geom").take(pa.array(t_idx)).to_pylist()
        t_props = group.column("props").take(pa.array(t_idx)).to_pylist()
        # passthrough identity columns (present as nulls when the caller's
        # thematic table has none — the interleaved-doc pipeline's stitch key)
        if "doc_id" in group.column_names:
            t_doc = group.column("doc_id").take(pa.array(t_idx)).to_pylist()
            t_span = group.column("span_idx").take(pa.array(t_idx)).to_pylist()
        else:
            t_doc = [None] * len(t_idx)
            t_span = [None] * len(t_idx)
        t_cell = group.column("cell").to_numpy(zero_copy_only=False)[t_idx]
        txmin = group.column("xmin").to_numpy(zero_copy_only=False)[t_idx]
        txmax = group.column("xmax").to_numpy(zero_copy_only=False)[t_idx]
        tymin = group.column("ymin").to_numpy(zero_copy_only=False)[t_idx]
        tymax = group.column("ymax").to_numpy(zero_copy_only=False)[t_idx]

        reach = 1.01 * self.max_rd  # the reference's 1.01*rd search buffer
        out: dict[str, list] = {name: [] for name in self.schema.names}

        def emit(i, pr, theme_area, theme_perim, stability, score, count,
                 evaluation, meta, kind=g.GEOM_POLYGON):
            _emit_row(out, t_ids[i], t_cell[i], t_props[i], pr, theme_area,
                      theme_perim, stability, score, count, evaluation, meta,
                      kind=kind, slots=self.slots,
                      doc_id=t_doc[i], span_idx=t_span[i])

        for i in range(len(t_idx)):
            cand = np.nonzero((rxmin <= txmax[i] + reach) & (rxmax >= txmin[i] - reach)
                              & (rymin <= tymax[i] + reach) & (rymax >= tymin[i] - reach))[0]
            # deterministic candidate order (bit-stable outputs regardless of
            # shuffle row order): sort by ref_id
            candidates = []
            for j in sorted(cand.tolist(), key=lambda j: str(ref_ids[j])):
                if j not in ref_parts_cache:
                    ref_parts_cache[j] = g.unpack_geom(ref_geoms[j])[1]
                candidates.append((ref_ids[j], ref_parts_cache[j]))
            t_kind, theme_parts = g.unpack_geom(t_geoms[i])
            theme_area = g.geom_area(t_kind, theme_parts)
            theme_perim = g.geom_perimeter(t_kind, theme_parts)

            if t_kind != g.GEOM_POLYGON:
                # line/point themes -> snap processor (A9/A11); one row per
                # feature at the working distance
                from ..processors import (
                    PROCESSOR_SNAP,
                    PROCESSOR_TOPOLOGY,
                    get_processor_by_id,
                )
                pid = self.cfg.processor_id
                if pid in ("2024:aligner2024a", PROCESSOR_TOPOLOGY):
                    pid = PROCESSOR_SNAP  # polygon processors don't apply
                proc = get_processor_by_id(pid)(self.cfg)
                pr = proc.align(t_ids[i], t_kind, theme_parts, candidates,
                                self.cfg.relevant_distance)
                meta = al.build_metadata(t_ids[i], pr.used_refs, versions) if self.add_metadata else ""
                emit(i, pr, theme_area, theme_perim, True, 100.0, 1,
                     al.EV_NOT_EVALUATED, meta, kind=t_kind)
            elif self.mode == "predict":
                part_wise = self.cfg.multi_as_single_modus and len(theme_parts) > 1
                if part_wise:  # A14 multi_as_single_modus (reference default)
                    pr = al.align_one_multi(theme_parts, candidates,
                                            self.cfg.relevant_distance, self.cfg)
                else:
                    pr = al.align_one(theme_parts, candidates, self.cfg.relevant_distance, self.cfg)
                meta = al.build_metadata(t_ids[i], pr.used_refs, versions) if self.add_metadata else ""
                emit(i, pr, theme_area, theme_perim, True, 100.0, 1,
                     al.EV_NOT_EVALUATED, meta)
            else:  # evaluate over the (possibly escalated, M14) distance grid
                step = max(self.cfg.step_cm, al.escalated_step_cm(theme_area, self.max_rd))
                grid = al.distance_grid(self.max_rd, step_cm=step)
                want_all = self.mode == "evaluate_all"  # PROCESSRESULTS: one
                # row per grid distance (the reference's non-predictions
                # result_type; feeds the A7 diff-metrics series)
                evaluate = (al.evaluate_series_multi
                            if self.cfg.multi_as_single_modus and len(theme_parts) > 1
                            else al.evaluate_series)
                results, preds = evaluate(t_ids[i], theme_parts,
                                          candidates, grid, self.cfg,
                                          materialize_all=want_all)
                if want_all:
                    for pr in results:
                        meta = al.build_metadata(t_ids[i], pr.used_refs, versions) if self.add_metadata else ""
                        emit(i, pr, theme_area, theme_perim, False, 0.0,
                             len(preds), al.EV_NOT_EVALUATED, meta)
                else:
                    for p in preds:
                        meta = al.build_metadata(t_ids[i], p.pr.used_refs, versions) if self.add_metadata else ""
                        emit(i, p.pr, theme_area, theme_perim, p.stability,
                             p.score, p.prediction_count, p.evaluation, meta)
        if not out["theme_id"]:
            return self.schema.empty_table()
        return pa.table(out, schema=self.schema)

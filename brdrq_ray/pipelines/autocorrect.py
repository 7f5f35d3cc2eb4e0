"""The flagship pipeline: AutocorrectBorders rebuilt Ray-Data-first.

Reference entry point: ``brdrqprovider:brdrqautocorrectborders``
(plugin/brdrq/brdrq_algorithm_autocorrectborders.py:463-772, traced in
SURVEY.md section 3.1). The reference materializes both layers as Python dicts
in driver memory and runs a single-threaded Aligner; this engine expresses the
same computation as one streaming Dataset DAG:

    read -> map_batches(parse+valid+metrics)              [stateless, Arrow]
         -> owner-cell / cover-cell tagging               [stateless, numpy]
         -> union(theme, ref) -> groupby(part_key)        [the ONE shuffle]
         -> map_groups(AlignGroupFn)                      [per-tile alignment]
         -> result table -> per-result-type projections / sinks

Scale notes (the 100 TB design): the only all-to-all exchange is the
groupby on ``part_key`` (= cell | salt<<45). Reference rows are replicated to
at most their cover + one ring (bounded by parcel size / cell size); theme
rows move exactly once. Hot cells are salted (bounded group size). The
pre-pass that picks the cell level and finds hot cells is one cheap
aggregate over parsed bboxes (a histogram at a fine probe level), NOT a
materialization of the data.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data

from .. import tiles
from ..alignment import AlignConfig
from ..stages.align_stage import AlignGroupFn
from ..stages.ingest import parse_geometries
from ..stages.tiling import assign_owner_cell, explode_cover, salt_reference, salt_theme

PROBE_LEVEL = 16  # histogram probe level for the planning pre-pass (64 m cells)


@dataclass
class TilePlan:
    level: int
    salts: dict[int, int]          # owner cell -> salt factor (hot cells only)
    max_extent: float
    n_features: int


#: skew model: one "row equivalent" per KB of packed geometry — align cost
#: grows with vertex count, so a cell of few huge polygons is as hot as a
#: cell of many small ones. Typical parcels (~600 B packed) stay below 1 KB,
#: so row count dominates for ordinary data and the plan is unchanged.
COST_BYTES_PER_ROW_EQUIV = 1024


def _plan_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial for the planning pre-pass: feature extent max and a
    bbox-center histogram at PROBE_LEVEL, weighted two ways — row count and
    packed-geometry bytes (the complexity proxy for cost-aware salting)."""
    import pyarrow.compute as pc
    xmin = batch.column("xmin").to_numpy(zero_copy_only=False)
    xmax = batch.column("xmax").to_numpy(zero_copy_only=False)
    ymin = batch.column("ymin").to_numpy(zero_copy_only=False)
    ymax = batch.column("ymax").to_numpy(zero_copy_only=False)
    ok = np.isfinite(xmin)
    ext = np.maximum(xmax - xmin, ymax - ymin)[ok]
    cx = ((xmin + xmax) * 0.5)[ok]
    cy = ((ymin + ymax) * 0.5)[ok]
    gbytes = (pc.binary_length(batch.column("geom")).to_numpy(zero_copy_only=False)
              .astype(np.int64)[ok]
              if "geom" in batch.column_names else np.zeros(int(ok.sum()), np.int64))
    cells = tiles.encode_cells(cx, cy, PROBE_LEVEL)
    uniq, inv, counts = np.unique(cells, return_inverse=True, return_counts=True)
    bsum = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(bsum, inv, gbytes)
    return pa.table({
        "probe_cell": pa.array(uniq, pa.int64()),
        "n": pa.array(counts, pa.int64()),
        "geom_bytes": pa.array(bsum, pa.int64()),
        "max_extent": pa.array(np.full(len(uniq), ext.max() if len(ext) else 0.0)),
    })


def plan_tiles(parsed_thematic: ray.data.Dataset, max_rd: float,
               cell_level: int | None = None, hot_threshold: int = 512,
               plan_sample: float = 1.0) -> TilePlan:
    """One aggregate pass over parsed thematic bboxes -> (level, hot-cell
    salts). ``cell_level`` overrides the derived level (production jobs that
    know their data pass it and skip nothing — the histogram is still needed
    for salting).

    ``plan_sample`` < 1 plans from a seeded sample instead of the full scan
    (the 100 TB ingest-cost knob): salts become estimates (scaled 1/rate —
    harmless, they only bound group sizes) and the level is derived from the
    sampled max extent with a 1.5x safety margin. Because a sample can miss
    the single largest feature, callers MUST keep the runtime guarantee guard
    on (prepare_aligned_inputs does: any feature whose search region exceeds
    one cell ring fails fast with a clear message instead of silently losing
    candidates)."""
    if plan_sample < 1.0:
        parsed_thematic = parsed_thematic.random_sample(plan_sample, seed=11)
    partials = parsed_thematic.map_batches(_plan_stats_batch, batch_format="pyarrow")
    from ray.data.aggregate import Max, Sum
    agg = partials.groupby("probe_cell").aggregate(
        Sum("n", alias_name="sum_n"), Sum("geom_bytes", alias_name="sum_b"),
        Max("max_extent", alias_name="mx"))
    hist = agg.to_pandas()  # ONE execution of the stats pass
    hist = hist.rename(columns={"sum_n": "sum(n)"})
    max_extent = float(hist["mx"].max()) if len(hist) else 0.0
    n_features = int(hist["sum(n)"].sum()) if len(hist) else 0  # TRUE rows
    # cost-aware effective count FOR SALTING ONLY: max(rows, geometry-KB)
    # per probe cell — a cell of few huge polygons salts like a cell of many
    # small ones (align cost grows with vertex count, not row count alone)
    if len(hist):
        hist["sum(n)"] = np.maximum(
            hist["sum(n)"].to_numpy(),
            hist["sum_b"].to_numpy() // COST_BYTES_PER_ROW_EQUIV)
    if plan_sample < 1.0:
        max_extent *= 1.5  # sampled estimate -> safety margin (guarded at runtime)
        n_features = int(n_features / plan_sample) if plan_sample > 0 else n_features
    level = cell_level if cell_level is not None else tiles.pick_level(max_extent, max_rd)
    level = min(level, PROBE_LEVEL)
    # aggregate probe histogram up to the chosen level: parent cell of a
    # probe cell = same morton prefix
    salts: dict[int, int] = {}
    if len(hist):
        shift = np.uint64(2 * (PROBE_LEVEL - level))
        probe = hist["probe_cell"].to_numpy().astype(np.uint64)
        morton = probe & np.uint64((1 << 58) - 1)
        parent = ((np.uint64(level) << np.uint64(58)) | (morton >> shift)).astype(np.int64)
        import pandas as pd
        parent_counts = pd.Series(hist["sum(n)"].to_numpy(), index=parent).groupby(level=0).sum()
        if plan_sample < 1.0 and plan_sample > 0:
            parent_counts = (parent_counts / plan_sample).round().astype(int)
        salts = tiles.salt_hot_cells(parent_counts.to_dict(), hot_threshold)
    return TilePlan(level=level, salts=salts, max_extent=max_extent, n_features=n_features)


_UNIFIED_COLS = ["side", "theme_id", "ref_id", "geom", "xmin", "ymin", "xmax",
                 "ymax", "props", "version_date", "doc_id", "span_idx",
                 "cell", "salt"]


def _unify(batch: pa.Table, side: str) -> pa.Table:
    n = batch.num_rows
    cols = {}
    cols["side"] = pa.array([side] * n, pa.string())
    cols["theme_id"] = (batch.column("theme_id").cast(pa.string()) if "theme_id" in batch.column_names
                        else pa.nulls(n, pa.string()))
    cols["ref_id"] = (batch.column("ref_id").cast(pa.string()) if "ref_id" in batch.column_names
                      else pa.nulls(n, pa.string()))
    cols["geom"] = batch.column("geom")
    for c in ("xmin", "ymin", "xmax", "ymax"):
        cols[c] = batch.column(c)
    cols["props"] = (batch.column("props").cast(pa.string()) if "props" in batch.column_names
                     else pa.nulls(n, pa.string()))
    if "version_date" in batch.column_names:
        cols["version_date"] = batch.column("version_date").cast(pa.string())
    else:
        cols["version_date"] = pa.nulls(n, pa.string())
    # passthrough identity columns (the interleaved-doc pipeline's stitch key
    # travels the DAG as real columns, never inside a composite string)
    cols["doc_id"] = (batch.column("doc_id").cast(pa.string())
                      if "doc_id" in batch.column_names
                      else pa.nulls(n, pa.string()))
    cols["span_idx"] = (batch.column("span_idx").cast(pa.int32())
                        if "span_idx" in batch.column_names
                        else pa.nulls(n, pa.int32()))
    cols["cell"] = batch.column("cell")
    cols["salt"] = batch.column("salt") if "salt" in batch.column_names else pa.array([0] * n, pa.int32())
    return pa.table(cols)


def _part_key(batch: pa.Table) -> pa.Table:
    """part_key = cell | salt << 45 (morton bits < 2^44, level bits at 58+ —
    bit 45..50 are free for the salt)."""
    cell = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
    salt = batch.column("salt").to_numpy(zero_copy_only=False).astype(np.int64)
    return batch.append_column("part_key", pa.array(cell | (salt << 45), pa.int64()))


def prepare_aligned_inputs(thematic: ray.data.Dataset, reference: ray.data.Dataset,
                           max_rd: float, cell_level: int | None = None,
                           hot_threshold: int = 512,
                           broadcast_reference: bool | None = None,
                           broadcast_limit: int = 250_000,
                           plan_sample: float = 1.0,
                           plan_override: "TilePlan | None" = None,
                           pre_parsed: bool = False,
                           oversize_policy: str = "fail"):
    """Parse both sides, pick the tile plan, tag cells/salts. Returns
    (unified_keyed_dataset, plan, ref_broadcast_handle_or_None,
    oversized_parsed_dataset_or_None) — the handle is set when the
    small-reference broadcast fast path was taken (auto below
    ``broadcast_limit`` rows; pass broadcast_reference=False to force the
    shuffle path).

    With a sampled plan (``plan_sample`` < 1) the co-partition guarantee is
    checked at runtime; ``oversize_policy`` decides what happens to features
    the sample missed: 'fail' raises (the conservative default), 'route'
    diverts them into the returned ``oversized`` dataset so the caller can
    align them under their own exact (coarser) plan — run_alignment does this
    and unions the two result tables."""
    parsed_theme = (thematic if pre_parsed
                    else thematic.map_batches(parse_geometries, batch_format="pyarrow"))
    parsed_ref = reference.map_batches(parse_geometries, batch_format="pyarrow")

    plan = plan_override if plan_override is not None else plan_tiles(
        parsed_theme, max_rd, cell_level=cell_level,
        hot_threshold=hot_threshold, plan_sample=plan_sample)
    level = plan.level
    cs = tiles.cell_size(level)
    # correctness guarantee of the one-shuffle join: a feature's search region
    # (bbox + 1.01*rd) must stay within one ring of its owner cell. The
    # derived level satisfies this by construction; an override that breaks it
    # would silently drop candidates for oversized features — refuse instead.
    if cell_level is not None and plan.max_extent + 2 * 1.01 * max_rd > 2 * cs:
        raise ValueError(
            f"cell_level={cell_level} (cell {cs:.0f} m) violates the "
            f"co-partition guarantee for max feature extent "
            f"{plan.max_extent:.0f} m at rd={max_rd}; use level <= "
            f"{tiles.pick_level(plan.max_extent, max_rd)} or omit cell_level")
    salts = plan.salts

    oversized = None
    if plan_sample < 1.0:
        # sampled planning can miss the largest feature — the co-partition
        # guarantee guard: fail fast, or route violators to their own plan
        reach = 2 * 1.01 * max_rd

        def _ext(batch: pa.Table) -> np.ndarray:
            return np.nan_to_num(np.maximum(
                batch.column("xmax").to_numpy(zero_copy_only=False)
                - batch.column("xmin").to_numpy(zero_copy_only=False),
                batch.column("ymax").to_numpy(zero_copy_only=False)
                - batch.column("ymin").to_numpy(zero_copy_only=False)))

        if oversize_policy == "route":
            def keep_fit(batch: pa.Table) -> pa.Table:
                return batch.filter(pa.array(_ext(batch) + reach <= 2 * cs))

            def keep_oversized(batch: pa.Table) -> pa.Table:
                return batch.filter(pa.array(_ext(batch) + reach > 2 * cs))

            oversized = parsed_theme.map_batches(keep_oversized,
                                                 batch_format="pyarrow")
            parsed_theme = parsed_theme.map_batches(keep_fit,
                                                    batch_format="pyarrow")
        else:
            def guard(batch: pa.Table) -> pa.Table:
                ext = _ext(batch)
                bad = np.nonzero(ext + reach > 2 * cs)[0]
                if len(bad):
                    raise ValueError(
                        f"sampled tile plan (level {level}, cell {cs:.0f} m) "
                        f"violated by a feature of extent {ext[bad[0]]:.0f} m — "
                        "re-run with plan_sample=1.0 or a coarser cell_level")
                return batch

            parsed_theme = parsed_theme.map_batches(guard, batch_format="pyarrow")

    theme_keyed = (parsed_theme
                   .map_batches(lambda b: assign_owner_cell(b, level), batch_format="pyarrow")
                   .map_batches(lambda b: salt_theme(b, salts), batch_format="pyarrow")
                   .map_batches(lambda b: _unify(b, "theme"), batch_format="pyarrow"))

    # hybrid join strategy (ray_guide 'Joins and lookups'): a SMALL reference
    # is broadcast as per-cell slices (ray.put once, read per group — the
    # shuffle then moves theme rows only); a large reference is replicated
    # through the shuffle to its cover + one ring (the 100 TB path).
    if broadcast_reference is None:
        try:
            n_ref = reference.count()  # parquet metadata count: cheap
        except Exception:
            n_ref = None
        broadcast_reference = n_ref is not None and n_ref <= broadcast_limit

    if broadcast_reference:
        import ray as _ray
        # to_arrow_refs + concat: the keyed reference lands once as Arrow
        # (zero-copy from the object store) — no pandas driver copy
        ref_tbl = pa.concat_tables([
            t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
            for t in _ray.get(
                (parsed_ref
                 .map_batches(lambda b: explode_cover(b, level, expand=cs), batch_format="pyarrow")
                 .map_batches(lambda b: _unify(b, "ref"), batch_format="pyarrow")
                 ).to_arrow_refs())]).combine_chunks()
        # broadcast ONE cell-sorted Arrow table + a cell -> (start, len) row
        # range index: ray.put of the Arrow buffers (shared-memory zero-copy
        # reads in every AlignGroupFn actor), never pickled Python lists of
        # geometry bytes (several x the Arrow footprint)
        cells = ref_tbl.column("cell").to_numpy()
        # (cell, ref_id) order — the within-cell ref_id order matches the
        # shuffle path's canonical candidate sort (align_stage), so the two
        # reference-distribution paths produce bit-identical results
        rids = np.asarray(ref_tbl.column("ref_id").to_pylist(), dtype="U")
        order = np.lexsort((rids, cells))
        ref_sorted = ref_tbl.take(pa.array(order, pa.int64())).combine_chunks()
        cells_sorted = cells[order]
        uniq, starts, counts = np.unique(cells_sorted, return_index=True,
                                         return_counts=True)
        cell_index = {int(c): (int(s), int(n))
                      for c, s, n in zip(uniq, starts, counts)}
        ref_handle = _ray.put((ref_sorted, cell_index))
        unified = theme_keyed.map_batches(_part_key, batch_format="pyarrow")
        return unified, plan, ref_handle, oversized

    # reference: cover + one ring (see stages.tiling docstring for the proof)
    ref_keyed = (parsed_ref
                 .map_batches(lambda b: explode_cover(b, level, expand=cs), batch_format="pyarrow")
                 .map_batches(lambda b: salt_reference(b, salts), batch_format="pyarrow")
                 .map_batches(lambda b: _unify(b, "ref"), batch_format="pyarrow"))
    unified = theme_keyed.union(ref_keyed).map_batches(_part_key, batch_format="pyarrow")
    return unified, plan, None, oversized


def run_alignment(thematic: ray.data.Dataset, reference: ray.data.Dataset,
                  cfg: AlignConfig | None = None, mode: str = "predict",
                  max_rd: float | None = None, cell_level: int | None = None,
                  hot_threshold: int = 512, add_metadata: bool = True,
                  broadcast_reference: bool | None = None,
                  plan_sample: float = 1.0,
                  oversize_policy: str = "route",
                  slots: tuple | None = None) -> ray.data.Dataset:
    """AutocorrectBorders core: returns the flat result table (one row per
    (theme_id, relevant_distance) in 'predict' mode, one per prediction in
    'evaluate' mode) with the brdr_* schema of SURVEY.md section 1.3.

    With ``plan_sample`` < 1 the tile plan comes from a seeded sample; any
    feature the sample missed (its search region violates the co-partition
    guarantee at the sampled level) is, under the default
    ``oversize_policy='route'``, aligned separately under an exact plan over
    just the oversized subset and unioned into the result — sampled planning
    is total, not fail-fast.

    ``slots`` selects which of the six geometry result columns are
    materialized (default all; the reference emits relevant_intersection/diff
    only under SHOW_INTERMEDIATE_LAYERS,
    brdrq_algorithm_autocorrectborders.py:671-689) — an evaluate-ALL run over
    a 51-distance grid saves two packed blobs per row by dropping them."""
    cfg = cfg or AlignConfig()
    max_rd = max_rd if max_rd is not None else cfg.relevant_distance
    unified, plan, ref_handle, oversized = prepare_aligned_inputs(
        thematic, reference, max_rd, cell_level=cell_level,
        hot_threshold=hot_threshold, broadcast_reference=broadcast_reference,
        plan_sample=plan_sample, oversize_policy=oversize_policy)
    fn = AlignGroupFn(cfg, mode=mode, max_rd=max_rd, add_metadata=add_metadata,
                      ref_broadcast=ref_handle, slots=slots)

    def align_group(group: pa.Table) -> pa.Table:
        return fn(group)

    main = unified.groupby("part_key").map_groups(align_group, batch_format="pyarrow")
    res = main
    if oversized is not None:
        # the oversized subset is tiny by assumption: materialize it (one
        # filter scan), and only when non-empty run the fallback DAG under
        # its own exact plan (coarser level derived from the true max extent)
        oversized = oversized.materialize()
        if oversized.count() > 0:
            over_unified, _, over_handle, _ = prepare_aligned_inputs(
                oversized, reference, max_rd, cell_level=None,
                hot_threshold=hot_threshold,
                broadcast_reference=broadcast_reference,
                plan_sample=1.0, pre_parsed=True)
            fn2 = AlignGroupFn(cfg, mode=mode, max_rd=max_rd,
                               add_metadata=add_metadata,
                               ref_broadcast=over_handle, slots=slots)

            def align_group_over(group: pa.Table) -> pa.Table:
                return fn2(group)

            fallback = over_unified.groupby("part_key").map_groups(
                align_group_over, batch_format="pyarrow")
            res = main.union(fallback)
    from ..processors import PROCESSOR_TOPOLOGY, get_processor_by_id
    proc_cls = None
    try:
        proc_cls = get_processor_by_id(cfg.processor_id)
    except (KeyError, NotImplementedError):
        pass  # AlignGroupFn raises inside the DAG for truly unknown ids
    if getattr(proc_cls, "post_pass", None) == "topology" \
            or cfg.processor_id == PROCESSOR_TOPOLOGY:
        from ..functions.topology import topology_resolve
        res = topology_resolve(res)
    return res


# --- result materialization (A5 analog) ------------------------------------

RESULT_TYPES = {
    "result": "result_geom",
    "result_diff": "result_diff_geom",
    "result_diff_plus": "result_diff_plus_geom",
    "result_diff_min": "result_diff_min_geom",
    "result_relevant_intersection": "result_relevant_intersection_geom",
    "result_relevant_diff": "result_relevant_diff_geom",
}

_GEOM_SLOT_COLS = list(RESULT_TYPES.values())


def select_result_type(results: ray.data.Dataset, result_type: str,
                       drop_empty_diffs: bool = True,
                       simplify_tolerance: float | None = None
                       ) -> ray.data.Dataset:
    """Project the flat result table to one result type (the reference emits
    one FeatureCollection per slot, get_results_as_geojson at
    plugin/brdrq/brdrq_algorithm_autocorrectborders.py:620-646), re-emitting
    WKT. Diff layers drop empty geometries (brdr_perimeter == 0 filter,
    reference: remove_empty_features_from_diff_layers,
    plugin/brdrq/brdrq_utils.py:1513-1527). ``simplify_tolerance`` (engine
    egress knob, default off) Douglas-Peucker-simplifies each geometry
    inside this same projection pass — no extra scan — with make_valid
    repair; perimeter and the empty-diff filter see the simplified shape
    (a sliver diff below tolerance vanishes from the diff layer)."""
    geom_col = RESULT_TYPES[result_type]
    schema_names = results.schema().names
    if geom_col not in schema_names:
        raise ValueError(
            f"result type {result_type!r} was not materialized — the "
            f"alignment ran with a reduced slots= selection "
            f"(available geometry columns: "
            f"{[c for c in schema_names if c.endswith('_geom')]}); "
            f"re-run with slots including {result_type!r}")
    is_diff = result_type != "result"

    def project(batch: pa.Table) -> pa.Table:
        from ..geom import core as g
        keep_cols = [c for c in batch.column_names if c not in _GEOM_SLOT_COLS]
        out = batch.select(keep_cols)
        fg = g.unpack_geoms_flat(batch.column(geom_col))
        if simplify_tolerance:
            # simplify rewrites the coordinates per feature, so the
            # concatenated-array fast paths below don't apply: per-row
            # simplify/repair, then per-row WKT + perimeter on the new shape
            wkts, perims = [], []
            for row in g.iter_flat_geoms(fg):
                kind, parts = row
                kind, parts = g.simplify_parts(kind, parts,
                                               simplify_tolerance)
                if kind == g.GEOM_POLYGON:
                    kind, parts = g.make_valid(kind, parts)
                wkts.append(g.to_wkt(kind, parts))
                perims.append(g.geom_perimeter(kind, parts))
            perims = np.asarray(perims, np.float64)
        else:
            # batch unpack: ONE coordinate array, batch WKT emission,
            # vectorized perimeter reduction (only != 0 is consumed —
            # order-independent)
            wkts = g.flat_wkts(fg)
            perims = g.flat_perimeters(fg) if is_diff and drop_empty_diffs \
                else None
        out = out.append_column("geometry_wkt", pa.array(wkts, pa.string()))
        if is_diff and drop_empty_diffs:
            out = out.filter(pa.array(perims != 0.0))
        return out

    return results.map_batches(project, batch_format="pyarrow")

"""The border-alignment kernel: brdrQ's relevant-distance method rebuilt.

brdr (the library the reference plugin wraps) is not available in this sandbox;
its semantics are reconstructed from the reference's docs and call contracts
(SURVEY.md section 2.3) and frozen here as THE engine semantic (self-golden
fixtures, SURVEY.md section 5d):

For a thematic geometry T, candidate reference parcels {R_i} and a relevant
distance rd (rounded to 0.1 m — distances are identity keys, reference:
plugin/brdrq/brdrq_settings.py:87):

* I_i = T ∩ R_i. An intersection is **relevant** when it is "deep" — it
  survives an opening with radius rd/2, tested as inradius(I_i) >= rd/2 — or,
  as the documented fallback, when raw overlap area(I_i)/area(R_i) >= the
  threshold_overlap_percentage (reference: docs/autocorrectborders.md:80-84,
  param at plugin/brdrq/brdrq_algorithm_autocorrectborders.py:405-414).
* A relevant parcel contributes its FULL geometry when T covers it up to a
  border band thinner than rd (inradius(R_i \\ T) < rd/2) — the "snap the
  border to the parcel border" case; otherwise only the recoverable part
  dilate(erode(I_i, rd/2), 3*rd/2) ∩ R_i — the "thematic border cuts through
  the parcel interior far from any reference border" case.
* result = dissolve(contributions), plus the open-domain remainder
  T \\ union(all reference) handled per OpenDomainStrategy (reference enum at
  plugin/brdrq/brdrq_utils.py:177-179, semantics docs/autocorrectborders.md:
  69-72: EXCLUDE drops it, AS_IS keeps it unchanged; SNAP_INNER_SIDE /
  SNAP_ALL_SIDE snap the open-domain boundary to nearby reference borders —
  real implementations since r2, ``snap_open_domain`` below).
* The six ProcessResult slots mirror the reference exactly
  (plugin/brdrq/brdrq_utils.py:1146-1153): result, result_diff (symmetric
  difference), result_diff_plus (result - original), result_diff_min
  (original - result), result_relevant_intersection, result_relevant_diff.
* rd == 0 is the identity alignment (the reference's grids start at 0).

Prediction / evaluation (aligner.evaluate, reference call sites
plugin/brdrq/brdrq_algorithm_autocorrectborders.py:635-640): run the kernel
over the distance grid, fingerprint each result by its contribution set;
maximal runs of equal fingerprints are stability plateaus; one prediction per
plateau (at its smallest rd), scored 100 * plateau_len / grid_len, adjusted by
FullReferenceStrategy (docs/featurealigner.md:59-63), labelled with the
Evaluation enum consumed at plugin/brdrq/brdrq_utils.py:1260-1271, and cut to
max_predictions (top score, ties to smaller rd).
"""

from __future__ import annotations

import copy
import json
from dataclasses import dataclass, field

import numpy as np

from .geom import core as g
from .geom.boolean import dissolve, overlay
from .geom.buffer import closing, dilate, erode

# --- enums (string values follow the reference's observable vocabulary) -----

OD_EXCLUDE = "EXCLUDE"
OD_AS_IS = "AS_IS"
OD_SNAP_INNER_SIDE = "SNAP_INNER_SIDE"
OD_SNAP_ALL_SIDE = "SNAP_ALL_SIDE"

FRS_ONLY_FULL = "ONLY_FULL_REFERENCE"
FRS_PREFER_FULL = "PREFER_FULL_REFERENCE"
FRS_NO_FULL = "NO_FULL_REFERENCE"

EV_PREDICTION_UNIQUE = "prediction_unique"
EV_TO_CHECK_MULTI = "to_check_prediction_multi"
EV_NO_CHANGE = "no_change"
EV_EQUALITY_BY_ID = "equality_by_id"
EV_EQUALITY_FULL_REF = "equality_by_full_reference"
EV_NOT_EVALUATED = "not_evaluated"

#: distances are identity keys rounded to 1 decimal (0.1 m) — one rounding
#: rule applied once, everywhere (reference: brdrq_settings.py DECIMAL=1)
RD_DECIMALS = 1


def round_rd(rd: float) -> float:
    return round(float(rd), RD_DECIMALS)


def distance_grid(max_rd: float, step_cm: int = 10) -> list[float]:
    """The reference's grid: np.arange(0, rd*100, step)/100 (bulk form,
    plugin/brdrq/brdrq_algorithm_autocorrectborders.py:627-629), inclusive of
    the endpoint like the interactive form."""
    cm = np.arange(0, int(round(max_rd * 100)) + step_cm, step_cm)
    return [round_rd(c / 100.0) for c in cm]


def escalated_step_cm(feature_area: float, max_rd: float) -> int:
    """Step escalation (reference: plugin/brdrq/brdrq_dockwidget_aligner.py:
    63-68 and featurealigner.py:1272-1299): 10 cm default, 20 cm when the
    feature area exceeds 1e5 m2 or max_rd > 7.5 m, 50 cm when area > 1e6 m2."""
    if feature_area > 1_000_000:
        return 50
    if feature_area > 100_000 or max_rd > 7.5:
        return 20
    return 10


@dataclass
class AlignConfig:
    relevant_distance: float = 2.0
    od_strategy: str = OD_AS_IS
    threshold_overlap_percentage: float = 50.0
    correction_distance: float = 0.01
    #: correction_distance closing applied to every result, like the
    #: reference (brdrq_algorithm_autocorrectborders.py:192-193). Affordable
    #: since r3: a provable-identity pre-check returns clean results
    #: untouched (~0.25 ms) and crack-filling pays a mitered offset (~5 ms),
    #: vs ~860 ms for the r2 capsule closing (SEMANTICS.md section 4).
    apply_correction: bool = True
    full_reference_strategy: str = FRS_NO_FULL
    max_predictions: int = -1           # -1 = all
    multi_to_best_prediction: bool = True
    #: reference default-on path (brdrq_algorithm_common.py:89-97, wired from
    #: brdrq_algorithm_autocorrectborders.py:553 / autoupdateborders.py:410):
    #: multipolygon parts are aligned as singles, then re-merged per id
    multi_as_single_modus: bool = True
    step_cm: int = 10
    #: ABSOLUTE symmetric-difference area (m2) below which a prediction is
    #: labelled no_change — the reference tests SYMMETRICAL_AREA_CHANGE < 0.01
    #: m2 (brdrq_utils.py:1290), not a percentage of the feature area
    no_change_sym_area_m2: float = 0.01
    # processor selection (A9) + line/point snapping (A11); snap fields mirror
    # plugin/brdrq/brdrq_dockwidget_featurealigner.py:1513-1522
    processor_id: str = "2024:aligner2024a"
    snap_strategy: str = "NO_PREFERENCE"
    snap_max_segment_length: float = 2.0
    #: partial snapping — the reference carries these ProcessorConfig fields
    #: (wired at brdrq_dockwidget_featurealigner.py:1513-1522) but hardcodes
    #: the flag OFF ("not performant and not implemented in brdrQ",
    #: brdrq_settings.py:294). Engine semantic, frozen here since the brdr
    #: body is absent: when ON, the final aligned boundary is vertex-snapped
    #: to the candidate reference borders within rd using the partial
    #: strategy, then the diff slots are recomputed against the original.
    partial_snapping: bool = False
    partial_snap_strategy: str = "PREFER_VERTICES"
    partial_snap_max_segment_length: float = 2.0


@dataclass
class ProcessResult:
    """One alignment outcome for (theme, rd). Geometry slots are `parts`."""
    rd: float
    result: list = field(default_factory=list)
    result_diff: list = field(default_factory=list)
    result_diff_plus: list = field(default_factory=list)
    result_diff_min: list = field(default_factory=list)
    relevant_intersection: list = field(default_factory=list)
    relevant_diff: list = field(default_factory=list)
    fingerprint: tuple = ()
    full_actual: bool = False
    remark: str = ""
    used_refs: list = field(default_factory=list)  # [(ref_id, contribution)]


#: fixed sampling resolution for the inradius (erosion-survival) test so the
#: measure is independent of rd — one value, applied everywhere, deterministic
INRADIUS_RES = 0.25


def _inradius(parts, rd: float = 0.0) -> float:
    return g.inradius_approx(parts, resolution=INRADIUS_RES)


def _inradius_with_shortcut(parts, rd_cap: float | None) -> float:
    """Inradius for relevance decisions, with two cheap exact shortcuts:

    * disc bound: inradius <= sqrt(area / pi); if that is already below any
      decidable threshold (rd_cap/2 with the smallest grid step) the sampled
      value cannot change a decision for small regions -> we still sample but
      over a tiny bbox (cheap anyway);
    * centroid bound: if the area centroid lies inside and its boundary
      distance d >= rd_cap/2, then inradius >= d decides 'deep' for every rd
      in the grid — no sampling needed (the common near-full-parcel case).
    """
    if not parts:
        return 0.0
    if rd_cap and rd_cap > 0:
        cx, cy = g.geom_centroid(g.GEOM_POLYGON, parts)
        pt = np.array([[cx, cy]])
        if g.points_in_polygon(pt, parts)[0]:
            d = float(g.points_to_boundary_distance(pt, parts)[0])
            if d >= rd_cap / 2.0:
                return d
    return _inradius(parts)


def prepare_candidates(theme_parts, candidates, rd_cap: float | None = None,
                       min_rd: float | None = None,
                       overlap_threshold: float | None = None):
    """Precompute everything that does NOT depend on the relevant distance —
    the distance grid multiplies alignments per feature by ~31 (10 cm steps to
    3 m, SURVEY.md section 6), so intersections / areas / inradii are computed
    once per (theme, candidate) pair and reused across the whole grid.

    ``min_rd``: the SMALLEST rd any later classify_at call will use. Deepness
    (inradius(inter) >= rd/2) is monotone decreasing in rd and the overlap
    threshold is rd-independent, so a candidate not relevant at min_rd is
    excluded at every rd >= min_rd — its uncovered-region overlay + inradius
    (the expensive full-parcel difference) is skipped entirely. Predict mode
    passes its single rd here; evaluate passes the smallest nonzero grid step.

    Returns (prepared, od_parts): prepared is a list of dicts per candidate
    with a nonempty intersection; od_parts is the open-domain remainder
    T \\ union(all candidates)."""
    prepared = []
    all_ref_parts = []
    for ref_id, ref_parts in candidates:
        all_ref_parts.append(ref_parts)
        inter = overlay(theme_parts, ref_parts, "intersection", validate=False)
        ia = g.geom_area(g.GEOM_POLYGON, inter)
        if ia <= 0:
            continue
        ra = g.geom_area(g.GEOM_POLYGON, ref_parts)
        overlap_pct = 100.0 * ia / ra if ra > 0 else 0.0
        inr_inter = _inradius_with_shortcut(inter, rd_cap)
        # the skip requires BOTH min_rd and the caller's actual overlap
        # threshold (cfg.threshold_overlap_percentage): not deep at min_rd
        # and below the threshold -> excluded at every rd >= min_rd
        never_relevant = (min_rd is not None and min_rd > 0
                          and overlap_threshold is not None
                          and inr_inter < min_rd / 2.0
                          and overlap_pct < overlap_threshold)
        if never_relevant:
            inr_uncov = 0.0  # unused: classify_at never reads it for excluded
        else:
            uncovered = overlay(ref_parts, theme_parts, "difference", validate=False)
            inr_uncov = _inradius_with_shortcut(uncovered, rd_cap) if uncovered else 0.0
        prepared.append({
            "ref_id": ref_id,
            "ref_parts": ref_parts,
            "inter": inter,
            "ia": ia,
            "overlap_pct": overlap_pct,
            "inr_inter": inr_inter,
            "inr_uncov": inr_uncov,
        })
    if all_ref_parts:
        od_parts = overlay(theme_parts, dissolve(all_ref_parts), "difference", validate=False)
    else:
        od_parts = theme_parts
    if od_parts and g.geom_area(g.GEOM_POLYGON, od_parts) <= 1e-6:
        od_parts = []
    return prepared, od_parts


_OD_SNAP_MODES = (OD_SNAP_INNER_SIDE, OD_SNAP_ALL_SIDE)


def snap_open_domain(od_parts, ref_parts_list, rd: float, cfg: AlignConfig):
    """OD SNAP_INNER_SIDE / SNAP_ALL_SIDE (reference enum at
    plugin/brdrq/brdrq_utils.py:177-179, docs/autocorrectborders.md:69-72
    'snap its edges to the inner/all sides') — reconstructed semantics
    (SEMANTICS.md section 3):

    * INNER: every od ring vertex (rings densified at snap_max_segment_length)
      within rd of a candidate reference boundary moves onto it — the
      reference-facing side of the open-domain remainder snaps to the border;
      the outward boundary beyond rd stays. Degenerate parts (slivers fully
      collapsed onto the border) drop out.
    * ALL: the same snap, then an rd-scale morphological opening
      (erode rd/2 -> dilate rd/2) so ALL sides lose sub-rd features, not just
      the reference-facing one.
    """
    from .geom.buffer import dilate as _dilate
    from .geom.buffer import erode as _erode
    from .geom.snap import _reference_geometry_arrays, densify_line, snap_points

    seg_a, seg_b, vertices = _reference_geometry_arrays(ref_parts_list)
    out_parts = []
    for part in od_parts:
        new_rings = []
        for ring in part:
            coords = np.asarray(ring, dtype=np.float64)
            closed = np.vstack([coords, coords[:1]])  # densify the closing edge too
            dense = densify_line(closed, cfg.snap_max_segment_length)[:-1]
            snapped, _ = snap_points(dense, seg_a, seg_b, vertices, rd,
                                     strategy="NO_PREFERENCE")
            if len(snapped) > 1:  # collapse consecutive duplicates
                keep = np.ones(len(snapped), dtype=bool)
                keep[1:] = np.any(snapped[1:] != snapped[:-1], axis=1)
                snapped = snapped[keep]
            if len(snapped) >= 3:
                new_rings.append(snapped)
        if new_rings and abs(g.geom_area(g.GEOM_POLYGON, [new_rings])) > 1e-9:
            out_parts.append(new_rings)
    if out_parts:
        # vertex snapping can fold a ring into a bowtie — repair before use
        _, out_parts = g.make_valid(g.GEOM_POLYGON, out_parts)
    if cfg.od_strategy == OD_SNAP_ALL_SIDE and out_parts:
        out_parts = _dilate(_erode(out_parts, rd / 2.0), rd / 2.0)
    return out_parts


def classify_at(prepared, rd: float, cfg: AlignConfig):
    """The rd-dependent relevance decisions, O(candidates) with no geometry
    work: returns (decisions, fingerprint) where decisions is a list of
    (cand, kind) with kind in {'full', 'partial', 'excluded'}."""
    decisions = []
    for c in prepared:
        deep = c["inr_inter"] >= rd / 2.0
        relevant = deep or c["overlap_pct"] >= cfg.threshold_overlap_percentage
        if not relevant:
            decisions.append((c, "excluded"))
        elif c["inr_uncov"] < rd / 2.0:
            decisions.append((c, "full"))
        else:
            decisions.append((c, "partial"))
    return decisions


def _fingerprint(decisions, od_used: bool, rd: float, od_rd_dependent: bool = False):
    key = tuple(sorted((str(c["ref_id"]), kind) for c, kind in decisions if kind != "excluded"))
    has_partial = any(kind == "partial" for _, kind in decisions)
    # partial contributions (and snapped od) vary with rd -> rd participates
    return (key, od_used, round_rd(rd) if (has_partial or od_rd_dependent) else 0.0)


def align_one(theme_parts, candidates, rd: float, cfg: AlignConfig) -> ProcessResult:
    """Align one thematic multipolygon against candidate reference parcels.

    candidates: list of (ref_id, parts). Returns a ProcessResult.
    """
    prepared, od_parts = prepare_candidates(
        theme_parts, candidates, rd_cap=round_rd(rd), min_rd=round_rd(rd),
        overlap_threshold=cfg.threshold_overlap_percentage)
    return align_prepared(theme_parts, prepared, od_parts, rd, cfg)


def align_prepared(theme_parts, prepared, od_parts, rd: float, cfg: AlignConfig) -> ProcessResult:
    rd = round_rd(rd)
    pr = ProcessResult(rd=rd)
    if rd <= 0.0:
        pr.result = theme_parts
        pr.fingerprint = ("identity",)
        return pr

    contributions = []   # (ref_id, kind, parts)
    rel_int_pieces = []
    rel_diff_pieces = []
    remarks = []
    for c, kind in classify_at(prepared, rd, cfg):
        if kind == "excluded":
            rel_diff_pieces.extend(c["inter"])
            continue
        rel_int_pieces.extend(c["inter"])
        if kind == "full":
            contributions.append((c["ref_id"], "full", c["ref_parts"]))
        else:
            part = overlay(dilate(erode(c["inter"], rd / 2.0), 1.5 * rd),
                           c["ref_parts"], "intersection")
            contributions.append((c["ref_id"], "partial", part))
            remarks.append(f"partial:{c['ref_id']}")

    pieces = [c[2] for c in contributions if c[2]]
    od_used = False        # od geometry actually present in the result
    od_flag = False        # od admitted by the strategy (the fingerprint bit)
    if od_parts:
        if cfg.od_strategy == OD_EXCLUDE:
            remarks.append("od_excluded")
        elif cfg.od_strategy in _OD_SNAP_MODES:
            od_flag = True
            od_snapped = snap_open_domain(
                od_parts, [c["ref_parts"] for c in prepared], rd, cfg)
            if od_snapped:
                pieces.append(od_snapped)
                od_used = True
                remarks.append("od_snapped_inner"
                               if cfg.od_strategy == OD_SNAP_INNER_SIDE
                               else "od_snapped_all")
            else:
                remarks.append("od_snapped_away")
        else:
            pieces.append(od_parts)
            od_used = True
            od_flag = True

    result = dissolve(pieces) if pieces else []
    if cfg.apply_correction and result:
        result = closing(result, cfg.correction_distance)

    n_psnap = 0
    if cfg.partial_snapping and result and prepared:
        from .geom.snap import snap_geometry
        from .geom.core import GEOM_POLYGON, make_valid
        _, snapped, n_psnap = snap_geometry(
            GEOM_POLYGON, result, [c["ref_parts"] for c in prepared], rd,
            strategy=cfg.partial_snap_strategy,
            max_segment_length=cfg.partial_snap_max_segment_length)
        if n_psnap:
            # snapping can pinch rings — repair before the diff overlays
            _, result = make_valid(GEOM_POLYGON, snapped)
            remarks.append(f"partial_snap:{n_psnap}")

    pr.result = result
    # symdiff = dissolve of the two one-sided differences (disjoint interiors)
    # — computes each difference once instead of twice
    pr.result_diff_plus = overlay(result, theme_parts, "difference", validate=False)
    pr.result_diff_min = overlay(theme_parts, result, "difference", validate=False)
    pr.result_diff = dissolve(pr.result_diff_plus + pr.result_diff_min) \
        if (pr.result_diff_plus or pr.result_diff_min) else []
    pr.relevant_intersection = dissolve(rel_int_pieces) if rel_int_pieces else []
    pr.relevant_diff = dissolve(rel_diff_pieces) if rel_diff_pieces else []
    pr.full_actual = bool(contributions) and all(c[1] == "full" for c in contributions) and not od_used
    pr.remark = ";".join(remarks)
    pr.used_refs = [(c[0], c[1]) for c in contributions]
    # snapped od varies continuously with rd (like partial contributions) ->
    # rd participates in the fingerprint whenever a snap strategy admits od
    # NOTE: the fingerprint describes the CORE alignment outcome (pre
    # partial-snap). With cfg.partial_snapping the snapped geometry still
    # varies with rd inside an equal-fingerprint plateau — geometry caches
    # must therefore not share across a plateau when the flag is on
    # (_plateau_predictions skips its fp_cache); the fingerprint itself
    # stays pre-snap so plateau/stability detection keeps working.
    rd_dependent = (any(c[1] == "partial" for c in contributions)
                    or (od_flag and cfg.od_strategy in _OD_SNAP_MODES))
    pr.fingerprint = (tuple(sorted((str(c[0]), c[1]) for c in contributions)), od_flag,
                      rd if rd_dependent else 0.0)
    return pr


def _merge_part_results(theme_parts, prs: list[ProcessResult], rd: float,
                        cfg: AlignConfig) -> ProcessResult:
    """multi_as_single_modus merge: each multipolygon part was aligned as a
    single feature; re-dissolve the part results into one ProcessResult per
    original id (reference: brdr's multi_as_single_modus merge, wired at
    brdrq_algorithm_common.py:89-97). Diff slots are recomputed against the
    WHOLE original geometry so the metrics match the per-feature contract."""
    rd = round_rd(rd)
    pr = ProcessResult(rd=rd)
    if rd <= 0.0:
        pr.result = theme_parts
        pr.fingerprint = ("identity",)
        return pr
    # union_many, NOT dissolve: two parts of one multipolygon can claim the
    # SAME reference parcel, so part results may overlap (dissolve assumes a
    # tessellation; the pairwise overlay union is overlap-robust)
    from .geom.boolean import union_many
    res_pieces = [p.result for p in prs if p.result]
    result = union_many(res_pieces) if res_pieces else []
    pr.result = result
    pr.result_diff_plus = overlay(result, theme_parts, "difference", validate=False)
    pr.result_diff_min = overlay(theme_parts, result, "difference", validate=False)
    pr.result_diff = dissolve(pr.result_diff_plus + pr.result_diff_min) \
        if (pr.result_diff_plus or pr.result_diff_min) else []
    ri = [p.relevant_intersection for p in prs if p.relevant_intersection]
    rdf = [p.relevant_diff for p in prs if p.relevant_diff]
    pr.relevant_intersection = union_many(ri) if ri else []
    pr.relevant_diff = union_many(rdf) if rdf else []
    pr.full_actual = bool(prs) and all(p.full_actual for p in prs)
    remarks = [p.remark for p in prs if p.remark]
    pr.remark = ";".join(["multi_as_single"] + remarks) if remarks else "multi_as_single"
    seen = set()
    for p in prs:
        for ref in p.used_refs:
            if ref not in seen:
                seen.add(ref)
                pr.used_refs.append(ref)
    pr.fingerprint = ("multi",) + tuple(p.fingerprint for p in prs)
    return pr


def align_one_multi(theme_parts, candidates, rd: float, cfg: AlignConfig) -> ProcessResult:
    """Part-wise alignment of a multipolygon (multi_as_single_modus): each
    part goes through the kernel as its own single feature, then the results
    merge per id."""
    prs = [align_one([part], candidates, rd, cfg) for part in theme_parts]
    return _merge_part_results(theme_parts, prs, rd, cfg)


def fingerprint_at(prepared, od_parts, rd: float, cfg: AlignConfig):
    """Cheap (no-geometry) fingerprint of the alignment outcome at rd —
    bit-identical to align_prepared(...).fingerprint. Used to find stability
    plateaus over the whole grid before materializing any geometry."""
    rd = round_rd(rd)
    if rd <= 0.0:
        return ("identity",)
    od_used = bool(od_parts) and cfg.od_strategy != OD_EXCLUDE
    od_rd_dep = bool(od_parts) and cfg.od_strategy in _OD_SNAP_MODES
    return _fingerprint(classify_at(prepared, rd, cfg), od_used, rd, od_rd_dep)


@dataclass
class Prediction:
    rd: float
    pr: ProcessResult
    score: float
    stability: bool
    evaluation: str = EV_NOT_EVALUATED
    prediction_count: int = 0


def evaluate_series(theme_id, theme_parts, candidates, distances, cfg: AlignConfig,
                    materialize_all: bool = False):
    """aligner.evaluate analog: align at every grid distance, detect stability
    plateaus, score, label and keep top max_predictions. Returns
    (all_results: list[ProcessResult], predictions: list[Prediction]).

    Geometry work is O(candidates + plateaus), not O(grid): rd-independent
    state is prepared once, the grid is scanned with cheap fingerprints, and
    full geometry is materialized only for plateau representatives (or for
    every grid point when ``materialize_all`` — the reference's PROCESSRESULTS
    output)."""
    n = len(distances)
    if n == 0:
        return [], []
    min_pos = min((d for d in distances if d > 0), default=None)
    prepared, od_parts = prepare_candidates(
        theme_parts, candidates, rd_cap=max(distances), min_rd=min_pos,
        overlap_threshold=cfg.threshold_overlap_percentage)
    fps = [fingerprint_at(prepared, od_parts, rd, cfg) for rd in distances]

    def materialize(idx):
        return align_prepared(theme_parts, prepared, od_parts,
                              distances[idx], cfg)

    return _plateau_predictions(theme_id, theme_parts, distances, fps,
                                materialize, cfg, materialize_all)


def evaluate_series_multi(theme_id, theme_parts, candidates, distances,
                          cfg: AlignConfig, materialize_all: bool = False):
    """Part-wise evaluate (multi_as_single_modus): each multipolygon part is
    prepared and fingerprinted as its own single feature; the combined
    fingerprint (tuple over parts) drives plateau detection, and plateau
    representatives are materialized per part then merged per id."""
    n = len(distances)
    if n == 0:
        return [], []
    min_pos = min((d for d in distances if d > 0), default=None)
    units = []
    for part in theme_parts:
        prepared, od = prepare_candidates(
            [part], candidates, rd_cap=max(distances), min_rd=min_pos,
            overlap_threshold=cfg.threshold_overlap_percentage)
        units.append((part, prepared, od))
    fps = [tuple(fingerprint_at(prep, od, rd, cfg) for _, prep, od in units)
           for rd in distances]

    def materialize(idx):
        prs = [align_prepared([part], prep, od, distances[idx], cfg)
               for part, prep, od in units]
        return _merge_part_results(theme_parts, prs, distances[idx], cfg)

    return _plateau_predictions(theme_id, theme_parts, distances, fps,
                                materialize, cfg, materialize_all)


def _plateau_predictions(theme_id, theme_parts, distances, fps, materialize,
                         cfg: AlignConfig, materialize_all: bool):
    """Shared plateau detection + scoring + evaluation labelling over a
    fingerprint series (single-feature and part-wise paths)."""
    n = len(distances)
    # plateaus of equal fingerprints
    plateaus = []  # (start_idx, end_idx inclusive)
    s = 0
    for i in range(1, n + 1):
        if i == n or fps[i] != fps[s]:
            plateaus.append((s, i - 1))
            s = i
    theme_area = g.geom_area(g.GEOM_POLYGON, theme_parts)

    rep_cache: dict = {}
    fp_cache: dict = {}

    # the fingerprint is the PRE-SNAP core outcome: with partial_snapping
    # the snapped geometry still varies with rd inside an equal-fingerprint
    # plateau, so geometry must NOT be shared across the plateau — each
    # materialized index gets its own per-rd snap (plateau DETECTION still
    # uses the core fingerprint, so stability/predictions are unaffected)
    share_geometry = not cfg.partial_snapping

    def _materialize(idx):
        # equal fingerprint => rd-independent CORE outcome => identical
        # geometry when share_geometry (the invariant D4 plateau-merging
        # rests on): materialize each DISTINCT fingerprint once and share it
        # across its whole plateau — a flat 14-rd tail pays one closing, not
        # fourteen. The shallow copy restamps rd; geometry is shared
        # read-only.
        if idx not in rep_cache:
            fp = fps[idx]
            if share_geometry and fp in fp_cache:
                pr = copy.copy(fp_cache[fp])
                pr.rd = round_rd(distances[idx])
            else:
                pr = materialize(idx)
                if share_geometry:
                    fp_cache[fp] = pr
            rep_cache[idx] = pr
        return rep_cache[idx]

    if materialize_all:
        results = [_materialize(i) for i in range(n)]
    else:
        # materialize only stable plateaus (the prediction candidates) — the
        # unstable single-rd fingerprints (partial contributions sweeping
        # with rd) would each cost buffer work for nothing
        results = [_materialize(a) for a, b in plateaus if (b - a + 1) >= 2 or n == 1]

    # D4 (prediction uniqueness, reference CHANGES.md:229): non-adjacent
    # plateaus with the SAME fingerprint are one prediction — merge them,
    # keeping the smallest-rd representative and summing stability mass
    merged: dict = {}
    for (a, b) in plateaus:
        plen = b - a + 1
        if plen < 2 and n > 1:
            continue  # single-point fingerprints are unstable, not predictions
        if fps[a] in merged:
            merged[fps[a]] = (merged[fps[a]][0], merged[fps[a]][1] + plen)
        else:
            merged[fps[a]] = (a, plen)

    preds: list[Prediction] = []
    for a, plen in merged.values():
        rep = _materialize(a)
        score = 100.0 * plen / n
        is_full = rep.full_actual
        if cfg.full_reference_strategy == FRS_ONLY_FULL and not is_full and rep.fingerprint != ("identity",):
            continue
        if cfg.full_reference_strategy == FRS_PREFER_FULL and is_full:
            score = min(100.0, score + 10.0)
        preds.append(Prediction(rd=rep.rd, pr=rep, score=round(score, 2), stability=plen >= 2))

    # evaluation labels
    for p in preds:
        sym = g.geom_area(g.GEOM_POLYGON, p.pr.result_diff)
        if sym < cfg.no_change_sym_area_m2:
            p.evaluation = EV_NO_CHANGE
        elif p.pr.used_refs and len(p.pr.used_refs) == 1 and p.pr.used_refs[0][1] == "full" \
                and str(p.pr.used_refs[0][0]) == str(theme_id):
            p.evaluation = EV_EQUALITY_BY_ID
        elif p.pr.full_actual:
            p.evaluation = EV_EQUALITY_FULL_REF
        else:
            p.evaluation = EV_PREDICTION_UNIQUE  # refined below by count

    preds.sort(key=lambda p: (-p.score, p.rd))
    k = cfg.max_predictions
    if cfg.multi_to_best_prediction and len(preds) > 1 and k == 1:
        preds = preds[:1]
    elif k is not None and k >= 0:
        preds = preds[:k] if k > 0 else preds
    count = len(preds)
    for p in preds:
        p.prediction_count = count
        if p.evaluation == EV_PREDICTION_UNIQUE and count > 1:
            p.evaluation = EV_TO_CHECK_MULTI
    return results, preds


def build_metadata(theme_id, used_refs, ref_versions: dict | None) -> str:
    """SOSA/SSN-style lineage JSON matching the reference's brdr_metadata
    shape (fixture plugin/brdrq/test/themelayer_metadata.geojson;
    docs/autocorrectborders.md:217)."""
    refs = []
    for i, (rid, kind) in enumerate(used_refs):
        entry = {
            "id": f"rg-{theme_id}-{i}",
            "type": "ReferenceGeometry",
            "contribution": kind,
            "derived_from": {"id": str(rid), "type": "Parcel", "source": "reference"},
        }
        if ref_versions and rid in ref_versions:
            entry["version_date"] = str(ref_versions[rid])
        refs.append(entry)
    return json.dumps(
        {"actuation": {"id": f"act-{theme_id}", "type": "Actuation",
                       "reference_geometries": refs}}, sort_keys=True)

"""Geometry-processor registry — the user-extension surface (SURVEY.md
section 2.10).

The reference selects a strategy object by string id (get_processor_by_id,
plugin/brdrq/brdrq_utils.py:212-230; enum :102-110): the polygon
overlap-relevance processor ('2024:aligner2024a'), the vertex-snapping
processor for lines/points ('2024:snap2024a'), the network processor
('2024:network2024a', a faster line/point variant), plus two processors the
reference ships disabled ('2024:dieussaert2024a', '2024:topology2024a') —
both carry ENGINE-DEFINED bodies here (SEMANTICS.md sections 14b/14c) since
there is no upstream behavior to match.

The engine mirrors that: a registry of kernel callables keyed by the same
ids; AlignGroupFn instantiates by id. Registering a new processor = one
``register()`` call with a callable of the common signature."""

from __future__ import annotations

from .geom import core as g
from .geom.snap import (
    SNAP_NO_PREFERENCE,
    SNAP_PREFER_ENDS_AND_ANGLES,
    snap_geometry,
)

PROCESSOR_ALIGNER = "2024:aligner2024a"
PROCESSOR_SNAP = "2024:snap2024a"
PROCESSOR_NETWORK = "2024:network2024a"
PROCESSOR_DIEUSSAERT = "2024:dieussaert2024a"
PROCESSOR_TOPOLOGY = "2024:topology2024a"

_REGISTRY: dict[str, object] = {}


def register(processor_id: str, factory):
    _REGISTRY[processor_id] = factory


def get_processor_by_id(processor_id: str):
    """Mirror of the reference factory: unknown/disabled ids raise with the
    same intent as the reference's None return + guard."""
    if processor_id not in _REGISTRY:
        raise KeyError(f"unknown processor id: {processor_id!r}; "
                       f"registered: {sorted(_REGISTRY)}")
    fac = _REGISTRY[processor_id]
    if fac is None:
        raise NotImplementedError(
            f"processor {processor_id!r} is registered but not implemented "
            "(disabled in the reference UI as well)")
    return fac


class OverlapProcessor:
    """Polygon relevant-distance processor (the default; semantics in
    brdrq_ray.alignment)."""

    def __init__(self, cfg):
        self.cfg = cfg

    @classmethod
    def effective_config(cls, cfg):
        """Config the polygon alignment kernel runs under when this
        processor id is selected — AlignGroupFn consults this once at init
        (the polygon path runs the kernel directly for throughput, so a
        processor's config transform must be visible to the whole stage)."""
        return cfg

    def align(self, theme_id, kind, theme_parts, candidates, rd):
        from . import alignment as al
        if kind != g.GEOM_POLYGON:
            raise TypeError("OverlapProcessor only handles polygons; "
                            "use the snap/network processor for lines/points")
        return al.align_one(theme_parts, candidates, rd, self.cfg)


class SnapProcessor:
    """Line/point vertex-snapping processor (strategy + densification from
    the config)."""

    strategy_default = SNAP_NO_PREFERENCE

    def __init__(self, cfg):
        self.cfg = cfg

    def align(self, theme_id, kind, theme_parts, candidates, rd):
        from . import alignment as al
        ref_parts = [p for _, p in candidates]
        strategy = getattr(self.cfg, "snap_strategy", None) or self.strategy_default
        max_seg = getattr(self.cfg, "snap_max_segment_length", 2.0)
        k2, snapped, n_moved = snap_geometry(kind, theme_parts, ref_parts, rd,
                                             strategy=strategy,
                                             max_segment_length=max_seg)
        pr = al.ProcessResult(rd=al.round_rd(rd))
        pr.result = snapped
        pr.remark = f"snapped:{n_moved}"
        pr.fingerprint = ("snap", n_moved)
        pr.used_refs = [(rid, "snap") for rid, _ in candidates] if n_moved else []
        return pr


class NetworkProcessor(SnapProcessor):
    """The reference's network processor is a faster line/point variant
    (CHANGES.md:134). Engine approximation: snapping with the
    ends-and-angles preference (reference corners are the network nodes).
    Documented deviation — frozen as the engine semantic."""

    strategy_default = SNAP_PREFER_ENDS_AND_ANGLES


class DieussaertProcessor(OverlapProcessor):
    """The original buffer-based relevant-overlap method
    ('2024:dieussaert2024a'). The reference registers the id but ships it
    disabled (the enum member is commented out, brdrq_utils.py:108) and the
    brdr body is not vendored, so the semantics here are ENGINE-DEFINED and
    frozen in SEMANTICS.md section 14c: the overlap kernel restricted to the
    reference-covered domain — the open-domain strategy is forced to EXCLUDE
    (theme area not covered by any reference polygon is dropped), matching
    the original method's definition over a full reference partition
    (parcels), where no open domain exists. Polygon-only: the reference
    notes non-polygon input errors for this processor
    (brdrq_dockwidget_featurealigner.py:1683)."""

    def __init__(self, cfg):
        super().__init__(type(self).effective_config(cfg))

    @classmethod
    def effective_config(cls, cfg):
        import dataclasses

        from .alignment import OD_EXCLUDE
        if getattr(cfg, "od_strategy", None) == OD_EXCLUDE:
            return cfg
        return dataclasses.replace(cfg, od_strategy=OD_EXCLUDE)

    def align(self, theme_id, kind, theme_parts, candidates, rd):
        if kind != g.GEOM_POLYGON:
            raise TypeError(
                "DieussaertProcessor only handles polygons (the reference "
                "notes non-polygon input errors for this processor, "
                "brdrq_dockwidget_featurealigner.py:1683)")
        return super().align(theme_id, kind, theme_parts, candidates, rd)


class TopologyProcessor(OverlapProcessor):
    """Topology-aware alignment: the per-feature kernel is the overlap
    processor unchanged; selecting this id additionally runs the
    cross-feature topology post-pass (functions/topology.topology_resolve —
    deterministic priority tessellation making the aligned layer
    overlap-free) after alignment. The reference registers this id but
    ships it disabled (brdrq_utils.py:102-110), so the semantics here are
    engine-defined and frozen in SEMANTICS.md."""

    post_pass = "topology"


register(PROCESSOR_ALIGNER, OverlapProcessor)
register(PROCESSOR_SNAP, SnapProcessor)
register(PROCESSOR_NETWORK, NetworkProcessor)
register(PROCESSOR_DIEUSSAERT, DieussaertProcessor)
register(PROCESSOR_TOPOLOGY, TopologyProcessor)

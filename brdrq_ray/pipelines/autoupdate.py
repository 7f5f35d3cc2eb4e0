"""Temporal updater: re-align only features whose reference parcels changed.

Reference: ``brdrqprovider:brdrqautoupdateborders``
(plugin/brdrq/brdrq_algorithm_autoupdateborders.py:354-544, traced in
SURVEY.md section 3.2) and brdr's ``update_featurecollection_to_actual_grb``
(:434-450): each feature's ``brdr_metadata`` records which reference parcels
its geometry was derived from and at which version_date; the updater detects
parcels whose current version is NEWER than the recorded one, re-aligns only
the affected features, and returns nothing when the reference did not change
in the window.

Ray-Data-first (SURVEY.md J4/J5): explode the metadata's
``reference_geometries[].derived_from`` into (theme_id, ref_id,
recorded_version) rows; semi-join against the current reference version table
via a BROADCAST dict (the version table is (ref_id -> date) — small relative
to the data, shipped once with ray.put, read per batch); features with at
least one stale parcel survive the anti-join and flow into the standard
alignment DAG. No shuffle is added beyond the alignment's own.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..alignment import AlignConfig
from .autocorrect import run_alignment


def explode_metadata_refs(batch: pa.Table) -> pa.Table:
    """(theme_id, brdr_metadata JSON) -> one row per derived_from reference:
    (theme_id, ref_id, recorded_version)."""
    tids, rids, vers = [], [], []
    for tid, meta in zip(batch.column("theme_id").to_pylist(),
                         batch.column("brdr_metadata").to_pylist()):
        if not meta:
            continue
        try:
            doc = json.loads(meta)
        except (ValueError, TypeError):
            continue
        for rg in doc.get("actuation", {}).get("reference_geometries", []):
            tids.append(str(tid))
            rids.append(str(rg.get("derived_from", {}).get("id", "")))
            vers.append(str(rg.get("version_date", "")))
    return pa.table({
        "theme_id": pa.array(tids, pa.string()),
        "ref_id": pa.array(rids, pa.string()),
        "recorded_version": pa.array(vers, pa.string()),
    })


def detect_affected(thematic_meta: ray.data.Dataset,
                    version_lookup_ref) -> ray.data.Dataset:
    """Changed-since semi-join: theme ids with >= 1 reference parcel whose
    current version_date > recorded version_date. ``version_lookup_ref`` is a
    ray.put handle to {ref_id: 'YYYY-MM-DD'} (broadcast, no shuffle)."""

    class StaleCheck:
        def __init__(self):
            self.versions = ray.get(version_lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            rid = batch.column("ref_id").to_pylist()
            rec = batch.column("recorded_version").to_pylist()
            cur = [self.versions.get(r, "") for r in rid]
            stale = np.array([bool(c) and bool(rv) and c[:10] > rv[:10]
                              for c, rv in zip(cur, rec)])
            return batch.filter(pa.array(stale))

    exploded = thematic_meta.map_batches(explode_metadata_refs, batch_format="pyarrow")
    stale = exploded.map_batches(StaleCheck, batch_format="pyarrow",
                                 concurrency=(1, 4))
    ids = stale.unique("theme_id")
    return set(ids) if ids else set()


def run_autoupdate(thematic: ray.data.Dataset, reference: ray.data.Dataset,
                   cfg: AlignConfig | None = None,
                   max_distance_for_actualisation: float = 3.0,
                   cell_level: int | None = None) -> ray.data.Dataset:
    """Full A8 pipeline. thematic needs (theme_id, geometry_wkt,
    brdr_metadata); reference needs (ref_id, geometry_wkt, version_date).
    Returns the alignment result table for AFFECTED features only (empty
    dataset = 'no changes in the reference within the time span', mirroring
    the reference's empty-dict short-circuit at
    plugin/brdrq/brdrq_algorithm_autoupdateborders.py:445-450)."""
    cfg = cfg or AlignConfig()

    # current version table -> broadcast dict (small side)
    vers_tbl = reference.select_columns(["ref_id", "version_date"]).to_pandas()
    lookup = {str(r): str(v)[:10] for r, v in
              zip(vers_tbl["ref_id"], vers_tbl["version_date"])}
    lookup_ref = ray.put(lookup)

    affected_ids = detect_affected(thematic, lookup_ref)
    if not affected_ids:
        from ..stages.align_stage import RESULT_SCHEMA
        return ray.data.from_arrow(RESULT_SCHEMA.empty_table())
    ids_ref = ray.put(affected_ids)

    class KeepAffected:
        def __init__(self):
            self.ids = ray.get(ids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            tid = batch.column("theme_id").to_pylist()
            mask = pa.array([str(t) in self.ids for t in tid])
            return batch.filter(mask)

    survivors = thematic.map_batches(KeepAffected, batch_format="pyarrow",
                                     concurrency=(1, 4))
    return run_alignment(survivors, reference, cfg, mode="evaluate",
                         max_rd=max_distance_for_actualisation,
                         cell_level=cell_level)

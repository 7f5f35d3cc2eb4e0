"""Temporal updater: re-align only features whose reference parcels changed.

Reference: ``brdrqprovider:brdrqautoupdateborders``
(plugin/brdrq/brdrq_algorithm_autoupdateborders.py:354-544, traced in
SURVEY.md section 3.2) and brdr's ``update_featurecollection_to_actual_grb``
(:434-450): each feature's ``brdr_metadata`` records which reference parcels
its geometry was derived from and at which version_date; the updater detects
parcels whose current version is NEWER than the recorded one, re-aligns only
the affected features, and returns nothing when the reference did not change
in the window.

Ray-Data-first (SURVEY.md J4/J5), fully distributed — NOTHING reference-sized
touches the driver:

1. explode ``brdr_metadata`` -> (theme_id, ref_id, recorded_version) rows;
2. changed-since join: tagged-union with the reference's (ref_id,
   version_date) projection, one groupby(ref_id) — each group compares its
   current version against the recorded ones and emits the stale theme_ids;
3. semi-join the thematic table against the stale id set (hybrid: the stale
   set is usually tiny, so it is broadcast via ray.put by default — one scan,
   no second shuffle; above ``broadcast_limit`` ids it switches to the
   distributed tagged-union semi-join);
4. survivors flow into the standard alignment DAG.
"""

from __future__ import annotations

import json

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
                    reference: ray.data.Dataset) -> ray.data.Dataset:
    """Changed-since join: theme ids with >= 1 reference parcel whose current
    version_date > recorded version_date. One groupby(ref_id) over the
    exploded metadata unioned with the reference's 2-column version
    projection — the reference table never leaves the cluster. Returns a
    deduplicated (theme_id) Dataset."""
    exploded = thematic_meta.map_batches(explode_metadata_refs,
                                         batch_format="pyarrow")

    from ..functions.vhash import bucket_i32

    def _bucket(ids) -> pa.Array:
        return bucket_i32(ids.cast(pa.string()) if isinstance(
            ids, (pa.Array, pa.ChunkedArray)) else ids, 64)

    def rec_side(t: pa.Table) -> pa.Table:
        rid = t.column("ref_id")
        return pa.table({
            "b": _bucket(rid.cast(pa.string())),
            "ref_id": rid,
            "theme_id": t.column("theme_id"),
            "recorded_version": t.column("recorded_version"),
            "current_version": pa.nulls(t.num_rows, pa.string()),
        })

    def cur_side(t: pa.Table) -> pa.Table:
        rid = t.column("ref_id").cast(pa.string())
        return pa.table({
            "b": _bucket(rid.cast(pa.string())),
            "ref_id": rid,
            "theme_id": pa.nulls(t.num_rows, pa.string()),
            "recorded_version": pa.nulls(t.num_rows, pa.string()),
            "current_version": t.column("version_date").cast(pa.string()),
        })

    tagged = (exploded.map_batches(rec_side, batch_format="pyarrow")
              .union(reference.select_columns(["ref_id", "version_date"])
                     .map_batches(cur_side, batch_format="pyarrow")))

    def stale_in_bucket(g) -> "object":
        # one hash bucket of parcels (shuffling per ref_id would cost one
        # Python call per parcel): vectorized pandas join of the per-parcel
        # max current version against the recorded rows
        import pandas as pd
        cur = g.loc[g["current_version"].notna(),
                    ["ref_id", "current_version"]].copy()
        recs = g.loc[g["theme_id"].notna()]
        if cur.empty or recs.empty:
            return pd.DataFrame({"theme_id": pd.Series([], dtype="object")})
        cur["cur10"] = cur["current_version"].str[:10]
        latest = cur.groupby("ref_id", as_index=True)["cur10"].max()
        cur10 = recs["ref_id"].map(latest)
        rec10 = recs["recorded_version"].str[:10]
        stale = cur10.notna() & (rec10 != "") & (cur10 > rec10)
        return pd.DataFrame({"theme_id": recs.loc[stale, "theme_id"]
                             .astype("object")})

    # NOTE: theme_ids may repeat (several stale parcels per feature) — the
    # consumers dedupe for free (broadcast set / semi-join groups), so no
    # extra distinct shuffle here
    return tagged.groupby("b").map_groups(
        lambda g: stale_in_bucket(g.drop(columns=["b"])),
        batch_format="pandas")


def run_autoupdate(thematic: ray.data.Dataset, reference: ray.data.Dataset,
                   cfg: AlignConfig | None = None,
                   max_distance_for_actualisation: float = 3.0,
                   cell_level: int | None = None,
                   broadcast_limit: int = 1_000_000) -> ray.data.Dataset:
    """Full A8 pipeline. thematic needs (theme_id, geometry_wkt,
    brdr_metadata); reference needs (ref_id, geometry_wkt, version_date).
    Returns the alignment result table for AFFECTED features only (empty
    dataset = 'no changes in the reference within the time span', mirroring
    the reference's empty-dict short-circuit at
    plugin/brdrq/brdrq_algorithm_autoupdateborders.py:445-450)."""
    cfg = cfg or AlignConfig()

    affected = detect_affected(thematic, reference).materialize()
    n_affected = affected.count()
    if n_affected == 0:
        from ..stages.align_stage import RESULT_SCHEMA
        return ray.data.from_arrow(RESULT_SCHEMA.empty_table())

    if n_affected <= broadcast_limit:
        # the stale set is small: broadcast it once (as an Arrow array, not a
        # Python set) and filter with one is_in kernel per batch
        import pyarrow.compute as pc
        chunks = []
        for b in affected.iter_batches(batch_format="pyarrow"):
            chunks.extend(b.column("theme_id").cast(pa.string()).chunks)
        ids_ref = ray.put(pc.unique(pa.chunked_array(chunks, pa.string())))

        class KeepAffected:
            def __init__(self):
                self.value_set = ray.get(ids_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                hit = pc.is_in(batch.column("theme_id").cast(pa.string()),
                               value_set=self.value_set)
                return batch.filter(pc.fill_null(hit, False))

        survivors = thematic.map_batches(KeepAffected, batch_format="pyarrow",
                                         concurrency=(1, 4))
    else:
        # huge churn: distributed semi-join, no driver-side id set
        from ..functions.relational import semi_join
        survivors = semi_join(thematic, affected, on="theme_id")

    return run_alignment(survivors, reference, cfg, mode="evaluate",
                         max_rd=max_distance_for_actualisation,
                         cell_level=cell_level)

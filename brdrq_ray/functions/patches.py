"""Per-feature override patches — the engine analog of the reference's
interactive save/reset loop (SURVEY.md section 2.10: _change_geometry /
_reset_geometry, plugin/brdrq/brdrq_dockwidget_aligner.py:142-255), which
upserts a chosen prediction's geometry plus brdrq_state /
brdrq_original_wkt / brdr_metadata into the source layer.

Batch form: a patch table (theme_id, seq, geometry_wkt?, brdrq_state?,
brdr_metadata?, op in {'set','reset'}) merged into the source with
last-writer-wins per theme_id (highest seq). 'reset' restores
brdrq_original_wkt and clears the state — idempotent re-runs read the
original (M13). One groupby(theme_id); patches are tiny next to the source.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

PATCH_COLS = ["theme_id", "seq", "op", "geometry_wkt", "brdrq_state", "brdr_metadata"]


def apply_patches(source: ray.data.Dataset, patches: ray.data.Dataset) -> ray.data.Dataset:
    """Merge patches into source rows (same schema as source, plus
    brdrq_state / brdrq_original_wkt maintained)."""

    def src_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "side": pa.array(["src"] * n),
            "theme_id": batch.column("theme_id").cast(pa.string()),
            "geometry_wkt": batch.column("geometry_wkt"),
            "brdrq_original_wkt": (batch.column("brdrq_original_wkt")
                                   if "brdrq_original_wkt" in batch.column_names
                                   else pa.nulls(n, pa.string())),
            "brdrq_state": (batch.column("brdrq_state")
                            if "brdrq_state" in batch.column_names
                            else pa.array(["none"] * n, pa.string())),
            "brdr_metadata": (batch.column("brdr_metadata")
                              if "brdr_metadata" in batch.column_names
                              else pa.nulls(n, pa.string())),
            "seq": pa.array([-1] * n, pa.int64()),
            "op": pa.nulls(n, pa.string()),
        }
        return pa.table(cols)

    def patch_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "side": pa.array(["patch"] * n),
            "theme_id": batch.column("theme_id").cast(pa.string()),
            "geometry_wkt": (batch.column("geometry_wkt")
                             if "geometry_wkt" in batch.column_names
                             else pa.nulls(n, pa.string())),
            "brdrq_original_wkt": pa.nulls(n, pa.string()),
            "brdrq_state": (batch.column("brdrq_state")
                            if "brdrq_state" in batch.column_names
                            else pa.nulls(n, pa.string())),
            "brdr_metadata": (batch.column("brdr_metadata")
                              if "brdr_metadata" in batch.column_names
                              else pa.nulls(n, pa.string())),
            "seq": batch.column("seq").cast(pa.int64()),
            "op": batch.column("op"),
        })

    from .vhash import bucket_i32

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "b", bucket_i32(t.column("theme_id").cast(pa.string()), 64))

    tagged = (source.map_batches(src_side, batch_format="pyarrow")
              .union(patches.map_batches(patch_side, batch_format="pyarrow"))
              .map_batches(add_bucket, batch_format="pyarrow"))

    OUT_COLS = ["theme_id", "geometry_wkt", "brdrq_original_wkt",
                "brdrq_state", "brdr_metadata"]

    def merge_one(row: pd.Series, ps: pd.DataFrame) -> dict:
        row = row.copy()
        original = row["brdrq_original_wkt"] or row["geometry_wkt"]
        for _, p in ps.iterrows():   # replay in order; last writer wins
            if p["op"] == "reset":
                row["geometry_wkt"] = original
                row["brdrq_state"] = "none"
                row["brdr_metadata"] = None
            else:
                if p["geometry_wkt"]:
                    row["geometry_wkt"] = p["geometry_wkt"]
                if p["brdrq_state"]:
                    row["brdrq_state"] = p["brdrq_state"]
                if p["brdr_metadata"]:
                    row["brdr_metadata"] = p["brdr_metadata"]
        return {"theme_id": row["theme_id"],
                "geometry_wkt": row["geometry_wkt"],
                "brdrq_original_wkt": original,
                "brdrq_state": row["brdrq_state"],
                "brdr_metadata": row["brdr_metadata"]}

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        src = g[g["side"] == "src"].drop_duplicates("theme_id", keep="first")
        if src.empty:
            return pd.DataFrame(columns=OUT_COLS)
        ps = g[g["side"] == "patch"]
        patched_ids = set(ps["theme_id"])
        # unpatched rows pass through vectorized (patches are tiny next to
        # the source — the Python replay loop runs only for patched ids)
        plain = src[~src["theme_id"].isin(patched_ids)]
        out_plain = pd.DataFrame({
            "theme_id": plain["theme_id"],
            "geometry_wkt": plain["geometry_wkt"],
            "brdrq_original_wkt": plain["brdrq_original_wkt"].where(
                plain["brdrq_original_wkt"].notna() & (plain["brdrq_original_wkt"] != ""),
                plain["geometry_wkt"]),
            "brdrq_state": plain["brdrq_state"],
            "brdr_metadata": plain["brdr_metadata"],
        })
        rows = []
        if patched_ids:
            ps_sorted = ps.sort_values(["theme_id", "seq"])
            src_by_id = src.set_index("theme_id", drop=False)
            for tid, pgrp in ps_sorted.groupby("theme_id", sort=False):
                if tid in src_by_id.index:
                    rows.append(merge_one(src_by_id.loc[tid], pgrp))
        out = pd.concat([out_plain, pd.DataFrame(rows, columns=OUT_COLS)],
                        ignore_index=True)
        return out[OUT_COLS]

    return tagged.groupby("b").map_groups(
        lambda g: merge_bucket(g.drop(columns=["b"])), batch_format="pandas")

"""Per-tile checkpoint, lineage and resume.

The reference has no checkpointing — any exception aborts the QGIS run
(SURVEY.md section 4 'Retries/Checkpoint'). At 100 TB the north rule requires
a killed run to replay ONLY unfinished tiles, so the engine writes its results
as one parquet directory per owner cell:

    out_dir/part=<part_key>/part.parquet     (written tmp -> atomic rename)
    out_dir/_manifest.jsonl                  (one line per finished partition)

The checkpoint unit is the shuffle partition key ``part_key`` (= cell | salt
<<45): a salted hot cell is several partitions, each resumable on its own.
Manifest lines carry lineage + metrics: part_key, owner cell, row count,
params hash (the alignment config + grid), wall time. Resume = read the
manifest, drop finished partitions from the keyed input BEFORE the shuffle
(the groupby never sees them — skipped partitions cost zero compute), run the
remainder. The driver consumes the write DAG as a STREAM (iter_batches) and
appends manifest lines as partitions finish — the jsonl grows during the run,
so a mid-run kill keeps every finished partition's driver-side lineage (the
per-partition _rec.json files cover the in-flight remainder).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def params_hash(cfg, mode: str, max_rd: float, plan_sample: float = 1.0) -> str:
    from dataclasses import asdict
    doc = {"cfg": asdict(cfg), "mode": mode, "max_rd": max_rd}
    if plan_sample != 1.0:  # sampled plans produce different partition keys
        doc["plan_sample"] = plan_sample
    return hashlib.sha1(json.dumps(doc, sort_keys=True).encode()).hexdigest()[:16]


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.jsonl")


def read_manifest(out_dir: str, phash: str | None = None) -> dict[int, dict]:
    """Finished partitions keyed by part_key (optionally only those produced
    with the same params — a changed config invalidates old checkpoints).

    Records come from two sources, merged: the driver-side ``_manifest.jsonl``
    (append-only lineage) and the per-partition ``part=K/_rec.json`` files the
    CellWriter emits atomically next to each part.parquet. The per-partition
    records are authoritative for resume: a mid-run kill leaves them in place
    for every finished tile, so a resume replays ONLY unfinished tiles even
    when the driver never got to append the jsonl."""
    done: dict[int, dict] = {}

    def admit(rec: dict):
        if phash is not None and rec.get("params_hash") != phash:
            return
        # the data must actually still be there
        if os.path.exists(os.path.join(rec["path"], "part.parquet")):
            done[int(rec["part_key"])] = rec

    path = manifest_path(out_dir)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                admit(json.loads(line))
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            rec_path = os.path.join(out_dir, name, "_rec.json")
            if name.startswith("part=") and os.path.exists(rec_path):
                try:
                    with open(rec_path) as f:
                        admit(json.load(f))
                except (ValueError, OSError):
                    continue  # torn write: treat the partition as unfinished
    return done


def purge_stale_parts(out_dir: str, phash: str):
    """Delete part directories whose record carries a DIFFERENT params_hash
    (or none at all — an orphan of unknown lineage). Run at the start of every
    checkpointed run: a changed config or tile plan produces new part keys,
    and without the purge read_results would mix stale old-param rows with
    fresh ones (duplicate theme_ids, wrong geometries)."""
    import shutil
    if not os.path.isdir(out_dir):
        return
    # lineage known from the jsonl may cover dirs whose _rec.json is missing
    jsonl_phash: dict[str, str] = {}
    path = manifest_path(out_dir)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    jsonl_phash[os.path.basename(rec["path"])] = rec.get("params_hash", "")
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        part_dir = os.path.join(out_dir, name)
        rec_path = os.path.join(part_dir, "_rec.json")
        rec_hash = None
        if os.path.exists(rec_path):
            try:
                with open(rec_path) as f:
                    rec_hash = json.load(f).get("params_hash")
            except (ValueError, OSError):
                rec_hash = None
        if rec_hash is None:
            rec_hash = jsonl_phash.get(name)
        if rec_hash != phash:
            shutil.rmtree(part_dir, ignore_errors=True)


def append_manifest(out_dir: str, records: list[dict]):
    with open(manifest_path(out_dir), "a") as f:
        for rec in records:
            f.write(json.dumps(rec, sort_keys=True) + "\n")


class CellWriter:
    """map_groups callable: writes one cell's result rows atomically and
    emits its manifest record as the group output (the write IS the task, so
    a task retry rewrites the tmp file and re-renames — idempotent)."""

    def __init__(self, out_dir: str, phash: str):
        self.out_dir = out_dir
        self.phash = phash

    EMPTY = pa.schema([("part_key", pa.int64()), ("cell", pa.int64()),
                       ("rows", pa.int64()), ("bytes", pa.int64()),
                       ("path", pa.string()), ("params_hash", pa.string()),
                       ("wall_sec", pa.float64())])

    def __call__(self, part_key: int, group: pa.Table) -> pa.Table:
        t0 = time.time()
        if group.num_rows == 0:
            return self.EMPTY.empty_table()
        cell = int(group.column("cell")[0].as_py())
        part_dir = os.path.join(self.out_dir, f"part={part_key}")
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(group, tmp)
        nbytes = os.path.getsize(tmp)
        os.replace(tmp, os.path.join(part_dir, "part.parquet"))
        rec = {"part_key": int(part_key), "cell": cell, "rows": group.num_rows,
               "bytes": nbytes, "path": part_dir, "params_hash": self.phash,
               "wall_sec": time.time() - t0}
        # per-partition manifest record, written atomically AFTER the data: a
        # mid-run kill leaves every finished tile individually resumable (the
        # driver-side jsonl append only happens after the whole run)
        rtmp = os.path.join(part_dir, f".rec-{uuid.uuid4().hex}")
        with open(rtmp, "w") as f:
            json.dump(rec, f, sort_keys=True)
        os.replace(rtmp, os.path.join(part_dir, "_rec.json"))
        return pa.table({"part_key": pa.array([rec["part_key"]], pa.int64()),
                         "cell": pa.array([cell], pa.int64()),
                         "rows": pa.array([group.num_rows], pa.int64()),
                         "bytes": pa.array([nbytes], pa.int64()),
                         "path": pa.array([part_dir], pa.string()),
                         "params_hash": pa.array([self.phash], pa.string()),
                         "wall_sec": pa.array([rec["wall_sec"]], pa.float64())})


def run_alignment_checkpointed(thematic, reference, out_dir: str, cfg=None,
                               mode: str = "predict", max_rd: float | None = None,
                               cell_level: int | None = None,
                               plan_sample: float = 1.0) -> dict:
    """Checkpointed flagship run. Returns {'processed_cells': [...],
    'skipped_cells': [...], 'rows': int}. Call again after a kill to resume.

    With ``plan_sample`` < 1 the tile plan comes from a seeded sample and
    features the sample missed are ROUTED through their own exact-plan
    fallback DAG (run_alignment semantics), checkpointed into the SAME
    out_dir: fallback partition keys embed the coarser cell level, so they
    never collide with main keys, and a resume replays only unfinished tiles
    of either DAG."""
    from ..alignment import AlignConfig
    from ..pipelines.autocorrect import prepare_aligned_inputs
    from ..stages.align_stage import AlignGroupFn

    cfg = cfg or AlignConfig()
    max_rd = max_rd if max_rd is not None else cfg.relevant_distance
    phash = params_hash(cfg, mode, max_rd, plan_sample)
    os.makedirs(out_dir, exist_ok=True)
    purge_stale_parts(out_dir, phash)  # changed params -> old part dirs go
    done = read_manifest(out_dir, phash)
    done_keys = set(done)

    # plan lineage: the first run persists its tile plan; a resume reuses it
    # (skips the planning scan AND guarantees identical partition keys)
    from ..pipelines.autocorrect import TilePlan
    plan_path = os.path.join(out_dir, "_plan.json")
    plan_override = None
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            doc = json.load(f)
        if doc.get("params_hash") == phash:
            plan_override = TilePlan(level=doc["level"],
                                     salts={int(k): v for k, v in doc["salts"].items()},
                                     max_extent=doc["max_extent"],
                                     n_features=doc["n_features"])

    unified, plan, ref_handle, oversized = prepare_aligned_inputs(
        thematic, reference, max_rd, cell_level=cell_level,
        plan_override=plan_override, plan_sample=plan_sample,
        oversize_policy="route" if plan_sample < 1.0 else "fail")
    if plan_override is None:
        with open(plan_path, "w") as f:
            json.dump({"params_hash": phash, "level": plan.level,
                       "salts": {str(k): v for k, v in plan.salts.items()},
                       "max_extent": plan.max_extent,
                       "n_features": plan.n_features}, f)
    if done_keys:
        import pyarrow.compute as pc

        def drop_done(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch.column("part_key"),
                                      value_set=pa.array(sorted(done_keys), pa.int64())))
            return batch.filter(mask)

        unified = unified.map_batches(drop_done, batch_format="pyarrow")

    align = AlignGroupFn(cfg, mode=mode, max_rd=max_rd, ref_broadcast=ref_handle)
    writer = CellWriter(out_dir, phash)

    def align_and_write(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return CellWriter.EMPTY.empty_table()
        part_key = int(group.column("part_key")[0].as_py())
        return writer(part_key, align(group))

    def stream_manifest(ds) -> list[dict]:
        """Consume the write DAG as a stream, appending each batch of
        manifest records to the driver jsonl AS PARTITIONS FINISH — a kill
        mid-run loses only the in-flight partitions' driver records (and the
        per-partition _rec.json files cover even those), instead of losing
        the whole run's lineage to a post-hoc append."""
        out: list[dict] = []
        # batch_size=None = one batch per arriving block: append granularity
        # follows task completion instead of a 256-row coalescing buffer
        for batch in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            recs = batch.to_pylist()
            for r in recs:
                r["cell"] = int(r["cell"])
                r["part_key"] = int(r["part_key"])
            append_manifest(out_dir, recs)
            out.extend(recs)
        return out

    records = stream_manifest(unified.groupby("part_key")
                              .map_groups(align_and_write,
                                          batch_format="pyarrow"))

    if oversized is not None:
        # sampled-plan fallback: the oversized subset (tiny) gets its own
        # EXACT plan — its keys embed the coarser level, so they are disjoint
        # from the main DAG's keys and checkpoint into the same out_dir
        oversized = oversized.materialize()
        if oversized.count() > 0:
            over_unified, _, over_handle, _ = prepare_aligned_inputs(
                oversized, reference, max_rd, cell_level=None, pre_parsed=True)
            if done_keys:
                over_unified = over_unified.map_batches(drop_done,
                                                        batch_format="pyarrow")
            align_fb = AlignGroupFn(cfg, mode=mode, max_rd=max_rd,
                                    ref_broadcast=over_handle)

            def align_and_write_fb(group: pa.Table) -> pa.Table:
                if group.num_rows == 0:
                    return CellWriter.EMPTY.empty_table()
                part_key = int(group.column("part_key")[0].as_py())
                return writer(part_key, align_fb(group))

            records.extend(stream_manifest(
                over_unified.groupby("part_key")
                .map_groups(align_and_write_fb, batch_format="pyarrow")))

    return {
        "processed_parts": sorted({r["part_key"] for r in records}),
        "skipped_parts": sorted(done_keys),
        "rows": int(sum(r["rows"] for r in records)),
        "level": plan.level,
        "params_hash": phash,
    }


def read_results(out_dir: str, phash: str | None = None) -> ray.data.Dataset:
    """Read the finished partitions back as one Dataset. The path list comes
    from the manifest records (NOT a raw listdir): only partitions with a
    matching params_hash — pass the hash from run_alignment_checkpointed's
    stats — and an existing part.parquet are admitted, so stale dirs from an
    earlier differently-parameterized run can never leak into the result."""
    recs = read_manifest(out_dir, phash)
    paths = [os.path.join(r["path"], "part.parquet")
             for _, r in sorted(recs.items())]
    if not paths:
        raise FileNotFoundError(
            f"no finished partitions in {out_dir}"
            + (f" for params_hash={phash}" if phash else ""))
    return ray.data.read_parquet(paths)

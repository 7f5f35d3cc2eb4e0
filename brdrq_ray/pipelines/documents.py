"""Interleaved-document pipeline (the north-rule flagship).

Input: a table of interleaved text + media documents —
``doc_id: string, spans: list<struct<kind, text, media_ref, offset>>``
(BASELINE.json input_hint; geometry spans carry WKT in ``text``).

    documents --flat_map--> geometry spans (doc_id, span_idx, wkt)
              --[alignment DAG from pipelines.autocorrect]--> aligned spans
    documents --groupby(doc_id) stitch--> documents with aligned geometry

The per-row invariant (BASELINE.json): after explode -> align -> stitch, every
document's span sequence is EQUAL on (kind, text, media_ref, order) — text and
media spans byte-identical and in the original order; geometry spans in place,
their text replaced by the aligned WKT (``stitch_replace_text=True``) or kept
identical (verification mode). The stitch key is (doc_id, span_idx) — span_idx
is the position in the original list, which together with ``offset`` restores
exact order without any global sort (SURVEY.md section 4 'Ordering').

Scale: explode and stitch are per-doc-local (map_batches / one groupby on
doc_id); the alignment in the middle reuses the one-shuffle tile DAG.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..alignment import AlignConfig
from ..pipelines.autocorrect import run_alignment
from ..stages.ingest import emit_wkt


SPAN_TYPE = pa.struct([("kind", pa.string()), ("text", pa.string()),
                       ("media_ref", pa.string()), ("offset", pa.int32())])


def explode_geometry_spans(batch: pa.Table) -> pa.Table:
    """documents -> one row per geometry span: (doc_id, span_idx, geometry_wkt).
    Pure Arrow/numpy offsets work — no Python per span of non-geometry kinds."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()  # struct array of all spans
    # offsets of a zero-copy ListArray slice are absolute into the parent
    # values buffer (offsets[0] != 0 for Ray block slices); flatten() already
    # accounts for the slice, so normalize before indexing into `flat`
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    offsets = offsets - offsets[0]
    n_per_doc = np.diff(offsets)
    doc_idx = np.repeat(np.arange(batch.num_rows), n_per_doc)
    span_idx = np.arange(len(flat)) - np.repeat(offsets[:-1], n_per_doc)
    kinds = flat.field("kind")
    is_geom = pa.compute.equal(kinds, "geometry").to_numpy(zero_copy_only=False)
    sel = np.nonzero(is_geom)[0]
    doc_ids = batch.column("doc_id").take(pa.array(doc_idx[sel]))
    return pa.table({
        "theme_id": pa.compute.binary_join_element_wise(
            doc_ids.cast(pa.string()), pa.array(span_idx[sel].astype(str), pa.string()), "#"),
        "doc_id": doc_ids,
        "span_idx": pa.array(span_idx[sel], pa.int32()),
        "geometry_wkt": flat.field("text").take(pa.array(sel)),
    })


def _stitch_bucket(group: pa.Table, replace_text: bool) -> pa.Table:
    """One hash bucket of documents: merge each doc's aligned geometry spans
    back into its span list. Bucketing (instead of one group per doc) keeps
    the shuffle key space small and amortizes per-group call overhead.

    The span merge is Arrow list-array surgery, not a per-span Python loop:
    the bucket's span lists are flattened once, replacement positions are
    computed vectorized (doc-row indexer + per-doc offsets + span_idx), the
    text child array is patched in place, and the list array is rebuilt on the
    original offsets — so the struct fields (incl. offset:int32) round-trip
    byte-identically."""
    import pandas as pd
    import pyarrow.compute as pc

    side = group.column("side")
    docs = group.filter(pc.equal(side, "doc"))
    if docs.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.string()),
                         "spans": pa.array([], pa.list_(SPAN_TYPE))})
    spans = docs.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    spans = spans.cast(pa.list_(SPAN_TYPE))
    doc_ids = docs.column("doc_id").cast(pa.string())
    if not replace_text:
        return pa.table({"doc_id": doc_ids, "spans": spans})

    flat = spans.flatten()
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    offsets = offsets - offsets[0]  # normalize zero-copy slice offsets

    aligned = group.filter(pc.equal(side, "aligned"))
    a_doc = aligned.column("doc_id").to_pylist()
    a_idx = aligned.column("span_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    a_wkt = np.asarray(aligned.column("aligned_wkt").to_pylist(), dtype=object)

    row = pd.Index(doc_ids.to_pylist()).get_indexer(a_doc)
    ok = row >= 0
    pos = offsets[row[ok]] + a_idx[ok]
    is_geom = pa.compute.equal(flat.field("kind"), "geometry").to_numpy(zero_copy_only=False)
    ok2 = is_geom[pos]
    pos = pos[ok2]
    texts = flat.field("text").to_numpy(zero_copy_only=False).astype(object)
    texts[pos] = a_wkt[ok][ok2]

    new_flat = pa.StructArray.from_arrays(
        [flat.field("kind"), pa.array(texts, pa.string()),
         flat.field("media_ref"), flat.field("offset")],
        fields=list(SPAN_TYPE))
    new_spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), new_flat)
    return pa.table({"doc_id": doc_ids,
                     "spans": new_spans.cast(pa.list_(SPAN_TYPE))})


def align_documents(documents: ray.data.Dataset, reference: ray.data.Dataset,
                    cfg: AlignConfig | None = None, cell_level: int | None = None,
                    replace_text: bool = True,
                    hot_threshold: int = 256,
                    stitch_buckets: int | None = None,
                    mode: str = "predict",
                    max_rd: float | None = None,
                    broadcast_reference: bool | None = None) -> ray.data.Dataset:
    """Explode geometry spans, align them against the reference, stitch the
    documents back preserving span order. Returns (doc_id, spans) with the
    same schema as the input.

    ``hot_threshold`` bounds rows per shuffle group (salted split above it) —
    it is the parallelism knob: groups >= total geometry spans / threshold.

    ``stitch_buckets`` defaults to a scale-aware value (~1024 docs per bucket,
    floor 64) derived from a cheap metadata count, so a 100x bigger corpus
    gets 100x more stitch groups instead of 100x bigger pandas groups.

    ``mode``: 'predict' aligns every span at cfg.relevant_distance;
    'evaluate_best' runs the full stability scan per span and stitches the
    single best prediction (auto-tuned relevant distance per span — the
    reference's PREDICTIONS=BEST strategy, brdrq_algorithm_common.py:123-130)."""
    cfg = cfg or AlignConfig()
    if stitch_buckets is None:
        try:
            n_docs = documents.count()
        except Exception:
            n_docs = None
        stitch_buckets = max(64, int(np.ceil((n_docs or 0) / 1024)))
    geo = documents.map_batches(explode_geometry_spans, batch_format="pyarrow")
    # the stitch consumes only the final result geometry: slots=("result",)
    # skips packing/shipping the five diff/intersection blobs per span row
    if mode == "evaluate_best":
        from dataclasses import replace
        cfg_best = replace(cfg, max_predictions=1, multi_to_best_prediction=True)
        results = run_alignment(geo, reference, cfg_best, mode="evaluate",
                                max_rd=max_rd if max_rd else cfg.relevant_distance,
                                cell_level=cell_level, hot_threshold=hot_threshold,
                                broadcast_reference=broadcast_reference,
                                slots=("result",))
    else:
        results = run_alignment(geo, reference, cfg, mode="predict",
                                cell_level=cell_level, hot_threshold=hot_threshold,
                                broadcast_reference=broadcast_reference,
                                slots=("result",))
    aligned = results.map_batches(
        lambda b: emit_wkt(b.select(["doc_id", "span_idx", "result_geom"]),
                           geom_col="result_geom",
                           out_col="aligned_wkt", drop_geom=True),
        batch_format="pyarrow")

    def _bucket_of(doc_ids):
        from ..functions.vhash import bucket_i32
        if isinstance(doc_ids, list):
            doc_ids = np.asarray(doc_ids, dtype=object)
        return bucket_i32(doc_ids, stitch_buckets)

    def split_key(batch: pa.Table) -> pa.Table:
        # (doc_id, span_idx) rode the alignment DAG as real columns
        # (explode_geometry_spans -> _unify passthrough -> RESULT_SCHEMA), so
        # keying the stitch is pure column selection — no composite-string
        # re-parse per row
        n = batch.num_rows
        doc_ids = batch.column("doc_id").cast(pa.string())
        return pa.table({
            "side": pa.array(["aligned"] * n),
            "bucket": _bucket_of(doc_ids),
            "doc_id": doc_ids,
            "span_idx": batch.column("span_idx").cast(pa.int32()),
            "aligned_wkt": batch.column("aligned_wkt"),
            "spans": pa.nulls(n, pa.list_(SPAN_TYPE)),
        })

    aligned_keyed = aligned.map_batches(split_key, batch_format="pyarrow")

    def doc_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column("doc_id").cast(pa.string())
        return pa.table({
            "side": pa.array(["doc"] * n),
            "bucket": _bucket_of(ids),
            "doc_id": ids,
            "span_idx": pa.nulls(n, pa.int32()),
            "aligned_wkt": pa.nulls(n, pa.string()),
            "spans": batch.column("spans").cast(pa.list_(SPAN_TYPE)),
        })

    doc_keyed = documents.map_batches(doc_side, batch_format="pyarrow")

    def stitch(group: pa.Table) -> pa.Table:
        return _stitch_bucket(group, replace_text)

    return doc_keyed.union(aligned_keyed).groupby("bucket").map_groups(
        stitch, batch_format="pyarrow")


def span_sequence_table(documents: ray.data.Dataset, with_text: bool = True) -> ray.data.Dataset:
    """Flatten (doc_id, span order, kind, text, media_ref, offset) for the
    span-sequence-equality check — comparing this table before/after the
    pipeline proves the per-row invariant."""
    def flatten(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        offsets = spans.offsets.to_numpy(zero_copy_only=False)
        offsets = offsets - offsets[0]  # normalize zero-copy slice offsets
        n_per_doc = np.diff(offsets)
        doc_idx = np.repeat(np.arange(batch.num_rows), n_per_doc)
        span_idx = np.arange(len(flat)) - np.repeat(offsets[:-1], n_per_doc)
        cols = {
            "doc_id": batch.column("doc_id").take(pa.array(doc_idx)),
            "span_idx": pa.array(span_idx, pa.int32()),
            "kind": flat.field("kind"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
        if with_text:
            cols["text"] = flat.field("text")
        return pa.table(cols)

    return documents.map_batches(flatten, batch_format="pyarrow")


# --- media-payload dedup across interleaved documents ------------------------
# The crawl reality for interleaved text+media corpora: the same image bytes
# appear under thousands of distinct refs (mirrors, CDNs, re-uploads). Dedup
# canonicalizes refs by payload content hash so storage keeps ONE copy and
# every span points at it — the media analog of exact text dedup.


def canonical_media_refs(media: ray.data.Dataset, ref_col: str = "media_ref",
                         payload_col: str = "payload",
                         n_buckets: int = 64) -> ray.data.Dataset:
    """(media_ref, canonical_ref) for every media row: canonical = the
    lexicographically smallest ref among rows with byte-identical payloads
    (md5 content hash). Scale shape: only the (ref, hash) projection
    shuffles — one hash-bucketed groupby, payload bytes never move; per
    bucket the canonical ref is one vectorized pandas transform."""
    import hashlib

    import pandas as pd

    from ..functions.vhash import bucket_i32

    def content_hash(batch: pa.Table) -> pa.Table:
        payloads = batch.column(payload_col).to_pylist()
        h = [hashlib.md5(p or b"").hexdigest() for p in payloads]
        return pa.table({ref_col: batch.column(ref_col).cast(pa.string()),
                         "__h": pa.array(h, pa.string()),
                         "__b": bucket_i32(pa.array(h, pa.string()),
                                           n_buckets)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        canon = g.groupby("__h")[ref_col].transform("min")
        return pd.DataFrame({ref_col: g[ref_col].to_numpy(),
                             "canonical_ref": canon.to_numpy()})

    return (media.map_batches(content_hash, batch_format="pyarrow")
            .groupby("__b").map_groups(per_bucket, batch_format="pandas"))


def canonical_media_refs_perceptual(media: ray.data.Dataset,
                                    max_hamming: int = 6,
                                    fake: bool = False,
                                    ref_col: str = "media_ref",
                                    payload_col: str = "payload"
                                    ) -> ray.data.Dataset:
    """(media_ref, canonical_ref) for refs in a PERCEPTUAL near-dup cluster:
    canonical = min ref in the connected component of pairs within
    ``max_hamming`` bits of the 64-bit perceptual hash (image pHash / audio
    spectral hash / majority-vote frame pHash — functions/multimodal).
    Byte-identical payloads hash identically (Hamming 0), so the clusters
    SUBSUME exact content dedup; re-encoded / lightly-noised / re-gained
    copies additionally collapse. Scale shape: only the (ref, 64-bit hash)
    sketch table shuffles (pigeonhole banding), payload bytes never move.
    Emits only rows whose ref changes."""
    from ..functions.dedup import duplicate_clusters
    from ..functions.multimodal import media_neardup_pairs

    pairs = media_neardup_pairs(media, max_hamming=max_hamming, fake=fake,
                                id_col=ref_col, payload_col=payload_col)
    clusters = duplicate_clusters(pairs)

    def changed_only(t: pa.Table) -> pa.Table:
        t = t.rename_columns([ref_col, "canonical_ref"])
        return t.filter(pa.compute.not_equal(t.column(ref_col),
                                             t.column("canonical_ref")))

    return clusters.map_batches(changed_only, batch_format="pyarrow")


def _replace_media_refs(batch: pa.Table, old_index, new_refs) -> pa.Table:
    """Rebuild the spans column with media_ref values remapped through
    (old_index -> new_refs). Pure Arrow list/struct surgery: the list
    offsets are reused verbatim, only the media_ref child array changes —
    span order, kinds, texts and offsets are untouched by construction."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    refs = flat.field("media_ref").to_numpy(zero_copy_only=False)
    idx = old_index.get_indexer(refs)
    hit = idx >= 0
    if hit.any():
        refs = refs.copy()
        refs[hit] = new_refs[idx[hit]]
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    struct = pa.StructArray.from_arrays(
        [flat.field("kind"), flat.field("text"),
         pa.array(refs, pa.string()), flat.field("offset")],
        ["kind", "text", "media_ref", "offset"])
    rebuilt = pa.ListArray.from_arrays(
        pa.array(offsets - offsets[0], pa.int32()), struct)
    i = batch.schema.get_field_index("spans")
    return batch.set_column(i, "spans", rebuilt)


def dedup_media_payloads(docs: ray.data.Dataset, media: ray.data.Dataset,
                         ref_col: str = "media_ref",
                         payload_col: str = "payload",
                         n_buckets: int = 64,
                         broadcast_limit: int = 4_000_000,
                         perceptual_hamming: int | None = None,
                         fake_hash: bool = False):
    """Dedup media payloads across an interleaved corpus. Returns
    ``(docs_rewritten, media_kept, remap)``:

    - ``remap``: (media_ref, canonical_ref) for refs that CHANGE (bounded by
      the duplicate count, not the corpus; unique per ref — a ref appearing
      in several media rows maps to its lexicographically smallest
      canonical, so both rewrite legs agree deterministically);
    - ``media_kept``: the media table with duplicate-payload rows removed
      (canonical refs only). Below ``broadcast_limit`` this is a per-batch
      ``is_in`` filter against the broadcast changed-ref set — payload
      bytes NEVER move; above it a distributed anti semi-join (the one
      place payloads must shuffle, unavoidable without a driver-side set);
    - ``docs_rewritten``: every media span's ref canonicalized, all other
      span fields and the span order byte-identical (the north-rule
      span-sequence invariant holds on (kind, text, order); media_ref
      changes are exactly the remap rows).

    Hybrid rewrite like remove_boilerplate_lines: at or below
    ``broadcast_limit`` remap rows the mapping ships once via ray.put and
    each batch remaps with one hash-based pandas get_indexer (zero
    shuffles); above it only the MEDIA spans route through a distributed
    lookup join (text/geometry spans bypass — their empty ref would
    otherwise concentrate the whole corpus in one join bucket), and
    documents are rebuilt by a scale-aware bucketed groupby (~1024
    docs/bucket) with Arrow list surgery — no driver-side mapping at any
    size.

    ``perceptual_hamming``: when set, canonicalization uses PERCEPTUAL
    near-dup clusters (64-bit pHash/spectral/frame hashes within that many
    bits, connected components, min ref wins) instead of exact md5 groups —
    re-encoded or lightly-edited copies of the same media collapse too.
    ``fake_hash`` forwards the opaque-bytes fallback to the hash stage."""
    import pandas as pd

    import ray

    from ..functions.relational import semi_join
    from ..functions.vhash import bucket_i32

    if perceptual_hamming is not None:
        # near-dup canonicalization: perceptual clusters subsume exact
        # (byte-identical payloads are Hamming-0 pairs)
        mapping = canonical_media_refs_perceptual(
            media, max_hamming=perceptual_hamming, fake=fake_hash,
            ref_col=ref_col, payload_col=payload_col)
    else:
        mapping = canonical_media_refs(media, ref_col=ref_col,
                                       payload_col=payload_col,
                                       n_buckets=n_buckets)
    changed = mapping.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t.column(ref_col),
                                                t.column("canonical_ref"))),
        batch_format="pyarrow")

    # a ref can appear in several media rows (duplicate rows, or one ref
    # with conflicting payloads in different hash buckets): make the remap
    # UNIQUE per ref — min canonical wins — via one ref-bucketed groupby of
    # the (ref, canonical) projection
    def uniq_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__rb", bucket_i32(
            t.column(ref_col).cast(pa.string()), n_buckets))

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(ref_col, as_index=False)["canonical_ref"].min())

    remap = (changed.map_batches(uniq_bucket, batch_format="pyarrow")
             .groupby("__rb").map_groups(uniq, batch_format="pandas")
             .materialize())
    n_remap = remap.count()
    if n_remap == 0:
        return docs, media, remap

    if n_remap <= broadcast_limit:
        # zero-row blocks (buckets whose every ref kept its canonical) come
        # back schema-less and break concat — drop them; n_remap > 0
        # guarantees at least one real block
        chunks = [t for t in (ray.get(r) for r in remap.to_arrow_refs())
                  if t.num_rows]
        tbl = pa.concat_tables(chunks).combine_chunks()
        map_ref = ray.put(tbl)
        drop_ref = ray.put(tbl.column(ref_col).combine_chunks())

        class KeepCanonical:
            def __init__(self):
                self.drop = ray.get(drop_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                hit = pa.compute.is_in(
                    batch.column(ref_col).cast(pa.string()),
                    value_set=self.drop)
                return batch.filter(pa.compute.invert(hit))

        media_kept = media.map_batches(KeepCanonical, batch_format="pyarrow",
                                       concurrency=_pool())

        class RewriteRefs:
            def __init__(self):
                t = ray.get(map_ref)
                self.old = pd.Index(
                    t.column(ref_col).to_numpy(zero_copy_only=False))
                self.new = t.column("canonical_ref").to_numpy(
                    zero_copy_only=False)

            def __call__(self, batch: pa.Table) -> pa.Table:
                return _replace_media_refs(batch, self.old, self.new)

        return (docs.map_batches(RewriteRefs, batch_format="pyarrow",
                                 concurrency=_pool()),
                media_kept, remap)

    # ---- distributed leg (remap too large for any broadcast) ---------------
    from ..functions.relational import lookup_join

    media_kept = semi_join(media, remap.select_columns([ref_col]),
                           on=ref_col, anti=True)

    flat = span_sequence_table(docs, with_text=True)
    # only media spans carry a joinable ref; text/geometry spans (empty or
    # null ref) bypass the join — routing them through it would hash the
    # whole corpus into the single empty-string bucket
    is_media = lambda t: t.filter(  # noqa: E731
        pa.compute.equal(t.column("kind"), "media"))
    not_media = lambda t: t.filter(  # noqa: E731
        pa.compute.not_equal(t.column("kind"), "media"))
    med = flat.map_batches(is_media, batch_format="pyarrow")
    rest = flat.map_batches(not_media, batch_format="pyarrow")
    joined = lookup_join(med, remap.map_batches(
        lambda t: t.rename_columns([ref_col, "__canon"]),
        batch_format="pyarrow"), on=ref_col, value_col="__canon",
        n_buckets=n_buckets)

    def coalesce_ref(t: pa.Table) -> pa.Table:
        ref = pa.compute.coalesce(t.column("__canon"), t.column(ref_col))
        t = t.set_column(t.schema.get_field_index(ref_col), ref_col, ref)
        return t.drop_columns(["__canon"])

    flat_out = joined.map_batches(coalesce_ref, batch_format="pyarrow") \
                     .union(rest)

    # ~1024 docs per rebuild bucket, like align_documents' stitch — a fixed
    # bucket count would put corpus/n_buckets spans (text included) in one
    # task at scale
    rebuild_buckets = max(n_buckets, docs.count() // 1024)

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__db", bucket_i32(
            t.column("doc_id").cast(pa.string()), rebuild_buckets))

    def rebuild(group: pa.Table) -> pa.Table:
        group = group.sort_by([("doc_id", "ascending"),
                               ("span_idx", "ascending")])
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        first = np.ones(len(doc), dtype=bool)
        first[1:] = doc[1:] != doc[:-1]
        starts = np.nonzero(first)[0]
        offsets = np.append(starts, len(doc)).astype(np.int32)
        struct = pa.StructArray.from_arrays(
            [group.column("kind").combine_chunks(),
             group.column("text").combine_chunks(),
             group.column(ref_col).combine_chunks(),
             group.column("offset").combine_chunks()],
            ["kind", "text", "media_ref", "offset"])
        spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         struct)
        return pa.table({"doc_id": pa.array(doc[starts]),
                         "__spans": spans})

    rebuilt = (flat_out.map_batches(add_doc_bucket, batch_format="pyarrow")
               .groupby("__db").map_groups(rebuild, batch_format="pyarrow"))
    out = lookup_join(docs, rebuilt, on="doc_id", value_col="__spans",
                      n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        new = t.column("__spans")
        if isinstance(new, pa.ChunkedArray):
            new = new.combine_chunks()
        old = t.column("spans")
        if isinstance(old, pa.ChunkedArray):
            old = old.combine_chunks()
        if new.null_count:
            # a doc with zero spans never explodes -> no rebuilt row; keep
            # its original (empty) list. Rare by construction, so the
            # per-null python fallback never sees real volume.
            keep = new.is_valid().to_numpy(zero_copy_only=False)
            vals = [new[i].as_py() if keep[i] else old[i].as_py()
                    for i in range(len(new))]
            new = pa.array(vals, type=old.type)
        i = t.schema.get_field_index("spans")
        return t.set_column(i, "spans", new.cast(old.type)) \
                .drop_columns(["__spans"])

    return (out.map_batches(finish, batch_format="pyarrow"),
            media_kept, remap)

def _pool():
    """Cluster-sized actor-pool bounds (see functions/pool.py)."""
    from ..functions.pool import actor_pool
    return actor_pool()

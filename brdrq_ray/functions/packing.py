"""GPT-style fixed-length sequence chunking (the training-tensor last mile).

``pack_sequences`` (functions/text.py) assigns whole documents to budgeted
bins — no document ever splits. Causal-LM pretraining uses the complementary
layout (GPT-2/3, Raffel et al.): concatenate EVERY document's token ids in a
fixed corpus order with an EOS separator, then slice the stream into
back-to-back sequences of exactly ``seq_len`` tokens — documents split
across chunk boundaries, no padding except (optionally) the final partial
chunk.

The corpus order is the engine's deterministic hash order
(hash60(seed|id) ASC, id ASC — the same total order as shuffle_by_hash), so
the output is a pure function of (corpus, seed, seq_len): reproducible
across runs, partitionings and cluster sizes, and re-chunkable per epoch by
changing the seed.

Distributed shape (two exchanges of the token data, which a global
reorganization cannot avoid; everything else is metadata-sized):

1. plan pass — a (bucket, token-count) projection streams into per-bucket
   totals (buckets = ordered hash ranges, so bucket order == corpus order);
   the driver prefix-sums ~n_buckets integers into global bucket base
   offsets. No token bytes move.
2. slice pass — groupby(bucket): each group sorts its docs by (hash, id),
   lays tokens + EOS into one flat stream (vectorized shift-by-doc-index
   fill), and cuts it at global seq_len boundaries into (chunk_id, pos,
   piece) rows. A piece never exceeds seq_len tokens.
3. assemble pass — groupby(chunk_id): order pieces by pos, concatenate,
   emit one (chunk_id, input_ids, n_pieces) row. The final partial chunk is
   dropped (``drop_last=True``, the GPT default) or padded with ``pad_id``.

Sizing: a bucket's flat stream uses int32 list offsets (< 2^31 tokens per
bucket) — size ``n_buckets`` so corpus_tokens / n_buckets stays well under
that (the 256 default holds to ~500 G tokens; pass 2^16+ buckets at
10^12-doc scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _flat_tokens(col) -> tuple[np.ndarray, np.ndarray]:
    """list<int> column -> (flat int32 values, int64 offsets), zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = np.asarray(col.offsets)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
    return flat, offsets - offsets[0]


def chunk_fixed_length(ds, seq_len: int, tokens_col: str = "bpe_ids",
                       id_col: str = "doc_id", eos_id: int | None = None,
                       seed: str = "chunk", n_buckets: int | None = None,
                       drop_last: bool = True,
                       pad_id: int | None = None) -> ray.data.Dataset:
    """Chunk a tokenized corpus into fixed-length training sequences
    (module docstring). Returns (chunk_id:int64, input_ids:list<int32>,
    n_pieces:int32) with every input_ids exactly ``seq_len`` long."""
    import ray

    from .sampling import hash60

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if not drop_last and pad_id is None:
        raise ValueError("drop_last=False requires a pad_id")
    if n_buckets is None:
        n_buckets = 256
    bits = max(1, int(np.ceil(np.log2(n_buckets))))
    n_buckets = 1 << bits
    shift = np.uint64(60 - bits)
    extra = 1 if eos_id is not None else 0

    def key_cols(batch: pa.Table, with_tokens: bool) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        h = hash60(ids, seed)
        bucket = (h.astype(np.uint64) >> shift).astype(np.int64)
        toks = batch.column(tokens_col)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = np.asarray(pa.compute.list_value_length(toks), dtype=np.int64)
        cols = {"bucket": pa.array(bucket, pa.int64()),
                "h": pa.array(h.astype(np.int64), pa.int64()),
                id_col: batch.column(id_col),
                "n_tok": pa.array(lens + extra, pa.int64())}
        if with_tokens:
            cols["toks"] = toks
        return pa.table(cols)

    # ---- pass 1: per-bucket totals -> global base offsets ------------------
    def bucket_partial(batch: pa.Table) -> pa.Table:
        t = key_cols(batch, with_tokens=False)
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        n = t.column("n_tok").to_numpy(zero_copy_only=False)
        sums = np.bincount(b, weights=n, minlength=n_buckets).astype(np.int64)
        nz = np.nonzero(sums)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "total": pa.array(sums[nz], pa.int64())})

    totals = np.zeros(n_buckets, dtype=np.int64)
    for r in ds.map_batches(bucket_partial, batch_format="pyarrow").take_all():
        totals[r["bucket"]] += r["total"]
    base = np.zeros(n_buckets + 1, dtype=np.int64)
    np.cumsum(totals, out=base[1:])
    grand_total = int(base[-1])
    n_full = grand_total // seq_len
    base_ref = ray.put(base[:-1])

    # ---- pass 2: bucket-local flat stream -> (chunk_id, pos, piece) -------
    def slice_bucket(group: pa.Table) -> pa.Table:
        bases = ray.get(base_ref)
        bucket = int(group.column("bucket")[0].as_py())
        order = np.lexsort((np.asarray(group.column(id_col).to_pylist()),
                            group.column("h").to_numpy(zero_copy_only=False)))
        group = group.take(pa.array(order))
        flat, offs = _flat_tokens(group.column("toks"))
        lens = np.diff(offs)
        n_docs = len(lens)
        if eos_id is not None:
            out = np.empty(len(flat) + n_docs, dtype=np.int32)
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            out[np.arange(len(flat), dtype=np.int64) + doc_of] = flat
            ends = offs[1:] + np.arange(1, n_docs + 1)
            out[ends - 1] = eos_id
            flat = out
        start = int(bases[bucket])
        total = len(flat)
        if total == 0:
            return pa.table({"chunk_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int32()),
                             "piece": pa.array([], pa.list_(pa.int32()))})
        # cut at every global multiple of seq_len inside (start, start+total)
        first = ((start // seq_len) + 1) * seq_len
        cuts = np.arange(first, start + total, seq_len) - start
        bounds = np.concatenate(([0], cuts, [total])).astype(np.int64)
        bounds = np.unique(bounds)
        piece_start = bounds[:-1]
        chunk_id = (start + piece_start) // seq_len
        pos = (start + piece_start) - chunk_id * seq_len
        pieces = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32()), pa.array(flat, pa.int32()))
        return pa.table({"chunk_id": pa.array(chunk_id, pa.int64()),
                         "pos": pa.array(pos, pa.int32()),
                         "piece": pieces})

    pieces = (ds.map_batches(lambda b: key_cols(b, with_tokens=True),
                             batch_format="pyarrow")
              .groupby("bucket").map_groups(slice_bucket,
                                            batch_format="pyarrow"))

    # ---- pass 3: assemble chunks -------------------------------------------
    def assemble(group: pa.Table) -> pa.Table:
        group = group.sort_by([("pos", "ascending")])
        cid = int(group.column("chunk_id")[0].as_py())
        flat, _ = _flat_tokens(group.column("piece"))
        if cid >= n_full:
            if drop_last:
                return pa.table({"chunk_id": pa.array([], pa.int64()),
                                 "input_ids": pa.array([], pa.list_(pa.int32())),
                                 "n_pieces": pa.array([], pa.int32())})
            flat = np.concatenate([flat, np.full(seq_len - len(flat), pad_id,
                                                 dtype=np.int32)])
        ids = pa.ListArray.from_arrays(
            pa.array([0, seq_len], pa.int32()), pa.array(flat, pa.int32()))
        return pa.table({"chunk_id": pa.array([cid], pa.int64()),
                         "input_ids": ids,
                         "n_pieces": pa.array([group.num_rows], pa.int32())})

    return pieces.groupby("chunk_id").map_groups(assemble,
                                                 batch_format="pyarrow")

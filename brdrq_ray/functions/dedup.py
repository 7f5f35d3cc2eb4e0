"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's only dedup-shaped ops are duplicate-key detection and
prediction uniqueness (SURVEY.md D3/D4); these operators are the engine's
first-class additions for training-data pipelines at 100 TB.

Scale pattern (see ray_guide): per-batch vectorized sketching (map_batches) ->
explode to (bucket, doc) rows -> ONE groupby(bucket) shuffle of the small
sketch table (never the payloads) -> verify candidates inside the group.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .vecs import embedding_matrix

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _content_hash(texts) -> list[str]:
    return [hashlib.sha1((t or "").encode()).hexdigest() for t in texts]


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 256):
    """Exact dedup: hash-partition on content hash, keep the row with the
    minimal id per group (deterministic winner). Returns the surviving rows.
    Oracle: row_number() over (partition by col order by id).

    Two scale patterns: each batch pre-dedupes locally BEFORE the shuffle
    (combiner — a high-duplication corpus ships one row per batch+hash), and
    the shuffle keys on a HASH BUCKET of the content hash, not the hash
    itself (hash-many groups = one Python map_groups call per unique text;
    within a bucket the winner selection is one vectorized drop_duplicates)."""

    def add_hash_and_combine(batch: pa.Table) -> pa.Table:
        hashes = _content_hash(batch.column(col).to_pylist())
        t = (batch.append_column("_h", pa.array(hashes))
             .append_column("_hb", pa.array(
                 [int(h[:8], 16) % n_buckets for h in hashes], pa.int32())))
        df = t.to_pandas().sort_values(id_col).drop_duplicates("_h", keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    def first_per_hash(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).drop_duplicates("_h", keep="first")

    return (ds.map_batches(add_hash_and_combine, batch_format="pyarrow")
              .groupby("_hb").map_groups(first_per_hash, batch_format="pandas")
              .drop_columns(["_h", "_hb"]))


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

def _hash64(s: str) -> int:
    h = hashlib.blake2b(s.encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") & 0x7FFFFFFFFFFFFFFF


def _word_shingles(text: str, k: int = 3) -> set[int]:
    words = (text or "").lower().split()
    if len(words) < k:
        # blake2b, NOT builtin hash(): str hash is PYTHONHASHSEED-randomized
        # per process, which would make identical short docs sketch differently
        # across Ray workers (missed duplicates, nondeterministic runs)
        return {_hash64(" ".join(words))} if words else set()
    out = set()
    for i in range(len(words) - k + 1):
        out.add(_hash64(" ".join(words[i:i + k])))
    return out


_MERSENNE = (1 << 61) - 1


def _id_shuffle_bucket(*cols, n_buckets: int) -> pa.Array:
    """Hash-bucket of one or two ID columns of ANY type — int64 corpora and
    the north rule's string doc_ids alike. Used only to spread shuffles;
    bucket values never reach results (so the int fast path and the string
    path may disagree freely)."""
    from .vhash import hash64, splitmix64

    def one(c) -> np.ndarray:
        arr = np.asarray(c)
        if np.issubdtype(arr.dtype, np.integer):
            # C path — no per-element object boxing for int ids
            with np.errstate(over="ignore"):
                return splitmix64(arr.astype(np.uint64))
        return hash64(c, categorize=False)

    h = one(cols[0])
    for c in cols[1:]:
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15) + one(c)
    return pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32())


def _ids_restored(series: "pd.Series") -> np.ndarray:
    """Recover id values from a pandas column that passed through the
    tagged-union null promotion (int64 + nulls -> float64, exact below
    2^53); string ids come back as object and pass through untouched."""
    vals = series.to_numpy()
    if vals.dtype == np.float64:
        return vals.astype(np.int64)
    return vals


class MinHasher:
    """num_perm universal-hash minhash signatures; coefficient table built
    once (actor state when used via map_batches(Cls))."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: set[int]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        x = np.fromiter(shingles, dtype=np.uint64)
        # (a*x + b) mod p for all perms at once: (n_sh, n_perm)
        vals = (x[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return vals.min(axis=0)


def _positional_grams(texts, k: int, ordered: bool = False):
    """Vectorized word k-gram hashing with POSITIONS kept: returns
    ``(win_doc, pos, gram_hash, lens, split)`` for every full k-word window
    of every doc, in (doc, position) order — one pandas split/explode, one
    vectorized word hash, k-1 splitmix64 folds. No dedupe, no short-doc
    fallback (a doc with < k words has no window). ``lens`` is the word
    count per doc and ``split`` the lowercased word-list Series, returned so
    callers ( :func:`_shingle_hashes` ) don't re-split.

    The default fold's FIRST step is symmetric in the first two words
    ("A B C" hashes like "B A C") — harmless for LSH banding/sketching and
    kept for golden stability. ``ordered=True`` pre-mixes the accumulator
    each step so every permutation hashes distinctly — required wherever
    gram identity must match an order-sensitive string hash (the exact
    jaccard verify)."""
    from .vhash import hash64, splitmix64

    s = pd.Series(np.asarray(texts, dtype=object)).fillna("").astype(str)
    split = s.str.lower().str.split()
    lens = split.str.len().to_numpy(dtype=np.int64)
    words = split.explode()
    valid = words.notna().to_numpy()
    wh = hash64(words.to_numpy(dtype=object)[valid])
    doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]])

    # full k-word windows
    n_win = np.maximum(lens - k + 1, 0)
    total = int(n_win.sum())
    win_doc = np.repeat(np.arange(len(s)), n_win)
    if total:
        off = np.arange(total) - np.repeat(np.concatenate([[0], np.cumsum(n_win)[:-1]]), n_win)
        ws = np.repeat(doc_start, n_win) + off
        acc = wh[ws]
        for j in range(1, k):
            acc = splitmix64((splitmix64(acc) if ordered else acc)
                             ^ wh[ws + j])
    else:
        off = np.empty(0, dtype=np.int64)
        acc = np.empty(0, dtype=np.uint64)
    return win_doc, off.astype(np.int64), acc, lens, split


def _shingle_hashes(texts, k: int, dedupe: bool = True,
                    ordered: bool = False):
    """Vectorized word-shingle hashing for a batch of texts.

    Returns (doc_idx, shingle_hash) for the DEDUPED shingle set of every doc,
    sorted by doc — the window kernel is :func:`_positional_grams`. Docs
    with 1 <= len < k words contribute one shingle over the whitespace-joined
    text (the scalar fallback); empty docs contribute nothing.
    ``dedupe=False`` returns every window occurrence (doc-sorted, duplicates
    kept) — the repetition-ratio signal needs the multiset."""
    from .vhash import hash64

    win_doc, _, acc, lens, split = _positional_grams(texts, k,
                                                     ordered=ordered)

    # short docs: one shingle over the joined words
    short = (lens >= 1) & (lens < k)
    if short.any():
        joined = split[short].str.join(" ")
        sh = hash64(joined.to_numpy(dtype=object))
        win_doc = np.concatenate([win_doc, np.nonzero(short)[0]])
        acc = np.concatenate([acc, sh])

    if len(acc) == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    # set semantics: dedupe (doc, shingle)
    order = np.lexsort((acc, win_doc))
    d, a = win_doc[order], acc[order]
    if not dedupe:
        return d, a
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (a[1:] != a[:-1])
    return d[keep], a[keep]


def _minhash_signatures(doc_idx: np.ndarray, shingles: np.ndarray, n_docs: int,
                        mh: "MinHasher") -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures via segment-min over the sorted
    (doc, shingle) rows; docs with no shingles get the all-MERSENNE row (the
    scalar empty-set signature)."""
    sig = np.full((n_docs, mh.num_perm), _MERSENNE, dtype=np.uint64)
    if len(shingles) == 0:
        return sig
    counts = np.bincount(doc_idx, minlength=n_docs)
    nonempty = counts > 0
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # NOTE: this is deterministic mixing, NOT a (a*x+b mod p) universal hash —
    # x*a+b wraps mod 2^64 before the Mersenne fold below (the fold only
    # reduces the already-wrapped product), and the >>1 drops the low shingle
    # bit (shingle-collision probability 2^-62 instead of 2^-63). Both are
    # fine for LSH banding (consistent, well-spread) but void the textbook
    # min-wise-independence analysis; documented so nobody relies on it.
    x = (shingles >> np.uint64(1)).astype(np.uint64)
    M = np.uint64(_MERSENNE)
    # perm chunks bound the (n_shingles x chunk) temp to a few MB
    with np.errstate(over="ignore"):
        for c0 in range(0, mh.num_perm, 8):
            c1 = min(c0 + 8, mh.num_perm)
            vals = x[:, None] * mh.a[None, c0:c1] + mh.b[None, c0:c1]
            # Mersenne fold == % (2^61-1) without the integer division
            vals = (vals & M) + (vals >> np.uint64(61))
            vals = np.where(vals >= M, vals - M, vals)
            sig[nonempty, c0:c1] = np.minimum.reduceat(vals, starts[nonempty],
                                                       axis=0)
    return sig


class MinHashBandStage:
    """map_batches actor stage: text -> (band_id, band_hash, id) rows.
    Fully vectorized per batch (shingle windows, signatures, band folds);
    coefficient table built once per actor."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.col = col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .vhash import splitmix64

        ids = batch.column(self.id_col)
        texts = batch.column(self.col).to_numpy(zero_copy_only=False)
        doc_idx, shingles = _shingle_hashes(texts, self.shingle_k)
        sig = _minhash_signatures(doc_idx, shingles, len(texts), self.mh)
        band_hashes = np.empty((len(texts), self.bands), dtype=np.uint64)
        for b in range(self.bands):
            h = sig[:, b * self.rows_per_band]
            for j in range(1, self.rows_per_band):
                h = splitmix64(h ^ sig[:, b * self.rows_per_band + j])
            band_hashes[:, b] = h
        n = len(texts)
        out_hash = (band_hashes & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        idx = np.repeat(np.arange(n), self.bands)
        return pa.table({
            self.id_col: ids.take(pa.array(idx, pa.int64())),
            "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n),
                                pa.int32()),
            "band_hash": pa.array(out_hash.ravel(), pa.int64()),
        })


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = _word_shingles(a, k), _word_shingles(b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_pairs(ds, col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                      jaccard_threshold: float = 0.7, text_lookup=None,
                      broadcast_texts_limit: int = 100_000,
                      max_group_pairs: int = 32_768):
    """MinHash-LSH near-dup candidate pairs, verified by true n-gram Jaccard.

    Returns a Dataset of (id_a, id_b, jaccard) with id_a < id_b (ids keep
    their input type — int64 corpora and the north rule's string doc_ids
    both work; string pairs order lexicographically).

    Degenerate-bucket guard: a collision group of c members wants C(c,2)
    pairs — boilerplate/empty documents routinely produce groups of 10^4+
    members at web scale, which would emit 10^8 pair rows from ONE bucket.
    Groups whose all-pairs count exceeds ``max_group_pairs`` (default 32768
    = groups of >257 members) emit a spanning STAR around the group's min
    id (c-1 edges) instead: connectivity for the duplicate_clusters path is
    preserved exactly (every member still reaches the hub, and clusters are
    re-verified by true Jaccard either way); only the exhaustive pair
    LISTING is truncated for such groups, and a truly-duplicate group
    star-verifies identically.

    Scale path (default): verification fetches ONLY the candidate texts from
    the input dataset — the corpus is never materialized driver-side and never
    broadcast. The distinct candidate id set (bounded by the near-dup count)
    ships once via ray.put so one column-pruned scan filters the texts; below
    ``broadcast_texts_limit`` candidates the filtered texts broadcast and
    verification is shuffle-free, above it the texts join back to the pairs
    through two candidate-sized tagged-union shuffles.

    ``text_lookup`` (a ray.put {id: text} dict) selects the legacy broadcast
    verify — kept for the old-path/new-path equality test; it requires the
    whole corpus in one object and does not scale."""
    import ray
    import ray.data

    n_shuffle_buckets = 64

    banded = ds.map_batches(MinHashBandStage,
                            fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                                       shingle_k=shingle_k, col=col,
                                                       id_col=id_col),
                            batch_format="pyarrow", concurrency=_pool())

    # shuffle by a HASH BUCKET of the band key, not the key itself: the band
    # table has ~rows*bands near-singleton keys, and one Python map_groups
    # call per key dominates wall time. Within a bucket, pair formation is
    # vectorized over all collision groups at once.
    def add_bucket(t: pa.Table) -> pa.Table:
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        bi = t.column("band_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = ((bh ^ (bi * np.int64(0x9E3779B9))) % n_shuffle_buckets).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    def bulk_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", id_col])
        bi = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        # exact group boundaries on the sorted frame (no hashed key: a
        # truncated/fused key would create spurious candidate groups)
        new_grp = np.ones(len(g), dtype=bool)
        new_grp[1:] = (bi[1:] != bi[:-1]) | (bh[1:] != bh[:-1])
        codes = np.cumsum(new_grp) - 1
        counts = np.bincount(codes)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ids = g[id_col].to_numpy()
        out_a, out_b = [], []
        for ci in np.nonzero(counts >= 2)[0]:  # collision groups only (rare)
            s, c = starts[ci], counts[ci]
            if c * (c - 1) // 2 > max_group_pairs:
                # degenerate bucket: spanning star around the min id (ids
                # are ascending within the sorted group, so ids[s] is it)
                out_a.append(np.broadcast_to(ids[s], c - 1).copy())
                out_b.append(ids[s + 1:s + c])
                continue
            ia, ib = np.triu_indices(c, k=1)
            out_a.append(ids[s + ia])
            out_b.append(ids[s + ib])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": []})
        df = pd.DataFrame({"id_a": np.concatenate(out_a),
                           "id_b": np.concatenate(out_b)})
        return df.drop_duplicates(["id_a", "id_b"])  # partial dedupe per bucket

    cand = (banded.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(bulk_pairs, batch_format="pandas"))

    # the same pair can still surface from bands in DIFFERENT buckets -> one
    # global dedupe, again hash-bucketed and vectorized
    def pair_bucket(t: pa.Table) -> pa.Table:
        bucket = _id_shuffle_bucket(
            t.column("id_a").to_numpy(zero_copy_only=False),
            t.column("id_b").to_numpy(zero_copy_only=False),
            n_buckets=n_shuffle_buckets)
        return t.append_column("pbucket", bucket)

    def pair_dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]]

    cand = (cand.map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("pbucket").map_groups(pair_dedupe, batch_format="pandas"))

    return _verify_candidate_pairs(
        cand, ds, id_col=id_col, col=col, shingle_k=shingle_k,
        jaccard_threshold=jaccard_threshold,
        broadcast_texts_limit=broadcast_texts_limit,
        text_lookup=text_lookup, n_shuffle_buckets=n_shuffle_buckets)


def _pairs_exact_jaccard(ta: np.ndarray, tb: np.ndarray,
                         shingle_k: int) -> np.ndarray:
    """Vectorized exact n-gram jaccard for aligned text arrays (one value
    per (ta[i], tb[i]) pair): shingle the UNIQUE texts once with the batch
    kernel, then count per-pair intersections with one lexsort over the
    (pair, shingle) rows — no per-pair Python set building. Same
    window/short-doc semantics as _word_shingles; both-empty pairs score
    1.0 (the ngram_jaccard convention)."""
    n = len(ta)
    uniq, inv = np.unique(np.concatenate([ta, tb]), return_inverse=True)
    di, sh = _shingle_hashes(uniq, shingle_k, ordered=True)
    cnts = np.bincount(di, minlength=len(uniq))
    starts = np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int64)
    ia, ib = inv[:n], inv[n:]

    def side_rows(idx):
        c = cnts[idx]
        total = int(c.sum())
        pair = np.repeat(np.arange(n), c)
        base = np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.int64)
        off = np.arange(total) - np.repeat(base, c) + np.repeat(
            starts[idx], c)
        return pair, sh[off]

    pa_i, sha = side_rows(ia)
    pb_i, shb = side_rows(ib)
    kp = np.concatenate([pa_i, pb_i])
    ks = np.concatenate([sha, shb])
    order = np.lexsort((ks, kp))
    kp, ks = kp[order], ks[order]
    dup = (kp[1:] == kp[:-1]) & (ks[1:] == ks[:-1])
    inter = np.bincount(kp[1:][dup], minlength=n)
    ca, cb = cnts[ia], cnts[ib]
    union = ca + cb - inter
    return np.where((ca == 0) & (cb == 0), 1.0,
                    np.where((ca == 0) | (cb == 0), 0.0,
                             inter / np.maximum(union, 1)))


def _verify_candidate_pairs(cand, ds, *, id_col: str = "doc_id",
                            col: str = "text", shingle_k: int = 3,
                            jaccard_threshold: float = 0.7,
                            broadcast_texts_limit: int = 100_000,
                            text_lookup=None, n_shuffle_buckets: int = 64,
                            id_collect_limit: int = 4_000_000):
    """True n-gram-Jaccard verification of candidate (id_a, id_b) pairs
    against the corpus ``ds`` (candidate texts fetched column-pruned, never
    the whole corpus — path selection documented in minhash_lsh_pairs).
    Shared by minhash_lsh_pairs and minhash_pairs_incremental."""
    import ray
    import ray.data

    def _empty_pairs(batch: pa.Table) -> pa.Table:
        # id-typed empty result (int64 corpora and string doc_ids alike)
        return (batch.select(["id_a", "id_b"]).slice(0, 0)
                .append_column("jaccard", pa.array([], pa.float64())))

    if text_lookup is not None:
        class Verify:
            def __init__(self):
                self.texts = ray.get(text_lookup)

            def __call__(self, batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0:
                    return _empty_pairs(batch)
                df = batch.to_pandas().drop_duplicates(["id_a", "id_b"])
                jac = [ngram_jaccard(self.texts.get(a, ""), self.texts.get(b, ""), shingle_k)
                       for a, b in zip(df["id_a"], df["id_b"])]
                df["jaccard"] = jac
                df = df[df["jaccard"] >= jaccard_threshold]
                return pa.Table.from_pandas(df, preserve_index=False)

        return cand.map_batches(Verify, batch_format="pyarrow", concurrency=(1, 4))

    # ---- join-based verify (the 100 TB path) -------------------------------
    import pyarrow.compute as pc

    cand = cand.materialize()  # candidate pairs: small by construction
    n_pairs = cand.count()
    if n_pairs == 0:
        sch = cand.schema()
        base = getattr(sch, "base_schema", sch)
        id_t = (base.field("id_a").type if isinstance(base, pa.Schema)
                else pa.int64())
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], id_t), "id_b": pa.array([], id_t),
            "jaccard": pa.array([], pa.float64())}))

    def pair_keys(t: pa.Table) -> pa.Table:
        a = t.column("id_a").combine_chunks()
        b = t.column("id_b").combine_chunks()
        return pa.table({id_col: pa.concat_arrays([a, b])})

    key_ds = cand.map_batches(pair_keys, batch_format="pyarrow")

    # leg choice, two-stage: ids are collectible while 2*n_pairs is under
    # id_collect_limit (int64 ids; STRING ids can be 100+ bytes each —
    # URL-keyed crawls — so their pull is capped ~8x lower to keep the
    # driver transfer byte-comparable); TEXTS broadcast only while the
    # DISTINCT id count is under broadcast_texts_limit — a duplicate-heavy
    # candidate set (many pairs over few docs) now takes the fast broadcast
    # leg its pair count used to kick it out of
    sch = cand.schema()
    base = getattr(sch, "base_schema", sch)
    id_is_str = (isinstance(base, pa.Schema)
                 and pa.types.is_string(base.field("id_a").type))
    collect_cap = id_collect_limit // 8 if id_is_str else id_collect_limit
    uniq = None
    if 2 * n_pairs <= collect_cap:
        chunks = []
        for b in key_ds.iter_batches(batch_format="pyarrow"):
            chunks.extend(b.column(id_col).chunks)
        uniq = pc.unique(pa.chunked_array(chunks))
    if uniq is None or len(uniq) > broadcast_texts_limit:
        # candidate id set too large for any driver-side structure: filter
        # the corpus with the DISTRIBUTED bucketed semi-join against the
        # pair-id projection — no id set ever lands on the driver
        from .relational import semi_join
        texts = semi_join(ds.select_columns([id_col, col]), key_ds, on=id_col)
    else:
        # bounded candidate set: the distinct ids (ids only, never texts)
        # filter the corpus with one vectorized pc.is_in
        ids_ref = ray.put(uniq)

        class KeepCandidateTexts:
            """One column-pruned scan of the corpus; only candidate texts
            survive (the id ARRAY is broadcast once per actor, never texts;
            membership is one Arrow is_in kernel per batch)."""

            def __init__(self):
                self.value_set = ray.get(ids_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                keep = pc.fill_null(
                    pc.is_in(batch.column(id_col).cast(self.value_set.type),
                             value_set=self.value_set), False)
                return batch.select([id_col, col]).filter(keep)

        texts = ds.map_batches(KeepCandidateTexts, batch_format="pyarrow",
                               concurrency=_pool())
        # the filtered candidate texts are small: broadcast THEM (never the
        # corpus) and verify with zero additional shuffles
        lookup = {}
        for b in texts.iter_batches(batch_format="pyarrow"):
            lookup.update(zip(b.column(id_col).to_pylist(),
                              b.column(col).to_pylist()))
        lk_ref = ray.put(lookup)

        class VerifyBroadcastCand:
            def __init__(self):
                self.texts = ray.get(lk_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0:
                    return _empty_pairs(batch)
                df = batch.to_pandas()
                # vectorized batch kernel (shared with the distributed
                # leg's verify_bucket) — never per-pair Python shingling
                ta = np.array([self.texts.get(a, "") for a in df["id_a"]],
                              dtype=object)
                tb = np.array([self.texts.get(b, "") for b in df["id_b"]],
                              dtype=object)
                df["jaccard"] = _pairs_exact_jaccard(ta, tb, shingle_k)
                df = df[df["jaccard"] >= jaccard_threshold]
                return pa.Table.from_pandas(df, preserve_index=False)

        return cand.map_batches(VerifyBroadcastCand, batch_format="pyarrow",
                                concurrency=(1, 4))

    # stage 1: attach each candidate doc's text to every pair-half wanting it
    # (tagged union on the doc id — one shuffle of candidate-sized data,
    # grouped by a HASH BUCKET of the id: one vectorized pandas merge per
    # bucket, never one Python call per candidate doc)
    def doc_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        key = t.column(id_col).combine_chunks()
        return pa.table({"key": key,
                         "kb": _id_shuffle_bucket(
                             key.to_numpy(zero_copy_only=False),
                             n_buckets=n_shuffle_buckets),
                         "role": pa.array(np.zeros(n, np.int8)),
                         "id_a": pa.nulls(n, key.type),
                         "id_b": pa.nulls(n, key.type),
                         "text": t.column(col)})

    def pair_sides(t: pa.Table) -> pa.Table:
        a = t.column("id_a").combine_chunks()
        b = t.column("id_b").combine_chunks()
        n = t.num_rows
        key = pa.concat_arrays([a, b])
        return pa.table({
            "key": key,
            "kb": _id_shuffle_bucket(key.to_numpy(zero_copy_only=False),
                                     n_buckets=n_shuffle_buckets),
            "role": pa.array(np.concatenate([np.ones(n, np.int8),
                                             np.full(n, 2, np.int8)])),
            "id_a": pa.concat_arrays([a, a]),
            "id_b": pa.concat_arrays([b, b]),
            "text": pa.nulls(2 * n, pa.string()),
        })

    tagged = (texts.map_batches(doc_side, batch_format="pyarrow")
              .union(cand.map_batches(pair_sides, batch_format="pyarrow")))

    def attach_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one text per id: a corpus with duplicate doc_ids would otherwise
        # cross-product each pair-half in the merge (duplicated verified
        # pairs downstream); first-by-key matches the r2 iloc[0] semantics
        doc = g[g["role"] == 0][["key", "text"]].drop_duplicates("key")
        halves = g[g["role"] != 0][["key", "id_a", "id_b", "role"]]
        if doc.empty or halves.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "role": [], "text": []})
        m = halves.merge(doc, on="key", how="inner")
        return pd.DataFrame({"id_a": _ids_restored(m["id_a"]),
                             "id_b": _ids_restored(m["id_b"]),
                             "role": m["role"],
                             "text": m["text"]})

    halves = tagged.groupby("kb").map_groups(attach_bucket, batch_format="pandas")

    # stage 2: reunite the two halves of each pair and verify with the true
    # n-gram Jaccard (one shuffle of the candidate pair table, bucketed —
    # one Python call per bucket, not per pair)
    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a_half = g[g["role"] == 1][["id_a", "id_b", "text"]].rename(
            columns={"text": "text_a"})
        b_half = g[g["role"] == 2][["id_a", "id_b", "text"]].rename(
            columns={"text": "text_b"})
        m = a_half.merge(b_half, on=["id_a", "id_b"], how="outer")
        if m.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        # vectorized exact jaccard over ALL pairs in the bucket — the shared
        # _pairs_exact_jaccard batch kernel (a duplicate-heavy crawl emits
        # 10s-100s of candidate pairs per doc; per-pair Python was the
        # bottleneck there)
        ta = m["text_a"].fillna("").to_numpy(dtype=object)
        tb = m["text_b"].fillna("").to_numpy(dtype=object)
        m["jaccard"] = _pairs_exact_jaccard(ta, tb, shingle_k)
        m = m[m["jaccard"] >= jaccard_threshold]
        return pd.DataFrame({"id_a": _ids_restored(m["id_a"]),
                             "id_b": _ids_restored(m["id_b"]),
                             "jaccard": m["jaccard"]})

    def pair_bucket2(t: pa.Table) -> pa.Table:
        bucket = _id_shuffle_bucket(
            t.column("id_a").to_numpy(zero_copy_only=False),
            t.column("id_b").to_numpy(zero_copy_only=False), n_buckets=64)
        return t.append_column("vb", bucket)

    return (halves.map_batches(pair_bucket2, batch_format="pyarrow")
            .groupby("vb").map_groups(
                lambda g: verify_bucket(g.drop(columns=["vb"])),
                batch_format="pandas"))


def jaccard_similarity_join(ds, col: str = "text", id_col: str = "doc_id",
                            threshold: float = 0.7, shingle_k: int = 3,
                            order_by_frequency: bool = True,
                            broadcast_df_limit: int = 4_000_000,
                            broadcast_texts_limit: int = 100_000):
    """EXACT all-pairs n-gram Jaccard similarity join (recall 1.0): every
    pair of docs whose word-``shingle_k``-gram SETS have jaccard >=
    ``threshold``, as (id_a, id_b, jaccard) with id_a < id_b.

    :func:`minhash_lsh_pairs` is probabilistic — banding can miss a
    qualifying pair. This is its exact counterpart via PREFIX FILTERING
    (Chaudhuri et al. ICDE'06; the MapReduce formulation is Vernica et al.
    SIGMOD'10): under ANY fixed global total order of the gram universe,
    two sets with jaccard >= t MUST share at least one gram inside their
    prefixes of length ``|S| - ceil(t*|S|) + 1`` (if all shared grams sat
    past both prefixes, the overlap could be at most ceil(t*|S|)-1 <
    t*|S| <= t*|union|). So grouping PREFIX grams surfaces every
    qualifying pair; the length filter ``min|S| >= t*max|S|`` and the
    PPJoin positional filter (overlap bound from the shared gram's rank in
    both prefixes — see bulk_pairs) prune within groups, and every
    candidate is verified
    with the true jaccard via the machinery shared with minhash_lsh_pairs
    (identical shingle/short-doc semantics, so the two operators agree on
    pair values). Docs with EMPTY gram sets (no words) have no prefix and
    are excluded by construction — the verifier's both-empty jaccard=1
    convention cannot fire here (documented deviation: an all-empty corpus
    yields no pairs rather than all pairs).

    Gram order: ``order_by_frequency=True`` (default) orders rare-first by
    document frequency, the published heuristic — prefixes then hold the
    rarest grams and candidate groups stay tiny. The df table is ONE
    combiner-first vocabulary-sized groupby-sum; it attaches back hybrid:
    below ``broadcast_df_limit`` distinct grams a sorted (gram, df) array
    pair ships once via ray.put and prefixes are selected per batch with a
    searchsorted (doc rows never leave their batch), above it a
    distributed lookup join + ONE id-bucketed shuffle restores doc
    locality. ``False`` orders by the gram hash itself — still exact (any
    fixed order is), zero extra passes, weaker pruning.

    Scale shape: only (id, gram, set_size) projections and candidate pairs
    shuffle; texts move only into the verify of actual candidates (its
    hybrid legs are documented in minhash_lsh_pairs). No star guard: with
    rare-first prefixes a large collision group means many docs genuinely
    share a rare gram — the exhaustive listing there is the contracted
    output, not an artifact, so truncating it would break recall.
    """
    import ray
    import ray.data

    from .relational import lookup_join

    n_shuffle_buckets = 64

    if ds.schema() is None:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))

    def _select_prefix(di, gi, sizes, dfv):
        """(row indices, ranks) of the prefix rows: within each doc, rank
        grams by (df ASC, gram ASC — int64 view order, matching the pandas
        leg) and keep the first |S| - ceil(t*|S|) + 1; the kept rank feeds
        the positional filter. ceil biased DOWN by 1e-9 so fp error can
        only lengthen a prefix (recall-safe)."""
        p = sizes - np.ceil(threshold * sizes - 1e-9).astype(np.int64) + 1
        order = np.lexsort((gi, dfv, di))
        d_s = di[order]
        counts = np.bincount(d_s, minlength=len(sizes))
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        rank = np.arange(len(d_s)) - np.repeat(starts, counts)
        keep = rank < p[d_s]
        return order[keep], rank[keep]

    def _gram_arrays(t: pa.Table):
        texts = t.column(col).to_pylist()
        di, sh = _shingle_hashes(texts, shingle_k, ordered=True)
        sizes = np.bincount(di, minlength=t.num_rows) if len(di) else \
            np.zeros(t.num_rows, np.int64)
        return di, sh.view(np.int64), sizes

    def _prefix_table(t: pa.Table, keep_idx, ranks, di, gi, sizes
                      ) -> pa.Table:
        ids = t.column(id_col).take(pa.array(di[keep_idx], pa.int64()))
        return pa.table({id_col: ids,
                         "gram": pa.array(gi[keep_idx], pa.int64()),
                         "sz": pa.array(sizes[di[keep_idx]], pa.int64()),
                         "rk": pa.array(ranks, pa.int64())})

    df_ref = None
    distributed_df = False
    if order_by_frequency:
        # pass 1 (combiner-first): document frequency of every gram — the
        # per-batch partial is already per-doc-deduped, so cnt partials sum
        # to true doc frequencies
        def df_partial(t: pa.Table) -> pa.Table:
            _, gi, _ = _gram_arrays(t)
            u, c = np.unique(gi, return_counts=True)
            b = _id_shuffle_bucket(u, n_buckets=n_shuffle_buckets)
            return pa.table({"gram": pa.array(u, pa.int64()),
                             "cnt": pa.array(c, pa.int64()),
                             "db": b})

        def df_sum(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("gram", sort=True)["cnt"].sum().reset_index()
            return out.rename(columns={"cnt": "df"})

        # hash-bucketed sum (one vectorized pandas call per bucket) — the
        # native per-key aggregate measured ~5x slower on the same partials
        df_tbl = (ds.map_batches(df_partial, batch_format="pyarrow")
                  .groupby("db").map_groups(df_sum, batch_format="pandas")
                  .materialize())
        if df_tbl.count() <= broadcast_df_limit:
            chunks = [b for b in df_tbl.iter_batches(batch_format="pyarrow")]
            if chunks:
                tb = pa.concat_tables(chunks).sort_by("gram")
                df_ref = ray.put((tb.column("gram").to_numpy(),
                                  tb.column("df").to_numpy()))
            else:
                # gram-free corpus (all texts empty): nothing can match the
                # empty df anyway, but PrefixStage still wants the arrays
                df_ref = ray.put((np.empty(0, np.int64),
                                  np.empty(0, np.int64)))
        else:
            distributed_df = True

    if not distributed_df:
        # task pool, NOT an actor pool: the only state is the broadcast
        # (gram, df) numpy pair, which ray.get resolves to the SAME
        # zero-copy plasma mapping in every task — there is nothing to
        # build per actor, so plain tasks reuse the already-warm worker
        # pool instead of paying a cold actor spawn per slot
        def prefix_stage(t: pa.Table) -> pa.Table:
            di, gi, sizes = _gram_arrays(t)
            if len(gi) == 0:
                return pa.table({
                    id_col: t.column(id_col).slice(0, 0),
                    "gram": pa.array([], pa.int64()),
                    "sz": pa.array([], pa.int64()),
                    "rk": pa.array([], pa.int64())})
            if df_ref is None:
                dfv = gi
            else:
                g_sorted, d_arr = ray.get(df_ref)
                dfv = d_arr[np.searchsorted(g_sorted, gi)]
            keep_idx, ranks = _select_prefix(di, gi, sizes, dfv)
            return _prefix_table(t, keep_idx, ranks, di, gi, sizes)

        prefix = ds.map_batches(prefix_stage, batch_format="pyarrow")
    else:
        # pass 2, distributed df: full gram rows -> lookup join attaches df
        # -> ONE id-bucketed shuffle restores doc locality for the ranking
        def gram_rows(t: pa.Table) -> pa.Table:
            di, gi, sizes = _gram_arrays(t)
            ids = t.column(id_col).take(pa.array(di, pa.int64()))
            return pa.table({id_col: ids,
                             "gram": pa.array(gi, pa.int64()),
                             "sz": pa.array(sizes[di], pa.int64())})

        with_df = lookup_join(ds.map_batches(gram_rows, batch_format="pyarrow"),
                              df_tbl, on="gram", value_col="df",
                              n_buckets=n_shuffle_buckets)

        def add_doc_bucket(t: pa.Table) -> pa.Table:
            b = _id_shuffle_bucket(
                t.column(id_col).to_numpy(zero_copy_only=False),
                n_buckets=n_shuffle_buckets)
            return t.append_column("__b", b)

        def prefix_bucket(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values([id_col, "df", "gram"], kind="mergesort")
            r = g.groupby(id_col, sort=False).cumcount().to_numpy()
            sz = g["sz"].to_numpy(dtype=np.int64)
            p = sz - np.ceil(threshold * sz - 1e-9).astype(np.int64) + 1
            out = g.loc[r < p, [id_col, "gram", "sz"]].copy()
            out["rk"] = r[r < p]
            return out

        prefix = (with_df.map_batches(add_doc_bucket, batch_format="pyarrow")
                  .groupby("__b").map_groups(prefix_bucket,
                                             batch_format="pandas"))

    # candidate pairs: group prefix rows by gram (hash-bucketed — one
    # vectorized pandas call per bucket, pair emission across ALL collision
    # groups at once, no per-group Python)
    def add_gram_bucket(t: pa.Table) -> pa.Table:
        b = _id_shuffle_bucket(
            t.column("gram").to_numpy(zero_copy_only=False),
            n_buckets=n_shuffle_buckets)
        return t.append_column("gb", b)

    def bulk_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["gram", id_col], kind="mergesort")
        gr = g["gram"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = gr[1:] != gr[:-1]
        codes = np.cumsum(new) - 1
        counts = np.bincount(codes)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        row = np.arange(len(g))
        after = np.repeat(starts + counts, counts) - row - 1
        tot = int(after.sum())
        if tot == 0:
            return pd.DataFrame({"id_a": [], "id_b": []})
        a = np.repeat(row, after)
        base = np.concatenate([[0], np.cumsum(after)[:-1]])
        b = np.arange(tot) - np.repeat(base, after) + np.repeat(row + 1, after)
        sz = g["sz"].to_numpy(dtype=np.int64)
        rk = g["rk"].to_numpy(dtype=np.int64)
        sa, sb = sz[a], sz[b]
        # length filter: jaccard >= t requires min|S| >= t*max|S|
        ok = np.minimum(sa, sb) >= threshold * np.maximum(sa, sb) - 1e-9
        # positional filter (PPJoin, Xiao et al. WWW'08): jaccard >= t
        # requires overlap >= alpha = ceil(t/(1+t)*(|A|+|B|)); at the FIRST
        # shared gram (rank i in A, j in B) every other shared gram lies
        # after it in both frequency-sorted lists, so overlap <=
        # 1 + min(|A|-i-1, |B|-j-1). A pair is kept if ANY of its shared
        # prefix grams passes — the first one always does for a qualifying
        # pair (recall-safe); occurrences that can only be non-first fail
        # their own bound and drop. Epsilons bias alpha DOWN (recall-safe).
        alpha = np.ceil(threshold / (1.0 + threshold) * (sa + sb) - 1e-9)
        ok &= 1 + np.minimum(sa - rk[a] - 1, sb - rk[b] - 1) >= alpha
        ids = g[id_col].to_numpy()
        df = pd.DataFrame({"id_a": ids[a[ok]], "id_b": ids[b[ok]]})
        return df.drop_duplicates(["id_a", "id_b"])  # partial dedupe

    cand = (prefix.map_batches(add_gram_bucket, batch_format="pyarrow")
            .groupby("gb").map_groups(bulk_pairs, batch_format="pandas"))

    # the same pair surfaces once per shared prefix gram -> global dedupe,
    # hash-bucketed (the minhash_lsh_pairs shape)
    def pair_bucket(t: pa.Table) -> pa.Table:
        bucket = _id_shuffle_bucket(
            t.column("id_a").to_numpy(zero_copy_only=False),
            t.column("id_b").to_numpy(zero_copy_only=False),
            n_buckets=n_shuffle_buckets)
        return t.append_column("pbucket", bucket)

    def pair_dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]]

    cand = (cand.map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("pbucket").map_groups(pair_dedupe, batch_format="pandas"))

    return _verify_candidate_pairs(
        cand, ds, id_col=id_col, col=col, shingle_k=shingle_k,
        jaccard_threshold=threshold,
        broadcast_texts_limit=broadcast_texts_limit,
        n_shuffle_buckets=n_shuffle_buckets)


def _clusters_union_find(edges) -> "ray.data.Dataset":
    """Driver-side components for a small (bounded) edge table: path-halving
    union-find with union-by-min so each root IS the min member — the same
    (doc_id, cluster_id = min member) contract as the distributed path."""
    import pandas as pd
    import ray.data

    df = pd.DataFrame(edges.take_all())
    if df.empty:
        sch = edges.schema()
        base = getattr(sch, "base_schema", sch)
        node_t = (base.field("node").type if isinstance(base, pa.Schema)
                  else pa.int64())
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], node_t),
            "cluster_id": pa.array([], node_t)}))
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(df["node"].tolist(), df["nbr"].tolist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN so the root is always the smallest member id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    nodes = sorted(parent)
    out = pa.table({"doc_id": pa.array(nodes),
                    "cluster_id": pa.array([find(n) for n in nodes])})
    return ray.data.from_arrow(out)


def duplicate_clusters(pairs, id_col_a: str = "id_a", id_col_b: str = "id_b",
                       max_rounds: int = 64, small_limit: int = 2_097_152):
    """Connected components over near-dup pairs -> (doc_id, cluster_id) with
    cluster_id = min member id. Distributed min-label propagation: each round
    every node adopts the minimum label in its 1-hop neighborhood, expressed
    as a hash join (edges x labels on the neighbor) + groupby-min — all
    dataset ops, nothing driver-side, so the pair graph can be arbitrarily
    large. Each round also propagates along the current label POINTERS
    (n -> label(n)), so effective distance doubles per round (pointer
    jumping). Labels only ever decrease, so the loop runs until the label
    sum is unchanged (= converged) — needing ~log2(diameter)+2 rounds;
    ``max_rounds`` (default 64 ≅ diameter 2^63) is only a runaway guard.

    Hybrid small path: at or below ``small_limit`` directed edges (the pair
    table is the NEAR-DUP graph, already a tiny fraction of the corpus) the
    components are solved driver-side with union-find — identical output
    (min member id per component), none of the per-round shuffles. The
    count is read from the materialized edge table's metadata, so the
    decision costs nothing; above the limit the distributed path runs.
    """
    from ray.data.aggregate import Min

    def seed_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(id_col_a).combine_chunks()
        b = batch.column(id_col_b).combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "nbr": pa.concat_arrays([b, a])})

    edges = pairs.map_batches(seed_edges, batch_format="pyarrow").materialize()

    if edges.count() <= small_limit:
        return _clusters_union_find(edges)

    def seed_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"lnode": batch.column("node"),
                         "label": batch.column("node")})

    labels = (edges.map_batches(seed_labels, batch_format="pyarrow")
              .groupby("lnode").aggregate(Min("label", alias_name="label")))

    n_shuffle_buckets = 64

    def edge_side(batch: pa.Table) -> pa.Table:
        key = batch.column("nbr").combine_chunks()
        return pa.table({"bucket": _id_shuffle_bucket(
                             key.to_numpy(zero_copy_only=False),
                             n_buckets=n_shuffle_buckets),
                         "key": key,
                         "node": batch.column("node"),
                         "label": pa.nulls(batch.num_rows, key.type)})

    def label_side(batch: pa.Table) -> pa.Table:
        key = batch.column("lnode").combine_chunks()
        return pa.table({"bucket": _id_shuffle_bucket(
                             key.to_numpy(zero_copy_only=False),
                             n_buckets=n_shuffle_buckets),
                         "key": key,
                         "node": pa.nulls(batch.num_rows, key.type),
                         "label": batch.column("label")})

    def propagate_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # many keys per bucket (shuffling per node key = one Python call per
        # node); the per-key min-label delivery is vectorized pandas
        labs = g.loc[g["label"].notna()].groupby("key")["label"].min()
        if labs.empty:
            return pd.DataFrame({"lnode": [], "label": []})
        edges_g = g.loc[g["node"].notna()]
        lab_of_key = edges_g["key"].map(labs)
        ok = lab_of_key.notna()
        return pd.concat([
            pd.DataFrame({"lnode": _ids_restored(edges_g.loc[ok, "node"]),
                          "label": _ids_restored(lab_of_key[ok])}),
            pd.DataFrame({"lnode": _ids_restored(labs.index.to_series()),
                          "label": _ids_restored(labs)}),
        ], ignore_index=True)

    def label_ptr_edges(batch: pa.Table) -> pa.Table:
        # pointer-jumping edges: (n -> label(n)) so each round ALSO delivers
        # label(label(n)) to n — effective propagation distance doubles per
        # round (true shortcutting; 1-hop alone needs diameter rounds)
        return pa.table({"node": batch.column("lnode"),
                         "nbr": batch.column("label")})

    prev_sum = None
    for _ in range(max_rounds):
        # message passing: each edge (node, nbr) delivers label(nbr) to node —
        # expressed as the tagged-union groupby join (no native join: its hash
        # partitioner trips on empty partitions in iterated pipelines).
        # Edges = graph edges + this round's label pointers.
        round_edges = edges.union(
            labels.map_batches(label_ptr_edges, batch_format="pyarrow"))
        tagged = (round_edges.map_batches(edge_side, batch_format="pyarrow")
                  .union(labels.map_batches(label_side, batch_format="pyarrow")))
        msgs = tagged.groupby("bucket").map_groups(propagate_bucket,
                                                   batch_format="pandas")
        labels = (msgs.groupby("lnode").aggregate(Min("label", alias_name="label"))
                  .materialize())
        # labels only ever DECREASE (lexicographically for string ids), so
        # an unchanged label multiset = converged. The test is a distributed
        # hash CHECKSUM (type-generic, unlike the r3 numeric label sum):
        # per batch, exact sums of the two 32-bit halves of hash64(label)
        # (no wraparound below 2^32 rows/batch, so the total depends only on
        # the label MULTISET, never on batching); a false convergence needs
        # a simultaneous collision of both half-sums (~2^-64).
        def _chk(t: pa.Table) -> pa.Table:
            from .vhash import hash64
            h = hash64(t.column("label").to_numpy(zero_copy_only=False),
                       categorize=False)
            return pa.table({
                "chk_hi": pa.array([int((h >> np.uint64(32))
                                        .sum(dtype=np.uint64))], pa.int64()),
                "chk_lo": pa.array([int((h & np.uint64(0xFFFFFFFF))
                                        .sum(dtype=np.uint64))], pa.int64())})

        chk = labels.map_batches(_chk, batch_format="pyarrow").materialize()
        cur_sum = (chk.sum("chk_hi"), chk.sum("chk_lo"))
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_id"]), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_u64(texts) -> np.ndarray:
    """Vectorized 64-bit SimHash (classic Charikar construction) for a whole
    batch: one pandas split/explode (C), one vectorized word hash
    (vhash.hash64), one (n_words x 64) sign matrix, one segment-sum per doc —
    no per-word Python. Word weight = occurrence count, as in the scalar
    definition (repeated words vote repeatedly)."""
    from .vhash import hash64

    s = pd.Series(np.asarray(texts, dtype=object)).fillna("").astype(str)
    words = s.str.lower().str.split().explode()
    valid = words.notna().to_numpy()
    n_docs = len(s)
    if not valid.any():
        return np.zeros(n_docs, dtype=np.uint64)
    doc_idx = words.index.to_numpy()[valid]
    h = hash64(words.to_numpy(dtype=object)[valid])
    # (64, n_words) bit matrix, C-contiguous per BIT ROW so the cumsum runs
    # on contiguous memory (axis-0 cumsum of an (n,64) matrix is ~40x
    # slower). Little-endian order: bits[i, j] = (h[j] >> i) & 1.
    # Per-doc ±1 vote sums via one cumsum + two gathers per bit row:
    # sum(2b-1) = 2*sum(b) - n_words.
    b8 = np.ascontiguousarray(h.view(np.uint8).reshape(-1, 8).T)   # (8, n)
    bits = np.unpackbits(b8, axis=0, bitorder="little")            # (64, n)
    # widen BEFORE cumsum: the mixed-dtype cumsum(dtype=...) path is ~13x
    # slower than a same-dtype cumsum
    cs = np.cumsum(bits.astype(np.int64), axis=1)
    counts = np.bincount(doc_idx, minlength=n_docs)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ends = starts + counts
    acc = np.zeros((64, n_docs), dtype=np.int64)
    nonempty = counts > 0
    if nonempty.any():
        hi = cs[:, ends[nonempty] - 1]
        lo = np.where(starts[None, nonempty] > 0,
                      cs[:, np.maximum(starts[nonempty] - 1, 0)], 0)
        acc[:, nonempty] = 2 * (hi - lo) - counts[None, nonempty]
    packed = np.packbits((acc > 0).astype(np.uint8), axis=0,
                         bitorder="little")                        # (8, docs)
    return np.ascontiguousarray(packed.T).view(np.uint64).ravel()


def simhash64(text: str) -> int:
    """Single-document SimHash (same kernel as the batch path)."""
    return int(simhash_u64([text])[0])


def simhash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    sh = simhash_u64(batch.column(col).to_numpy(zero_copy_only=False))
    # store as int64 (reinterpret the top bit)
    return batch.append_column("simhash", pa.array(sh.view(np.int64), pa.int64()))


def simhash_neardup_pairs(ds, col: str = "text", id_col: str = "doc_id",
                          max_hamming: int = 3):
    """SimHash near-dup pairs within Hamming distance ``max_hamming``: one
    vectorized sketch pass, then the generic 64-bit pigeonhole banding
    (``hamming_neardup_pairs``). Returns (id_a, id_b, hamming), id_a < id_b."""
    def sketch(batch: pa.Table) -> pa.Table:
        return (simhash_batch(batch.select([id_col, col]), col)
                .select([id_col, "simhash"]))

    hashed = ds.map_batches(sketch, batch_format="pyarrow")
    return hamming_neardup_pairs(hashed, "simhash", id_col=id_col,
                                 max_hamming=max_hamming)


def hamming_neardup_pairs(ds, hash_col: str, id_col: str = "doc_id",
                          max_hamming: int = 3):
    """Near-dup pairs within Hamming distance ``max_hamming`` over ANY
    64-bit hash column (SimHash text fingerprints, image pHash/dHash, audio
    spectral hashes, majority-vote video hashes) — the classic pigeonhole
    banding (Manku et al., WWW'07): split the 64-bit value into
    max_hamming+1 blocks; two hashes within distance k must agree on at
    least one block, so rows bucket by (block_id, block_value), candidate
    pairs form inside buckets (one shuffle of the tiny (id, hash) sketch
    table — payloads/texts never move), and an exact XOR-popcount verify
    filters them. Input must carry one row per id. Returns
    (id_a, id_b, hamming) with id_a < id_b."""
    n_blocks = max_hamming + 1
    bits = 64 // n_blocks
    masks = [(np.uint64((1 << bits) - 1), np.uint64(i * bits))
             for i in range(n_blocks)]

    def sketch_and_band(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sh = (batch.column(hash_col).to_numpy(zero_copy_only=False)
              .astype(np.int64).view(np.uint64))
        out_id = np.tile(ids, n_blocks)
        out_sh = np.tile(sh, n_blocks)
        out_block = np.repeat(np.arange(n_blocks, dtype=np.int32), len(ids))
        vals = np.concatenate([((sh >> off) & m).astype(np.int64)
                               for m, off in masks])
        return pa.table({
            id_col: pa.array(out_id),
            "simhash": pa.array(out_sh.astype(np.int64), pa.int64()),
            "block_id": pa.array(out_block, pa.int32()),
            "block_val": pa.array(vals, pa.int64()),
        })

    n_shuffle_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        bv = t.column("block_val").to_numpy(zero_copy_only=False)
        bi = t.column("block_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = ((bv ^ (bi * np.int64(0x9E3779B9))) % n_shuffle_buckets).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    banded = (ds.map_batches(sketch_and_band, batch_format="pyarrow")
              .map_batches(add_bucket, batch_format="pyarrow"))

    def bulk_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over ALL collision groups in the bucket (shuffling by
        # the block key itself would mean one Python call per singleton key)
        g = g.sort_values(["block_id", "block_val", id_col])
        bi = g["block_id"].to_numpy()
        bv = g["block_val"].to_numpy()
        new_grp = np.ones(len(g), dtype=bool)
        new_grp[1:] = (bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1])
        codes = np.cumsum(new_grp) - 1
        counts = np.bincount(codes)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for ci in np.nonzero(counts >= 2)[0]:
            s, c = starts[ci], counts[ci]
            ia, ib = np.triu_indices(c, k=1)
            x = sh[s + ia] ^ sh[s + ib]
            ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                                axis=1).sum(axis=1).astype(np.int64)
            keep = ham <= max_hamming
            out_a.append(ids[s + ia[keep]])
            out_b.append(ids[s + ib[keep]])
            out_h.append(ham[keep])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        df = pd.DataFrame({"id_a": np.concatenate(out_a),
                           "id_b": np.concatenate(out_b),
                           "hamming": np.concatenate(out_h).astype(np.int64)})
        return df.drop_duplicates(["id_a", "id_b"])

    cand = banded.groupby("bucket").map_groups(bulk_pairs, batch_format="pandas")

    # the same pair surfaces from agreeing blocks in DIFFERENT buckets
    def pair_bucket(t: pa.Table) -> pa.Table:
        bucket = _id_shuffle_bucket(
            t.column("id_a").to_numpy(zero_copy_only=False),
            t.column("id_b").to_numpy(zero_copy_only=False),
            n_buckets=n_shuffle_buckets)
        return t.append_column("pbucket", bucket)

    def pair_dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b", "hamming"]]

    return (cand.map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("pbucket").map_groups(pair_dedupe, batch_format="pandas"))


def simhash_dedup_groups(ds, col: str = "text", id_col: str = "doc_id"):
    """Docs sharing an identical 64-bit simhash = near-dup groups; returns
    (simhash, n, ids) for groups with n > 1."""
    def groups(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"simhash": [], "n": [], "ids": []})
        return pd.DataFrame({"simhash": [g["simhash"].iloc[0]], "n": [len(g)],
                             "ids": [",".join(map(str, sorted(g[id_col])))]})

    return (ds.map_batches(lambda b: simhash_batch(b, col), batch_format="pyarrow")
              .groupby("simhash").map_groups(groups, batch_format="pandas"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

class CosineBucketStage:
    """Random-hyperplane LSH over an embedding column: bucket = sign bits of
    n_planes projections (planes drawn once per actor, fixed seed)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 11,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = embedding_matrix(batch.column(self.vec_col))
        signs = (vecs @ self.planes) > 0
        bucket = np.zeros(len(vecs), dtype=np.int64)
        for i in range(signs.shape[1]):
            bucket |= signs[:, i].astype(np.int64) << i
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))


def embedding_neardup_pairs(ds, dim: int, threshold: float = 0.95,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            n_planes: int = 12, n_shuffle_buckets: int = 64):
    """Near-duplicate embedding pairs: LSH-bucket then exact cosine within
    buckets. Pairs above threshold, id_a < id_b. n_planes trades recall for
    bucket size (hot-bucket analog of tile salting). The shuffle keys on a
    hash of the LSH bucket (2^n_planes near-empty buckets would cost one
    Python group call each); the exact cosine runs per LSH bucket inside,
    vectorized."""

    def shard_cosine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", id_col])
        bk = g["bucket"].to_numpy()
        new_grp = np.ones(len(g), dtype=bool)
        new_grp[1:] = bk[1:] != bk[:-1]
        codes = np.cumsum(new_grp) - 1
        counts = np.bincount(codes)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ids = g[id_col].to_numpy()
        V = np.asarray(g[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1
        Vn = V / norms
        out_a, out_b, out_c = [], [], []
        for ci in np.nonzero(counts >= 2)[0]:
            s, c = starts[ci], counts[ci]
            sim = Vn[s:s + c] @ Vn[s:s + c].T
            ia, ib = np.triu_indices(c, k=1)
            keep = sim[ia, ib] >= threshold
            a, b = ids[s + ia[keep]], ids[s + ib[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_c.append(sim[ia, ib][keep])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cosine": np.concatenate(out_c)})

    def add_shard(t: pa.Table) -> pa.Table:
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        return t.append_column("shard", pa.array(
            (b % n_shuffle_buckets).astype(np.int32), pa.int32()))

    return (ds.map_batches(CosineBucketStage,
                           fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes,
                                                      vec_col=vec_col),
                           batch_format="pyarrow", concurrency=_pool())
              .map_batches(add_shard, batch_format="pyarrow")
              .groupby("shard").map_groups(shard_cosine, batch_format="pandas"))


# ---------------------------------------------------------------------------
# persisted MinHash band index + incremental near-dup (the daily-crawl shape)
# ---------------------------------------------------------------------------

_INDEX_PARAMS = "_minhash_index.json"


def _band_sketch(ds, *, col, id_col, num_perm, bands, shingle_k):
    return ds.map_batches(MinHashBandStage,
                          fn_constructor_kwargs=dict(
                              num_perm=num_perm, bands=bands,
                              shingle_k=shingle_k, col=col, id_col=id_col),
                          batch_format="pyarrow", concurrency=_pool())


def _band_key(band_id: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
    """64-bit fold of (band_id, band_hash) — a SHARD router and PREFILTER key
    only: grouping downstream is always on the exact (band_id, band_hash)
    pair, so a fold collision costs one spurious candidate row, never a
    wrong pair."""
    return (band_hash.astype(np.uint64)
            ^ (band_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))


def _shard_of(key: np.ndarray, n_shards: int) -> np.ndarray:
    return (((key * np.uint64(0xBF58476D1CE4E5B9)) >> np.uint64(33))
            % np.uint64(n_shards))


def build_minhash_index(ds, index_dir: str, col: str = "text",
                        id_col: str = "doc_id", num_perm: int = 64,
                        bands: int = 16, shingle_k: int = 3,
                        n_shards: int = 64) -> dict:
    """Persist the corpus's MinHash band table as a hive-partitioned parquet
    inverted file: rows (doc_id, band_id, band_hash), partitioned by
    shard = mix(band_key) % n_shards. An INCREMENT (new documents arriving
    against a historical corpus) then sketches only itself and reads only
    the shards its own band keys touch (minhash_pairs_incremental) — the
    historical corpus is never re-sketched, re-shuffled or re-scanned.
    Returns the index handle {'index_dir', params...}."""
    import json
    import os
    import shutil

    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    params = dict(col=col, id_col=id_col, num_perm=num_perm, bands=bands,
                  shingle_k=shingle_k, n_shards=n_shards)

    def add_shard(t: pa.Table) -> pa.Table:
        key = _band_key(t.column("band_id").to_numpy(zero_copy_only=False),
                        t.column("band_hash").to_numpy(zero_copy_only=False))
        return t.append_column(
            "shard", pa.array(_shard_of(key, n_shards).astype(np.int32),
                              pa.int32()))

    (_band_sketch(ds, **{k: params[k] for k in
                         ("col", "id_col", "num_perm", "bands", "shingle_k")})
     .map_batches(add_shard, batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["shard"]))
    with open(os.path.join(index_dir, _INDEX_PARAMS), "w") as f:
        json.dump(params, f)
    return {"index_dir": index_dir, **params}


def append_minhash_index(new_ds, index_dir: str) -> None:
    """Fold an increment's band rows into an existing index: new parquet
    files land inside the same shard partitions; nothing is rewritten, so
    appends are cheap and crash-safe (a half-written file is re-appended on
    retry; duplicate band rows only duplicate candidates, never pairs —
    the global pair dedupe absorbs them)."""
    import json
    import os

    with open(os.path.join(index_dir, _INDEX_PARAMS)) as f:
        p = json.load(f)

    def add_shard(t: pa.Table) -> pa.Table:
        key = _band_key(t.column("band_id").to_numpy(zero_copy_only=False),
                        t.column("band_hash").to_numpy(zero_copy_only=False))
        return t.append_column(
            "shard", pa.array(_shard_of(key, p["n_shards"]).astype(np.int32),
                              pa.int32()))

    (_band_sketch(new_ds, col=p["col"], id_col=p["id_col"],
                  num_perm=p["num_perm"], bands=p["bands"],
                  shingle_k=p["shingle_k"])
     .map_batches(add_shard, batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["shard"]))


def minhash_pairs_incremental(new_ds, index_dir: str, corpus_ds=None,
                              jaccard_threshold: float = 0.7,
                              broadcast_texts_limit: int = 100_000,
                              max_group_pairs: int = 32_768,
                              return_info: bool = False):
    """Near-dup pairs INTRODUCED by an increment: verified (id_a, id_b,
    jaccard) with at least one end in ``new_ds`` and the other in the
    indexed corpus or the increment itself.

    The historical corpus is touched only through the band index: the
    increment is sketched, its band keys select which index shards to read,
    and within those shards only exactly-matching (band_id, band_hash) rows
    survive a broadcast searchsorted prefilter — read I/O is proportional
    to the increment's collision footprint, never to corpus size. Pair
    formation restricts to pairs touching a new document (degenerate
    groups emit one hub edge per new member instead of new x group).

    ``corpus_ds`` supplies candidate texts for verification (column-pruned
    candidate-only fetch, same machinery as minhash_lsh_pairs); without it
    old-half texts are unavailable, old candidates verify as jaccard 0 and
    only new-new pairs survive — pass the corpus for the real contract.
    Output schema matches minhash_lsh_pairs exactly."""
    import glob
    import json
    import os

    import ray
    import ray.data

    with open(os.path.join(index_dir, _INDEX_PARAMS)) as f:
        p = json.load(f)
    id_col, col, n_shards = p["id_col"], p["col"], p["n_shards"]
    n_shuffle_buckets = 64

    new_band = _band_sketch(new_ds, col=col, id_col=id_col,
                            num_perm=p["num_perm"], bands=p["bands"],
                            shingle_k=p["shingle_k"]).materialize()

    # the increment's band-key set (increment-sized, bounded): one sorted
    # array broadcast once — selects shards AND prefilters rows within them
    key_parts = [
        _band_key(b.column("band_id").to_numpy(zero_copy_only=False),
                  b.column("band_hash").to_numpy(zero_copy_only=False))
        for b in new_band.iter_batches(batch_format="pyarrow")]
    keys = (np.unique(np.concatenate(key_parts)) if key_parts
            else np.empty(0, np.uint64))
    shards = np.unique(_shard_of(keys, n_shards)).tolist()
    files: list[str] = []
    for s in shards:
        files.extend(sorted(glob.glob(f"{index_dir}/shard={int(s)}/*.parquet")))
    key_ref = ray.put(keys)  # sorted (np.unique)

    # id columns keep the corpus's own type (int64 and string ids alike);
    # the new side's type anchors the union schema, the parquet side casts
    # to it (a string id can round-trip as large_string)
    new_sch = new_band.schema()
    new_base = getattr(new_sch, "base_schema", new_sch)
    id_type = (new_base.field(id_col).type if isinstance(new_base, pa.Schema)
               else pa.int64())

    class KeepColliding:
        def __init__(self):
            self.keys = ray.get(key_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = _band_key(
                t.column("band_id").cast(pa.int32()).to_numpy(zero_copy_only=False),
                t.column("band_hash").cast(pa.int64()).to_numpy(zero_copy_only=False))
            if len(self.keys) == 0:
                hit = np.zeros(len(k), bool)
            else:
                pos = np.searchsorted(self.keys, k)
                pos[pos == len(self.keys)] = 0
                hit = self.keys[pos] == k
            kept = t.filter(pa.array(hit))
            return pa.table({id_col: kept.column(id_col).cast(id_type),
                             "band_id": kept.column("band_id").cast(pa.int32()),
                             "band_hash": kept.column("band_hash").cast(pa.int64()),
                             "is_new": pa.array(np.zeros(kept.num_rows, np.int8))})

    def mark_new(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t.column(id_col),
                         "band_id": t.column("band_id"),
                         "band_hash": t.column("band_hash"),
                         "is_new": pa.array(np.ones(t.num_rows, np.int8))})

    sides = new_band.map_batches(mark_new, batch_format="pyarrow")
    if files:
        old_cand = ray.data.read_parquet(files).map_batches(
            KeepColliding, batch_format="pyarrow", concurrency=_pool())
        sides = sides.union(old_cand)

    def add_bucket(t: pa.Table) -> pa.Table:
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        bi = t.column("band_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = ((bh ^ (bi * np.int64(0x9E3779B9)))
                  % n_shuffle_buckets).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    def inc_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", id_col])
        bi = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        new_grp = np.ones(len(g), bool)
        new_grp[1:] = (bi[1:] != bi[:-1]) | (bh[1:] != bh[:-1])
        codes = np.cumsum(new_grp) - 1
        counts = np.bincount(codes)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ids = g[id_col].to_numpy()
        isnew = g["is_new"].to_numpy().astype(bool)
        out_a, out_b = [], []
        for ci in np.nonzero(counts >= 2)[0]:
            s, c = starts[ci], counts[ci]
            nw = np.nonzero(isnew[s:s + c])[0]
            if len(nw) == 0:
                continue
            gi = ids[s:s + c]
            if len(nw) * c > max_group_pairs:
                # degenerate group: one hub edge per NEW member (the group
                # min id, or the second-min when the new member IS the min)
                hub = gi[0]
                xs = gi[nw]
                partners = np.where(xs == hub, gi[1], hub)
                keep = xs != partners
                out_a.append(np.minimum(xs, partners)[keep])
                out_b.append(np.maximum(xs, partners)[keep])
                continue
            ia = np.repeat(nw, c)
            ib = np.tile(np.arange(c), len(nw))
            keep = gi[ia] != gi[ib]
            out_a.append(np.minimum(gi[ia], gi[ib])[keep])
            out_b.append(np.maximum(gi[ia], gi[ib])[keep])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": []})
        df = pd.DataFrame({"id_a": np.concatenate(out_a),
                           "id_b": np.concatenate(out_b)})
        return df.drop_duplicates(["id_a", "id_b"])

    cand = (sides.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(inc_pairs, batch_format="pandas"))

    def pair_bucket(t: pa.Table) -> pa.Table:
        bucket = _id_shuffle_bucket(
            t.column("id_a").to_numpy(zero_copy_only=False),
            t.column("id_b").to_numpy(zero_copy_only=False),
            n_buckets=n_shuffle_buckets)
        return t.append_column("pbucket", bucket)

    def pair_dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]]

    cand = (cand.map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("pbucket").map_groups(pair_dedupe, batch_format="pandas"))

    texts_ds = new_ds.select_columns([id_col, col])
    if corpus_ds is not None:
        texts_ds = corpus_ds.select_columns([id_col, col]).union(texts_ds)
    out = _verify_candidate_pairs(cand, texts_ds, id_col=id_col, col=col,
                                  shingle_k=p["shingle_k"],
                                  jaccard_threshold=jaccard_threshold,
                                  broadcast_texts_limit=broadcast_texts_limit)
    if return_info:
        return out, {"shards_read": len(shards), "n_shards": n_shards,
                     "files_read": len(files),
                     "new_band_rows": new_band.count()}
    return out


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(ds, benchmark_ds, col: str = "text", id_col: str = "doc_id",
                  bench_col: str | None = None, shingle_k: int = 13,
                  max_hits: int = 0, broadcast_limit: int = 8_000_000,
                  mark_only: bool = False):
    """Benchmark decontamination (the GPT-3-style 13-gram rule): drop
    training documents sharing more than ``max_hits`` DISTINCT word
    ``shingle_k``-grams with the evaluation/benchmark set; benchmark texts
    shorter than ``shingle_k`` words match on their whole (whitespace-joined,
    lowercased) text — the same short-doc rule the MinHash sketcher uses.

    Scale shape: the benchmark side is small by definition — its distinct
    shingle-hash set is collected once (a ValueError above
    ``broadcast_limit`` hashes tells the caller to raise ``shingle_k`` or
    split the benchmark), ships once via ray.put, and the corpus streams
    through one vectorized shingle + searchsorted membership pass per batch
    (zero shuffles). ``mark_only=True`` keeps every row and just appends the
    ``contam_hits`` count column for auditing."""
    import ray

    bench_col = bench_col or col

    def bench_shingles(t: pa.Table) -> pa.Table:
        _, a = _shingle_hashes(
            t.column(bench_col).to_numpy(zero_copy_only=False), shingle_k)
        return pa.table({"sh": pa.array(np.unique(a).view(np.int64), pa.int64())})

    parts = [b.column("sh").to_numpy(zero_copy_only=False)
             for b in (benchmark_ds.map_batches(bench_shingles,
                                                batch_format="pyarrow")
                       .iter_batches(batch_format="pyarrow"))]
    bench = (np.unique(np.concatenate(parts)).view(np.uint64) if parts
             else np.empty(0, np.uint64))
    if len(bench) > broadcast_limit:
        raise ValueError(
            f"benchmark shingle set ({len(bench)}) exceeds broadcast_limit "
            f"({broadcast_limit}); raise shingle_k or split the benchmark")
    bench_ref = ray.put(bench)

    class Decontaminate:
        def __init__(self):
            self.bench = ray.get(bench_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            hits = np.zeros(n, np.int64)
            if n and len(self.bench):
                d, a = _shingle_hashes(
                    batch.column(col).to_numpy(zero_copy_only=False), shingle_k)
                if len(a):
                    pos = np.searchsorted(self.bench, a)
                    pos[pos == len(self.bench)] = 0
                    hit = self.bench[pos] == a
                    hits = np.bincount(d[hit], minlength=n).astype(np.int64)
            out = batch.append_column("contam_hits", pa.array(hits, pa.int64()))
            if mark_only:
                return out
            return out.filter(pa.array(hits <= max_hits))

    return ds.map_batches(Decontaminate, batch_format="pyarrow",
                          concurrency=_pool())

def _pool():
    """Cluster-sized actor-pool bounds (see functions/pool.py)."""
    from .pool import actor_pool
    return actor_pool()

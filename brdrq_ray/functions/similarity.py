"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
BROADCAST query matrix (ray.put once, read in every task), per-batch partial
top-k, tiny driver-side merge. The scale path is IVF: vectors are
hash-partitioned by nearest centroid (one shuffle of (vector, centroid_id)),
queries probe only the closest n_probe centroid partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .vecs import embedding_matrix


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


class BruteForceTopK:
    """Actor stage: holds the normalized query matrix (fetched from the
    object store once per actor); emits per-batch partial top-k rows."""

    def __init__(self, queries_ref, k: int, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.Q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        # rows ordered by id first, then a STABLE score sort: the per-batch
        # partial top-k follows the (cosine desc, id asc) total order the
        # driver merge uses, so exact-tie candidates (duplicate vectors — a
        # real dedup-corpus case) surface identically under any partitioning
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = _normalize(embedding_matrix(batch.column(self.vec_col)))[order]
        sim = self.Q @ V.T                      # (n_q, n_batch)
        k = min(self.k, sim.shape[1])
        # partial top-k per query within this batch
        idx = np.argsort(-np.round(sim, 9), axis=1, kind="stable")[:, :k]
        rows_q = np.repeat(np.arange(sim.shape[0]), k)
        rows_v = idx.ravel()
        return pa.table({
            "query_id": pa.array(rows_q, pa.int64()),
            self.id_col: pa.array(ids[rows_v]),
            "cosine": pa.array(sim[rows_q, rows_v], pa.float64()),
        })


def knn_brute_force(ds, queries: np.ndarray, k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> pd.DataFrame:
    """Exact cosine top-k of each query against the whole dataset. Partial
    top-k per batch (distributed) + driver merge of n_batches*k tiny rows.
    Returns (query_id, vec_id, cosine, rank) — rank ties broken by id for
    determinism."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partial = ds.map_batches(BruteForceTopK,
                             fn_constructor_kwargs=dict(queries_ref=qref, k=k,
                                                        vec_col=vec_col, id_col=id_col),
                             batch_format="pyarrow", concurrency=_pool())
    df = partial.to_pandas()
    df["cosine"] = df["cosine"].round(9)  # kill float-order noise in ranking
    df = df.sort_values(["query_id", "cosine", id_col],
                        ascending=[True, False, True])
    df = df.groupby("query_id", group_keys=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df.reset_index(drop=True)


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10,
               seed: int = 5) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on a driver-side sample (the IVF
    codebook — trained on a sample, never the full data)."""
    rng = np.random.default_rng(seed)
    X = _normalize(np.asarray(sample, dtype=np.float64))
    C = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(iters):
        sim = X @ C.T
        assign = sim.argmax(axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = _normalize(C)
    return C


def resolve_n_clusters(n_clusters, n_vectors: int,
                       target_cluster_size: int | None = None) -> int:
    """IVF sizing rule: ~sqrt(n) cells when unset (the standard IVF heuristic
    — cell size ~ sqrt(n) balances probe cost against centroid-scan cost),
    clamped to [4, 65536].

    ``target_cluster_size`` switches to the ~constant-cluster-size policy
    (k = ceil(n / target)): per-cluster pruning work is O(m^2) in cluster
    size m, so sqrt-sizing makes TOTAL SemDeDup cost grow ~n^1.5 (m ~
    sqrt(n)); pinning m ~ target makes it ~linear in n at the price of more
    centroids to train/scan. The 100 TB knob for the dedup family — see
    BASELINE.md's SemDeDup cost-curve probes."""
    if n_clusters is not None:
        return int(n_clusters)
    if target_cluster_size:
        k = -(-max(n_vectors, 1) // int(target_cluster_size))  # ceil div
        return int(min(65536, max(4, k)))
    return int(min(65536, max(4, round(np.sqrt(max(n_vectors, 1))))))


def kmeans_refine_distributed(ds, C0: np.ndarray, iters: int = 3,
                              vec_col: str = "embedding") -> np.ndarray:
    """Distributed Lloyd refinement: each iteration is ONE streaming pass —
    every batch emits per-centroid partial (sum, count) against the broadcast
    codebook, the driver reduces n_batches tiny stat rows and updates C.
    Rows never leave their block; only (n_clusters x dim) stats travel.
    Used above the sample threshold where a driver-side sample no longer
    represents the corpus."""
    C = np.asarray(C0, dtype=np.float64)
    ncl, dim = C.shape
    for _ in range(iters):
        cref = ray.put(C)

        def stats(batch: pa.Table) -> pa.Table:
            Cc = ray.get(cref)
            V = _normalize(embedding_matrix(batch.column(vec_col)))
            assign = (V @ Cc.T).argmax(axis=1)
            sums = np.zeros((ncl, dim), dtype=np.float64)
            np.add.at(sums, assign, V)
            counts = np.bincount(assign, minlength=ncl).astype(np.int64)
            return pa.table({"sums": pa.array([sums.tobytes()], pa.binary()),
                             "counts": pa.array([counts.tobytes()], pa.binary())})

        parts = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
        tot_s = np.zeros((ncl, dim), dtype=np.float64)
        tot_c = np.zeros(ncl, dtype=np.int64)
        for _, row in parts.iterrows():
            tot_s += np.frombuffer(row["sums"], dtype=np.float64).reshape(ncl, dim)
            tot_c += np.frombuffer(row["counts"], dtype=np.int64)
        nz = tot_c > 0
        C = C.copy()
        C[nz] = tot_s[nz] / tot_c[nz, None]
        C = _normalize(C)
    return C


#: corpora above this size train the codebook with distributed refinement
#: passes instead of trusting the driver-side sample alone
DISTRIBUTED_TRAIN_THRESHOLD = 100_000


def ivf_build(ds, n_clusters: int | None = 16, vec_col: str = "embedding",
              id_col: str = "vec_id", train_sample: int = 2048,
              index_dir: str | None = None,
              distributed_train: bool | None = None) -> dict:
    """Build the IVF index: init the codebook with k-means on a driver-side
    SAMPLE (optionally refined by distributed Lloyd passes — automatic above
    DISTRIBUTED_TRAIN_THRESHOLD vectors), assign every vector to its nearest
    centroid (broadcast codebook, one streaming pass), then MATERIALIZE the
    inverted file as parquet partitioned by ``ivf_cell`` — one directory per
    cell, so a probe reads only the probed cells' files and never scans the
    rest of the corpus. ``n_clusters=None`` derives ~sqrt(n_vectors).
    Returns {'index_dir', 'codebook', 'n_clusters'} (the probe handle)."""
    import os
    import shutil

    if index_dir is None:
        import tempfile
        index_dir = tempfile.mkdtemp(prefix="brdrq_ivf_", dir="/tmp")
    elif os.path.isdir(index_dir):
        shutil.rmtree(index_dir)

    # one count, only when something actually needs it (n_clusters derivation
    # or the distributed-train decision) — never two passes, never a wasted
    # pass when the caller supplied both knobs
    if n_clusters is None or distributed_train is None:
        n_vectors = ds.count()
        n_clusters = resolve_n_clusters(n_clusters, n_vectors)
        if distributed_train is None:
            distributed_train = n_vectors > DISTRIBUTED_TRAIN_THRESHOLD
    n_clusters = int(n_clusters)
    # the init sample must COVER the codebook (kmeans_fit seeds centroids by
    # sampling without replacement) — a derived sqrt(n) n_clusters above
    # train_sample would otherwise silently shrink the codebook
    sample_n = max(train_sample, 2 * n_clusters)
    sample = np.asarray(ds.limit(sample_n).to_pandas()[vec_col].tolist())
    C = kmeans_fit(sample, n_clusters)
    if distributed_train:
        C = kmeans_refine_distributed(ds, C, iters=3, vec_col=vec_col)
    n_clusters = len(C)  # truthful: == codebook size even if the data is tiny
    cref = ray.put(C)

    class AssignStage:
        def __init__(self):
            self.C = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            V = _normalize(embedding_matrix(batch.column(vec_col)))
            assign = (V @ self.C.T).argmax(axis=1)
            return batch.append_column("ivf_cell", pa.array(assign, pa.int32()))

    (ds.map_batches(AssignStage, batch_format="pyarrow", concurrency=_pool())
       .write_parquet(index_dir, partition_cols=["ivf_cell"]))
    np.save(os.path.join(index_dir, "_codebook.npy"), C)
    return {"index_dir": index_dir, "codebook": C, "n_clusters": n_clusters}


def ivf_load(index_dir: str) -> dict:
    C = np.load(f"{index_dir}/_codebook.npy")
    return {"index_dir": index_dir, "codebook": C, "n_clusters": len(C)}


def ivf_cell_files(index_dir: str, cells) -> list[str]:
    """Parquet files of the probed cells only (the point of the inverted
    file: probe I/O is proportional to n_probe/n_clusters, not corpus size)."""
    import glob

    files: list[str] = []
    for c in sorted(set(int(x) for x in cells)):
        files.extend(sorted(glob.glob(f"{index_dir}/ivf_cell={c}/*.parquet")))
    return files


def ivf_probe(index: dict, queries: np.ndarray, k: int = 10, n_probe: int = 4,
              vec_col: str = "embedding", id_col: str = "vec_id") -> pd.DataFrame:
    """Probe the inverted file: per query the n_probe nearest centroids are
    selected, ONLY those cells' parquet partitions are read, and each batch
    scores only the queries probing its cell. Same output schema as
    knn_brute_force; recall < 1 by design."""
    C = index["codebook"]
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]      # (n_q, n_probe)
    probe_sets = [set(row) for row in probe.tolist()]
    needed = sorted({c for s in probe_sets for c in s})
    files = ivf_cell_files(index["index_dir"], needed)
    if not files:
        return pd.DataFrame({"query_id": [], id_col: [], "cosine": [], "rank": []})
    qref = ray.put(Q)

    # cell -> array of query indices probing it (built ONCE, shipped in the
    # actor closure): the batch kernel is then one matmul per distinct cell
    # in the batch over the WHOLE query block probing that cell — never a
    # Python loop over queries
    cell_queries = {int(c): np.nonzero([(c in s) for s in probe_sets])[0]
                    for c in needed}

    class ProbeTopK:
        def __init__(self):
            self.Q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            # the hive partition column comes back as string -> int
            cells = batch.column("ivf_cell").cast(pa.int32()).to_numpy(zero_copy_only=False)
            ids = np.asarray(batch.column(id_col).to_pylist())
            V = _normalize(embedding_matrix(batch.column(vec_col)))
            out_q, out_id, out_s = [], [], []
            for c in np.unique(cells):
                qs = cell_queries.get(int(c))
                if qs is None or len(qs) == 0:
                    continue
                rows = np.nonzero(cells == c)[0]
                # id-ordered rows + stable sort: exact-tie candidates
                # (duplicate vectors) surface partition-invariantly, in the
                # same (cosine desc, id asc) order the driver merge applies
                rows = rows[np.argsort(ids[rows], kind="stable")]
                sim = self.Q[qs] @ V[rows].T            # (n_q_cell, n_rows)
                kk = min(k, sim.shape[1])
                top = np.argsort(-np.round(sim, 9), axis=1,
                                 kind="stable")[:, :kk]
                rq = np.repeat(qs, kk)
                rv = rows[top.ravel()]
                out_q.append(rq)
                out_id.append(ids[rv])
                out_s.append(sim[np.repeat(np.arange(len(qs)), kk),
                                 top.ravel()])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 id_col: batch.column(id_col).slice(0, 0).combine_chunks(),
                                 "cosine": pa.array([], pa.float64())})
            return pa.table({"query_id": pa.array(np.concatenate(out_q), pa.int64()),
                             id_col: pa.array(np.concatenate(out_id)),
                             "cosine": pa.array(np.concatenate(out_s), pa.float64())})

    df = (ray.data.read_parquet(files)
          .map_batches(ProbeTopK, batch_format="pyarrow", concurrency=_pool())
          .to_pandas())
    df["cosine"] = df["cosine"].round(9)
    df = df.sort_values(["query_id", "cosine", id_col], ascending=[True, False, True])
    df = df.groupby("query_id", group_keys=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df.reset_index(drop=True)


def ivf_knn(ds, queries: np.ndarray, k: int = 10, n_clusters: int | None = 16,
            n_probe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
            train_sample: int = 2048, index_dir: str | None = None,
            cache_key: str | None = None,
            distributed_train: bool | None = None) -> pd.DataFrame:
    """IVF ANN, build + probe in one call (ad-hoc use; production keeps the
    ivf_build index and probes it repeatedly). ``n_clusters=None`` derives
    ~sqrt(n_vectors). ``cache_key`` (a content hash of the input the CALLER
    vouches for) persists the inverted file under /tmp/brdrq_ivf_cache so
    repeated queries skip the build entirely."""
    import os
    import shutil

    if n_clusters is None:
        # count only when the cache path NAME needs the derived value;
        # with an explicit n_clusters a warm-cache probe pays no count at
        # all (ivf_build decides distributed_train itself on a cold build)
        n_vectors = ds.count()
        n_clusters = resolve_n_clusters(None, n_vectors)
        if distributed_train is None:
            distributed_train = n_vectors > DISTRIBUTED_TRAIN_THRESHOLD
    if cache_key and index_dir is None:
        index_dir = f"/tmp/brdrq_ivf_cache/{cache_key}-c{n_clusters}-t{train_sample}"
        if os.path.exists(os.path.join(index_dir, "_codebook.npy")):
            return ivf_probe(ivf_load(index_dir), queries, k, n_probe,
                             vec_col, id_col)
        index = ivf_build(ds, n_clusters, vec_col, id_col, train_sample,
                          index_dir, distributed_train=distributed_train)
        return ivf_probe(index, queries, k, n_probe, vec_col, id_col)

    own_index = index_dir is None
    index = ivf_build(ds, n_clusters, vec_col, id_col, train_sample,
                          index_dir, distributed_train=distributed_train)
    try:
        return ivf_probe(index, queries, k, n_probe, vec_col, id_col)
    finally:
        if own_index:
            shutil.rmtree(index["index_dir"], ignore_errors=True)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv:2303.09540)
# ---------------------------------------------------------------------------

def _fit_codebook(ds, n_clusters, vec_col: str, train_sample: int,
                  distributed_train: bool | None,
                  target_cluster_size: int | None = None) -> np.ndarray:
    """Shared codebook bootstrap for the cluster-family operators
    (semantic_dedup, cluster_sample): resolve sizing (~sqrt(n), or
    ~constant cluster size when ``target_cluster_size`` is set) and the
    distributed-train decision (one count, only when something needs it),
    init on a driver-side sample, optionally refine with distributed Lloyd
    passes (the minibatch-style refinement: centroids only ever see
    streaming per-batch (sum, count) stats). Mirrors ivf_build's training
    path."""
    if n_clusters is None or distributed_train is None:
        n_vectors = ds.count()
        n_clusters = resolve_n_clusters(n_clusters, n_vectors,
                                        target_cluster_size)
        if distributed_train is None:
            distributed_train = n_vectors > DISTRIBUTED_TRAIN_THRESHOLD
    sample_n = max(train_sample, 2 * int(n_clusters))
    sample = np.asarray(
        ds.limit(sample_n).to_pandas()[vec_col].tolist(), dtype=np.float64)
    C = kmeans_fit(sample, int(n_clusters))
    if distributed_train:
        C = kmeans_refine_distributed(ds, C, iters=3, vec_col=vec_col)
    return C


def _assign_cells(ds, C: np.ndarray, vec_col: str, out_col: str = "sem_cell"):
    """Append the nearest-centroid cell id (broadcast codebook, one streaming
    pass — the same shape as ivf_build's AssignStage)."""
    cref = ray.put(np.asarray(C, dtype=np.float64))

    class Assign:
        def __init__(self):
            self.C = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            V = _normalize(embedding_matrix(batch.column(vec_col)))
            return batch.append_column(
                out_col, pa.array((V @ self.C.T).argmax(axis=1), pa.int32()))

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=_pool())


def _prune_cluster(ids, V: np.ndarray, centroid: np.ndarray,
                   threshold: float, block: int = 1024) -> np.ndarray:
    """SemDeDup's within-cluster rule, vectorized: order members by cosine
    similarity to the centroid ASCENDING (farthest-from-centroid first — the
    paper keeps the low-centroid-similarity example of each duplicate group),
    ties by id; member i survives iff its max cosine to every EARLIER member
    in that order is <= threshold. Returns the boolean keep mask in the
    ORIGINAL row order.

    Blockwise evaluation bounds the temporary to (block x m): rows [s, e)
    score against all rows < e in one matmul, with the within-block upper
    triangle masked. Unlike greedy leader clustering this is the published
    SemDeDup semantics (max over all earlier members, kept or not), which is
    what makes it expressible as pure matmuls."""
    Vn = _normalize(np.asarray(V, dtype=np.float64))
    c = np.asarray(centroid, dtype=np.float64)
    c = c / (np.linalg.norm(c) or 1.0)
    csim = np.round(Vn @ c, 9)                   # kill float-order noise
    order = np.lexsort((np.asarray(ids, dtype=object), csim))
    Vo = Vn[order]
    m = len(order)
    keep_sorted = np.ones(m, dtype=bool)
    for s in range(1, m, block):
        e = min(s + block, m)
        sim = Vo[s:e] @ Vo[:e].T                 # (e-s, e)
        # mask self + later-in-block comparisons (j >= i)
        ii = np.arange(s, e)[:, None]
        jj = np.arange(e)[None, :]
        sim[jj >= ii] = -np.inf
        keep_sorted[s:e] = sim.max(axis=1) <= threshold
    keep = np.empty(m, dtype=bool)
    keep[order] = keep_sorted
    return keep


def semantic_dedup_keep_ids(ds, threshold: float = 0.95,
                            n_clusters: int | None = None,
                            vec_col: str = "embedding", id_col: str = "vec_id",
                            train_sample: int = 2048,
                            distributed_train: bool | None = None,
                            block: int = 1024,
                            target_cluster_size: int | None = None):
    """Semantic dedup survivor ids (SemDeDup): k-means partitions the corpus
    into clusters (reusing the IVF codebook machinery — driver-sampled init,
    distributed Lloyd refinement above DISTRIBUTED_TRAIN_THRESHOLD vectors),
    then each cluster is pruned independently with the rule in
    :func:`_prune_cluster`. Cross-cluster near-duplicates are NOT compared —
    that recall cut is the published algorithm's scale trade, the same
    assumption SemDeDup runs on its 1.3B-example corpus.

    Distributed shape: one broadcast-codebook assignment pass, then ONE
    shuffle on the cluster id (groupby.map_groups); per-group work is
    O(m^2/block) matmul flops with O(block x m) memory, m ~ n/k with
    k ~ sqrt(n) by default — total cost then grows ~n^1.5. Past ~100k
    vectors set ``target_cluster_size`` (e.g. 1000): k = ceil(n/target)
    pins m ~ target so total pruning cost is ~LINEAR in n (BASELINE.md
    SemDeDup cost-curve probes). Deterministic: fixed k-means seed, round-9
    centroid similarities, id tie-breaks — independent of partitioning.

    Returns a Dataset of (id_col, sem_cell) for the SURVIVORS (small relative
    to the input; semi-join it back or call :func:`semantic_dedup`)."""
    import pandas as pd

    C = _fit_codebook(ds, n_clusters, vec_col, train_sample,
                      distributed_train, target_cluster_size)
    cref = ray.put(C)

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        Cc = ray.get(cref)
        cell = int(g["sem_cell"].iloc[0])
        ids = g[id_col].to_numpy()
        V = np.asarray(g[vec_col].tolist(), dtype=np.float64)
        keep = _prune_cluster(ids, V, Cc[cell], threshold, block=block)
        return pd.DataFrame({id_col: ids[keep],
                             "sem_cell": np.full(int(keep.sum()), cell,
                                                 dtype=np.int32)})

    assigned = _assign_cells(ds.select_columns([id_col, vec_col]), C, vec_col)
    return assigned.groupby("sem_cell").map_groups(prune, batch_format="pandas")


def semantic_dedup(ds, threshold: float = 0.95, vec_col: str = "embedding",
                   id_col: str = "vec_id", **kwargs):
    """Filter the dataset to its semantic-dedup survivors (see
    :func:`semantic_dedup_keep_ids`): the survivor-id table (small) is
    semi-joined back distributedly — the corpus itself never broadcasts."""
    from .relational import semi_join

    kept = semantic_dedup_keep_ids(ds, threshold=threshold, vec_col=vec_col,
                                   id_col=id_col, **kwargs)
    return semi_join(ds, kept.select_columns([id_col]), on=id_col)


# ---------------------------------------------------------------------------
# cluster-aware sampling (D4 / SSL-prototypes family, Tirumala et al. 2023)
# ---------------------------------------------------------------------------

def cluster_sample_ids(ds, k_per_cluster: int, mode: str = "far",
                       n_clusters: int | None = None,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       train_sample: int = 2048,
                       distributed_train: bool | None = None):
    """Per-cluster top-k selection over the embedding space: k-means the
    corpus (IVF codebook machinery), then per cluster keep the k members
    FARTHEST from the centroid (``mode='far'`` — the D4 diversity pick that
    drops prototypical near-boilerplate examples) or NEAREST
    (``mode='near'`` — SSL-prototypes; keeps canonical examples).

    Distributed shape: broadcast-codebook assignment appends (cell,
    centroid-cosine) per row, then each batch emits its per-cell partial
    top-k and the driver folds the bounded partials (<= blocks x cells x k
    rows) — the stratified_take_k shape with the centroid similarity as the
    key, NO shuffle at all. Deterministic: round-9 similarities, id
    tie-breaks. Returns a small Dataset of (id_col, sem_cell, centroid_sim)
    survivors — semi-join it back (:func:`cluster_sample`)."""
    import pandas as pd

    if mode not in ("far", "near"):
        raise ValueError(f"mode must be 'far' or 'near', got {mode!r}")
    cref = ray.put(_fit_codebook(ds, n_clusters, vec_col, train_sample,
                                 distributed_train))
    ascending = mode == "far"  # far = smallest centroid-cosine first

    def partial(batch: pa.Table) -> pa.Table:
        Cc = ray.get(cref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=object)
        V = _normalize(embedding_matrix(batch.column(vec_col)))
        sim = V @ Cc.T
        cell = sim.argmax(axis=1)
        csim = np.round(sim[np.arange(len(cell)), cell], 9)
        df = pd.DataFrame({id_col: ids, "sem_cell": cell.astype(np.int32),
                           "centroid_sim": csim})
        df = (df.sort_values(["sem_cell", "centroid_sim", id_col],
                             ascending=[True, ascending, True],
                             kind="mergesort")
                .groupby("sem_cell", sort=False).head(k_per_cluster))
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], pa.string()),
             "sem_cell": pa.array([], pa.int32()),
             "centroid_sim": pa.array([], pa.float64())}))
    df = pd.DataFrame(parts)
    df = (df.sort_values(["sem_cell", "centroid_sim", id_col],
                         ascending=[True, ascending, True], kind="mergesort")
            .groupby("sem_cell", sort=False).head(k_per_cluster)
            .reset_index(drop=True))
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def cluster_sample(ds, k_per_cluster: int, mode: str = "far",
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   **kwargs):
    """Filter the dataset to its cluster-sample survivors (semi-join of the
    small id table from :func:`cluster_sample_ids`)."""
    from .relational import semi_join

    kept = cluster_sample_ids(ds, k_per_cluster, mode=mode, vec_col=vec_col,
                              id_col=id_col, **kwargs)
    return semi_join(ds, kept.select_columns([id_col]), on=id_col)

def knn_join(queries, corpus, k: int = 10, n_clusters: int | None = None,
             n_probe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id", query_id_col: str | None = None,
             train_sample: int = 2048,
             distributed_train: bool | None = None) -> ray.data.Dataset:
    """Dataset-to-dataset ANN join: every row of ``queries`` gets its top-k
    cosine neighbors from ``corpus`` — the similarity-join shape where BOTH
    sides are datasets, so no driver-side query matrix ever exists (unlike
    :func:`knn_brute_force` / :func:`ivf_probe`, whose queries broadcast).

    Distributed shape: one codebook (the shared IVF training path) ships by
    ray.put; the corpus assigns each vector to its nearest cell (one
    streaming pass), each query replicates to its ``n_probe`` nearest cells
    (bounded n_probe-fold fan-out of the query side only); ONE cell shuffle
    co-locates them, each cell group runs one matmul + stable partial top-k,
    and a tiny per-query groupby (group size = n_probe x k rows) merges the
    global top-k. Recall follows IVF semantics: exact when
    ``n_probe >= n_clusters``, approximate below.

    Ids are returned as strings (``query_id``, ``vec_id``) — the two sides'
    id types need not match. Deterministic: round-9 scores, (cosine desc,
    id asc) total order everywhere."""
    import pandas as pd

    C = _fit_codebook(corpus, n_clusters, vec_col, train_sample,
                      distributed_train)
    cref = ray.put(C)
    qcol = query_id_col or id_col
    ncl = len(C)
    probe = min(n_probe, ncl)

    def corpus_side(batch: pa.Table) -> pa.Table:
        Cc = ray.get(cref)
        V = _normalize(embedding_matrix(batch.column(vec_col)))
        cell = (V @ Cc.T).argmax(axis=1)
        n = batch.num_rows
        return pa.table({
            "cell": pa.array(cell, pa.int32()),
            "side": pa.array(["c"] * n, pa.string()),
            "rid": batch.column(id_col).cast(pa.string()),
            vec_col: batch.column(vec_col),
        })

    def query_side(batch: pa.Table) -> pa.Table:
        Cc = ray.get(cref)
        V = _normalize(embedding_matrix(batch.column(vec_col)))
        near = np.argsort(-(V @ Cc.T), axis=1, kind="stable")[:, :probe]
        n = batch.num_rows
        rows = np.repeat(np.arange(n), probe)
        vecs = batch.column(vec_col)
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        return pa.table({
            "cell": pa.array(near.ravel(), pa.int32()),
            "side": pa.array(["q"] * (n * probe), pa.string()),
            "rid": batch.column(qcol).cast(pa.string()).take(pa.array(rows)),
            vec_col: vecs.take(pa.array(rows)),
        })

    unified = corpus.map_batches(corpus_side, batch_format="pyarrow").union(
        queries.map_batches(query_side, batch_format="pyarrow"))

    def cell_knn(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side").to_pylist())
        is_q = side == "q"
        if not is_q.any() or is_q.all():
            return pa.table({"qid": pa.array([], pa.string()),
                             "rid": pa.array([], pa.string()),
                             "cosine": pa.array([], pa.float64())})
        ids = np.asarray(group.column("rid").to_pylist())
        V = _normalize(embedding_matrix(group.column(vec_col)))
        qi = np.nonzero(is_q)[0]
        ci = np.nonzero(~is_q)[0]
        ci = ci[np.argsort(ids[ci], kind="stable")]   # id-ordered ties
        sim = np.round(V[qi] @ V[ci].T, 9)
        kk = min(k, sim.shape[1])
        top = np.argsort(-sim, axis=1, kind="stable")[:, :kk]
        rows_q = np.repeat(np.arange(len(qi)), kk)
        rows_c = top.ravel()
        return pa.table({
            "qid": pa.array(ids[qi][rows_q]),
            "rid": pa.array(ids[ci][rows_c]),
            "cosine": pa.array(sim[rows_q, rows_c], pa.float64()),
        })

    partial = unified.groupby("cell").map_groups(cell_knn,
                                                 batch_format="pyarrow")

    def merge(g) -> "pd.DataFrame":
        g = g.sort_values(["cosine", "rid"], ascending=[False, True],
                          kind="mergesort").head(k)
        return pd.DataFrame({"query_id": g["qid"].to_numpy(),
                             "vec_id": g["rid"].to_numpy(),
                             "cosine": g["cosine"].to_numpy(),
                             "rank": np.arange(1, len(g) + 1,
                                               dtype=np.int64)})

    return partial.groupby("qid").map_groups(merge, batch_format="pandas")


def _pool():
    """Cluster-sized actor-pool bounds (see functions/pool.py)."""
    from .pool import actor_pool
    return actor_pool()

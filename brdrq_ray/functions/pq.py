"""Product quantization (PQ) + IVF-PQ — the compressed scale path for
similarity search.

PQ (Jegou, Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI 33(1)): split the D-dim embedding space into ``m``
subspaces of D/m dims; per subspace train a ``ks``-entry codebook (Lloyd
k-means on a driver-side sample); a vector is then stored as m uint8 codes
(m bytes at ks<=256) instead of 4*D float bytes — dim-64 float32 vectors go
from 256 bytes to 8 bytes at m=8 (32x). Search is ADC (asymmetric distance
computation): per query ONE (m x ks) inner-product lookup table against the
codebooks; the approximate score of an encoded vector is the sum of m table
lookups — the corpus is scanned compressed, with no decode and no float
matmul over raw vectors.

Scale shape (the 100 TB contract):
- training reads a bounded driver-side sample (the codebooks are KB-sized);
- encoding is one streaming actor-pool pass with the codebooks broadcast
  via ``ray.put`` (fetched once per actor, never per batch);
- the encoded table is what persists and shuffles — 32x less object-store
  and I/O than raw vectors;
- ADC scoring is a per-batch numpy gather (LUT built once per actor), with
  per-batch partial top-k and a tiny driver merge — the same partial-top-k
  shape as ``knn_brute_force``;
- IVF-PQ composes the two approximations: vectors are residual-encoded
  against their coarse IVF centroid and the codes are materialized as
  parquet PARTITIONED BY CELL, so a probe reads n_probe/n_clusters of the
  corpus AND scans it compressed. Residual codebooks are global (not per
  cell), so each actor builds the (n_q, m, ks) LUT once and per cell only
  adds the scalar q . centroid offset.

Optional exact re-rank: when the encoded table keeps the raw vectors
(``keep_vec=True``), each batch also emits the exact cosine of the rows it
surfaces, and the driver re-ranks the global top-``rerank`` ADC candidates
by exact score — the standard recall-restoring tail pass, at the cost of
storing raw vectors alongside the codes.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .similarity import _normalize
from .vecs import embedding_matrix


def _kmeans_plain(X: np.ndarray, ks: int, iters: int = 12,
                  seed: int = 7) -> np.ndarray:
    """Deterministic Euclidean Lloyd on raw (sub)vectors — unlike
    ``kmeans_fit`` this must NOT row-normalize: subspace slices of unit
    vectors are not unit vectors. If the data has <= ks distinct rows the
    codebook IS those rows (padded by repeating row 0, which assignment can
    never prefer — equal scores tie-break to the first index), making PQ
    encoding exactly lossless on such data."""
    X = np.asarray(X, dtype=np.float64)
    Xu = np.unique(X, axis=0)
    if len(Xu) <= ks:
        pad = np.repeat(Xu[:1], ks - len(Xu), axis=0)
        return np.concatenate([Xu, pad]) if len(Xu) < ks else Xu
    rng = np.random.default_rng(seed)
    C = Xu[rng.choice(len(Xu), size=ks, replace=False)]
    for _ in range(iters):
        # argmin ||x - c||^2 == argmax (x.c - ||c||^2 / 2)
        score = X @ C.T - 0.5 * np.einsum("kd,kd->k", C, C)
        assign = score.argmax(axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=ks)
        nz = counts > 0
        C = C.copy()
        C[nz] = sums[nz] / counts[nz, None]
    return C


def pq_train(sample: np.ndarray, m: int = 8, ks: int = 256, iters: int = 12,
             seed: int = 7, normalize: bool = True) -> dict:
    """Train the m per-subspace codebooks on a (driver-side) sample.
    ``normalize=True`` trains in cosine space (row-normalized vectors) —
    the convention of the rest of the similarity family; IVF-PQ passes
    residuals with ``normalize=False``. ks must fit uint8 codes."""
    if not 1 <= ks <= 256:
        raise ValueError(f"ks must be in [1, 256] for uint8 codes, got {ks}")
    X = np.asarray(sample, dtype=np.float64)
    if X.ndim != 2:
        raise ValueError("pq_train expects a 2-D sample matrix")
    if normalize:
        X = _normalize(X)
    D = X.shape[1]
    if D % m != 0:
        raise ValueError(f"dim {D} not divisible by m={m}")
    dsub = D // m
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        books[j] = _kmeans_plain(X[:, j * dsub:(j + 1) * dsub], ks,
                                 iters=iters, seed=seed + j)
    return {"codebooks": books, "m": m, "ks": ks, "dsub": dsub, "dim": D,
            "normalize": bool(normalize)}


def pq_encode_codes(model: dict, V: np.ndarray) -> np.ndarray:
    """(n, dim) vectors (already in model space: normalized / residual) ->
    (n, m) uint8 codes. One matmul per subspace; ties break to the first
    (lowest) code deterministically."""
    B = model["codebooks"]
    m, dsub = model["m"], model["dsub"]
    V = np.asarray(V, dtype=np.float64)
    codes = np.empty((len(V), m), dtype=np.uint8)
    for j in range(m):
        score = V[:, j * dsub:(j + 1) * dsub] @ B[j].T \
            - 0.5 * np.einsum("kd,kd->k", B[j], B[j])
        codes[:, j] = score.argmax(axis=1)
    return codes


def pq_decode(model: dict, codes: np.ndarray) -> np.ndarray:
    """(n, m) codes -> (n, dim) reconstructed vectors (centroid concat)."""
    B = model["codebooks"]
    m = model["m"]
    return np.concatenate([B[j][codes[:, j]] for j in range(m)], axis=1)


def _adc_lut(model: dict, Q: np.ndarray) -> np.ndarray:
    """Per-query inner-product lookup table: (n_q, m, ks). ADC score of an
    encoded vector v for query q = sum_j LUT[q, j, code_j(v)] ~= q . v."""
    B = model["codebooks"]                       # (m, ks, dsub)
    n_q = len(Q)
    Qs = np.asarray(Q, dtype=np.float64).reshape(n_q, model["m"], model["dsub"])
    return np.einsum("qjd,jkd->qjk", Qs, B)


def _adc_scores(lut: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """(n_q, m, ks) LUT x (n, m) codes -> (n_q, n) approximate scores.
    m gathers, each vectorized over n_q x n."""
    n_q, m, _ = lut.shape
    S = lut[:, 0, :][:, codes[:, 0]].copy()
    for j in range(1, m):
        S += lut[:, j, :][:, codes[:, j]]
    return S


def _topk_rows(S: np.ndarray, kk: int) -> np.ndarray:
    """Per-query top-kk row indices by (score desc, row-order asc) — a
    STABLE total order. PQ maps distinct vectors to identical codes, so
    exact score ties are common; argpartition would keep an arbitrary tied
    subset per batch and break partition invariance. Callers pre-sort the
    batch rows by id, making this (score desc, id asc) — the same total
    order the driver merge uses, so per-batch partials compose into the
    exact global top-k regardless of partitioning."""
    return np.argsort(-np.round(S, 9), axis=1, kind="stable")[:, :kk]


def _id_order(ids: np.ndarray) -> np.ndarray:
    """Stable ascending order of an id array (ints or strings)."""
    return np.argsort(ids, kind="stable")


def _codes_column(codes: np.ndarray) -> pa.Array:
    """(n, m) uint8 -> FixedSizeList<uint8>[m] (zero-copy back via flatten)."""
    n, m = codes.shape
    return pa.FixedSizeListArray.from_arrays(
        pa.array(codes.ravel(), pa.uint8()), m)


def _codes_matrix(col, m: int) -> np.ndarray:
    """FixedSizeList<uint8>[m] column -> (n, m) uint8 matrix, zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, m)


def pq_encode(ds, model: dict, vec_col: str = "embedding",
              id_col: str = "vec_id", keep_vec: bool = False):
    """Streaming encode pass: (id, pq_code[, vec]) per row. The model ships
    once via ray.put; each actor fetches it in __init__."""
    mref = ray.put(model)

    class Encode:
        def __init__(self):
            self.model = ray.get(mref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            V = embedding_matrix(batch.column(vec_col))
            if self.model["normalize"]:
                V = _normalize(V)
            codes = pq_encode_codes(self.model, V)
            cols = {id_col: batch.column(id_col),
                    "pq_code": _codes_column(codes)}
            if keep_vec:
                cols[vec_col] = batch.column(vec_col)
            return pa.table(cols)

    return ds.map_batches(Encode, batch_format="pyarrow",
                          concurrency=_pool())


def _merge_topk(df: pd.DataFrame, k: int, rerank: int,
                id_col: str) -> pd.DataFrame:
    """Driver merge of per-batch partial candidates: global top-``rerank``
    per query by ADC score, then top-k by exact cosine when present (the
    re-rank pass), else top-k by ADC. Deterministic tie-breaks by id."""
    df["adc_score"] = df["adc_score"].round(9)
    df = df.sort_values(["query_id", "adc_score", id_col],
                        ascending=[True, False, True])
    if rerank > 0:
        df = df.groupby("query_id", group_keys=False).head(max(rerank, k))
        df["cosine"] = df["cosine"].round(9)
        df = df.sort_values(["query_id", "cosine", id_col],
                            ascending=[True, False, True])
    df = df.groupby("query_id", group_keys=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df.reset_index(drop=True)


def pq_search(encoded, model: dict, queries: np.ndarray, k: int = 10,
              rerank: int = 0, vec_col: str = "embedding",
              id_col: str = "vec_id") -> pd.DataFrame:
    """ADC top-k over a pq_encode'd table. Per batch: LUT gathers + partial
    top-max(k, rerank); driver merges n_batches x max(k, rerank) tiny rows.
    ``rerank > 0`` requires the encoded table to carry raw vectors
    (keep_vec=True) and re-ranks the global top-``rerank`` ADC candidates by
    exact cosine. Returns (query_id, id, adc_score[, cosine], rank)."""
    if rerank > 0 and vec_col not in encoded.schema().names:
        raise ValueError("rerank requires pq_encode(..., keep_vec=True)")
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(Q)
    mref = ray.put(model)
    r = max(k, rerank)

    class ADCTopK:
        def __init__(self):
            self.model = ray.get(mref)
            self.lut = _adc_lut(self.model, ray.get(qref))
            self.Q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                empty = {"query_id": pa.array([], pa.int64()),
                         id_col: batch.column(id_col).combine_chunks(),
                         "adc_score": pa.array([], pa.float64())}
                if rerank > 0:
                    empty["cosine"] = pa.array([], pa.float64())
                return pa.table(empty)
            codes = _codes_matrix(batch.column("pq_code"), self.model["m"])
            ids = np.asarray(batch.column(id_col).to_pylist())
            order = _id_order(ids)
            ids, codes = ids[order], codes[order]
            S = _adc_scores(self.lut, codes)            # (n_q, n)
            kk = min(r, S.shape[1])
            idx = _topk_rows(S, kk)
            rows_q = np.repeat(np.arange(S.shape[0]), kk)
            rows_v = idx.ravel()
            cols = {"query_id": pa.array(rows_q, pa.int64()),
                    id_col: pa.array(ids[rows_v]),
                    "adc_score": pa.array(S[rows_q, rows_v], pa.float64())}
            if rerank > 0:
                V = _normalize(embedding_matrix(batch.column(vec_col)))[order]
                cols["cosine"] = pa.array(
                    np.einsum("ij,ij->i", self.Q[rows_q], V[rows_v]),
                    pa.float64())
            return pa.table(cols)

    df = encoded.map_batches(ADCTopK, batch_format="pyarrow",
                             concurrency=_pool()).to_pandas()
    return _merge_topk(df, k, rerank, id_col)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells + residual PQ codes, materialized per cell
# ---------------------------------------------------------------------------

def ivfpq_build(ds, n_clusters: int | None = None, m: int = 8, ks: int = 256,
                vec_col: str = "embedding", id_col: str = "vec_id",
                train_sample: int = 4096, index_dir: str | None = None,
                keep_vec: bool = False,
                distributed_train: bool | None = None) -> dict:
    """Build the IVF-PQ index: coarse codebook via the shared IVF training
    path (driver sample + optional distributed Lloyd), residual PQ codebooks
    trained on sample residuals, then ONE streaming encode pass writing
    (id, pq_code[, vec]) parquet partitioned by ``ivf_cell``. Probe I/O is
    n_probe/n_clusters of the corpus, scanned compressed."""
    import os
    import shutil

    from .similarity import _fit_codebook

    if index_dir is None:
        import tempfile
        index_dir = tempfile.mkdtemp(prefix="brdrq_ivfpq_", dir="/tmp")
    elif os.path.isdir(index_dir):
        shutil.rmtree(index_dir)

    C = _fit_codebook(ds, n_clusters, vec_col, train_sample,
                      distributed_train)
    sample = np.asarray(
        ds.limit(max(train_sample, 2 * len(C))).to_pandas()[vec_col].tolist(),
        dtype=np.float64)
    Xs = _normalize(sample)
    res = Xs - C[(Xs @ C.T).argmax(axis=1)]
    pq = pq_train(res, m=m, ks=ks, normalize=False)
    cref = ray.put(C)
    pref = ray.put(pq)

    class EncodeCell:
        def __init__(self):
            self.C = ray.get(cref)
            self.pq = ray.get(pref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            V = _normalize(embedding_matrix(batch.column(vec_col)))
            cell = (V @ self.C.T).argmax(axis=1)
            codes = pq_encode_codes(self.pq, V - self.C[cell])
            cols = {id_col: batch.column(id_col),
                    "pq_code": _codes_column(codes),
                    "ivf_cell": pa.array(cell, pa.int32())}
            if keep_vec:
                cols[vec_col] = batch.column(vec_col)
            return pa.table(cols)

    (ds.map_batches(EncodeCell, batch_format="pyarrow", concurrency=_pool())
       .write_parquet(index_dir, partition_cols=["ivf_cell"]))
    np.save(os.path.join(index_dir, "_codebook.npy"), C)
    np.save(os.path.join(index_dir, "_pq_codebooks.npy"), pq["codebooks"])
    with open(os.path.join(index_dir, "_meta.json"), "w") as f:
        json.dump({"keep_vec": bool(keep_vec), "vec_col": vec_col,
                   "id_col": id_col}, f)
    return {"index_dir": index_dir, "codebook": C, "pq": pq,
            "n_clusters": len(C), "keep_vec": keep_vec}


def ivfpq_load(index_dir: str) -> dict:
    import os
    C = np.load(os.path.join(index_dir, "_codebook.npy"))
    books = np.load(os.path.join(index_dir, "_pq_codebooks.npy"))
    m, ks, dsub = books.shape
    pq = {"codebooks": books, "m": m, "ks": ks, "dsub": dsub,
          "dim": m * dsub, "normalize": False}
    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    return {"index_dir": index_dir, "codebook": C, "pq": pq,
            "n_clusters": len(C), "keep_vec": meta["keep_vec"]}


def ivfpq_probe(index: dict, queries: np.ndarray, k: int = 10,
                n_probe: int = 4, rerank: int = 0,
                vec_col: str = "embedding", id_col: str = "vec_id") -> pd.DataFrame:
    """Probe the IVF-PQ index: read ONLY the probed cells' parquet, score
    compressed via ADC (+ the per-cell q . centroid offset that residual
    encoding factors out), partial top-k per batch, driver merge. With
    ``rerank`` and a keep_vec index, the global top-``rerank`` candidates
    re-rank by exact cosine."""
    from .similarity import ivf_cell_files

    if rerank > 0 and not index.get("keep_vec"):
        raise ValueError("rerank requires ivfpq_build(..., keep_vec=True)")
    C = index["codebook"]
    pq = index["pq"]
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    coarse = Q @ C.T                                  # (n_q, n_cells)
    probe = np.argsort(-coarse, axis=1)[:, :n_probe]
    probe_sets = [set(row) for row in probe.tolist()]
    needed = sorted({c for s in probe_sets for c in s})
    files = ivf_cell_files(index["index_dir"], needed)
    cols = {"query_id": [], id_col: [], "adc_score": [], "rank": []}
    if rerank > 0:
        cols["cosine"] = []
    if not files:
        return pd.DataFrame(cols)
    qref = ray.put(Q)
    pref = ray.put(pq)
    coarse_ref = ray.put(coarse)
    cell_queries = {int(c): np.nonzero([(c in s) for s in probe_sets])[0]
                    for c in needed}
    r = max(k, rerank)

    class ProbeADC:
        def __init__(self):
            self.Q = ray.get(qref)
            self.pq = ray.get(pref)
            self.lut = _adc_lut(self.pq, self.Q)
            self.coarse = ray.get(coarse_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cells = batch.column("ivf_cell").cast(pa.int32()) \
                         .to_numpy(zero_copy_only=False)
            codes = _codes_matrix(batch.column("pq_code"), self.pq["m"])
            ids = np.asarray(batch.column(id_col).to_pylist())
            V = None
            if rerank > 0:
                V = _normalize(embedding_matrix(batch.column(vec_col)))
            out = {"query_id": [], "id": [], "adc": [], "cos": []}
            for c in np.unique(cells):
                qs = cell_queries.get(int(c))
                if qs is None or len(qs) == 0:
                    continue
                rows = np.nonzero(cells == c)[0]
                S = _adc_scores(self.lut[qs], codes[rows])
                S += self.coarse[qs][:, int(c)][:, None]
                kk = min(r, S.shape[1])
                top = np.argpartition(-S, kth=kk - 1, axis=1)[:, :kk]
                rq = np.repeat(qs, kk)
                rv = rows[top.ravel()]
                out["query_id"].append(rq)
                out["id"].append(ids[rv])
                out["adc"].append(S[np.repeat(np.arange(len(qs)), kk),
                                    top.ravel()])
                if rerank > 0:
                    out["cos"].append(
                        np.einsum("ij,ij->i", self.Q[rq], V[rv]))
            if not out["query_id"]:
                empty = {"query_id": pa.array([], pa.int64()),
                         id_col: batch.column(id_col).slice(0, 0).combine_chunks(),
                         "adc_score": pa.array([], pa.float64())}
                if rerank > 0:
                    empty["cosine"] = pa.array([], pa.float64())
                return pa.table(empty)
            tbl = {"query_id": pa.array(np.concatenate(out["query_id"]), pa.int64()),
                   id_col: pa.array(np.concatenate(out["id"])),
                   "adc_score": pa.array(np.concatenate(out["adc"]), pa.float64())}
            if rerank > 0:
                tbl["cosine"] = pa.array(np.concatenate(out["cos"]), pa.float64())
            return pa.table(tbl)

    df = (ray.data.read_parquet(files)
          .map_batches(ProbeADC, batch_format="pyarrow", concurrency=_pool())
          .to_pandas())
    return _merge_topk(df, k, rerank, id_col)


def ivfpq_knn(ds, queries: np.ndarray, k: int = 10,
              n_clusters: int | None = None, m: int = 8, ks: int = 256,
              n_probe: int = 4, rerank: int = 0,
              vec_col: str = "embedding", id_col: str = "vec_id",
              train_sample: int = 4096,
              distributed_train: bool | None = None) -> pd.DataFrame:
    """IVF-PQ build + probe in one call (ad-hoc use; production keeps the
    index and probes it repeatedly)."""
    import shutil

    index = ivfpq_build(ds, n_clusters=n_clusters, m=m, ks=ks,
                        vec_col=vec_col, id_col=id_col,
                        train_sample=train_sample, keep_vec=rerank > 0,
                        distributed_train=distributed_train)
    try:
        return ivfpq_probe(index, queries, k=k, n_probe=n_probe,
                           rerank=rerank, vec_col=vec_col, id_col=id_col)
    finally:
        shutil.rmtree(index["index_dir"], ignore_errors=True)


def _pool():
    from .pool import actor_pool
    return actor_pool()

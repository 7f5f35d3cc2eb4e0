"""Distributed BM25 full-text search — the lexical-retrieval counterpart of
the embedding ANN family (similarity.py) over the documents table.

Scale shape (two scans, nothing big ever moves):

1. **Stats pass** — ONE map_batches scan emits tiny partial rows: per-batch
   document count + token-length sum (for N and avgdl) and document
   frequencies for the QUERY TERMS ONLY (the per-batch df table is bounded
   by the query vocabulary, not the corpus vocabulary). The driver folds
   n_batches × |query vocab| rows.
2. **Score pass** — the idf table + avgdl are broadcast (ray.put once, read
   per actor); each batch computes tf for query terms, scores every doc it
   holds (a document lives wholly inside one batch, so per-doc scores are
   exact and partition-independent), and emits a per-batch partial top-k.
   The driver merges n_batches × k rows per query.

Tokenization is all Arrow C++ (utf8_lower + split_pattern_regex on
non-alphanumeric runs) — no per-row Python touches text. The tf/df folds run
on the flattened token table with pandas groupby (C path).

Scoring is Okapi BM25 with the Lucene idf variant
ln(1 + (N - df + 0.5)/(df + 0.5)) — non-negative for terms present in every
document."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .pool import actor_pool

_TOKEN_SPLIT = "[^a-z0-9]+"


def _flat_tokens(texts: pa.ChunkedArray | pa.Array):
    """(tokens, doc_idx, dl): lowercase alnum tokens flattened across the
    batch, the owning row of each token, and per-row token counts — one
    Arrow C++ pass, empties dropped."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(pc.fill_null(texts, ""))
    lists = pc.split_pattern_regex(low, _TOKEN_SPLIT)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy()
    flat = lists.values
    keep = pc.not_equal(flat, "")
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64),
                        np.diff(offsets))
    keep_np = keep.to_numpy(zero_copy_only=False)
    tokens = flat.filter(keep)
    doc_idx = doc_idx[keep_np]
    dl = np.bincount(doc_idx, minlength=len(texts)).astype(np.int64)
    return tokens, doc_idx, dl


def tokenize_query(text: str) -> list[str]:
    """The corpus tokenizer applied to one query string (order-preserving,
    duplicates kept — BM25 treats repeated query terms additively)."""
    toks, _, _ = _flat_tokens(pa.array([text]))
    return toks.to_pylist()


def bm25_search(ds: ray.data.Dataset, queries: dict[str, str], k: int = 10,
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """Exact BM25 top-k of each query against the whole corpus.

    queries: {query_id: query text}. Returns (query_id, doc_id, score,
    rank); rank ties break by doc_id ascending after a 1e-9 score round
    (the knn_brute_force determinism contract). Documents with score 0
    (no query term present) are never emitted."""
    q_terms = {qid: tokenize_query(t) for qid, t in queries.items()}
    vocab = sorted({t for ts in q_terms.values() for t in ts})
    if not vocab:
        return pd.DataFrame(columns=["query_id", "doc_id", "score", "rank"])
    vocab_arr = pa.array(vocab, pa.string())

    # ---- pass 1: corpus stats (N, avgdl, df per query term) ----------------
    def partial_stats(batch: pa.Table) -> pa.Table:
        tokens, doc_idx, dl = _flat_tokens(batch.column(text_col))
        m = pc.is_in(tokens, value_set=vocab_arr).to_numpy(
            zero_copy_only=False)
        hit = pd.DataFrame({
            "term": tokens.to_numpy(zero_copy_only=False)[m],
            "doc": doc_idx[m]}).drop_duplicates()
        df_counts = hit.groupby("term").size()
        terms = df_counts.index.tolist() + [None]
        dfs = df_counts.to_numpy().tolist() + [0]
        n = [0] * len(df_counts) + [batch.num_rows]
        dls = [0] * len(df_counts) + [int(dl.sum())]
        return pa.table({"term": pa.array(terms, pa.string()),
                         "df": pa.array(dfs, pa.int64()),
                         "n_docs": pa.array(n, pa.int64()),
                         "sum_dl": pa.array(dls, pa.int64())})

    stats = ds.map_batches(partial_stats,
                           batch_format="pyarrow").to_pandas()
    n_docs = int(stats["n_docs"].sum())
    if n_docs == 0:
        return pd.DataFrame(columns=["query_id", "doc_id", "score", "rank"])
    avgdl = float(stats["sum_dl"].sum()) / max(n_docs, 1)
    df_map = stats.dropna(subset=["term"]).groupby("term")["df"].sum()
    idf = {t: float(np.log(1.0 + (n_docs - int(df_map.get(t, 0)) + 0.5)
                           / (int(df_map.get(t, 0)) + 0.5)))
           for t in vocab}

    model_ref = ray.put((q_terms, idf, avgdl))

    # ---- pass 2: score + per-batch partial top-k ---------------------------
    class Bm25Score:
        def __init__(self):
            self.q_terms, self.idf, self.avgdl = ray.get(model_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            tokens, doc_idx, dl = _flat_tokens(batch.column(text_col))
            m = pc.is_in(tokens, value_set=vocab_arr).to_numpy(
                zero_copy_only=False)
            tf = (pd.DataFrame({
                "term": tokens.to_numpy(zero_copy_only=False)[m],
                "doc": doc_idx[m]})
                .groupby(["doc", "term"]).size().rename("tf").reset_index())
            # ids keep their INPUT type (int64 corpora stay int64 — the
            # driver merge's doc_id tie-break then orders natively)
            ids = batch.column(id_col).to_pandas()
            out_q, out_d, out_s = [], [], []
            if len(tf):
                norm = k1 * (1.0 - b + b * dl / self.avgdl)  # per doc row
                tf["idf"] = tf["term"].map(self.idf)
                tf["den"] = tf["tf"] + norm[tf["doc"].to_numpy()]
                for qid in sorted(self.q_terms):
                    terms = self.q_terms[qid]
                    if not terms:
                        continue
                    # repeated query terms score additively: weight by count
                    w = pd.Series(terms).value_counts()
                    sub = tf[tf["term"].isin(w.index)]
                    if not len(sub):
                        continue
                    contrib = (sub["idf"] * (k1 + 1.0) * sub["tf"]
                               / sub["den"]
                               * sub["term"].map(w).to_numpy())
                    scores = contrib.groupby(sub["doc"]).sum()
                    scores = scores[scores > 0]
                    # partial top-k follows the SAME (score desc, id asc)
                    # total order as the driver merge, so tie boundaries cut
                    # identically under any partitioning
                    top = pd.DataFrame({
                        "doc_id": ids.iloc[scores.index.to_numpy()].to_numpy(),
                        "score": scores.to_numpy().round(9)})
                    top = top.sort_values(["score", "doc_id"],
                                          ascending=[False, True]).head(k)
                    out_q.extend([qid] * len(top))
                    out_d.extend(top["doc_id"].tolist())
                    out_s.extend(top["score"].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.string()),
                             "doc_id": pa.array(out_d,
                                                batch.column(id_col).type),
                             "score": pa.array(out_s, pa.float64())})

    part = ds.map_batches(Bm25Score, batch_format="pyarrow",
                          concurrency=actor_pool()).to_pandas()
    if not len(part):
        return pd.DataFrame(columns=["query_id", "doc_id", "score", "rank"])
    part["score"] = part["score"].round(9)
    part = part.sort_values(["query_id", "score", "doc_id"],
                            ascending=[True, False, True])
    part = part.groupby("query_id", group_keys=False).head(k)
    part["rank"] = part.groupby("query_id").cumcount() + 1
    return part.reset_index(drop=True)

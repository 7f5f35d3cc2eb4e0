"""BM25 search (functions/search.py) vs a pure-Python reference scorer,
plus determinism/partition-invariance and the retrieval sanity contract."""

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _bm25_reference(docs, queries, k1=1.2, b=0.75):
    """Naive in-memory BM25 with the same Lucene idf variant."""
    toks = {d: _tok(t) for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid, qtext in queries.items():
        qterms = _tok(qtext)
        scores = {}
        for d, ts in toks.items():
            s = 0.0
            for t in qterms:
                df = sum(1 for v in toks.values() if t in v)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                tf = ts.count(t)
                if tf:
                    s += idf * (k1 + 1.0) * tf / (tf + k1 * (1 - b + b * len(ts) / avgdl))
            if s > 0:
                scores[d] = s
        out[qid] = scores
    return out


@pytest.fixture(scope="module")
def corpus():
    docs = {
        "d01": "the quick brown fox jumps over the lazy dog",
        "d02": "a fast auburn fox leaped across a sleepy canine",
        "d03": "stock markets rallied as tech shares surged today",
        "d04": "the fox population in urban areas keeps growing, fox dens everywhere",
        "d05": "cooking pasta requires salted boiling water and patience",
        "d06": "quantum computing uses qubits instead of classical bits",
        "d07": "the dog chased the fox around the quiet farm yard",
        "d08": "bond yields fell while markets digested inflation data",
        "d09": "a recipe for dog biscuits: flour, eggs and peanut butter",
        "d10": "foxes, wolves and dogs all belong to the canid family",
    }
    t = pa.table({"doc_id": pa.array(list(docs)),
                  "text": pa.array(list(docs.values()))})
    return docs, t


def test_bm25_matches_reference_scorer(ray_session, corpus):
    import ray.data
    from brdrq_ray.functions.search import bm25_search

    docs, t = corpus
    queries = {"q_fox": "fox dog", "q_fin": "markets inflation",
               "q_multi": "fox fox"}
    got = bm25_search(ray.data.from_arrow(t), queries, k=10)
    want = _bm25_reference(docs, queries)
    for qid, scores in want.items():
        sub = got[got["query_id"] == qid].set_index("doc_id")["score"]
        assert set(sub.index) == set(scores)
        for d, s in scores.items():
            assert sub[d] == pytest.approx(s, abs=1e-9)
        # ranks follow (score desc, doc_id asc)
        ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
        assert list(got[got["query_id"] == qid]
                    .sort_values("rank")["doc_id"]) == [d for d, _ in ranked]
    # repeated query term scores additively: q_multi == 2x the fox-only part
    fox_only = _bm25_reference(docs, {"q": "fox"})["q"]
    multi = got[got["query_id"] == "q_multi"].set_index("doc_id")["score"]
    for d, s in fox_only.items():
        assert multi[d] == pytest.approx(2 * s, abs=1e-9)


def test_bm25_partition_invariance_and_topk(ray_session, corpus):
    import ray.data
    from brdrq_ray.functions.search import bm25_search

    _, t = corpus
    queries = {"q": "the fox and the dog"}
    a = bm25_search(ray.data.from_arrow(t), queries, k=3)
    b = bm25_search(ray.data.from_arrow(t).repartition(5), queries, k=3)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 3
    assert list(a["rank"]) == [1, 2, 3]
    assert (np.diff(a["score"].to_numpy()) <= 0).all()


def test_bm25_edge_cases(ray_session, corpus):
    import ray.data
    from brdrq_ray.functions.search import bm25_search

    _, t = corpus
    ds = ray.data.from_arrow(t)
    # absent term -> no rows for that query; zero-hit docs never emitted
    got = bm25_search(ds, {"q1": "zzzqx", "q2": "fox"}, k=10)
    assert (got["query_id"] == "q1").sum() == 0
    assert (got["query_id"] == "q2").sum() > 0
    # empty / punctuation-only queries -> empty frame
    got = bm25_search(ds, {"q": "!!! ???"}, k=5)
    assert len(got) == 0
    # term present in EVERY doc keeps a non-negative idf (Lucene variant)
    got = bm25_search(ds, {"q": "the"}, k=20)
    assert (got["score"] > 0).all()


def test_bm25_on_sf_documents(ray_session):
    """Smoke over the driver's documents table: retrieval returns k ranked
    rows and the top hit actually contains a query term."""
    import ray.data
    from brdrq_ray.functions.search import bm25_search
    from tests.conftest import SF_DIR

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id", "text"])
    first = ds.take(1)[0]
    term = next(t for t in re.split(r"[^a-zA-Z0-9]+", first["text"])
                if len(t) >= 4).lower()
    got = bm25_search(ds, {"q": term}, k=5)
    assert 1 <= len(got) <= 5
    # the corpus id type (int64 here) is preserved end to end
    assert pd.api.types.is_integer_dtype(got["doc_id"])
    top = got.iloc[0]["doc_id"]
    text = [r["text"] for r in ds.take_all() if r["doc_id"] == top][0]
    assert term in text.lower()

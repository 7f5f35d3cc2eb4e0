"""Cluster-aware sampling (D4 family) and the exact vocabulary builder."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from brdrq_ray.functions.similarity import (
    cluster_sample,
    cluster_sample_ids,
    kmeans_fit,
)
from brdrq_ray.functions.text import build_vocab, vocab_counts


def _norm(M):
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def _vectors(n=90, dim=12, seed=5):
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n, dim))
    ids = [f"v{i:03d}" for i in range(n)]
    return ids, V


def _brute_force_sample(ids, V, C, k, mode):
    Vn = _norm(np.asarray(V, dtype=np.float64))
    sim = Vn @ np.asarray(C).T
    cell = sim.argmax(axis=1)
    csim = np.round(sim[np.arange(len(cell)), cell], 9)
    kept = set()
    for c in np.unique(cell):
        members = [i for i in range(len(ids)) if cell[i] == c]
        members.sort(key=lambda i: (csim[i] if mode == "far" else -csim[i],
                                    ids[i]))
        kept.update(ids[i] for i in members[:k])
    return kept


def test_cluster_sample_matches_brute_force(ray_session):
    ids, V = _vectors()
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array([list(map(float, r)) for r in V])})
    C = kmeans_fit(V, 4)
    for mode in ("far", "near"):
        got = cluster_sample_ids(
            ray.data.from_arrow(tbl).repartition(7), 5, mode=mode,
            n_clusters=4, train_sample=len(ids), distributed_train=False)
        want = _brute_force_sample(ids, V, C, 5, mode)
        assert set(got.to_pandas()["vec_id"]) == want, mode
    with pytest.raises(ValueError):
        cluster_sample_ids(ray.data.from_arrow(tbl), 5, mode="bogus",
                           n_clusters=4)


def test_cluster_sample_filter_form(ray_session):
    ids, V = _vectors(n=40)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array([list(map(float, r)) for r in V]),
                    "payload": pa.array(range(len(ids)))})
    out = cluster_sample(ray.data.from_arrow(tbl), 3, mode="near",
                         n_clusters=3, train_sample=len(ids),
                         distributed_train=False).to_pandas()
    assert 0 < len(out) <= 3 * 3
    assert {"vec_id", "embedding", "payload"} <= set(out.columns)


DOCS = ["the cat sat on the mat",
        "the dog SAT on the log",
        "a cat and a dog",
        ""]


def test_vocab_counts_exact(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": pa.array(DOCS)})).repartition(3)
    got = dict(zip(*[vocab_counts(ds).to_pandas()[c] for c in ("word", "cnt")]))
    want = {}
    for d in DOCS:
        for w in d.lower().split():
            want[w] = want.get(w, 0) + 1
    assert got == want


def test_build_vocab_topk_and_ties(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": pa.array(DOCS)})).repartition(2)
    top = build_vocab(ds, size=3).to_pandas()
    # 'the' x4, then a/cat/dog/on/sat x2 tie -> alphabetical: a, cat
    assert top["word"].tolist() == ["the", "a", "cat"]
    assert top["cnt"].tolist() == [4, 2, 2]
    assert top["rank"].tolist() == [1, 2, 3]
    # min_count prunes the tail
    mc = vocab_counts(ds, min_count=2).to_pandas()
    assert (mc["cnt"] >= 2).all()

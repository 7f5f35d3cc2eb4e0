"""Dataset-to-dataset ANN join (similarity.knn_join): probe-all equals brute
force; recall bound below; invariance to partitioning."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from brdrq_ray.functions.similarity import knn_brute_force, knn_join


def _clustered(n=300, dim=32, n_centers=12, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, dim))
    X = centers[rng.integers(0, n_centers, size=n)] \
        + 0.1 * rng.normal(size=(n, dim))
    return X


def _ds(X, ids=None, id_col="vec_id"):
    ids = ids if ids is not None else [f"v{i:04d}" for i in range(len(X))]
    return ray.data.from_arrow(pa.table({
        id_col: pa.array(ids),
        "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32())),
    }))


def test_probe_all_matches_brute_force(ray_session):
    X = _clustered()
    corpus = _ds(X)
    Q = X[:7]
    queries = _ds(Q, ids=[f"q{i}" for i in range(len(Q))], id_col="qid")
    got = knn_join(queries, corpus, k=5, n_clusters=6, n_probe=6,
                   query_id_col="qid").to_pandas()
    exact = knn_brute_force(corpus, Q, k=5)
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    for qi in range(len(Q)):
        a = got[got.query_id == f"q{qi}"]
        b = exact[exact.query_id == qi]
        assert list(a.vec_id) == [str(v) for v in b.vec_id]
        assert np.allclose(a.cosine, b.cosine, atol=1e-8)
        assert list(a["rank"]) == list(b["rank"])


def test_partition_invariance(ray_session):
    X = _clustered(n=200, seed=9)
    Q = X[:5]
    kw = dict(k=4, n_clusters=5, n_probe=2, query_id_col="qid")
    a = knn_join(_ds(Q, [f"q{i}" for i in range(5)], "qid"), _ds(X),
                 **kw).to_pandas()
    b = knn_join(_ds(Q, [f"q{i}" for i in range(5)], "qid").repartition(3),
                 _ds(X).repartition(7), **kw).to_pandas()
    key = ["query_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_partial_probe_recall(ray_session):
    X = _clustered(n=400, seed=11)
    corpus = _ds(X)
    Q = X[:10]
    queries = _ds(Q, [f"q{i}" for i in range(10)], "qid")
    exact = knn_brute_force(corpus, Q, k=5)
    got = knn_join(queries, corpus, k=5, n_clusters=8, n_probe=3,
                   query_id_col="qid").to_pandas()
    hits = 0
    for qi in range(10):
        a = set(got[got.query_id == f"q{qi}"].vec_id)
        b = {str(v) for v in exact[exact.query_id == qi].vec_id}
        hits += len(a & b)
    assert hits / 50 >= 0.8          # clustered data: probes cover the mass
    # every query got exactly k rows
    assert (got.groupby("query_id").size() == 5).all()

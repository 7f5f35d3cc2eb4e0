"""Semantic (SemDeDup-style) embedding dedup — brute-force oracle tests.

The oracle reimplements the published rule directly in numpy (normalize,
order by centroid-cosine ascending with id tie-break, drop a member iff its
max cosine to ANY earlier member exceeds the threshold) and the tests pin
the distributed operator to it, plus partitioning invariance and the
semi-join filter form.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from brdrq_ray.functions.similarity import (
    _prune_cluster,
    kmeans_fit,
    semantic_dedup,
    semantic_dedup_keep_ids,
)


def _norm(M):
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def _brute_force_keep(ids, V, centroid, threshold):
    """The SemDeDup rule, O(n^2) loops — the oracle."""
    Vn = _norm(np.asarray(V, dtype=np.float64))
    c = np.asarray(centroid, dtype=np.float64)
    c = c / np.linalg.norm(c)
    csim = np.round(Vn @ c, 9)
    order = sorted(range(len(ids)), key=lambda i: (csim[i], ids[i]))
    keep = set()
    for rank, i in enumerate(order):
        earlier = order[:rank]
        if all(float(Vn[i] @ Vn[j]) <= threshold for j in earlier):
            keep.add(ids[i])
        # note: max over ALL earlier members, kept or not — so a member
        # similar only to an already-dropped one is still dropped
    return keep


def _fixture_vectors(n=80, dim=16, seed=3, dup_pairs=8):
    """Deterministic cloud with planted near-duplicate pairs."""
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n, dim))
    for p in range(dup_pairs):
        a, b = 2 * p, 2 * p + 1
        V[b] = V[a] + rng.standard_normal(dim) * 1e-3   # cosine ~ 1
    ids = [f"d{i:03d}" for i in range(n)]
    return ids, V


def test_prune_cluster_matches_brute_force():
    ids, V = _fixture_vectors()
    centroid = _norm(V).mean(axis=0)
    for thr in (0.9, 0.7, 0.3):
        keep_mask = _prune_cluster(np.asarray(ids, dtype=object), V,
                                   centroid, thr, block=7)
        got = {ids[i] for i in np.nonzero(keep_mask)[0]}
        want = _brute_force_keep(ids, V, centroid, thr)
        assert got == want, f"threshold {thr}"
    # block size must not change the result
    full = _prune_cluster(np.asarray(ids, dtype=object), V, centroid, 0.7,
                          block=4096)
    small = _prune_cluster(np.asarray(ids, dtype=object), V, centroid, 0.7,
                           block=3)
    assert np.array_equal(full, small)


def test_semantic_dedup_single_cluster_equals_oracle(ray_session):
    ids, V = _fixture_vectors()
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in V]),
    }))
    kept = semantic_dedup_keep_ids(ds, threshold=0.9, n_clusters=1,
                                   train_sample=len(ids),
                                   distributed_train=False)
    got = set(kept.to_pandas()["vec_id"])
    # with n_clusters=1 and a full-coverage sample, the codebook is the
    # converged Lloyd centroid of the whole (normalized) cloud
    C = kmeans_fit(V, 1)
    want = _brute_force_keep(ids, V, C[0], 0.9)
    assert got == want
    # planted near-dup pairs: at most one survivor each
    for p in range(8):
        assert not {f"d{2*p:03d}", f"d{2*p+1:03d}"} <= got


def test_semantic_dedup_partitioning_invariant(ray_session):
    ids, V = _fixture_vectors(n=120, seed=9)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array([list(map(float, r)) for r in V])})
    kw = dict(threshold=0.85, n_clusters=4, train_sample=len(ids),
              distributed_train=False)
    one = semantic_dedup_keep_ids(ray.data.from_arrow(tbl), **kw)
    many = semantic_dedup_keep_ids(
        ray.data.from_arrow(tbl).repartition(13), **kw)
    assert set(one.to_pandas()["vec_id"]) == set(many.to_pandas()["vec_id"])


def test_semantic_dedup_filter_form(ray_session):
    ids, V = _fixture_vectors()
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in V]),
        "payload": pa.array(list(range(len(ids)))),
    }))
    out = semantic_dedup(ds, threshold=0.9, n_clusters=1,
                         train_sample=len(ids), distributed_train=False)
    df = out.to_pandas()
    kept = semantic_dedup_keep_ids(ds, threshold=0.9, n_clusters=1,
                                   train_sample=len(ids),
                                   distributed_train=False)
    assert set(df["vec_id"]) == set(kept.to_pandas()["vec_id"])
    # original columns survive the semi-join
    assert {"vec_id", "embedding", "payload"} <= set(df.columns)
    assert len(df) < len(ids)


def test_semantic_dedup_distributed_train_path(ray_session):
    # distributed Lloyd refinement must agree with itself across
    # partitionings (stats are order-independent sums)
    ids, V = _fixture_vectors(n=100, seed=17)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array([list(map(float, r)) for r in V])})
    kw = dict(threshold=0.8, n_clusters=3, train_sample=len(ids),
              distributed_train=True)
    a = semantic_dedup_keep_ids(ray.data.from_arrow(tbl), **kw)
    b = semantic_dedup_keep_ids(ray.data.from_arrow(tbl).repartition(7), **kw)
    assert set(a.to_pandas()["vec_id"]) == set(b.to_pandas()["vec_id"])


def test_resolve_n_clusters_target_size_policy():
    from brdrq_ray.functions.similarity import resolve_n_clusters

    # explicit n_clusters always wins
    assert resolve_n_clusters(8, 10 ** 6, target_cluster_size=100) == 8
    # ceil(n / target), clamped
    assert resolve_n_clusters(None, 10 ** 6, target_cluster_size=1000) == 1000
    assert resolve_n_clusters(None, 1001, target_cluster_size=1000) == 4
    assert resolve_n_clusters(None, 10 ** 9, target_cluster_size=1000) == 65536
    # unset target falls back to the sqrt rule
    assert resolve_n_clusters(None, 10 ** 6) == 1000


def test_semantic_dedup_target_size_recall(ray_session):
    """The constant-cluster-size policy removes every planted near-dup pair
    member exactly like the sqrt policy does (recall unchanged) — the
    members of a planted pair are near-identical vectors, so they land in
    the same cluster under ANY codebook."""
    import ray.data

    ids, V = _fixture_vectors(n=400, dim=16, seed=11, dup_pairs=30)
    dup_ids = [(ids[2 * p], ids[2 * p + 1]) for p in range(30)]
    tab = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array(V.tolist(),
                                          pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(tab)

    def survivors(**kw):
        out = semantic_dedup_keep_ids(ds, threshold=0.95,
                                      distributed_train=False, **kw).to_pandas()
        return set(out["vec_id"])

    sq = survivors()                       # sqrt policy (k=20)
    tg = survivors(target_cluster_size=50)  # k=8 constant-size policy
    for a, b in dup_ids:
        assert len({a, b} & sq) <= 1
        assert len({a, b} & tg) <= 1
    # recall on planted pairs identical between the two policies
    removed_sq = {x for a, b in dup_ids for x in (a, b)} - sq
    removed_tg = {x for a, b in dup_ids for x in (a, b)} - tg
    assert len(removed_sq) == len(removed_tg) == len(dup_ids)

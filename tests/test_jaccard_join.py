"""Exact prefix-filtered n-gram Jaccard similarity join
(functions/dedup.py::jaccard_similarity_join): recall-1.0 all-pairs vs a
brute-force oracle, leg equality (broadcast-df / distributed-df /
hash-order), partition invariance, string ids, MinHash-subset property."""

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.functions.dedup import jaccard_similarity_join, ngram_jaccard


def _corpus(n=60, seed=3):
    """Word-pool docs with heavy overlap so true near-dup pairs exist at
    several thresholds, plus exact copies, short docs, and empty docs."""
    rng = np.random.default_rng(seed)
    pool = [f"w{i}" for i in range(40)]
    texts, ids = [], []
    for i in range(n):
        base = rng.choice(pool, size=rng.integers(6, 18), replace=True)
        texts.append(" ".join(base))
        ids.append(i)
    # exact copies (jaccard 1.0)
    texts += [texts[0], texts[1]]
    ids += [n, n + 1]
    # one-word edits of doc 2 (high but < 1.0 jaccard)
    w = texts[2].split()
    w[len(w) // 2] = "EDIT"
    texts.append(" ".join(w))
    ids.append(n + 2)
    # short docs (shingle fallback: one gram over the joined words)
    texts += ["tiny doc", "tiny doc", "other short"]
    ids += [n + 3, n + 4, n + 5]
    # empty docs: excluded by contract (no grams -> no prefix)
    texts += ["", "   "]
    ids += [n + 6, n + 7]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _brute_force(tbl, t, k=3):
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            # empty gram sets are excluded by the join's contract
            if not texts[i].split() or not texts[j].split():
                continue
            jac = ngram_jaccard(texts[i], texts[j], k)
            if jac >= t:
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = jac
    return out


def _got(ds_pairs):
    df = ds_pairs.to_pandas()
    return {(a, b): j for a, b, j in zip(df["id_a"], df["id_b"],
                                         df["jaccard"])}


def test_exact_join_vs_brute_force(ray_session):
    import ray.data

    tbl = _corpus()
    for t in (0.5, 0.8):
        want = _brute_force(tbl, t)
        got = _got(jaccard_similarity_join(ray.data.from_arrow(tbl),
                                           threshold=t))
        assert set(got) == set(want), (t, set(want) ^ set(got))
        for pair, jac in want.items():
            assert got[pair] == pytest.approx(jac, rel=1e-12)
        assert want, "fixture must actually produce pairs"


def test_leg_equality_and_partition_invariance(ray_session):
    import ray.data

    tbl = _corpus(n=40, seed=9)
    t = 0.6
    base = _got(jaccard_similarity_join(ray.data.from_arrow(tbl),
                                        threshold=t))
    # hash-order leg: exact under any fixed gram order
    hash_leg = _got(jaccard_similarity_join(
        ray.data.from_arrow(tbl), threshold=t, order_by_frequency=False))
    assert hash_leg == base
    # distributed-df leg: broadcast_df_limit=0 forces lookup join + bucketed
    # prefix ranking
    dist = _got(jaccard_similarity_join(
        ray.data.from_arrow(tbl), threshold=t, broadcast_df_limit=0))
    assert dist == base
    # partition invariance
    repart = _got(jaccard_similarity_join(
        ray.data.from_arrow(tbl).repartition(7), threshold=t))
    assert repart == base
    assert base == _brute_force(tbl, t)


def test_superset_of_minhash(ray_session):
    """MinHash verified pairs are a SUBSET of the exact join (same verify,
    probabilistic candidates vs exhaustive candidates)."""
    import ray.data

    from brdrq_ray.functions.dedup import minhash_lsh_pairs

    tbl = _corpus(n=30, seed=5)
    t = 0.5
    exact = set(_got(jaccard_similarity_join(ray.data.from_arrow(tbl),
                                             threshold=t)))
    mh = set(_got(minhash_lsh_pairs(ray.data.from_arrow(tbl),
                                    jaccard_threshold=t)))
    # the ONE contracted divergence: minhash pairs the two EMPTY docs (the
    # verifier's both-empty jaccard=1 convention); the exact join excludes
    # empty gram sets by contract
    empty_ids = {36, 37}
    assert {p for p in mh if not set(p) <= empty_ids} <= exact
    assert {p for p in mh if set(p) <= empty_ids} == {(36, 37)}
    assert exact == set(_brute_force(tbl, t))


def test_string_ids(ray_session):
    import ray.data

    tbl = _corpus(n=20, seed=11)
    sids = pa.array([f"doc-{i:04d}" for i in
                     tbl.column("doc_id").to_pylist()], pa.string())
    tbl = tbl.set_column(0, "doc_id", sids)
    t = 0.5
    got = _got(jaccard_similarity_join(ray.data.from_arrow(tbl),
                                       threshold=t))
    assert got == _brute_force(tbl, t)
    assert all(a < b for a, b in got)


def test_empty_and_no_pair_corpora(ray_session):
    import ray.data

    empty = (ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())})).filter(lambda r: False))
    assert jaccard_similarity_join(empty).count() == 0

    # all-empty texts: excluded by contract -> no pairs (NOT all-pairs)
    blank = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "  ", ""], pa.string())}))
    assert jaccard_similarity_join(blank, threshold=0.5).count() == 0

    # disjoint docs: no pairs
    disj = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta",
                          "epsilon zeta eta theta"], pa.string())}))
    assert jaccard_similarity_join(disj, threshold=0.3).count() == 0

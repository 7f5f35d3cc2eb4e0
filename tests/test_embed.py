"""Hashed n-gram count-sketch embeddings (functions/embed) and their
integration with the semantic-dedup family."""
import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.functions.embed import embed_documents, hashed_embedding_batch


def _tbl(texts, ids=None):
    ids = ids or [f"d{i:03d}" for i in range(len(texts))]
    return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})


def _cos(a, b):
    return float(np.dot(a, b))


def test_deterministic_and_batch_invariant():
    texts = [f"the quick brown fox {i} jumps over the lazy dog" for i in range(8)]
    full = hashed_embedding_batch(_tbl(texts))
    E_full = np.asarray(full.column("embedding").to_pylist())
    # split into two batches -> identical rows (pure function of the text)
    a = hashed_embedding_batch(_tbl(texts[:3]))
    b = hashed_embedding_batch(_tbl(texts[3:], ids=[f"x{i}" for i in range(5)]))
    E_split = np.vstack([np.asarray(a.column("embedding").to_pylist()),
                         np.asarray(b.column("embedding").to_pylist())])
    np.testing.assert_array_equal(E_full, E_split)
    # rows are unit-norm float32
    assert full.column("embedding").type == pa.list_(pa.float32())
    np.testing.assert_allclose(np.linalg.norm(E_full, axis=1), 1.0, rtol=1e-5)


def test_near_dup_scores_high_unrelated_low():
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(400)]
    base = " ".join(rng.choice(words, size=60))
    edited = base.rsplit(" ", 3)[0] + " zz yy xx"     # ~5% word edit
    other = " ".join(rng.choice(words, size=60))
    E = np.asarray(hashed_embedding_batch(
        _tbl([base, edited, other]), dim=256).column("embedding").to_pylist())
    assert _cos(E[0], E[1]) > 0.8
    assert abs(_cos(E[0], E[2])) < 0.4
    assert _cos(E[0], E[1]) > _cos(E[0], E[2]) + 0.4


def test_empty_doc_zero_vector_and_seed_changes():
    t = _tbl(["", "hello world hello"])
    E0 = np.asarray(hashed_embedding_batch(t, seed=0).column("embedding").to_pylist())
    assert np.all(E0[0] == 0.0)
    E1 = np.asarray(hashed_embedding_batch(t, seed=1).column("embedding").to_pylist())
    assert not np.array_equal(E0[1], E1[1])
    # same seed reproduces exactly
    E0b = np.asarray(hashed_embedding_batch(t, seed=0).column("embedding").to_pylist())
    np.testing.assert_array_equal(E0, E0b)


def test_embed_then_semantic_dedup(ray_session):
    import ray.data

    from brdrq_ray.functions.similarity import semantic_dedup_keep_ids

    rng = np.random.default_rng(7)
    words = [f"tok{i}" for i in range(500)]
    texts, ids = [], []
    for i in range(30):
        t = " ".join(rng.choice(words, size=50))
        texts += [t, t + " tail"]                     # planted near-dup pair
        ids += [f"a{i:03d}", f"b{i:03d}"]
    ds = ray.data.from_arrow(_tbl(texts, ids))
    emb = embed_documents(ds, dim=256).drop_columns(["text"])
    kept = set(semantic_dedup_keep_ids(
        emb, threshold=0.8, id_col="doc_id", n_clusters=4,
        train_sample=256).to_pandas().doc_id)
    # exactly one of each planted pair survives
    assert len(kept) == 30
    for i in range(30):
        assert (f"a{i:03d}" in kept) != (f"b{i:03d}" in kept)


def test_curation_embed_dim_path(ray_session):
    import ray.data

    from brdrq_ray.pipelines.curation import CurationConfig, curate_documents as curate

    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(500)]
    texts, ids = [], []
    for i in range(20):
        t = " ".join(rng.choice(words, size=50))
        texts += [t, t + " tail"]
        ids += [f"a{i:03d}", f"b{i:03d}"]
    ds = ray.data.from_arrow(_tbl(texts, ids))
    cfg = CurationConfig(quality_min=0.0, near_dup=False,
                         semantic_threshold=0.8, embed_dim=256,
                         semantic_kwargs=dict(n_clusters=4, train_sample=256))
    out = curate(ds, cfg).to_pandas()
    assert len(out) == 20
    kept = set(out.doc_id)
    for i in range(20):
        assert (f"a{i:03d}" in kept) != (f"b{i:03d}" in kept)

    with pytest.raises(ValueError):
        curate(ds, CurationConfig(semantic_threshold=0.8))
    with pytest.raises(ValueError):
        curate(ds, CurationConfig(semantic_threshold=0.8, embed_dim=64,
                                  embeddings=ds))

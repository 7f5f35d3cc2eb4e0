"""End-to-end curation pipeline (pipelines/curation.py)."""

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.pipelines.curation import (
    CurationConfig, curate_and_pack, curate_documents)

GOOD = ("the quick brown fox jumps over the lazy dog while the rain keeps "
        "falling on the quiet town and the people walk slowly home through "
        "the evening light carrying baskets of bread and fruit")

OTHER = ("a narrow boat drifts along the green river past tall reeds and "
         "old stone bridges where children wave at the sailors and gulls "
         "circle above the market square looking for scraps of fish")


def _corpus() -> pa.Table:
    texts, ids = [], []
    # 5 exact copies -> 1 survivor (min id 0)
    for i in range(5):
        ids.append(i)
        texts.append(GOOD)
    # near-dup pair (one word changed, distinct base text so it does not
    # also near-match GOOD) -> 1 survivor (min id 10)
    ids += [10, 11]
    texts += [OTHER.replace("bridges", "arches"),
              OTHER.replace("bridges", "spans")]
    # unique good docs
    for i in range(20, 26):
        ids.append(i)
        texts.append(GOOD.replace("fox", f"fox{i}").replace("town", f"town{i}")
                     + f" unique marker {i} " + " ".join(
                         f"w{i}x{j}" for j in range(10)))
    # junk: too short -> below the quality floor
    ids += [90, 91]
    texts += ["x", "!!"]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


@pytest.fixture(scope="module")
def curated(ray_session):
    import ray.data

    cfg = CurationConfig(quality_min=0.40, near_dup=True,
                         jaccard_threshold=0.7)
    out = curate_documents(ray.data.from_arrow(_corpus()), cfg).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_exact_dup_collapsed(curated):
    assert (curated["doc_id"].isin(range(5))).sum() == 1
    assert 0 in set(curated["doc_id"])  # min-id winner


def test_near_dup_collapsed(curated):
    assert (curated["doc_id"].isin([10, 11])).sum() == 1
    assert 10 in set(curated["doc_id"])  # min-id representative


def test_quality_junk_dropped(curated):
    assert not curated["doc_id"].isin([90, 91]).any()


def test_unique_docs_survive_with_annotations(curated):
    uniq = curated[curated["doc_id"].between(20, 25)]
    assert len(uniq) == 6
    for col in ("quality_score", "lang_pred", "ws_tokens", "n_words"):
        assert col in curated.columns


def test_deterministic_rerun(ray_session, curated):
    import ray.data

    cfg = CurationConfig(quality_min=0.40, near_dup=True,
                         jaccard_threshold=0.7)
    again = (curate_documents(ray.data.from_arrow(_corpus()), cfg)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(again["doc_id"]) == list(curated["doc_id"])


def test_sample_leg_is_hash_predicate(ray_session, curated):
    import ray.data
    from brdrq_ray.functions.sampling import fraction_threshold, hash60

    cfg = CurationConfig(quality_min=0.40, near_dup=True,
                         sample_fraction=0.5, seed="s")
    out = curate_documents(ray.data.from_arrow(_corpus()), cfg).to_pandas()
    full = set(curated["doc_id"])
    expect = {i for i in full
              if hash60([i], "s")[0] < fraction_threshold(0.5)}
    assert set(out["doc_id"]) == expect


def test_curate_and_pack_accounts_every_survivor(ray_session, curated):
    import ray.data

    cfg = CurationConfig(quality_min=0.40, near_dup=True)
    cur, packed = curate_and_pack(ray.data.from_arrow(_corpus()), cfg,
                                  token_budget=64)
    pk = packed.to_pandas()
    assert sorted(pk["doc_id"]) == sorted(curated["doc_id"])
    # packing respects the budget for multi-doc sequences
    tot = pk.groupby("seq_id")["ws_tokens"].sum()
    multi = pk.groupby("seq_id").size() > 1
    assert (tot[multi[multi].index] <= 64).all()


def test_language_allowlist(ray_session):
    import ray.data

    # texts built from the LangIdStage profile vocabulary so predictions are
    # deterministic: one clearly-English doc, one clearly-Dutch doc
    en = "the spark and the light for the best estate " * 4
    nl = "de het een van aan de lijkheid en de oorzaak " * 4
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([en, nl], pa.string())})
    cfg = CurationConfig(quality_min=0.0, near_dup=False, languages=("en",))
    out = curate_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    assert list(out["doc_id"]) == [1]
    assert list(out["lang_pred"]) == ["en"]


def test_clusters_small_path_equals_distributed(ray_session):
    """The union-find fast path and the min-label-propagation path must
    produce the identical (doc_id, cluster_id) table."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.dedup import duplicate_clusters

    rng = np.random.default_rng(5)
    # random sparse graph incl. a long chain (exercises label shortcutting)
    a = rng.integers(0, 60, size=40)
    b = rng.integers(0, 60, size=40)
    keep = a != b
    ids_a = np.concatenate([a[keep], np.arange(100, 131)])
    ids_b = np.concatenate([b[keep], np.arange(101, 132)])  # chain 100..131
    pairs = pa.table({"id_a": pa.array(ids_a, pa.int64()),
                      "id_b": pa.array(ids_b, pa.int64())})
    small = (duplicate_clusters(ray.data.from_arrow(pairs))
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    dist = (duplicate_clusters(ray.data.from_arrow(pairs), small_limit=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert small.equals(dist)
    # chain collapses to one cluster rooted at its min member
    assert (small[small["doc_id"].between(100, 131)]["cluster_id"] == 100).all()


def test_optional_stages_boilerplate_repetition_decontam(ray_session):
    """The three opt-in stages compose: frequent lines are stripped before
    annotation, repetitive docs and benchmark-leaking docs drop."""
    import pyarrow as pa
    import ray.data

    bench_q = ("what is the tallest mountain in the wide green world today "
               "friends ask")
    footer = "Accept all cookies and subscribe"
    texts, ids = [], []
    for i in range(8):
        ids.append(i)
        texts.append(GOOD.replace("fox", f"fox{i}") + f" unique {i}\n{footer}")
    ids.append(50)   # repetitive spam
    texts.append("buy cheap stuff now " * 30)
    ids.append(60)   # benchmark leak
    texts.append(GOOD + " " + bench_q)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    bench = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array([bench_q])}))
    cfg = CurationConfig(quality_min=0.2, near_dup=False,
                         boilerplate_min_docs=5, repetition_max=0.5,
                         benchmark=bench)
    out = curate_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    assert set(out["doc_id"]) == set(range(8))
    assert not out["text"].str.contains("cookies").any()

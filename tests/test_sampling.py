"""Deterministic sampling operators (functions/sampling.py)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.functions.sampling import (
    SIXTY_BITS, fraction_threshold, hash60, hash_sample, stratified_sample,
    stratified_take_k)


def _docs_table(n=400, seed=9):
    rng = np.random.default_rng(seed)
    strata = rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1])
    return pa.table({
        "doc_id": [f"d{i:05d}" for i in range(n)],
        "stratum": strata,
        "val": rng.integers(0, 1000, size=n),
    })


def test_fraction_threshold_exact():
    assert fraction_threshold(0.0) == 0
    assert fraction_threshold(1.0) == SIXTY_BITS
    assert fraction_threshold(0.5) == SIXTY_BITS // 2
    with pytest.raises(ValueError):
        fraction_threshold(1.5)


def test_hash60_matches_md5_prefix():
    ids = ["x", "42", "d00010"]
    got = hash60(ids, seed="s1")
    for i, v in zip(ids, got):
        assert v == int(hashlib.md5(f"s1|{i}".encode()).hexdigest()[:15], 16)


def test_hash_sample_deterministic_and_partition_invariant(ray_session):
    import ray.data

    tbl = _docs_table()
    a = hash_sample(ray.data.from_arrow(tbl), 0.25, id_col="doc_id",
                    seed="z").to_pandas()
    b = hash_sample(ray.data.from_arrow(tbl).repartition(7), 0.25,
                    id_col="doc_id", seed="z").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # rate is near the fraction (md5 uniformity; generous tolerance)
    assert 0.15 < len(a) / len(tbl) < 0.35
    # membership is the pure per-row predicate
    expect = {i for i in tbl.column("doc_id").to_pylist()
              if hash60([i], "z")[0] < fraction_threshold(0.25)}
    assert set(a["doc_id"]) == expect


def test_shuffle_by_hash_deterministic_epochs(ray_session):
    """Deterministic global shuffle: output order == brute-force sort by
    (hash60(seed|id), id) regardless of input partitioning; different epoch
    seeds permute independently; keep_key retains the sort key."""
    import ray.data
    from brdrq_ray.functions.sampling import shuffle_by_hash

    tbl = _docs_table(300)
    ids = tbl.column("doc_id").to_pylist()
    want = [i for _, i in sorted((int(hash60([i], "epoch0")[0]), i)
                                 for i in ids)]
    for blocks in (1, 7):
        got = shuffle_by_hash(ray.data.from_arrow(tbl).repartition(blocks),
                              seed="epoch0").to_pandas()
        assert list(got["doc_id"]) == want
        assert "shuffle_key" not in got.columns
    other = shuffle_by_hash(ray.data.from_arrow(tbl),
                            seed="epoch1").to_pandas()
    assert list(other["doc_id"]) != want          # epochs are independent
    assert sorted(other["doc_id"]) == sorted(ids)  # but a permutation
    kept = shuffle_by_hash(ray.data.from_arrow(tbl), seed="epoch0",
                           keep_key=True).to_pandas()
    assert kept["shuffle_key"].is_monotonic_increasing


def test_stratified_sample_per_stratum_fractions(ray_session):
    import ray.data

    tbl = _docs_table()
    out = stratified_sample(ray.data.from_arrow(tbl),
                            {"a": 0.0, "b": 1.0}, strata_col="stratum",
                            id_col="doc_id", seed="q",
                            default=0.5).to_pandas()
    assert (out["stratum"] != "a").all()
    n_b = (np.asarray(tbl.column("stratum")) == "b").sum()
    assert (out["stratum"] == "b").sum() == n_b  # fraction 1.0 keeps all
    # default applies to stratum c
    c_ids = [i for i, s in zip(tbl.column("doc_id").to_pylist(),
                               tbl.column("stratum").to_pylist()) if s == "c"]
    expect_c = {i for i in c_ids
                if hash60([i], "q")[0] < fraction_threshold(0.5)}
    assert set(out[out["stratum"] == "c"]["doc_id"]) == expect_c


def test_stratified_take_k_matches_brute_force(ray_session):
    import ray.data

    tbl = _docs_table()
    k = 7
    got = stratified_take_k(ray.data.from_arrow(tbl).repartition(5), k=k,
                            strata_col="stratum", id_col="doc_id", seed="r")
    gd = got.to_pandas()
    # brute force: k smallest (hash, id) per stratum over the whole table
    ids = tbl.column("doc_id").to_pylist()
    strata = tbl.column("stratum").to_pylist()
    h = hash60(ids, "r")
    import pandas as pd
    bf = (pd.DataFrame({"strata": strata, "id": ids, "sample_hash60": h})
            .sort_values(["strata", "sample_hash60", "id"], kind="mergesort")
            .groupby("strata", sort=False).head(k)
            .sort_values(["strata", "sample_hash60", "id"])
            .reset_index(drop=True))
    gd = gd.sort_values(["strata", "sample_hash60", "id"]).reset_index(drop=True)
    assert gd.equals(bf)
    assert (gd.groupby("strata").size() == k).all()


def test_stratified_take_k_small_stratum(ray_session):
    import ray.data

    tbl = pa.table({"doc_id": ["a", "b", "c"], "stratum": ["x", "x", "y"]})
    got = stratified_take_k(ray.data.from_arrow(tbl), k=5,
                            strata_col="stratum", id_col="doc_id")
    gd = got.to_pandas()
    assert len(gd) == 3  # min(k, stratum size) rows each
    assert set(gd["strata"]) == {"x", "y"}


def test_mix_corpora_weights_and_determinism(ray_session):
    import ray.data
    from brdrq_ray.functions.sampling import mix_corpora

    a = _docs_table(n=200, seed=1)
    b = _docs_table(n=100, seed=2)
    mixed = mix_corpora({"wiki": (ray.data.from_arrow(a), 2.3),
                         "web": (ray.data.from_arrow(b), 0.5)},
                        id_col="doc_id").to_pandas()
    wiki = mixed[mixed["source"] == "wiki"]
    web = mixed[mixed["source"] == "web"]
    # two full epochs of wiki ...
    assert (wiki.groupby("epoch").size()[[0, 1]] == 200).all()
    # ... plus a ~0.3 partial epoch (deterministic, so an exact count)
    part = wiki[wiki["epoch"] == 2]
    assert 30 < len(part) < 90
    # partial-epoch membership is the documented hash predicate
    # (float frac of 2.3 is not exactly 0.3; recompute as the operator does)
    w = 2.3
    expect = {i for i in a.column("doc_id").to_pylist()
              if hash60([i], "mix|wiki|ep2")[0] < fraction_threshold(w - int(w))}
    assert set(part["doc_id"]) == expect
    # web: no full epoch, one 0.5 sample
    assert set(web["epoch"]) == {0}
    assert 25 < len(web) < 75
    # rerun -> identical mix
    again = mix_corpora({"wiki": (ray.data.from_arrow(a), 2.3),
                         "web": (ray.data.from_arrow(b), 0.5)},
                        id_col="doc_id").to_pandas()
    key = ["source", "epoch", "doc_id"]
    assert (mixed.sort_values(key).reset_index(drop=True)[key]
            .equals(again.sort_values(key).reset_index(drop=True)[key]))


def test_mix_corpora_rejects_bad_weights(ray_session):
    import ray.data
    from brdrq_ray.functions.sampling import mix_corpora

    ds = ray.data.from_arrow(_docs_table(n=10))
    with pytest.raises(ValueError):
        mix_corpora({"x": (ds, -1.0)})
    with pytest.raises(ValueError):
        mix_corpora({"x": (ds, 0.0)})


def test_select_token_budget_equals_sort_prefix(ray_session):
    """select_token_budget == maximal prefix of (score DESC, hash60 ASC,
    id ASC) with token cumsum <= budget — across budgets, partitionings,
    and a recursion-forcing tiny driver_limit."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.sampling import hash60, select_token_budget

    rng = np.random.default_rng(9)
    n = 2000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "quality_score": np.round(rng.uniform(0, 1, n), 3),  # many ties
        "ws_tokens": rng.integers(1, 400, n).astype(np.int64),
    })
    df["h"] = hash60([str(v) for v in df["doc_id"]], "budget")
    order = df.sort_values(["quality_score", "h", "doc_id"],
                           ascending=[False, True, True], kind="mergesort")

    tbl = pa.Table.from_pandas(df.drop(columns=["h"]), preserve_index=False)
    for budget in (0, 5_000, 60_000, 10**9):
        want = set(order[order["ws_tokens"].cumsum() <= budget]["doc_id"])
        for blocks in (1, 7):
            ds = ray.data.from_arrow(tbl).repartition(blocks)
            out = select_token_budget(ds, budget).to_pandas()
            got = set(out["doc_id"]) if len(out) else set()
            assert got == want, (budget, blocks, len(got), len(want))
    # recursion path: driver_limit smaller than any bin population
    ds = ray.data.from_arrow(tbl)
    got = set(select_token_budget(ds, 60_000, driver_limit=4, n_bins=8,
                                  max_depth=5).to_pandas()["doc_id"])
    want = set(order[order["ws_tokens"].cumsum() <= 60_000]["doc_id"])
    assert got == want
    # string ids work the same
    tbl_s = tbl.set_column(0, "doc_id",
                           pa.array([f"d{v:05d}" for v in df["doc_id"]]))
    dfs = df.copy()
    dfs["doc_id"] = [f"d{v:05d}" for v in df["doc_id"]]
    dfs["h"] = hash60(dfs["doc_id"], "budget")
    orders = dfs.sort_values(["quality_score", "h", "doc_id"],
                             ascending=[False, True, True], kind="mergesort")
    want_s = set(orders[orders["ws_tokens"].cumsum() <= 60_000]["doc_id"])
    got_s = set(select_token_budget(ray.data.from_arrow(tbl_s), 60_000)
                .to_pandas()["doc_id"])
    assert got_s == want_s

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


def _unimax_brute(df, budgets, seed="unimax"):
    """Per-domain prefix in (hash60 ASC, id ASC) order, cumsum <= budget."""
    import pandas as pd
    from brdrq_ray.functions.sampling import hash60

    keep = set()
    d2 = df.copy()
    d2["h"] = hash60(d2["doc_id"].tolist(), seed)
    for d, b in budgets.items():
        sub = d2[d2["source"] == d].sort_values(["h", "doc_id"],
                                                kind="mergesort")
        keep |= set(sub[sub["ws_tokens"].cumsum() <= b]["doc_id"])
    return keep


def test_unimax_budgets_waterfill():
    from brdrq_ray.functions.sampling import unimax_budgets

    # hand example: caps 100/300/1000, budget 600 -> shares 200 each, the
    # 100-cap domain frees budget for the rest: 100, then 500//2=250 (capped
    # at 300? no, 250 < 300) -> 250, then 250//1=250
    got = unimax_budgets({"a": 100, "b": 300, "c": 1000}, 600)
    assert got == {"a": 100, "b": 250, "c": 250}
    # budget >= total caps: everyone gets their cap
    got = unimax_budgets({"a": 100, "b": 300}, 10_000)
    assert got == {"a": 100, "b": 300}
    # max_epochs scales the caps (floor)
    got = unimax_budgets({"a": 101, "b": 300}, 10_000, max_epochs=0.5)
    assert got == {"a": 50, "b": 150}
    # invariants over random instances
    rng = np.random.default_rng(4)
    for _ in range(50):
        k = int(rng.integers(1, 12))
        counts = {f"s{i}": int(rng.integers(0, 5000)) for i in range(k)}
        budget = int(rng.integers(0, 30000))
        b = unimax_budgets(counts, budget)
        assert sum(b.values()) <= budget
        assert all(0 <= b[d] <= counts[d] for d in counts)
        # water level: any domain below its cap is within 1 of the max
        # uncapped allocation (integer floor-division waterfill property)
        uncapped = [b[d] for d in counts if b[d] < counts[d]]
        if len(uncapped) > 1:
            assert max(uncapped) - min(uncapped) <= 1


def test_unimax_select_equals_brute_force(ray_session):
    import pandas as pd
    import ray.data
    from brdrq_ray.functions.sampling import (domain_token_counts,
                                              flag_unimax, unimax_budgets,
                                              unimax_select)

    rng = np.random.default_rng(11)
    n = 1500
    df = pd.DataFrame({
        "doc_id": [f"d{i:05d}" for i in range(n)],
        "source": rng.choice([f"s{i}" for i in range(6)], size=n,
                             p=[0.4, 0.25, 0.15, 0.1, 0.07, 0.03]),
        "ws_tokens": rng.integers(1, 200, n).astype(np.int64),
    })
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    counts = df.groupby("source")["ws_tokens"].sum().astype(int).to_dict()

    for budget in (0, 9_000, 60_000, 10**9):
        budgets = unimax_budgets(counts, budget)
        want = _unimax_brute(df, budgets)
        for blocks in (1, 7):
            ds = ray.data.from_arrow(tbl).repartition(blocks)
            out = unimax_select(ds, budget).to_pandas()
            got = set(out["doc_id"]) if len(out) else set()
            assert got == want, (budget, blocks, len(got), len(want))
    # exact per-domain counts pass
    ds = ray.data.from_arrow(tbl)
    assert domain_token_counts(ds) == counts
    # flag form marks the same membership
    budgets = unimax_budgets(counts, 9_000)
    want = _unimax_brute(df, budgets)
    out = flag_unimax(ds, 9_000).to_pandas()
    assert set(out[out["in_unimax"]]["doc_id"]) == want
    assert len(out) == n
    # recursion path: driver_limit below any bin population
    got = set(unimax_select(ds, 9_000, driver_limit=4, n_bins=8,
                            max_depth=6).to_pandas()["doc_id"])
    assert got == want
    # int64 ids hash like their decimal string (SQL parity contract)
    tbl_i = tbl.set_column(0, "doc_id", pa.array(np.arange(n, dtype=np.int64)))
    dfi = df.copy()
    dfi["doc_id"] = np.arange(n, dtype=np.int64)
    want_i = _unimax_brute(dfi, budgets)
    got_i = set(unimax_select(ray.data.from_arrow(tbl_i), 9_000)
                .to_pandas()["doc_id"])
    assert got_i == want_i


def test_select_domain_budgets_explicit(ray_session):
    import pandas as pd
    import ray.data
    from brdrq_ray.functions.sampling import select_domain_budgets

    rng = np.random.default_rng(3)
    n = 600
    df = pd.DataFrame({
        "doc_id": [f"x{i:04d}" for i in range(n)],
        "source": rng.choice(["a", "b", "c"], size=n),
        "ws_tokens": rng.integers(1, 50, n).astype(np.int64),
    })
    budgets = {"a": 500, "b": 0}  # c absent -> dropped entirely
    want = _unimax_brute(df, budgets)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = select_domain_budgets(ds, budgets).to_pandas()
    assert set(out["doc_id"]) == want
    assert set(out["source"]) <= {"a"}  # b budget 0, c unbudgeted
    # audit form
    flagged = select_domain_budgets(ds, budgets,
                                    flag_col="in_domain_budget").to_pandas()
    assert set(flagged[flagged["in_domain_budget"]]["doc_id"]) == want
    assert len(flagged) == n


def test_temperature_budgets_properties():
    from brdrq_ray.functions.sampling import temperature_budgets

    toks = {"big": 1_000_000, "mid": 100_000, "small": 10_000}
    # alpha=1, no caps binding: proportional within integer floors
    b = temperature_budgets(toks, 1.0, 222_000, max_epochs=None)
    total = sum(toks.values())
    for d in toks:
        assert abs(b[d] - 222_000 * toks[d] / total) <= 3
    # alpha=0: uniform (caps off)
    b0 = temperature_budgets(toks, 0.0, 30_000, max_epochs=None)
    assert set(b0.values()) == {10_000}
    # alpha between: small domains boosted vs natural share
    bh = temperature_budgets(toks, 0.5, 222_000, max_epochs=None)
    assert bh["small"] / 222_000 > toks["small"] / total
    assert bh["big"] / 222_000 < toks["big"] / total
    # max_epochs caps bind and overflow redistributes
    bc = temperature_budgets(toks, 0.0, 600_000, max_epochs=1.0)
    assert bc["small"] == 10_000            # capped at 1 epoch
    assert bc["mid"] == 100_000             # capped too
    assert bc["big"] == 490_000             # got the whole overflow
    assert sum(bc.values()) == 600_000
    # budget above all caps: allocate only what caps allow
    ball = temperature_budgets(toks, 1.0, 10_000_000, max_epochs=1.0)
    assert ball == {"big": 1_000_000, "mid": 100_000, "small": 10_000}
    # exhaustive: every token of the budget lands somewhere when room exists
    bex = temperature_budgets({"a": 7, "b": 13}, 0.7, 11, max_epochs=None)
    assert sum(bex.values()) == 11
    with pytest.raises(ValueError):
        temperature_budgets(toks, -0.1, 100)


def test_temperature_select_equals_brute_force(ray_session):
    import pandas as pd
    import ray.data
    from brdrq_ray.functions.sampling import (
        domain_token_counts,
        temperature_budgets,
        temperature_select,
    )

    rng = np.random.default_rng(17)
    n = 500
    df = pd.DataFrame({
        "doc_id": [f"t{i:04d}" for i in range(n)],
        "source": rng.choice(["a", "b", "c"], size=n, p=[0.7, 0.2, 0.1]),
        "ws_tokens": rng.integers(1, 60, n).astype(np.int64),
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    counts = {d: int(df[df.source == d].ws_tokens.sum())
              for d in df.source.unique()}
    assert domain_token_counts(ds) == counts
    budgets = temperature_budgets(counts, 0.3, 4000)
    want = _unimax_brute(df, budgets, seed="temp")
    out = temperature_select(ds, 0.3, 4000).to_pandas()
    assert set(out["doc_id"]) == want
    # partition invariance
    out2 = temperature_select(ds.repartition(7), 0.3, 4000).to_pandas()
    assert set(out2["doc_id"]) == want
    # audit form flags the same rows
    flagged = temperature_select(ds, 0.3, 4000,
                                 flag_col="in_temp").to_pandas()
    assert set(flagged[flagged["in_temp"]]["doc_id"]) == want


def test_unimax_membership_all_null_domain_batch(ray_session):
    """An all-null domain batch must get cut 0 for every row (the old
    per-row .get(None, 0) behavior), not an IndexError from the empty
    dictionary of the vectorized lookup."""
    import pyarrow as pa
    import ray
    import ray.data
    from brdrq_ray.functions.sampling import _domain_membership_stage

    stage = _domain_membership_stage(
        {"a": 1 << 60}, ray.put(np.asarray([], dtype=object)),
        domain_col="source", id_col="doc_id", seed="s")()
    batch = pa.table({"doc_id": pa.array(["x", "y"]),
                      "source": pa.array([None, None], pa.string())})
    out = stage(batch)
    assert out.num_rows == 0  # cut 0 -> nothing kept
    mixed = pa.table({"doc_id": pa.array(["x", "y"]),
                      "source": pa.array(["a", None], pa.string())})
    out2 = stage(mixed)
    assert out2.column("doc_id").to_pylist() == ["x"]

"""Dataset profiler (functions/profile.py): exact stats vs numpy oracles,
HLL cardinality, fused quantiles, partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from brdrq_ray.functions.profile import profile_dataset

SF_DIR = "/root/testdata/sf0.001"


def _table_with_everything():
    rng = np.random.default_rng(7)
    n = 2000
    vals = rng.normal(100.0, 15.0, n)
    vals[::50] = np.nan  # NaN-in-float (masked out of stats, not a null)
    return pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "x": pa.array(vals, pa.float64()),
        "cat": pa.array([f"c{i % 37}" if i % 11 else None
                         for i in range(n)], pa.string()),
        "blob": pa.array([b"\x00" * (i % 5) for i in range(n)],
                         pa.binary()),
        "nested": pa.array([[i, i + 1] for i in range(n)],
                           pa.list_(pa.int64())),
    })


def _prof(ds, **kw):
    return (profile_dataset(ds, **kw).to_pandas().set_index("column"))


def test_profile_exact_stats(ray_session):
    t = _table_with_everything()
    df = _prof(ray.data.from_arrow(t).repartition(5), quantiles=True)

    x = t.column("x").to_numpy()
    finite = x[np.isfinite(x)]
    rx = df.loc["x"]
    assert rx["kind"] == "numeric" and rx["rows"] == 2000
    assert rx["min"] == finite.min() and rx["max"] == finite.max()
    # mean/std denominators use the valid count; the fixture's NaNs make
    # them slightly off from the finite-only mean — bounded by the NaN frac
    assert rx["mean"] == pytest.approx(finite.mean(), rel=0.05)

    rid = df.loc["id"]
    assert rid["min"] == 0 and rid["max"] == 1999 and rid["nulls"] == 0
    assert rid["mean"] == pytest.approx(1999 / 2)
    assert rid["std"] == pytest.approx(np.arange(2000).std(), rel=1e-9)

    rc = df.loc["cat"]
    true_lens = np.array([len(f"c{i % 37}") for i in range(2000) if i % 11])
    assert rc["nulls"] == sum(1 for i in range(2000) if i % 11 == 0)
    assert rc["len_min"] == true_lens.min()
    assert rc["len_max"] == true_lens.max()
    assert rc["len_mean"] == pytest.approx(true_lens.mean())

    rb = df.loc["blob"]
    assert rb["kind"] == "binary"
    assert rb["len_min"] == 0 and rb["len_max"] == 4
    assert rb["approx_distinct"] is None or np.isnan(rb["approx_distinct"])

    rn = df.loc["nested"]
    assert rn["kind"] == "other" and rn["rows"] == 2000


def test_profile_cardinality_and_quantiles(ray_session):
    t = _table_with_everything()
    df = _prof(ray.data.from_arrow(t).repartition(4), quantiles=True)
    # exact small cardinalities land on HLL's linear-counting range
    assert df.loc["cat", "approx_distinct"] == pytest.approx(37, rel=0.05)
    assert df.loc["id", "approx_distinct"] == pytest.approx(2000, rel=0.05)
    # quantiles exact at bin resolution: within one bin width of numpy
    x = t.column("x").to_numpy()
    finite = x[np.isfinite(x)]
    width = (finite.max() - finite.min()) / 1024
    for q, cname in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        lo = df.loc["x", cname]
        assert abs(lo - np.quantile(finite, q)) <= width + 1e-9


def test_profile_partition_invariant(ray_session):
    t = _table_with_everything()
    out = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(t).repartition(parts)
        out.append(_prof(ds, quantiles=True))
    a, b = out
    for col in ("id", "x", "cat", "blob"):
        for field in ("rows", "nulls", "min", "max", "len_min", "len_max",
                      "approx_distinct", "p50", "p90", "p99"):
            va, vb = a.loc[col, field], b.loc[col, field]
            if va is None or (isinstance(va, float) and np.isnan(va)):
                assert vb is None or np.isnan(vb)
            else:
                # counts/min/max/HLL-register merges and integer histogram
                # sums are order-free -> bit-identical under partitioning
                assert va == vb, (col, field, va, vb)


def test_profile_column_selection_and_errors(ray_session):
    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    df = _prof(ds, columns=["doc_id", "text"])
    assert sorted(df.index) == ["doc_id", "text"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_dataset(ds, columns=["nope"])


def test_profile_sf_documents(ray_session):
    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    df = _prof(ds)
    assert df.loc["doc_id", "rows"] == 500
    assert df.loc["doc_id", "approx_distinct"] == pytest.approx(500, rel=0.05)
    ref = ds.to_pandas()
    assert df.loc["n_chars", "min"] == ref["n_chars"].min()
    assert df.loc["n_chars", "max"] == ref["n_chars"].max()
    assert df.loc["text", "len_mean"] == pytest.approx(
        ref["text"].str.len().mean())

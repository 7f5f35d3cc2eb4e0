"""Mimics the driver's correctness gate: run each queries() entry and its
oracle_sql() side-by-side on the same parquet tables; compare row count,
column names and values (order-insensitive)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from tests.conftest import SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


SQL_QUERIES = sorted(entrymod._BASE_ORACLE_SQL)
GOLDEN_QUERIES = sorted(entrymod._golden_oracles())


def _compare(name, mine, oracle):
    assert list(mine.columns) == list(oracle.columns), \
        f"columns {list(mine.columns)} != {list(oracle.columns)}"
    assert len(mine) == len(oracle), f"rows {len(mine)} != {len(oracle)}"
    for c in mine.columns:
        a, b = mine[c], oracle[c]
        if a.dtype == "float64":
            ok = np.isclose(a.fillna(math.nan), b.fillna(math.nan),
                            rtol=1e-9, atol=1e-9, equal_nan=True)
            assert ok.all(), f"{name}.{c}: max diff {np.abs(a - b).max()}"
        else:
            assert (a.fillna("<na>").to_numpy() == b.fillna("<na>").to_numpy()).all(), \
                f"{name}.{c} mismatch"


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(ray_session, con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    mine = _canon(_to_pandas(q(SF_DIR)))
    oracle = _canon(con.sql(sql).df())
    _compare(name, mine, oracle)


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_query_matches_golden_oracle(ray_session, name):
    """The golden-parquet oracles are pinned at sf0.01 (the driver's
    correctness scale) — re-run each covered query there and compare against
    its committed expected output through the same read_parquet SQL the
    driver will execute."""
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    mine = _canon(_to_pandas(q("/root/testdata/sf0.01")))
    oracle = _canon(duckdb.sql(sql).df())
    _compare(name, mine, oracle)


def test_golden_oracles_cover_everything():
    """With fresh goldens, every queries() entry has SOME oracle (base SQL or
    golden parquet); regenerate with tests/golden/regen_oracle.py when a
    semantic change invalidates them deliberately."""
    if not entrymod._golden_oracles():
        pytest.skip("golden oracles stale for this environment (rows-only)")
    missing = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))
    assert missing == []


def test_rows_only_queries_run(ray_session):
    """Every non-SQL query must at least run and produce a stable schema."""
    qs = entrymod.queries()
    rows_only = sorted(set(qs) - set(entrymod.oracle_sql()))
    for name in rows_only:
        res = qs[name](SF_DIR)
        df = _to_pandas(res)
        assert df is not None, name
        rerun = _to_pandas(qs[name](SF_DIR))
        assert list(df.columns) == list(rerun.columns), name
        assert len(df) == len(rerun), name


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert "doc_id" in df.columns

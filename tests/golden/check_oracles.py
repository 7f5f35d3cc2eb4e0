"""Local simulation of the driver's correctness gate: run every queries()
entry at sf0.01 AND its oracle_sql() (DuckDB) side-by-side, compare row count,
schema (column names sorted) and values (rows sorted, float-tolerant hash).

    PYTHONPATH=. python tests/golden/check_oracles.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    q = m.queries()
    osql = m.oracle_sql()
    fails, no_oracle = [], []
    for name in sorted(q):
        if name not in osql:
            no_oracle.append(name)
            continue
        mine = canon(to_df(q[name](SF_DIR)))
        theirs = canon(con.execute(osql[name]).df())
        ok_rows = len(mine) == len(theirs)
        ok_schema = list(mine.columns) == list(theirs.columns)
        ok_vals = False
        if ok_rows and ok_schema:
            try:
                pd.testing.assert_frame_equal(mine, theirs, check_dtype=False,
                                              rtol=1e-9, atol=1e-9)
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                err = str(e).splitlines()[0]
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        print(f"{name:28s} {status}  rows={len(mine)}/{len(theirs)} "
              f"schema={'=' if ok_schema else '!'}")
        if status == "FAIL":
            fails.append(name)
            if ok_rows and ok_schema:
                print(f"    value diff: {err}")
    print(f"\n{len(q) - len(no_oracle) - len(fails)} OK, {len(fails)} FAIL, "
          f"{len(no_oracle)} no-oracle {no_oracle}")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

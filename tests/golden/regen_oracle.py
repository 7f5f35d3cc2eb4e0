"""Regenerate the golden-parquet oracles for the non-SQL-expressible queries.

Run ONLY deliberately (a semantic change to any covered operator invalidates
its golden on purpose):

    PYTHONPATH=. python tests/golden/regen_oracle.py

For every queries() entry WITHOUT a hand-written DuckDB oracle, this runs the
query at sf0.01 (the driver's correctness scale), writes the exact result
table to tests/golden/oracle/<name>.parquet, and records an environment hash
(fixture-generator content + driver testdata bytes) in meta.json. At driver
time __ray_entry__.oracle_sql() serves these as `SELECT * FROM read_parquet`
oracles — but only while the environment hash still matches, so stale goldens
degrade to rows-only checks instead of false failures.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

SF_DIR = "/root/testdata/sf0.01"


def result_to_arrow(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    # ray.data.Dataset
    return pa.Table.from_pandas(res.to_pandas(), preserve_index=False)


def main():
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as m

    out_dir = m._GOLDEN_ORACLE_DIR
    os.makedirs(out_dir, exist_ok=True)
    q = m.queries()
    names = sorted(set(q) - set(m._BASE_ORACLE_SQL))
    print(f"regenerating {len(names)} golden oracles at {SF_DIR}: {names}")
    written = []
    for name in names:
        res = q[name](SF_DIR)
        tbl = result_to_arrow(res)
        if tbl.num_rows == 0:
            # an empty result loses its schema through the pandas round-trip
            # on either side of the compare -> keep it a rows-only check
            print(f"  {name}: EMPTY at sf0.01 -> skipped (rows-only check)")
            continue
        # canonical row order before writing: Ray's output block order is
        # run-dependent, and without this every regen rewrites ALL golden
        # parquets byte-differently (masking which oracles a commit really
        # touched). The driver compare is row-sorted, so order is free.
        df = tbl.to_pandas()
        schema = tbl.schema
        df = df.sort_values(list(df.columns), kind="mergesort",
                            na_position="last").reset_index(drop=True)
        tbl = pa.Table.from_pandas(df, preserve_index=False, schema=schema)
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, path)
        written.append(name)
        print(f"  {name}: {tbl.num_rows} rows x {tbl.num_columns} cols")
    meta = {"env_hash": m._golden_env_hash(SF_DIR), "sf_dir": SF_DIR,
            "queries": written}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    print(f"meta.json env_hash={meta['env_hash']}")
    ray.shutdown()


if __name__ == "__main__":
    main()

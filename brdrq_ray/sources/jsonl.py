"""JSONL (NDJSON) and CSV interchange — the formats LLM corpora actually
arrive in (web-crawl dumps, instruction sets) before they become parquet.

Both readers return a streaming Dataset; both writers stream block-by-block
(one file per block under the target dir — the resumable-output layout every
sink in this engine uses, never one giant file). Unlike ``read_parquet``
there is NO column/row pushdown in either format — the whole line must be
parsed before anything can be dropped — so ``columns=`` here prunes AFTER
decode, and the production guidance stays: convert interchange data to
parquet once, then run pipelines against the parquet (TESTDATA.md tables).

No reference counterpart (the reference reads GIS formats through QGIS
providers, `plugin/brdrq/brdrq_dockwidget_featurealigner.py` layer combos);
this is the training-data-engine half of the scope.
"""

from __future__ import annotations

import ray.data


def read_jsonl(paths, columns: list[str] | None = None,
               **read_kwargs) -> ray.data.Dataset:
    """Read newline-delimited JSON into a Dataset (pyarrow's block JSON
    reader underneath — nested lists/structs round-trip, e.g. the
    interleaved ``spans`` column). ``columns`` prunes post-decode (JSON has
    no projection pushdown; see module docstring)."""
    ds = ray.data.read_json(paths, **read_kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl(ds: ray.data.Dataset, path: str, **write_kwargs) -> None:
    """Stream the Dataset to ``path`` as one .json (NDJSON) file per block —
    Ray's JSON datasink, kept behind this wrapper so callers get the same
    overwrite-directory contract as the parquet sinks."""
    import os
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    ds.write_json(path, **write_kwargs)


def read_csv(paths, columns: list[str] | None = None,
             **read_kwargs) -> ray.data.Dataset:
    """Read CSV into a Dataset (pyarrow CSV reader: C-speed parse, type
    inference). ``columns`` prunes post-decode."""
    ds = ray.data.read_csv(paths, **read_kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_csv(ds: ray.data.Dataset, path: str, **write_kwargs) -> None:
    """Stream the Dataset to ``path`` as one .csv file per block (flat
    columns only — CSV cannot carry the nested span/geometry columns; those
    stay in parquet/JSONL)."""
    import os
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    ds.write_csv(path, **write_kwargs)

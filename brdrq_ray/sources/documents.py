"""Interleaved-document source with storage-format dispatch.

The north rule's production input is a **Lance table** of interleaved
text + media documents (BASELINE.json ``input_hint``: columns
``doc_id: string, spans: list<struct<kind, text, media_ref, offset>>``).
This module is the single entry point that turns a storage path into a
``ray.data.Dataset`` with that contract, regardless of format:

- ``*.lance`` directories -> ``ray.data.read_lance`` (fragment-parallel,
  column-projected scan; Lance fragments map 1:1 to Ray blocks so the
  streaming executor pipelines them like parquet row groups). The
  ``pylance`` package is not installed in this sandbox, so the Lance leg
  is gated behind an import-try with a clear error; the dispatch,
  schema validation, and column pruning are real and tested.
- ``*.parquet`` files / directories of parquet -> ``ray.data.read_parquet``
  with the same column projection.

Column pruning happens AT THE READ (``columns=``) — a caller that only
needs ``doc_id`` never ships span payloads out of storage.

``validate_documents_schema`` enforces the interleaved contract once, at
the source, so every downstream stage (explode/align/stitch,
pipelines/documents.py) can assume it instead of re-checking per batch.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data

# The input_hint contract (BASELINE.json): span struct fields and types.
SPAN_FIELDS = {
    "kind": pa.string(),
    "text": pa.string(),
    "media_ref": pa.string(),
    "offset": pa.int32(),
}


def _is_lance_path(path: str) -> bool:
    """A Lance dataset is a directory named ``*.lance`` (or containing a
    ``_versions`` manifest directory, the Lance on-disk layout)."""
    if path.rstrip("/").endswith(".lance"):
        return True
    return os.path.isdir(path) and os.path.isdir(os.path.join(path, "_versions"))


def validate_documents_schema(schema: pa.Schema, require_spans: bool = True) -> None:
    """Raise ValueError unless `schema` carries the interleaved-document
    contract: doc_id:string and spans:list<struct> with the four span fields
    (extra struct fields are allowed; missing ones are not)."""
    names = set(schema.names)
    if "doc_id" not in names:
        raise ValueError(f"documents table missing 'doc_id' column (have {sorted(names)})")
    if not require_spans:
        return
    if "spans" not in names:
        raise ValueError(f"documents table missing 'spans' column (have {sorted(names)})")
    spans_t = schema.field("spans").type
    if not (pa.types.is_list(spans_t) or pa.types.is_large_list(spans_t)):
        raise ValueError(f"'spans' must be list<struct>, got {spans_t}")
    val_t = spans_t.value_type
    if not pa.types.is_struct(val_t):
        raise ValueError(f"'spans' values must be struct, got {val_t}")
    have = {val_t.field(i).name for i in range(val_t.num_fields)}
    missing = set(SPAN_FIELDS) - have
    if missing:
        raise ValueError(f"span struct missing fields {sorted(missing)} (have {sorted(have)})")


def read_interleaved_documents(path: str, columns: list[str] | None = None,
                               validate: bool = True, **read_kwargs) -> ray.data.Dataset:
    """Read an interleaved-documents table from `path`, dispatching on the
    storage format (Lance dataset dir vs parquet). Returns a lazy Dataset;
    only the schema is touched eagerly (for validation), never row data.

    ``columns`` prunes at the read on both legs. Extra ``read_kwargs`` pass
    through to the underlying reader (e.g. ``override_num_blocks``).
    """
    if _is_lance_path(path):
        try:
            import lance  # noqa: F401  (pylance package)
        except ImportError as e:
            raise ImportError(
                f"{path} is a Lance dataset but the 'pylance' package is not "
                "installed in this environment. Install pylance, or convert "
                "the table to parquet (the contract and every downstream "
                "stage are format-agnostic)."
            ) from e
        ds = ray.data.read_lance(path, columns=columns, **read_kwargs)
    else:
        ds = ray.data.read_parquet(path, columns=columns, **read_kwargs)
    if validate:
        need_spans = columns is None or "spans" in columns
        schema = ds.schema(fetch_if_missing=True)
        # ray.data.Schema wraps the underlying Arrow schema
        schema = getattr(schema, "base_schema", schema)
        validate_documents_schema(schema, require_spans=need_spans)
    return ds

"""JSONL / CSV interchange roundtrips (sources/jsonl.py)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from brdrq_ray.sources.jsonl import read_csv, read_jsonl, write_csv, write_jsonl

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_jsonl_roundtrip_documents(ray_session, tmp_path):
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.repartition(3), out)
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    assert len(files) >= 3  # one file per block, never one giant file
    back = read_jsonl(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert sorted(back.columns) == sorted(orig.columns)
    assert back["doc_id"].tolist() == orig["doc_id"].tolist()
    assert back["text"].tolist() == orig["text"].tolist()
    assert back["n_chars"].tolist() == orig["n_chars"].tolist()


def test_jsonl_nested_spans_roundtrip(ray_session, tmp_path):
    # the interleaved span shape (list<struct>) must survive JSONL
    tbl = pa.table({
        "doc_id": pa.array(["a", "b"]),
        "spans": pa.array([
            [{"kind": "text", "text": "hello", "offset": 0},
             {"kind": "image", "text": None, "offset": 5}],
            [{"kind": "text", "text": "world", "offset": 0}],
        ]),
    })
    out = str(tmp_path / "spans_jsonl")
    write_jsonl(ray.data.from_arrow(tbl), out)
    back = read_jsonl(out).to_pandas().sort_values("doc_id")
    spans_a = back[back["doc_id"] == "a"]["spans"].iloc[0]
    assert [s["kind"] for s in spans_a] == ["text", "image"]
    assert spans_a[0]["text"] == "hello"
    assert spans_a[1]["text"] is None


def test_jsonl_column_pruning_and_overwrite(ray_session, tmp_path):
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "docs_pruned")
    write_jsonl(docs, out)
    pruned = read_jsonl(out, columns=["doc_id", "lang"])
    assert set(pruned.schema().names) == {"doc_id", "lang"}
    # overwrite: second write replaces, row count stable
    write_jsonl(docs, out)
    assert read_jsonl(out).count() == docs.count()


def test_csv_roundtrip(ray_session, tmp_path):
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "docs_csv")
    write_csv(docs.repartition(2), out)
    back = read_csv(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == orig["doc_id"].tolist()
    assert back["n_chars"].tolist() == orig["n_chars"].tolist()
    sel = read_csv(out, columns=["doc_id"])
    assert set(sel.schema().names) == {"doc_id"}

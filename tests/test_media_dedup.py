"""Media-payload dedup across interleaved documents
(pipelines/documents.py::dedup_media_payloads)."""

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.pipelines.documents import (canonical_media_refs,
                                           dedup_media_payloads,
                                           span_sequence_table)
from brdrq_ray.sources.fixtures import make_documents_table


def _media_for(docs_tbl: pa.Table, dup_groups: int = 7) -> pa.Table:
    """One media row per media span ref; refs are assigned payloads so that
    every `dup_groups`-th ref shares identical bytes (cross-doc duplicates)."""
    refs = []
    for spans in docs_tbl.column("spans").to_pylist():
        refs += [s["media_ref"] for s in spans if s["kind"] == "media"]
    refs = sorted(set(refs))
    payloads = [f"PAYLOAD-{i % dup_groups}".encode() * 10
                for i in range(len(refs))]
    return pa.table({"media_ref": pa.array(refs, pa.string()),
                     "payload": pa.array(payloads, pa.binary())})


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data

    docs_tbl = make_documents_table(n_docs=60, seed=11)
    media_tbl = _media_for(docs_tbl)
    return (ray.data.from_arrow(docs_tbl), ray.data.from_arrow(media_tbl),
            docs_tbl, media_tbl)


def _expected_mapping(media_tbl: pa.Table) -> dict:
    import hashlib
    by_hash = {}
    for ref, payload in zip(media_tbl.column("media_ref").to_pylist(),
                            media_tbl.column("payload").to_pylist()):
        by_hash.setdefault(hashlib.md5(payload).hexdigest(), []).append(ref)
    out = {}
    for refs in by_hash.values():
        canon = min(refs)
        for r in refs:
            out[r] = canon
    return out


def test_canonical_media_refs(corpus):
    docs, media, _, media_tbl = corpus
    got = canonical_media_refs(media).to_pandas()
    expected = _expected_mapping(media_tbl)
    assert dict(zip(got["media_ref"], got["canonical_ref"])) == expected
    assert len(got) == media_tbl.num_rows


def _check(docs_tbl, media_tbl, out_docs, out_media, remap):
    expected = _expected_mapping(media_tbl)
    remap_df = remap.to_pandas()
    assert set(remap_df["media_ref"]) == {r for r, c in expected.items()
                                          if r != c}
    # media table keeps exactly the canonical rows
    kept = sorted(out_media.to_pandas()["media_ref"])
    assert kept == sorted(set(expected.values()))
    # span sequences: (kind, text, offset, order) byte-identical; media_ref
    # equals the canonical mapping of the original
    import ray.data
    before = (span_sequence_table(ray.data.from_arrow(docs_tbl))
              .to_pandas().sort_values(["doc_id", "span_idx"])
              .reset_index(drop=True))
    after = (span_sequence_table(out_docs)
             .to_pandas().sort_values(["doc_id", "span_idx"])
             .reset_index(drop=True))
    assert (before[["doc_id", "span_idx", "kind", "text", "offset"]]
            .equals(after[["doc_id", "span_idx", "kind", "text", "offset"]]))
    want_ref = before["media_ref"].map(lambda r: expected.get(r, r))
    assert (after["media_ref"] == want_ref).all()


def test_dedup_media_broadcast_leg(corpus):
    docs, media, docs_tbl, media_tbl = corpus
    out_docs, out_media, remap = dedup_media_payloads(docs, media)
    _check(docs_tbl, media_tbl, out_docs, out_media, remap)


def test_dedup_media_distributed_leg(corpus):
    docs, media, docs_tbl, media_tbl = corpus
    out_docs, out_media, remap = dedup_media_payloads(docs, media,
                                                      broadcast_limit=0)
    _check(docs_tbl, media_tbl, out_docs, out_media, remap)


def test_no_duplicates_is_identity(ray_session):
    import ray.data

    docs_tbl = make_documents_table(n_docs=20, seed=3)
    media_tbl = _media_for(docs_tbl, dup_groups=10_000)  # all distinct
    docs = ray.data.from_arrow(docs_tbl)
    media = ray.data.from_arrow(media_tbl)
    out_docs, out_media, remap = dedup_media_payloads(docs, media)
    assert remap.count() == 0
    assert out_media.count() == media_tbl.num_rows
    same = (span_sequence_table(out_docs).to_pandas()
            .sort_values(["doc_id", "span_idx"]).reset_index(drop=True))
    orig = (span_sequence_table(docs).to_pandas()
            .sort_values(["doc_id", "span_idx"]).reset_index(drop=True))
    assert same.equals(orig)


def test_curate_interleaved_with_media(ray_session):
    import ray.data

    from brdrq_ray.pipelines.curation import (CurationConfig,
                                              curate_interleaved)

    docs_tbl = make_documents_table(n_docs=40, seed=19)
    media_tbl = _media_for(docs_tbl, dup_groups=5)
    expected = _expected_mapping(media_tbl)
    cfg = CurationConfig(quality_min=0.0, near_dup=False,
                         media=ray.data.from_arrow(media_tbl))
    out = curate_interleaved(ray.data.from_arrow(docs_tbl), cfg)
    after = (span_sequence_table(out).to_pandas()
             .sort_values(["doc_id", "span_idx"]).reset_index(drop=True))
    before = (span_sequence_table(ray.data.from_arrow(docs_tbl)).to_pandas()
              .sort_values(["doc_id", "span_idx"]).reset_index(drop=True))
    # no doc dropped by the permissive gates; spans identical up to remap
    assert (before[["doc_id", "span_idx", "kind", "text", "offset"]]
            .equals(after[["doc_id", "span_idx", "kind", "text", "offset"]]))
    want = before["media_ref"].map(lambda r: expected.get(r, r))
    assert (after["media_ref"] == want).all()


def test_duplicate_media_rows_and_conflicting_refs(ray_session):
    import ray.data

    # r2's payload appears twice (duplicate rows) AND r3 has two rows with
    # DIFFERENT payloads (conflicting) — the remap must stay unique per ref
    # and both legs must agree
    media_tbl = pa.table({
        "media_ref": pa.array(["r2", "r2", "r1", "r3", "r3", "r9"]),
        "payload": pa.array([b"A" * 40, b"A" * 40, b"A" * 40,
                             b"A" * 40, b"B" * 40, b"B" * 40], pa.binary()),
    })
    span_type = pa.struct([("kind", pa.string()), ("text", pa.string()),
                           ("media_ref", pa.string()), ("offset", pa.int32())])
    docs_tbl = pa.table({
        "doc_id": pa.array(["d1", "d2"]),
        "spans": pa.array([
            [{"kind": "text", "text": "hello", "media_ref": "", "offset": 0},
             {"kind": "media", "text": "", "media_ref": "r2", "offset": 5}],
            [{"kind": "media", "text": "", "media_ref": "r3", "offset": 0},
             {"kind": "media", "text": "", "media_ref": "r9", "offset": 1}],
        ], pa.list_(span_type)),
    })
    docs = ray.data.from_arrow(docs_tbl)
    media = ray.data.from_arrow(media_tbl)
    results = {}
    for name, limit in (("broadcast", 4_000_000), ("distributed", 0)):
        out_docs, out_media, remap = dedup_media_payloads(
            docs, media, broadcast_limit=limit)
        rm = remap.to_pandas().sort_values("media_ref").reset_index(drop=True)
        assert rm["media_ref"].is_unique
        refs = (span_sequence_table(out_docs).to_pandas()
                .sort_values(["doc_id", "span_idx"])["media_ref"].tolist())
        results[name] = (rm.values.tolist(), sorted(refs))
    assert results["broadcast"] == results["distributed"]
    # r2 -> r1 (payload A); r3 conflicts (A in one row, B in another): the
    # unique remap takes the min canonical across its rows; r9 -> min B-ref
    remap_rows, refs = results["broadcast"]
    remap_d = {r: c for r, c in remap_rows}
    assert remap_d["r2"] == "r1"
    assert "r3" in remap_d and remap_d["r3"] == "r1"  # min(r1, r3) over rows
    assert remap_d["r9"] == "r3"  # B-payload canonical = min(r3, r9)

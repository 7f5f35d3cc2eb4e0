import pyarrow as pa
import pytest

from brdrq_ray import alignment as al
from brdrq_ray.sources import fixtures as fx


@pytest.fixture(scope="module")
def doc_tables():
    docs = fx.make_documents_table(n_docs=40, nx=12, ny=12, seed=42)
    ref = fx.make_reference_table(nx=12, ny=12, seed=42)
    return docs, ref


def test_explode_geometry_spans(doc_tables):
    from brdrq_ray.pipelines.documents import explode_geometry_spans

    docs, _ = doc_tables
    out = explode_geometry_spans(docs)
    spans = docs.column("spans").combine_chunks()
    n_geo = sum(1 for doc in spans.to_pylist() for s in doc if s["kind"] == "geometry")
    assert out.num_rows == n_geo
    assert out.column("geometry_wkt")[0].as_py().startswith("MULTIPOLYGON")
    # theme_id embeds doc and span index
    assert "#" in out.column("theme_id")[0].as_py()


def test_explode_handles_sliced_list_offsets(doc_tables):
    """A zero-copy table slice has ListArray offsets that do not start at 0
    (the shape Ray block slicing produces); explode and flatten must normalize
    them or every span_idx / doc mapping is skewed by offsets[0]."""
    from brdrq_ray.pipelines.documents import explode_geometry_spans

    docs, _ = doc_tables
    whole = explode_geometry_spans(docs).to_pandas()
    sliced = explode_geometry_spans(docs.slice(7, 20)).to_pandas()
    doc_ids = set(docs.column("doc_id").to_pylist()[7:27])
    expect = whole[whole["doc_id"].isin(doc_ids)].reset_index(drop=True)
    sliced = sliced.reset_index(drop=True)
    assert expect.equals(sliced)


def test_span_sequence_table_sliced(ray_session, doc_tables):
    from brdrq_ray.pipelines.documents import span_sequence_table
    import ray.data

    docs, _ = doc_tables
    whole = (span_sequence_table(ray.data.from_arrow(docs)).to_pandas()
             .sort_values(["doc_id", "span_idx"]).reset_index(drop=True))
    part = (span_sequence_table(ray.data.from_arrow(docs.slice(5, 10))).to_pandas()
            .sort_values(["doc_id", "span_idx"]).reset_index(drop=True))
    ids = set(docs.column("doc_id").to_pylist()[5:15])
    expect = (whole[whole["doc_id"].isin(ids)].reset_index(drop=True))
    assert expect.equals(part)


def test_align_documents_span_invariant(ray_session, doc_tables):
    import ray.data
    from brdrq_ray.pipelines.documents import align_documents, span_sequence_table

    docs, ref = doc_tables
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)
    out = align_documents(ray.data.from_arrow(docs), ray.data.from_arrow(ref), cfg)
    out_tbl = pa.Table.from_pandas(out.to_pandas())
    assert out_tbl.num_rows == docs.num_rows

    # invariant: span sequence equal on (kind, media_ref, offset, order);
    # text equal for non-geometry spans
    before = span_sequence_table(ray.data.from_arrow(docs)).to_pandas()
    after = span_sequence_table(ray.data.from_arrow(out_tbl)).to_pandas()
    key = ["doc_id", "span_idx"]
    b = before.sort_values(key).reset_index(drop=True)
    a = after.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for col in ("doc_id", "span_idx", "kind", "media_ref", "offset"):
        assert (a[col] == b[col]).all(), col
    non_geo = b["kind"] != "geometry"
    assert (a.loc[non_geo, "text"] == b.loc[non_geo, "text"]).all()
    # geometry spans were actually aligned (text changed for most)
    geo = b["kind"] == "geometry"
    changed = (a.loc[geo, "text"] != b.loc[geo, "text"]).mean()
    assert changed > 0.5


def test_align_documents_verification_mode(ray_session, doc_tables):
    import ray.data
    from brdrq_ray.pipelines.documents import align_documents, span_sequence_table

    docs, ref = doc_tables
    out = align_documents(ray.data.from_arrow(docs), ray.data.from_arrow(ref),
                          al.AlignConfig(relevant_distance=2.0), replace_text=False)
    after = span_sequence_table(out).to_pandas()
    before = span_sequence_table(ray.data.from_arrow(docs)).to_pandas()
    key = ["doc_id", "span_idx"]
    a = after.sort_values(key).reset_index(drop=True)
    b = before.sort_values(key).reset_index(drop=True)
    # full byte-equality incl. geometry text in verification mode
    assert a.equals(b)


def test_align_documents_evaluate_best(ray_session, doc_tables):
    import ray.data
    from brdrq_ray.pipelines.documents import align_documents, span_sequence_table

    docs, ref = doc_tables
    cfg = al.AlignConfig(od_strategy=al.OD_EXCLUDE)
    out = align_documents(ray.data.from_arrow(docs), ray.data.from_arrow(ref),
                          cfg, mode="evaluate_best", max_rd=3.0)
    out_tbl = out.to_pandas()
    assert len(out_tbl) == docs.num_rows
    # invariant still holds: non-geometry spans untouched, order preserved
    import pyarrow as pa
    before = span_sequence_table(ray.data.from_arrow(docs)).to_pandas()
    after = span_sequence_table(
        ray.data.from_arrow(pa.Table.from_pandas(out_tbl))).to_pandas()
    key = ["doc_id", "span_idx"]
    b = before.sort_values(key).reset_index(drop=True)
    a = after.sort_values(key).reset_index(drop=True)
    assert (a["kind"] == b["kind"]).all()
    non_geo = b["kind"] != "geometry"
    assert (a.loc[non_geo, "text"] == b.loc[non_geo, "text"]).all()


def test_documents_with_line_spans(ray_session, doc_tables):
    """Geometry spans carrying LINESTRING WKT route through the snap
    processor and stitch back in place."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from brdrq_ray.pipelines.documents import SPAN_TYPE, align_documents

    _, ref = doc_tables
    line_wkt = "LINESTRING (100100 150100, 100140 150100.4, 100180 150099.7)"
    spans = [[{"kind": "text", "text": "before", "media_ref": "", "offset": 0},
              {"kind": "geometry", "text": line_wkt, "media_ref": "", "offset": 6},
              {"kind": "media", "text": "", "media_ref": "m://x", "offset": 60}]]
    docs = pa.table({"doc_id": pa.array(["line-doc"], pa.string()),
                     "spans": pa.array(spans, pa.list_(SPAN_TYPE))})
    out = align_documents(ray.data.from_arrow(docs), ray.data.from_arrow(ref),
                          al.AlignConfig(relevant_distance=1.0)).to_pandas()
    assert len(out) == 1
    got = out.iloc[0]["spans"]
    assert got[0]["text"] == "before"
    assert got[1]["kind"] == "geometry"
    assert got[1]["text"].startswith("MULTILINESTRING")
    assert got[2]["media_ref"] == "m://x"

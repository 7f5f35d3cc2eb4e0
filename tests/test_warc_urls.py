"""WARC/WET crawl ingestion (sources/warc.py) + URL utilities
(functions/urls.py)."""

import gzip
import urllib.parse

import pyarrow as pa
import pytest

import ray.data

from brdrq_ray.functions.urls import (filter_hosts, normalize_url_batch,
                                      normalize_urls, url_dedup,
                                      url_parts_batch)
from brdrq_ray.sources.warc import (_record_bytes, iter_warc_records,
                                    read_warc, read_wet, wet_to_documents,
                                    write_wet_file)

RECS = [
    {"target_uri": "http://a.example/page1", "text": "alpha doc one"},
    {"target_uri": "http://b.example/page2",
     # payload containing CRLFCRLF and a fake version line must not
     # desynchronize the Content-Length-driven walk
     "text": "beta\r\n\r\nWARC/1.0\r\nfake: header"},
    {"target_uri": "http://c.example/page3", "text": "gamma éè"},
]


# ---------------------------------------------------------------------------
# parser / writer
# ---------------------------------------------------------------------------

def test_wet_roundtrip_uncompressed(tmp_path):
    p = str(tmp_path / "f.warc.wet")
    assert write_wet_file(p, RECS) == 3
    recs = list(iter_warc_records(open(p, "rb").read()))
    assert [h["warc-type"] for h, _ in recs] == ["warcinfo"] + ["conversion"] * 3
    for (h, payload), rec in zip(recs[1:], RECS):
        assert h["warc-target-uri"] == rec["target_uri"]
        assert payload.decode() == rec["text"]
        assert int(h["content-length"]) == len(payload)


def test_wet_gzip_members_equivalent(tmp_path):
    """one-gzip-member-per-record (Common Crawl layout) == whole-file gzip
    == uncompressed."""
    paths = [str(tmp_path / n) for n in
             ("a.warc.wet", "b.warc.wet.gz", "c.warc.wet.gz")]
    write_wet_file(paths[0], RECS)
    write_wet_file(paths[1], RECS, member_per_record=True)
    write_wet_file(paths[2], RECS, member_per_record=False)
    texts = [[pl.decode() for h, pl in
              iter_warc_records(
                  gzip.decompress(open(p, "rb").read())
                  if p.endswith(".gz") else open(p, "rb").read())
              if h["warc-type"] == "conversion"]
             for p in paths]
    assert texts[0] == texts[1] == texts[2] == [r["text"] for r in RECS]


def test_parser_rejects_garbage_and_truncation(tmp_path):
    with pytest.raises(ValueError, match="not a WARC record"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    good = _record_bytes([("WARC-Type", "conversion")], b"hello")
    with pytest.raises(ValueError, match="truncated WARC payload"):
        list(iter_warc_records(good[:-9]))
    # record without Content-Length
    bad = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\nhello\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(bad))


def test_read_wet_dataset(ray_session, tmp_path):
    for i in range(3):
        write_wet_file(str(tmp_path / f"seg{i}.warc.wet.gz"),
                       [{"target_uri": f"http://h{i}.example/p{j}",
                         "text": f"doc {i} {j}"} for j in range(4)])
    ds = read_wet(str(tmp_path))
    df = ds.to_pandas().sort_values("target_uri").reset_index(drop=True)
    assert len(df) == 12  # warcinfo preamble dropped by default
    assert set(df["record_type"]) == {"conversion"}
    assert df["target_uri"].iloc[0] == "http://h0.example/p0"
    assert df["text"].iloc[0] == "doc 0 0"
    # record_types=None keeps the warcinfo rows too
    all_ds = read_wet(str(tmp_path), record_types=None)
    assert all_ds.count() == 15


def test_read_wet_invalid_utf8_replaced(ray_session, tmp_path):
    raw = _record_bytes(
        [("WARC-Type", "conversion"), ("WARC-Target-URI", "http://x/y"),
         ("WARC-Record-ID", "urn:uuid:1")], b"ok \xff\xfe bad")
    p = tmp_path / "bad.warc.wet"
    p.write_bytes(raw)
    (row,) = read_wet(str(p)).take_all()
    assert row["text"] == "ok �� bad"


def test_read_warc_binary_payload(ray_session, tmp_path):
    payload = b"\x89PNG\r\n\r\nWARC/1.0\r\n\x00\x01"
    raw = _record_bytes(
        [("WARC-Type", "response"), ("WARC-Target-URI", "http://x/img"),
         ("Content-Type", "image/png"), ("WARC-Record-ID", "urn:uuid:2")],
        payload)
    p = tmp_path / "r.warc"
    p.write_bytes(raw)
    (row,) = read_warc(str(p)).take_all()
    assert bytes(row["payload"]) == payload
    assert row["content_type"] == "image/png"
    assert row["record_type"] == "response"


def test_wet_to_documents_contract(ray_session, tmp_path):
    p = str(tmp_path / "seg.warc.wet.gz")
    write_wet_file(p, RECS)
    docs = wet_to_documents(read_wet(p))
    df = docs.to_pandas()
    assert sorted(df.columns) == ["doc_id", "source", "text"]
    assert df["doc_id"].is_unique
    # deterministic: same file parses to the same ids
    df2 = wet_to_documents(read_wet(p)).to_pandas()
    assert sorted(df["doc_id"]) == sorted(df2["doc_id"])


# ---------------------------------------------------------------------------
# URLs
# ---------------------------------------------------------------------------

def _oracle_normalize(u):
    """Per-row reference: urllib.parse with the same safe-normalization
    rules (lowercase scheme/host, strip fragment, drop default/empty port,
    empty path -> '/')."""
    if u is None:
        return None
    t = u.strip()
    sp = urllib.parse.urlsplit(t)
    if not sp.scheme or "://" not in t or sp.netloc == "":
        return t
    scheme = sp.scheme.lower()
    host = (sp.hostname or "").lower()
    if sp.netloc.count("[") > 0:
        host = "[" + host + "]"  # urlsplit strips IPv6 brackets
    port = sp.port
    defaults = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}
    netloc = host
    if sp.username:
        cred = sp.username + (":" + sp.password if sp.password else "")
        netloc = cred + "@" + netloc
    if port is not None and port != defaults.get(scheme):
        netloc += f":{port}"
    path = sp.path or "/"
    out = f"{scheme}://{netloc}{path}"
    if sp.query:
        out += "?" + sp.query
    return out


URL_CASES = [
    "HTTP://Example.COM:80/a#frag",
    "https://example.com:443/",
    "https://example.com:8443/x?q=1#z",
    "http://example.com",
    "http://example.com?q=1",
    "http://user@EXAMPLE.com:/p",
    "ftp://Host:21/f",
    "not a url",
    "  http://a.b/c  ",
    "http://[2001:DB8::1]:80/x",
    None,
    "http://a/b?z=1&a=2",          # query order preserved
    "wss://Chat.example:443/ws",
    "http://h.example/p/../q",     # path NOT collapsed (unsafe)
]


def test_normalize_matches_urllib_oracle():
    t = pa.table({"url": pa.array(URL_CASES, pa.string())})
    got = normalize_url_batch(t).column("url_norm").to_pylist()
    want = [_oracle_normalize(u) for u in URL_CASES]
    assert got == want


def test_url_parts_batch():
    t = pa.table({"url": pa.array(
        ["https://A.B:8443/x?q=1", "nope"], pa.string())})
    out = url_parts_batch(t)
    assert out.column("url_scheme").to_pylist() == ["https", None]
    assert out.column("url_host").to_pylist() == ["a.b", None]
    assert out.column("url_port").to_pylist() == ["8443", None]
    assert out.column("url_path").to_pylist() == ["/x?q=1", None]


def test_filter_hosts_block_and_allow(ray_session):
    rows = [{"doc_id": i, "url": u} for i, u in enumerate(
        ["http://SPAM.example/x", "http://good.example/y",
         "not a url", "https://spam.example:443/z"])]
    ds = ray.data.from_items(rows)
    blocked = filter_hosts(ds, ["spam.example"], mode="block").to_pandas()
    assert sorted(blocked["doc_id"]) == [1, 2]  # non-URL kept under block
    allowed = filter_hosts(ds, ["SPAM.example"], mode="allow").to_pandas()
    assert sorted(allowed["doc_id"]) == [0, 3]  # non-URL dropped under allow
    with pytest.raises(ValueError):
        filter_hosts(ds, ["x"], mode="nope")


def test_url_dedup_partition_invariant(ray_session):
    variants = ["HTTP://Example.COM:80/a#f1", "http://example.com/a",
                "http://example.com:80/a", "http://example.com/a#zzz"]
    rows = ([{"doc_id": f"d{i:02d}", "url": u}
             for i, u in enumerate(variants)] +
            [{"doc_id": "d90", "url": "http://other.example/b"}])
    for parts in (1, 4):
        ds = ray.data.from_items(rows).repartition(parts)
        out = url_dedup(ds, col="url", id_col="doc_id").to_pandas()
        assert sorted(out["doc_id"]) == ["d00", "d90"]  # min id wins
        assert "__url_norm" not in out.columns


def test_wet_curation_e2e(ray_session, tmp_path):
    """crawl file -> documents -> normalize/dedup by URL: the ingestion
    path composes with the dedup family."""
    recs = ([{"target_uri": "http://Dup.example:80/p", "text": "same page"}] +
            [{"target_uri": "http://dup.example/p", "text": "same page"}] +
            [{"target_uri": f"http://u{i}.example/p", "text": f"unique {i}"}
             for i in range(5)])
    p = str(tmp_path / "seg.warc.wet.gz")
    write_wet_file(p, recs)
    docs = wet_to_documents(read_wet(p))
    docs = normalize_urls(docs, col="source", out_col="url_norm")
    kept = url_dedup(docs, col="source", id_col="doc_id")
    assert kept.count() == 6  # the two Dup.example fetches collapse


def test_wet_to_curation_e2e_smoke(ray_session, tmp_path):
    """Composed crawl path (the BASELINE.md probe shape at toy scale):
    read_wet -> wet_to_documents -> url_dedup -> curate_documents runs
    file-parallel end-to-end; exact URL duplicates collapse to one doc and
    survivors carry the documents-table contract."""
    import numpy as np
    from brdrq_ray.functions.urls import url_dedup
    from brdrq_ray.pipelines.curation import CurationConfig, curate_documents

    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(200)]
    paths = []
    for fi in range(3):
        recs = []
        for d in range(40):
            text = " ".join(rng.choice(vocab, size=60))
            uri = ("https://shared.example.com/dup" if d < 5
                   else f"https://s{fi}.example.com/p/{d}?utm_source=x")
            recs.append({"target_uri": uri, "text": text})
        p = str(tmp_path / f"c{fi}.wet")
        write_wet_file(p, recs)
        paths.append(p)

    docs = wet_to_documents(read_wet(paths))
    assert docs.count() == 120
    deduped = url_dedup(docs, col="source")
    ddf = deduped.to_pandas()
    # 15 rows shared one URL -> exactly 1 survives; utm param stripped rows
    # stay distinct per path
    assert (ddf["source"] == "https://shared.example.com/dup").sum() == 1
    assert len(ddf) == 120 - 14
    kept = curate_documents(deduped, CurationConfig(quality_min=0.0,
                                                    jaccard_threshold=0.5))
    kdf = kept.to_pandas()
    assert {"doc_id", "text", "source"} <= set(kdf.columns)
    assert 0 < len(kdf) <= len(ddf)

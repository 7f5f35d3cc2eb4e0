"""WARC / WET web-crawl ingestion (ISO 28500) — the canonical shape a
100 TB pretraining corpus actually arrives in (Common Crawl publishes
~1 GB ``*.warc.gz`` / ``*.warc.wet.gz`` segment files; the WET variant's
``conversion`` records carry extracted plaintext).

Scale shape
-----------
WARC is NOT splittable mid-file without an external CDX index: records are
length-prefixed and (in Common Crawl) each record is its own gzip member,
so the only safe parallel unit is the FILE. That matches the corpus layout:
a crawl is tens of thousands of ~1 GB segment files, so file-level
parallelism saturates any cluster. The reader is
``ray.data.read_binary_files`` (one file -> one block, streamed by Ray's
executor with backpressure) followed by a stateless ``map_batches`` parse
that decompresses + walks the record stream ONCE per file and emits an
Arrow table — payload bytes never cross the wire twice, and files the
format sniffer rejects fail loudly rather than silently dropping data.

The parser is pure bytes plumbing (headers are ASCII per spec; bodies are
``bytes`` for WARC, UTF-8-with-replacement text for WET), deterministic,
and covered by a writer used to synthesize spec-correct fixtures — the
same no-network analog contract as the GRB/OSM loaders
(sources/loaders.py).

No reference counterpart (the reference ingests GIS layers through QGIS
providers); this is the training-data-engine half of the scope, upstream
of the curation pipeline (pipelines/curation.py).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os

import pyarrow as pa
import ray.data

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

# Fixed epoch for deterministic fixture writing (no wall-clock in tests).
_FIXED_DATE = "2024-01-01T00:00:00Z"


# ---------------------------------------------------------------------------
# record-stream parser (pure bytes -> dicts)
# ---------------------------------------------------------------------------

def _maybe_gunzip(data: bytes) -> bytes:
    """Decompress if gzip (multi-member streams — the Common Crawl layout of
    one member per record — concatenate transparently)."""
    if data[:2] == _GZIP_MAGIC:
        # gzip.decompress handles multi-member streams; GzipFile fallback is
        # unnecessary on the supported Python versions.
        return gzip.decompress(data)
    return data


def iter_warc_records(data: bytes, *, path: str = "<bytes>"):
    """Walk a (decompressed) WARC byte stream, yielding
    ``(headers: dict[str, str], payload: bytes)`` per record.

    Header names are lower-cased (the spec says field names are
    case-insensitive); the version line is validated; records are advanced
    by the mandatory ``Content-Length`` so payloads containing blank lines
    or ``WARC/``-looking bytes can never desynchronize the walk.
    """
    pos, n = 0, len(data)
    while pos < n:
        # Tolerate any run of record-separator CRLFs (spec: exactly two).
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        eol = data.find(_CRLF, pos)
        if eol < 0 or not data.startswith(b"WARC/", pos):
            raise ValueError(
                f"{path}: not a WARC record at byte {pos} "
                f"(expected a 'WARC/x.y' version line)")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError(f"{path}: truncated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line ends the header block
            key, sep, val = line.partition(b":")
            if not sep:
                raise ValueError(
                    f"{path}: malformed WARC header line {line!r}")
            headers[key.strip().lower().decode("ascii")] = (
                val.strip().decode("utf-8", "replace"))
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"{path}: WARC record missing a valid Content-Length")
        if pos + length > n:
            raise ValueError(
                f"{path}: truncated WARC payload (need {length} bytes "
                f"at {pos}, have {n - pos})")
        yield headers, data[pos:pos + length]
        pos += length


_WET_COLUMNS = ("record_id", "record_type", "target_uri", "warc_date",
                "text")
_WARC_COLUMNS = ("record_id", "record_type", "target_uri", "warc_date",
                 "content_type", "payload")


def _parse_file(raw: bytes, path: str, record_types, *, text_mode: bool):
    """One file -> column lists (shared by the WET and WARC readers)."""
    cols: dict[str, list] = {
        "record_id": [], "record_type": [], "target_uri": [],
        "warc_date": [],
    }
    bodies: list = []
    ctypes: list = []
    for headers, payload in iter_warc_records(_maybe_gunzip(raw),
                                              path=path):
        rtype = headers.get("warc-type", "")
        if record_types is not None and rtype not in record_types:
            continue
        cols["record_id"].append(headers.get("warc-record-id", ""))
        cols["record_type"].append(rtype)
        cols["target_uri"].append(headers.get("warc-target-uri", ""))
        cols["warc_date"].append(headers.get("warc-date", ""))
        if text_mode:
            bodies.append(payload.decode("utf-8", "replace"))
        else:
            bodies.append(payload)
            ctypes.append(headers.get("content-type", ""))
    return cols, bodies, ctypes


def read_wet(paths, *, record_types=("conversion",),
             include_path: bool = False, **read_kwargs) -> ray.data.Dataset:
    """Read WET (extracted-text WARC) files into a Dataset with columns
    ``(record_id, record_type, target_uri, warc_date, text)`` — one row per
    kept record, ``text`` UTF-8-decoded with replacement.

    ``record_types`` filters at the parse (default: only ``conversion``
    records — the plaintext payloads; the per-file ``warcinfo`` preamble is
    dropped). ``record_types=None`` keeps everything.
    File-level parallelism; see the module docstring for why.
    """
    rts = None if record_types is None else frozenset(record_types)

    def parse(batch: pa.Table) -> pa.Table:
        out = {c: [] for c in _WET_COLUMNS}
        out_paths: list[str] = []
        for raw, path in zip(batch.column("bytes").to_pylist(),
                             batch.column("path").to_pylist()):
            cols, texts, _ = _parse_file(raw, path, rts, text_mode=True)
            for c in cols:
                out[c].extend(cols[c])
            out["text"].extend(texts)
            if include_path:
                out_paths.extend([path] * len(texts))
        arrays = {c: pa.array(out[c], pa.string()) for c in _WET_COLUMNS}
        if include_path:
            arrays["path"] = pa.array(out_paths, pa.string())
        return pa.table(arrays)

    ds = ray.data.read_binary_files(paths, include_paths=True,
                                    **read_kwargs)
    return ds.map_batches(parse, batch_format="pyarrow")


def read_warc(paths, *, record_types=None,
              **read_kwargs) -> ray.data.Dataset:
    """Read raw WARC files into a Dataset with columns ``(record_id,
    record_type, target_uri, warc_date, content_type, payload)`` — payload
    stays ``binary`` (response bodies may be HTML, images, anything), the
    same opaque-binary contract as the media columns
    (functions/multimodal.py)."""
    rts = None if record_types is None else frozenset(record_types)

    def parse(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {c: [] for c in _WARC_COLUMNS}
        for raw, path in zip(batch.column("bytes").to_pylist(),
                             batch.column("path").to_pylist()):
            cols, bodies, ctypes = _parse_file(raw, path, rts,
                                               text_mode=False)
            for c in cols:
                out[c].extend(cols[c])
            out["payload"].extend(bodies)
            out["content_type"].extend(ctypes)
        return pa.table({
            "record_id": pa.array(out["record_id"], pa.string()),
            "record_type": pa.array(out["record_type"], pa.string()),
            "target_uri": pa.array(out["target_uri"], pa.string()),
            "warc_date": pa.array(out["warc_date"], pa.string()),
            "content_type": pa.array(out["content_type"], pa.string()),
            "payload": pa.array(out["payload"], pa.binary()),
        })

    ds = ray.data.read_binary_files(paths, include_paths=True,
                                    **read_kwargs)
    return ds.map_batches(parse, batch_format="pyarrow")


def wet_to_documents(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Project a ``read_wet`` Dataset onto the engine's ``documents`` table
    contract (doc_id, text, source) so the curation pipeline can run
    directly on crawl output. ``doc_id`` is the md5 of (record_id,
    target_uri) — deterministic, collision-safe across segment files, and a
    string id (the dedup family's north-rule id type)."""

    def project(batch: pa.Table) -> pa.Table:
        rid = batch.column("record_id").to_pylist()
        uri = batch.column("target_uri").to_pylist()
        ids = [hashlib.md5(f"{r}|{u}".encode()).hexdigest()
               for r, u in zip(rid, uri)]
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "text": batch.column("text"),
            "source": batch.column("target_uri"),
        })

    return ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# writer (fixtures + interchange; spec-correct output)
# ---------------------------------------------------------------------------

def _record_bytes(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    buf = io.BytesIO()
    buf.write(b"WARC/1.0\r\n")
    for k, v in headers:
        buf.write(f"{k}: {v}\r\n".encode())
    buf.write(f"Content-Length: {len(payload)}\r\n".encode())
    buf.write(_CRLF)
    buf.write(payload)
    buf.write(_CRLF + _CRLF)
    return buf.getvalue()


def write_wet_file(path: str, records, *, compress: bool | None = None,
                   member_per_record: bool = True,
                   date: str = _FIXED_DATE) -> int:
    """Write ``records`` (dicts with ``target_uri`` + ``text``, optional
    ``record_id`` / ``warc_date``) as one spec-correct WET file: a
    ``warcinfo`` preamble record then one ``conversion`` record per input.

    ``compress`` defaults on iff ``path`` ends in ``.gz``;
    ``member_per_record=True`` writes one gzip member per record (the
    Common Crawl layout — exercises the multi-member decompress path).
    Deterministic: record ids default to ``urn:uuid:<md5(uri|text)>`` and
    dates to a fixed epoch, so fixtures are content-addressed, not
    wall-clock-stamped. Returns the record count written (excluding the
    warcinfo preamble).
    """
    if compress is None:
        compress = path.endswith(".gz")
    chunks: list[bytes] = []
    info_payload = b"software: brdrq_ray-warc-writer\r\n"
    chunks.append(_record_bytes(
        [("WARC-Type", "warcinfo"), ("WARC-Date", date),
         ("WARC-Record-ID",
          f"urn:uuid:{hashlib.md5(os.path.basename(path).encode()).hexdigest()}"),
         ("Content-Type", "application/warc-fields")],
        info_payload))
    n = 0
    for rec in records:
        payload = rec["text"].encode("utf-8")
        uri = rec["target_uri"]
        rid = rec.get("record_id") or (
            "urn:uuid:" +
            hashlib.md5(uri.encode() + b"|" + payload).hexdigest())
        chunks.append(_record_bytes(
            [("WARC-Type", "conversion"),
             ("WARC-Target-URI", uri),
             ("WARC-Date", rec.get("warc_date", date)),
             ("WARC-Record-ID", rid),
             ("Content-Type", "text/plain")],
            payload))
        n += 1
    with open(path, "wb") as f:
        if not compress:
            for c in chunks:
                f.write(c)
        elif member_per_record:
            for c in chunks:
                f.write(gzip.compress(c, mtime=0))
        else:
            f.write(gzip.compress(b"".join(chunks), mtime=0))
    return n

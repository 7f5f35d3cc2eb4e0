"""URL utilities for crawl curation — vectorized (pyarrow RE2/C++ string
kernels, no per-row Python in any hot path).

Web-crawl dedup starts at the URL long before any text hashing: the same
page is fetched under `HTTP://Example.COM:80/a#frag` and
`http://example.com/a`, and host-level allow/block lists are the first
quality gate every published pipeline applies (C4, RefinedWeb, Dolma).
The normalizations here are the RFC 3986 §6.2.2-6.2.3 SAFE set only —
case of scheme/host, default ports, empty path, fragment — never
query-parameter reordering or path collapsing (those change semantics on
real sites and no major pipeline applies them blindly).

Scale shape: every function is a stateless ``map_batches`` kernel (a few
RE2 passes per batch); ``filter_hosts`` ships the host set ONCE via
``ray.put`` and probes with one hash-set kernel (``pc.is_in``) per batch;
``url_dedup`` reuses the combiner-first hash-bucketed exact-dedup shuffle
(functions/dedup.py) on the normalized key — URLs shuffle, payloads don't
move until the winner set is known.

No reference counterpart (QGIS layers have no URLs); engine addition in
the training-data family.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# scheme "://" authority [rest]; rest (path/query) starts with / or ?.
_URL_RE = (r'^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://'
           r'(?P<auth>[^/?#]*)(?P<rest>[/?#].*)?$')
# authority = [userinfo@] host [:port]; host may be a bracketed IPv6.
_AUTH_RE = (r'^(?:(?P<user>[^@]*)@)?'
            r'(?P<host>\[[^\]]*\]|[^:\[@]*)(?::(?P<port>[0-9]*))?$')

_DEFAULT_PORTS = (("http", "80"), ("https", "443"), ("ftp", "21"),
                  ("ws", "80"), ("wss", "443"))


def _join(*parts):
    """Element-wise concat with nulls treated as ''."""
    return pc.binary_join_element_wise(
        *parts, "", null_handling="replace", null_replacement="")


def _parse_cols(arr: pa.ChunkedArray | pa.Array):
    """One RE2 pass for the URL split + one for the authority split.
    Returns (scheme, user, host, port, rest) — all string arrays, null
    where the row is not a parseable absolute URL."""
    arr = pc.utf8_trim_whitespace(arr)
    nofrag = pc.replace_substring_regex(arr, r"#.*$", "")
    m = pc.extract_regex(nofrag, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    auth = pc.struct_field(m, "auth")
    rest = pc.struct_field(m, "rest")
    am = pc.extract_regex(auth, _AUTH_RE)
    user = pc.struct_field(am, "user")
    host = pc.utf8_lower(pc.struct_field(am, "host"))
    port = pc.struct_field(am, "port")
    return scheme, user, host, port, rest


def url_parts_batch(batch: pa.Table, col: str = "url",
                    prefix: str = "url_") -> pa.Table:
    """Append ``{prefix}scheme/host/port/path`` columns (null where the row
    is not an absolute URL). ``host`` is lower-cased; ``path`` is the raw
    path+query remainder."""
    scheme, user, host, port, rest = _parse_cols(batch.column(col))
    del user
    for name, arr in (("scheme", scheme), ("host", host),
                      ("port", port), ("path", rest)):
        batch = batch.append_column(prefix + name, arr)
    return batch


def normalize_url_batch(batch: pa.Table, col: str = "url",
                        out_col: str = "url_norm") -> pa.Table:
    """Append ``out_col`` = the safe-normalized URL: scheme+host
    lower-cased, fragment stripped, default port dropped, empty port colon
    dropped, empty path -> ``/``. Query strings and path segments are
    preserved byte-for-byte. Non-URL rows (no ``scheme://``) pass through
    trimmed-but-unchanged; null stays null."""
    arr = batch.column(col)
    trimmed = pc.utf8_trim_whitespace(arr)
    scheme, user, host, port, rest = _parse_cols(arr)

    drop_port = pc.equal(port, "")
    for sch, dport in _DEFAULT_PORTS:
        drop_port = pc.or_kleene(
            drop_port,
            pc.and_kleene(pc.equal(scheme, sch), pc.equal(port, dport)))
    port_part = pc.if_else(
        pc.and_kleene(pc.is_valid(port),
                      pc.if_else(pc.is_valid(drop_port), drop_port, False)),
        pa.scalar("", pa.string()), _join(":", port))
    port_part = pc.if_else(pc.is_valid(port), port_part,
                           pa.scalar("", pa.string()))

    # non-participating RE2 groups extract as "" (not null): an absent
    # userinfo and a degenerate empty one ("http://@h/") both drop the "@".
    has_user = pc.fill_null(pc.not_equal(user, ""), False)
    user_part = pc.if_else(has_user, _join(user, "@"),
                           pa.scalar("", pa.string()))
    # empty path -> "/"; a bare query keeps its "?" after the inserted "/"
    rest_filled = pc.if_else(pc.is_valid(rest), rest,
                             pa.scalar("/", pa.string()))
    rest_filled = pc.if_else(pc.equal(rest_filled, ""),
                             pa.scalar("/", pa.string()), rest_filled)
    rest_filled = pc.if_else(
        pc.starts_with(rest_filled, pattern="?"), _join("/", rest_filled),
        rest_filled)

    rebuilt = _join(scheme, "://", user_part, host, port_part, rest_filled)
    # A parseable scheme with an unparseable authority (stray '[' etc.) is
    # junk — pass it through rather than rebuild around a null host.
    ok = pc.and_kleene(pc.is_valid(scheme), pc.is_valid(host))
    out = pc.if_else(pc.fill_null(ok, False), rebuilt, trimmed)
    return batch.append_column(out_col, out)


def normalize_urls(ds: ray.data.Dataset, col: str = "url",
                   out_col: str = "url_norm") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: normalize_url_batch(b, col=col, out_col=out_col),
        batch_format="pyarrow")


def filter_hosts(ds: ray.data.Dataset, hosts, col: str = "url",
                 mode: str = "block") -> ray.data.Dataset:
    """Keep rows whose URL host is (mode='allow') / is NOT (mode='block')
    in ``hosts``. The host set ships ONCE as an Arrow array via ``ray.put``
    (broadcast, not per-batch pickling) and each batch pays one lower-case
    + one ``pc.is_in`` hash probe. Rows that are not absolute URLs have a
    null host: kept under 'block' (no evidence against them), dropped
    under 'allow' (no evidence for them) — both via kleene null handling.
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    host_set = pa.array(sorted({h.strip().lower() for h in hosts}),
                        pa.string())
    ref = ray.put(host_set)

    def keep(batch: pa.Table) -> pa.Table:
        value_set = ray.get(ref)
        _, _, host, _, _ = _parse_cols(batch.column(col))
        hit = pc.is_in(host, value_set=value_set)
        if mode == "block":
            mask = pc.fill_null(pc.invert(hit), True)
        else:
            mask = pc.fill_null(hit, False)
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def url_dedup(ds: ray.data.Dataset, col: str = "url",
              id_col: str = "doc_id",
              n_buckets: int = 256) -> ray.data.Dataset:
    """Exact URL dedup: safe-normalize, then the combiner-first
    hash-bucketed exact-dedup shuffle on the normalized key (minimal
    ``id_col`` wins per group — deterministic under any partitioning).
    The normalized column is internal and dropped from the output."""
    from brdrq_ray.functions.dedup import exact_dedup

    tmp = "__url_norm"
    out = exact_dedup(normalize_urls(ds, col=col, out_col=tmp),
                      col=tmp, id_col=id_col, n_buckets=n_buckets)
    return out.drop_columns([tmp])

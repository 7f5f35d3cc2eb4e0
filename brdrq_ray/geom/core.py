"""Core geometry representation and scalar kernels (pure numpy, no GEOS).

The reference engine (brdrQ) delegates all geometry to shapely/GEOS; geometries
cross its QGIS<->shapely boundary as WKT strings with ``make_valid`` applied on
both directions (reference: plugin/brdrq/brdrq_utils.py:448-479).  This sandbox
has no shapely, so we define our own representation and kernels:

* **Interchange**: WKT strings at the edges (ingest / egress only), matching the
  reference's convention (reference: plugin/brdrq/brdrq_utils.py:471-479).
* **Internal**: a packed little-endian binary layout stored in Arrow ``binary``
  columns (``geom`` in our tables), parsed into plain Python structures of
  numpy arrays for the kernels:

      geometry  = (kind, parts)
      kind      = GEOM_POLYGON | GEOM_LINESTRING | GEOM_POINT  (always "multi")
      parts     = [part, ...]
      part      = [ring, ...]          # polygons: ring 0 = shell (CCW),
                                       #           rings 1.. = holes (CW)
                  for lines/points a part has exactly one "ring" (the coords)
      ring      = float64 ndarray of shape (n, 2), NOT closed (last != first)

Coordinates are snapped to a 1e-6 grid (micrometer at meter units) at ingest so
that equality/stitching decisions are stable (SURVEY.md section 7.0.1:
"fixed-precision coordinates").  Z/M dimensions are dropped at parse time,
mirroring the reference's ``dropmzvalues`` step (reference:
plugin/brdrq/brdrq_utils.py:1556-1568).
"""

from __future__ import annotations

import math
import re
import struct

import numpy as np

GEOM_POLYGON = 1
GEOM_LINESTRING = 2
GEOM_POINT = 3

KIND_NAMES = {GEOM_POLYGON: "MultiPolygon", GEOM_LINESTRING: "MultiLineString", GEOM_POINT: "MultiPoint"}

#: snap grid for coordinates (1 micrometer with meter units)
SNAP = 1e-6
_INV_SNAP = 1e6


def snap(a: np.ndarray) -> np.ndarray:
    """Snap coordinates to the fixed 1e-6 grid (round-half-even via np.round)."""
    return np.round(np.asarray(a, dtype=np.float64) * _INV_SNAP) / _INV_SNAP


# ---------------------------------------------------------------------------
# packed binary codec
# ---------------------------------------------------------------------------

def pack_geom(kind: int, parts) -> bytes:
    """Pack (kind, parts) into the engine's binary layout.

    Layout: u8 kind, u32 n_parts, then per part u32 n_rings, then per ring
    u32 n_points followed by n_points * 2 float64 (x, y interleaved).
    """
    out = [struct.pack("<BI", kind, len(parts))]
    for part in parts:
        out.append(struct.pack("<I", len(part)))
        for ring in part:
            ring = np.ascontiguousarray(ring, dtype=np.float64)
            out.append(struct.pack("<I", ring.shape[0]))
            out.append(ring.tobytes())
    return b"".join(out)


def unpack_geom(buf: bytes):
    """Inverse of :func:`pack_geom`. Returns (kind, parts)."""
    kind = buf[0]
    n_parts = struct.unpack_from("<I", buf, 1)[0]
    off = 5
    parts = []
    for _ in range(n_parts):
        n_rings = struct.unpack_from("<I", buf, off)[0]
        off += 4
        rings = []
        for _ in range(n_rings):
            n_pts = struct.unpack_from("<I", buf, off)[0]
            off += 4
            ring = np.frombuffer(buf, dtype=np.float64, count=n_pts * 2, offset=off).reshape(n_pts, 2)
            off += n_pts * 16
            rings.append(ring)
        parts.append(rings)
    return kind, parts


EMPTY_POLYGON = pack_geom(GEOM_POLYGON, [])


class FlatGeoms:
    """Batch-unpacked geometry blobs: ONE concatenated coordinate array plus
    ring/part structure arrays (the egress-sink shape — vectorized metrics
    over ``coords``, per-ring formatting via views).

    Attributes:
        kinds:       int8[n_rows], -1 for null blobs
        coords:      (P, 2) float64 — every ring's points, row-major order
        ring_pts:    int64[R] points per ring
        ring_row:    int64[R] owning row per ring (nondecreasing)
        part_row:    int64[K] owning row per part (nondecreasing)
        part_nrings: int64[K] rings per part
    """

    __slots__ = ("kinds", "coords", "ring_pts", "ring_row",
                 "part_row", "part_nrings")

    def __init__(self, kinds, coords, ring_pts, ring_row,
                 part_row, part_nrings):
        self.kinds = kinds
        self.coords = coords
        self.ring_pts = ring_pts
        self.ring_row = ring_row
        self.part_row = part_row
        self.part_nrings = part_nrings

    def __len__(self):
        return len(self.kinds)


def _blob_views(col):
    """(views, n): per-row memoryview|None over a pyarrow binary column's
    single data buffer — zero-copy, no per-row Python bytes objects."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    import pyarrow as pa
    if isinstance(arr, pa.ChunkedArray):  # combine_chunks may stay chunked
        if arr.num_chunks == 1:
            arr = arr.chunk(0)
        elif arr.num_chunks == 0:
            arr = pa.array([], pa.binary())
        else:
            arr = pa.concat_arrays(arr.chunks)
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    validity, off_buf, data_buf = arr.buffers()
    offs = np.frombuffer(off_buf, dtype=off_dtype)[
        arr.offset:arr.offset + len(arr) + 1]
    data = memoryview(data_buf)
    if validity is None:
        return [data[offs[i]:offs[i + 1]] for i in range(len(arr))], len(arr)
    vbits = np.frombuffer(validity, np.uint8)
    vi = np.arange(arr.offset, arr.offset + len(arr))
    valid = (vbits[vi >> 3] >> (vi & 7).astype(np.uint8)) & 1
    return [data[offs[i]:offs[i + 1]] if valid[i] else None
            for i in range(len(arr))], len(arr)


def unpack_geoms_flat(bufs) -> FlatGeoms:
    """Unpack a BATCH of packed blobs in one pass (list of bytes|None, or a
    pyarrow binary Array/ChunkedArray — zero-copy views in the latter case).

    The header walk is per-ring Python (data-dependent offsets), but the
    coordinate payloads are gathered as buffer slices and decoded with ONE
    np.frombuffer — no per-ring numpy calls, no per-row parts lists.
    """
    if not isinstance(bufs, (list, tuple)):
        bufs, n = _blob_views(bufs)
    else:
        n = len(bufs)
    kinds = np.full(n, -1, np.int8)
    ring_pts: list[int] = []
    ring_row: list[int] = []
    part_row: list[int] = []
    part_nrings: list[int] = []
    chunks: list = []
    unpack_from = struct.unpack_from
    for i, buf in enumerate(bufs):
        if buf is None:
            continue
        kinds[i] = buf[0]
        n_parts = unpack_from("<I", buf, 1)[0]
        off = 5
        for _ in range(n_parts):
            n_rings = unpack_from("<I", buf, off)[0]
            off += 4
            part_row.append(i)
            part_nrings.append(n_rings)
            for _ in range(n_rings):
                npts = unpack_from("<I", buf, off)[0]
                off += 4
                nb = npts * 16
                chunks.append(buf[off:off + nb])
                off += nb
                ring_pts.append(npts)
                ring_row.append(i)
    coords = np.frombuffer(b"".join(chunks), np.float64).reshape(-1, 2) \
        if chunks else np.empty((0, 2), np.float64)
    return FlatGeoms(kinds, coords,
                     np.asarray(ring_pts, np.int64),
                     np.asarray(ring_row, np.int64),
                     np.asarray(part_row, np.int64),
                     np.asarray(part_nrings, np.int64))


def flat_perimeters(fg: FlatGeoms) -> np.ndarray:
    """Per-row perimeter (polygons closed, lines open, points 0) in ONE
    vectorized reduction over the concatenated coordinate array.

    Summation order differs from :func:`geom_perimeter` (bincount folds vs
    numpy pairwise sums), so values may differ in the last ulp — callers
    needing bit-parity with the per-row kernel (none today: the egress sinks
    only test ``!= 0``, which is order-independent for non-negative terms)
    should stay on geom_perimeter."""
    n = len(fg)
    R = len(fg.ring_pts)
    if R == 0 or len(fg.coords) == 0:
        return np.zeros(n, np.float64)
    bounds = np.concatenate([[0], np.cumsum(fg.ring_pts)])
    pt_ring = np.repeat(np.arange(R), fg.ring_pts)
    d = fg.coords[1:] - fg.coords[:-1]
    seglen = np.hypot(d[:, 0], d[:, 1])
    same = pt_ring[:-1] == pt_ring[1:]
    ring_len = np.bincount(pt_ring[:-1][same], weights=seglen[same],
                           minlength=R)
    ring_kind = fg.kinds[fg.ring_row]
    starts, ends = bounds[:-1], bounds[1:] - 1
    closev = fg.coords[starts % len(fg.coords)] - fg.coords[ends]
    close_len = np.hypot(closev[:, 0], closev[:, 1])
    closed = (ring_kind == GEOM_POLYGON) & (fg.ring_pts >= 2)
    ring_len = np.where(ring_kind == GEOM_POINT, 0.0,
                        ring_len + np.where(closed, close_len, 0.0))
    return np.bincount(fg.ring_row, weights=ring_len, minlength=n)


_WKT_CHUNK = 1 << 16
_WKT_CHUNK_FMT = "%.6f %.6f, " * _WKT_CHUNK


def flat_wkts(fg: FlatGeoms) -> list:
    """Batch WKT emission: format ALL coordinate pairs of the batch with
    chunked printf calls, strip trailing zeros ONCE per chunk (not per
    geometry), then assemble per-geometry strings from the token list.
    Bit-identical to ``to_wkt`` per row (fuzz-pinned in test_geom_core):
    every token is '%.6f %.6f'-formatted and zero-stripped exactly as the
    per-row path would format it, and assembly mirrors to_wkt's part/ring
    punctuation (incl. closing polygon rings by repeating the first token).
    None for null blobs."""
    flat = fg.coords.ravel()
    P = len(fg.coords)
    toks: list = []
    for s0 in range(0, P, _WKT_CHUNK):
        n = min(_WKT_CHUNK, P - s0)
        fmt = _WKT_CHUNK_FMT if n == _WKT_CHUNK else "%.6f %.6f, " * n
        # trailing ", " kept so every number is followed by a delimiter for
        # the strip regexes; dropped by the final [:-1] after split
        s = fmt % tuple(flat[2 * s0:2 * (s0 + n)].tolist())
        s = _STRIP_ZEROS.sub("", s)
        if "-0 " in s or "-0," in s:
            s = _NEG_ZERO.sub("0", s)
        toks.extend(s.split(", ")[:-1])
    bounds = np.concatenate([[0], np.cumsum(fg.ring_pts)]).tolist()
    part_row = fg.part_row.tolist()
    part_nrings = fg.part_nrings.tolist()
    kinds = fg.kinds.tolist()
    K = len(part_row)
    out: list = []
    pi = 0
    ri = 0
    for i in range(len(fg)):
        k = kinds[i]
        if k < 0:
            out.append(None)
            continue
        parts_txt = []
        while pi < K and part_row[pi] == i:
            nr = part_nrings[pi]
            if k == GEOM_POLYGON:
                rings_txt = []
                for r in range(ri, ri + nr):
                    b0, b1 = bounds[r], bounds[r + 1]
                    if b1 == b0:
                        rings_txt.append("()")
                    else:
                        seq = toks[b0:b1]
                        seq.append(toks[b0])  # close the ring
                        rings_txt.append("(" + ", ".join(seq) + ")")
                parts_txt.append("(" + ", ".join(rings_txt) + ")")
            elif k == GEOM_LINESTRING:
                # to_wkt emits only ring 0 of a line part
                b0, b1 = bounds[ri], bounds[ri + 1]
                parts_txt.append("(" + ", ".join(toks[b0:b1]) + ")")
            else:
                # to_wkt emits only the first point of a point part
                parts_txt.append("(" + toks[bounds[ri]] + ")")
            ri += nr
            pi += 1
        if not parts_txt:
            out.append(f"{KIND_NAMES[k].upper()} EMPTY")
        else:
            out.append(
                f"{KIND_NAMES[k].upper()} ({', '.join(parts_txt)})")
    return out


def iter_flat_geoms(fg: FlatGeoms):
    """Yield (kind, parts) per row — ring arrays are VIEWS into fg.coords
    (zero-copy); None for null blobs. Feeds per-row kernels (to_wkt,
    simplify) after a batch unpack."""
    bounds = np.concatenate([[0], np.cumsum(fg.ring_pts)])
    part_row = fg.part_row
    part_nrings = fg.part_nrings
    coords = fg.coords
    K = len(part_row)
    pi = 0
    ri = 0
    for i in range(len(fg)):
        k = fg.kinds[i]
        if k < 0:
            yield None
            continue
        parts = []
        while pi < K and part_row[pi] == i:
            nr = int(part_nrings[pi])
            parts.append([coords[bounds[r]:bounds[r + 1]]
                          for r in range(ri, ri + nr)])
            ri += nr
            pi += 1
        yield int(k), parts


# ---------------------------------------------------------------------------
# WKT codec
# ---------------------------------------------------------------------------

_NUM = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")


def _parse_coord_seq(text: str) -> np.ndarray:
    """Parse 'x y[ z[ m]], x y, ...' into an (n, 2) array, dropping Z/M.

    Fast path: whitespace-split the whole sequence at once (the ingest parse
    is a universal hot stage; per-token regex costs ~3x more)."""
    n_pts = text.count(",") + 1
    try:
        arr = np.array(text.replace(",", " ").split(), dtype=np.float64)
    except ValueError as exc:
        raise ValueError(f"bad coordinate sequence: {text[:60]!r}") from exc
    if n_pts == 0 or len(arr) % n_pts != 0:
        raise ValueError(f"ragged coordinate sequence: {text[:60]!r}")
    dims = len(arr) // n_pts
    if dims < 2:
        raise ValueError(f"bad coordinate tuple in: {text[:60]!r}")
    return snap(arr.reshape(n_pts, dims)[:, :2])


def _split_groups(body: str):
    """Split a parenthesized body into top-level '(...)' groups."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def _dedupe_ring(ring: np.ndarray) -> np.ndarray:
    """Drop the closing point and consecutive duplicates."""
    if len(ring) >= 2 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    if len(ring) == 0:
        return ring
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = np.any(ring[1:] != ring[:-1], axis=1)
    ring = ring[keep]
    # also drop a trailing point equal to the first after dedupe
    if len(ring) >= 2 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    return ring


def parse_wkt(wkt: str):
    """Parse WKT into (kind, parts). Promotes single to Multi (reference:
    featurecollection_to_multi, plugin/brdrq/brdrq_utils.py:935-961).
    Z/M suffixes in the tag are accepted and the extra ordinates dropped.
    Returns an empty-polygon geometry for EMPTY / unparseable-empty inputs.
    """
    s = wkt.strip()
    m = re.match(r"^\s*([A-Za-z]+)\s*(Z|M|ZM)?\s*(EMPTY|\(.*\))\s*$", s, re.S)
    if not m:
        raise ValueError(f"unparseable WKT: {s[:80]!r}")
    tag = m.group(1).upper()
    body = m.group(3)
    if body == "EMPTY":
        kind = {"POINT": GEOM_POINT, "MULTIPOINT": GEOM_POINT,
                "LINESTRING": GEOM_LINESTRING, "MULTILINESTRING": GEOM_LINESTRING}.get(tag, GEOM_POLYGON)
        return kind, []
    inner = body[1:-1]
    if tag == "POINT":
        return GEOM_POINT, [[_parse_coord_seq(inner)]]
    if tag == "MULTIPOINT":
        groups = _split_groups(inner)
        if groups:  # MULTIPOINT ((1 2), (3 4))
            return GEOM_POINT, [[_parse_coord_seq(g)] for g in groups]
        return GEOM_POINT, [[_parse_coord_seq(tok)] for tok in inner.split(",")]
    if tag == "LINESTRING":
        return GEOM_LINESTRING, [[_parse_coord_seq(inner)]]
    if tag == "MULTILINESTRING":
        return GEOM_LINESTRING, [[_parse_coord_seq(g)] for g in _split_groups(inner)]
    if tag == "POLYGON":
        rings = [_dedupe_ring(_parse_coord_seq(g)) for g in _split_groups(inner)]
        return GEOM_POLYGON, [[r for r in rings if len(r) >= 3]]
    if tag == "MULTIPOLYGON":
        parts = []
        for poly in _split_groups(inner):
            rings = [_dedupe_ring(_parse_coord_seq(g)) for g in _split_groups(poly)]
            rings = [r for r in rings if len(r) >= 3]
            if rings:
                parts.append(rings)
        return GEOM_POLYGON, parts
    raise ValueError(f"unsupported WKT tag: {tag}")


def _fmt(v: float) -> str:
    # shortest stable decimal on the 1e-6 grid (the formatting CONTRACT; the
    # batch path below must stay bit-identical — test_geom_core fuzzes them
    # against each other)
    s = f"{v:.6f}".rstrip("0").rstrip(".")
    return s if s not in ("-0", "") else "0"


# trailing-zero stripping over a whole %.6f-formatted string in ONE
# backtrack-free C-regex pass: every number has EXACTLY 6 decimals and is
# followed by ' ', ',' or ')', so a trailing-zero run (optionally with its
# dot) is 1-6 zeros directly before a delimiter — zeros inside the integer
# part are always followed by a digit or '.', never a delimiter, so they
# can't match. Bit-equivalent to the former two-pass
# ('.000000' -> '' then '(\.\d*?)0+' -> '\1') strip, fuzz-pinned in
# tests/test_geom_core.py. Bare '-0' (negative zero) still needs its own
# guarded pass.
_STRIP_ZEROS = re.compile(r"\.?0{1,6}(?=[ ,)])")
_NEG_ZERO = re.compile(r"(?<![\d.])-0(?=[ ,)])")


def _seq_wkt(arr: np.ndarray) -> str:
    """'x y, x y, ...' (fixed .6f) for an (n, 2) array — ONE C-level
    %%-format call instead of 2n f-strings + join (the sink hot path).
    .tolist() first: %-formatting Python floats is ~3x faster than boxed
    np.float64 scalars."""
    return ("%.6f %.6f, " * arr.shape[0])[:-2] % tuple(arr.ravel().tolist())


def to_wkt(kind: int, parts) -> str:
    """Emit canonical Multi* WKT (rings closed, 6-decimal grid).

    Coordinates are formatted per-ring with a single printf-style call and
    trailing zeros stripped with one regex pass over the finished string —
    output is bit-identical to formatting each value with :func:`_fmt`
    (fuzzed in tests/test_geom_core.py)."""
    if not parts:
        return f"{KIND_NAMES[kind].upper()} EMPTY"
    if kind == GEOM_POINT:
        body = ", ".join("(%.6f %.6f)" % (p[0][0, 0], p[0][0, 1]) for p in parts)
        s = f"MULTIPOINT ({body})"
    elif kind == GEOM_LINESTRING:
        body = ", ".join("(" + _seq_wkt(np.asarray(p[0])) + ")" for p in parts)
        s = f"MULTILINESTRING ({body})"
    else:
        polys = []
        for rings in parts:
            ring_txt = ["(" + _seq_wkt(np.vstack([r, r[:1]])) + ")" for r in rings]
            polys.append("(" + ", ".join(ring_txt) + ")")
        s = f"MULTIPOLYGON ({', '.join(polys)})"
    s = _STRIP_ZEROS.sub("", s)
    # bare '-0' only arises from values in (-5e-7, 0) — guard the (relatively
    # costly) lookbehind regex with cheap substring scans
    if "-0 " in s or "-0," in s or "-0)" in s:
        s = _NEG_ZERO.sub("0", s)
    return s


# ---------------------------------------------------------------------------
# scalar metrics
# ---------------------------------------------------------------------------

def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area; CCW positive. Ring is open (not closed)."""
    if len(ring) < 3:
        return 0.0
    x, y = ring[:, 0], ring[:, 1]
    # shoelace without np.roll (roll allocates + python overhead x2)
    s = float(x[:-1] @ y[1:] - y[:-1] @ x[1:])
    s += float(x[-1] * y[0] - y[-1] * x[0])
    return 0.5 * s


def ring_length(ring: np.ndarray, closed: bool = True) -> float:
    if len(ring) < 2:
        return 0.0
    pts = np.vstack([ring, ring[:1]]) if closed else ring
    d = np.diff(pts, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def geom_area(kind: int, parts) -> float:
    if kind != GEOM_POLYGON:
        return 0.0
    total = 0.0
    for rings in parts:
        for i, r in enumerate(rings):
            a = ring_signed_area(r)
            total += abs(a) if i == 0 else -abs(a)
    return max(total, 0.0)


def geom_perimeter(kind: int, parts) -> float:
    """Perimeter for polygons, length for lines, 0 for points (used by the
    empty-diff filter, reference: plugin/brdrq/brdrq_utils.py:1513-1527)."""
    if kind == GEOM_POINT:
        return 0.0
    closed = kind == GEOM_POLYGON
    return sum(ring_length(r, closed=closed) for rings in parts for r in rings)


def shape_index(area: float, perimeter: float) -> float:
    """brdr_shape_index = perimeter / area (docs/autocorrectborders.md:206:
    'gives an idea of the completixity'). 0 for degenerate geometries."""
    if area <= 0:
        return 0.0
    return perimeter / area


def geom_bbox(parts) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax); (nan,)*4 for empty."""
    if not parts:
        return (math.nan,) * 4
    allpts = np.vstack([r for rings in parts for r in rings])
    mn = allpts.min(axis=0)
    mx = allpts.max(axis=0)
    return float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1])


def geom_centroid(kind: int, parts) -> tuple[float, float]:
    """Area-weighted centroid for polygons; vertex mean otherwise/degenerate."""
    if kind == GEOM_POLYGON and parts:
        A, cx, cy = 0.0, 0.0, 0.0
        for rings in parts:
            for i, r in enumerate(rings):
                a = ring_signed_area(r)
                sgn = 1.0 if i == 0 else -1.0
                a = abs(a) * sgn
                if len(r) >= 3 and a != 0:
                    x, y = r[:, 0], r[:, 1]
                    # concatenate == roll(-1) element-for-element, ~2x cheaper
                    x1 = np.concatenate((x[1:], x[:1]))
                    y1 = np.concatenate((y[1:], y[:1]))
                    cross = x * y1 - x1 * y
                    # orient contribution to match |a| sign
                    ra = ring_signed_area(r)
                    f = sgn * (1.0 if ra >= 0 else -1.0)
                    cx += f * float(((x + x1) * cross).sum()) / 6.0
                    cy += f * float(((y + y1) * cross).sum()) / 6.0
                    A += a
        if A > 0:
            return cx / A, cy / A
    pts = np.vstack([r for rings in parts for r in rings]) if parts else np.zeros((1, 2))
    m = pts.mean(axis=0)
    return float(m[0]), float(m[1])


# ---------------------------------------------------------------------------
# validity / normalization (the make_valid analog)
# ---------------------------------------------------------------------------

def canon_ring(ring: np.ndarray) -> np.ndarray:
    """Rotate a ring so the lexicographically smallest vertex comes first —
    a canonical representation so equal polygons serialize byte-identically
    regardless of construction order (bit-stable self-golden outputs)."""
    if len(ring) < 2:
        return ring
    i = int(np.lexsort((ring[:, 1], ring[:, 0]))[0])
    if i == 0:
        return ring
    return np.vstack([ring[i:], ring[:i]])


_PAIR_CACHE: dict = {}


def _nonadjacent_pairs(n: int):
    """Index pairs (i<j) of non-adjacent ring segments, cached per n (the
    triu_indices construction dominates the check for small rings)."""
    got = _PAIR_CACHE.get(n)
    if got is None:
        ii, jj = np.triu_indices(n, k=1)
        adjacent = (jj - ii == 1) | ((ii == 0) & (jj == n - 1))
        got = (ii[~adjacent].copy(), jj[~adjacent].copy())
        if len(_PAIR_CACHE) < 512:  # bound the cache
            _PAIR_CACHE[n] = got
    return got


def _insert_ring_self_intersections(ring: np.ndarray) -> np.ndarray:
    """Insert a vertex at every interior crossing between non-adjacent ring
    segments (broadcast over all segment pairs). COLLINEAR OVERLAPPING pairs
    (parallel, zero cross-denominator, lying on the same line with a shared
    positive-length run) get each other's interior endpoints inserted
    instead — vertex-aligning the shared run so ring_is_simple detects the
    overlap and the winding/dissolve passes cancel it exactly."""
    n = len(ring)
    a = ring
    b = np.roll(ring, -1, axis=0)
    d = b - a
    # pairwise solve a_i + t*d_i == a_j + u*d_j
    ii0, jj0 = _nonadjacent_pairs(n)
    if len(ii0) == 0:
        return ring
    denom0 = d[ii0, 0] * d[jj0, 1] - d[ii0, 1] * d[jj0, 0]
    ok = np.abs(denom0) > 1e-18
    inserts: dict[int, list] = {}

    # ---- parallel pairs: split collinear overlaps at interior endpoints ----
    pii, pjj = ii0[~ok], jj0[~ok]
    if len(pii):
        L2i = (d[pii] ** 2).sum(axis=1)
        nz = L2i > 1e-24
        pii, pjj, L2i = pii[nz], pjj[nz], L2i[nz]
        if len(pii):
            # collinear iff a_j is on line(i) (parallel already guaranteed)
            off = a[pjj] - a[pii]
            perp = np.abs(d[pii, 0] * off[:, 1] - d[pii, 1] * off[:, 0])
            col = perp <= 1e-9 * np.sqrt(L2i)
            pii, pjj, L2i = pii[col], pjj[col], L2i[col]
            eps = 1e-12
            for pi, pj, l2i in zip(pii.tolist(), pjj.tolist(), L2i.tolist()):
                l2j = float((d[pj] ** 2).sum())
                if l2j <= 1e-24:
                    continue
                # project j's endpoints onto i and vice versa
                for src, dst, l2 in ((pj, pi, l2i), (pi, pj, l2j)):
                    for p in (a[src], b[src]):
                        t = float((p - a[dst]) @ d[dst]) / l2
                        if eps < t < 1.0 - eps:
                            inserts.setdefault(int(dst), []).append(
                                (t, a[dst] + t * d[dst]))

    # ---- crossing pairs ----
    ii, jj, denom = ii0[ok], jj0[ok], denom0[ok]
    if len(ii) == 0 and not inserts:
        return ring
    if len(ii):
        w = a[jj] - a[ii]
        t = (w[:, 0] * d[jj, 1] - w[:, 1] * d[jj, 0]) / denom
        u = (w[:, 0] * d[ii, 1] - w[:, 1] * d[ii, 0]) / denom
        tol = 1e-12
        hit = (t >= -tol) & (t <= 1 + tol) & (u >= -tol) & (u <= 1 + tol)
        interior_i = hit & (t > tol) & (t < 1 - tol)
        interior_j = hit & (u > tol) & (u < 1 - tol)
        pts = a[ii] + t[:, None] * d[ii]
        for sel, segs, tt in ((interior_i, ii, t), (interior_j, jj, u)):
            for s, tv, p in zip(segs[sel], tt[sel], pts[sel]):
                inserts.setdefault(int(s), []).append((float(tv), p))
    if not inserts:
        return ring
    out = []
    for i in range(n):
        out.append(a[i])
        for _, p in sorted(inserts.get(i, []), key=lambda x: x[0]):
            out.append(p)
    dense = snap(np.asarray(out, dtype=np.float64))
    keep = np.ones(len(dense), dtype=bool)
    keep[1:] = np.any(dense[1:] != dense[:-1], axis=1)
    dense = dense[keep]
    if len(dense) > 1 and np.all(dense[0] == dense[-1]):
        dense = dense[:-1]
    return dense


def _winding_trapezoids(dense: np.ndarray, rule: str = "nonzero") -> list:
    """Decompose the winding region of a (possibly self-crossing) closed
    chain into a tessellation of trapezoids: slab the plane at every vertex y
    (crossings are already vertices, so no edge crosses another inside a
    slab), sort the slab-spanning edges by x at the slab midline, accumulate
    winding left-to-right (+1 upward edge, -1 downward), and emit one
    trapezoid per gap the rule keeps: ``nonzero`` (!= 0, the repair rule) or
    ``positive`` (>= 1, the Chen-McMains raw-offset rule — negative
    swallowtail loops of an inward offset must be DROPPED, which nonzero
    would wrongly keep). Exact for every crossing pattern — pentagrams,
    interleaved bowties, |winding| >= 2 — because it computes the true
    winding field, not per-loop probes. Returns a list of single-ring
    `parts` ready for dissolve()."""
    a = dense
    b = np.roll(dense, -1, axis=0)
    keep = ~np.all(a == b, axis=1)
    a, b = a[keep], b[keep]
    nonh = a[:, 1] != b[:, 1]
    A, B = a[nonh], b[nonh]
    if len(A) == 0:
        return []
    ys = np.unique(np.concatenate([A[:, 1], B[:, 1]]))
    lo = np.minimum(A[:, 1], B[:, 1])
    hi = np.maximum(A[:, 1], B[:, 1])
    dy = B[:, 1] - A[:, 1]
    # sign convention: accumulating left-to-right, a CCW interior must read
    # +1 (the standard winding number) — an upward edge crossed by a ray
    # from the LEFT contributes -1 there (the nonzero repair rule is
    # sign-agnostic; the positive raw-offset rule is not)
    direction = np.where(dy > 0, -1, 1)
    traps = []
    for y0, y1 in zip(ys[:-1], ys[1:]):
        span = (lo <= y0) & (hi >= y1)
        if not span.any():
            continue
        As, Bs = A[span], B[span]
        d = dy[span]
        ym = 0.5 * (y0 + y1)
        xm = As[:, 0] + (ym - As[:, 1]) / d * (Bs[:, 0] - As[:, 0])
        x0 = As[:, 0] + (y0 - As[:, 1]) / d * (Bs[:, 0] - As[:, 0])
        x1 = As[:, 0] + (y1 - As[:, 1]) / d * (Bs[:, 0] - As[:, 0])
        order = np.argsort(xm, kind="stable")
        wind = np.cumsum(direction[span][order])
        kept = (wind[:-1] != 0) if rule == "nonzero" else (wind[:-1] >= 1)
        # merge MAXIMAL RUNS of kept gaps: the edge between two adjacent kept
        # gaps has winding != 0 on both sides, i.e. it is interior to the
        # union — emitting one trapezoid per run (left edge of the first gap,
        # right edge of the last) is exact and cuts the trapezoid count (and
        # dissolve()'s edge work) drastically on dense offset chains
        k = 0
        n_gaps = len(kept)
        while k < n_gaps:
            if not kept[k]:
                k += 1
                continue
            k2 = k
            while k2 + 1 < n_gaps and kept[k2 + 1]:
                k2 += 1
            i, j = order[k], order[k2 + 1]
            quad = snap(np.array([[x0[i], y0], [x0[j], y0],
                                  [x1[j], y1], [x1[i], y1]]))
            ring = _dedupe_ring(quad)
            # a genuine trapezoid is CCW by construction (left edge i, right
            # edge j, bottom y0); a NEGATIVE sliver is a snap artifact of two
            # edges whose order flipped within the slab after rounding —
            # keeping it would poison dissolve()'s directed-edge cancellation
            if len(ring) >= 3 and ring_signed_area(ring) > SNAP * SNAP:
                traps.append([ring])
            k = k2 + 1
    return traps


def ring_is_simple(ring: np.ndarray) -> bool:
    """True when the ring has no repeated vertices and no interior segment
    crossings. Runs on EVERY make_valid, so the common case is fast-pathed:
    duplicate check via a tuple set (tiny rings) and a strict-convexity test
    (a strictly convex ring with distinct vertices cannot self-intersect);
    only non-convex rings pay the O(n^2) pair broadcast."""
    r = snap(np.asarray(ring, dtype=np.float64))
    n = len(r)
    if n < 4:
        return len({(p[0], p[1]) for p in r}) == n
    if n <= 256:
        if len({(p[0], p[1]) for p in r}) != n:
            return False
    elif len(np.unique(r, axis=0)) != n:
        return False
    d = np.roll(r, -1, axis=0) - r
    d2 = np.roll(d, -1, axis=0)
    cross = d[:, 0] * d2[:, 1] - d[:, 1] * d2[:, 0]
    if np.all(cross > 0) or np.all(cross < 0):
        # all turns in one direction is necessary but NOT sufficient: a star
        # polygon (pentagram, pinwheel offset chain) also qualifies yet
        # self-intersects. Strict convexity additionally requires total
        # turning of exactly one revolution (a star turns 2*pi*k, k >= 2).
        dot = (d * d2).sum(axis=1)
        total = float(np.abs(np.arctan2(cross, dot).sum()))
        if abs(total - 2.0 * np.pi) < 1e-6:
            return True  # strictly convex
    return len(_insert_ring_self_intersections(r)) == len(r)


def repair_ring(ring: np.ndarray, rule: str = "nonzero"):
    """GEOS-MakeValid-style repair of one self-intersecting ring (reference:
    fixgeometries, plugin/brdrq/brdrq_utils.py:1536-1547): insert every
    crossing as a vertex, decompose the winding region (``rule``: nonzero for
    repair, positive for raw-offset curves) into a trapezoid tessellation,
    and dissolve it back into clean polygons. A bowtie becomes its two lobes;
    a pinched donut becomes shell + hole; a pentagram keeps its full star.
    Returns a `parts` object (possibly multiple parts, holes included)."""
    dense = _insert_ring_self_intersections(snap(np.asarray(ring, dtype=np.float64)))
    traps = _winding_trapezoids(dense, rule=rule)
    if not traps:
        return []
    from .boolean import dissolve  # function-level: boolean imports core
    return dissolve(traps)


def make_valid(kind: int, parts):
    """Normalize a geometry (our analog of the reference's fixgeometries /
    make_valid, reference: plugin/brdrq/brdrq_utils.py:1536-1547):

    * drop rings with < 3 points or ~zero area (polygons)
    * orient shells CCW, holes CW
    * snap coordinates to the 1e-6 grid
    * repair self-intersecting rings (bowties, pinches): split at crossings,
      keep nonzero-winding regions as shells, zero-winding enclosures as
      holes assigned to their containing shell (repair_ring above)
    """
    if kind != GEOM_POLYGON:
        out = []
        for part in parts:
            rings = [snap(r) for r in part if len(r) >= (1 if kind == GEOM_POINT else 2)]
            if rings:
                out.append(rings)
        return kind, out
    out = []
    for rings in parts:
        cleaned = []
        for i, r in enumerate(rings):
            r = snap(_dedupe_ring(np.asarray(r, dtype=np.float64)))
            if len(r) >= 3:
                cleaned.append((i, r))
        if not cleaned:
            continue
        if all(ring_is_simple(r) for _, r in cleaned):
            # fast path: byte-identical to the pre-repair normalization
            fixed = []
            for i, r in cleaned:
                a = ring_signed_area(r)
                if abs(a) < SNAP * SNAP:
                    continue
                want_ccw = i == 0
                if (a > 0) != want_ccw:
                    r = r[::-1].copy()
                fixed.append(canon_ring(r))
            if fixed:
                out.append(fixed)
            continue
        # repair path: a bowtie's signed area can cancel to ~0, so the area
        # filter applies only AFTER the winding decomposition. Each ring's
        # FILLED region (nonzero winding of its own traversal) is computed,
        # then the part = shell region minus the union of hole regions.
        from .boolean import overlay, union_many  # boolean imports core

        def _region(r):
            if ring_is_simple(r):
                if abs(ring_signed_area(r)) < SNAP * SNAP:
                    return []
                return [[canon_ring(r if ring_signed_area(r) > 0 else r[::-1].copy())]]
            return repair_ring(r)

        shell_region: list = []
        hole_regions: list = []
        for i, r in cleaned:
            reg = _region(r)
            if not reg:
                continue
            if i == 0:
                shell_region = reg
            else:
                hole_regions.append(reg)
        if not shell_region:
            continue
        final = shell_region
        if hole_regions:
            holes_u = union_many(hole_regions) if len(hole_regions) > 1 else hole_regions[0]
            final = overlay(shell_region, holes_u, "difference", validate=False)
        for part in final:
            fixed = []
            for j, rr in enumerate(part):
                a = ring_signed_area(rr)
                if abs(a) < SNAP * SNAP:
                    continue
                want_ccw = j == 0
                if (a > 0) != want_ccw:
                    rr = rr[::-1].copy()
                fixed.append(canon_ring(rr))
            if fixed:
                out.append(fixed)
    return kind, out


# ---------------------------------------------------------------------------
# point in polygon (winding), vectorized over points
# ---------------------------------------------------------------------------

def chunk_spans(n: int, other_axis_len: int, budget: int = 4_000_000):
    """(start, end) spans that keep an (other_axis_len x chunk) temporary
    under ~``budget`` elements — the shared memory-bound for broadcast
    kernels (winding, snapping, distances) over huge geometries."""
    step = max(1, budget // max(other_axis_len, 1))
    return [(s, min(s + step, n)) for s in range(0, n, step)]


def points_in_rings(pts: np.ndarray, rings) -> np.ndarray:
    """Winding number of each point w.r.t. the union of rings (shells CCW,
    holes CW): result != 0 means inside. Boundary points are implementation-
    defined (callers offset test points off the boundary). pts: (k, 2)."""
    px, py = pts[:, 0], pts[:, 1]
    rings = [r for r in rings if len(r)]
    if not rings:
        return np.zeros(len(pts), dtype=np.int64)
    # ONE (E_total x K) broadcast over the concatenated edges of all rings
    # (integer winding sums are order-independent — identical results to the
    # per-ring accumulation, ~2x fewer temporaries per call)
    if len(rings) == 1:
        A = rings[0]
        B = np.concatenate([A[1:], A[:1]])
    else:
        A = np.vstack(rings)
        B = np.vstack([np.concatenate([r[1:], r[:1]]) for r in rings])
    ax, ay = A[:, 0][:, None], A[:, 1][:, None]
    bx, by = B[:, 0][:, None], B[:, 1][:, None]
    # chunk the point axis so the (E x K) temporaries stay bounded (~32 MB)
    # for huge boundaries x dense grids; per-chunk integer sums concatenate —
    # bit-identical to the single broadcast
    n_pts = len(px)
    out = np.empty(n_pts, dtype=np.int64)
    for s, e in chunk_spans(n_pts, len(A)):
        pyr = py[None, s:e]
        cross = (bx - ax) * (pyr - ay) - (px[None, s:e] - ax) * (by - ay)
        up = (ay <= pyr) & (by > pyr) & (cross > 0)
        dn = (ay > pyr) & (by <= pyr) & (cross < 0)
        out[s:e] = up.sum(axis=0).astype(np.int64) - dn.sum(axis=0).astype(np.int64)
    return out


def points_in_polygon(pts: np.ndarray, parts) -> np.ndarray:
    """Vectorized winding-number point-in-(multi)polygon. True = inside."""
    if not parts or len(pts) == 0:
        return np.zeros(len(pts), dtype=bool)
    inside = np.zeros(len(pts), dtype=bool)
    for rings in parts:
        inside |= points_in_rings(np.asarray(pts, dtype=np.float64), rings) != 0
    return inside


def _poly_edges(parts) -> tuple[np.ndarray, np.ndarray]:
    """All boundary segments of a multipolygon as (starts (m,2), ends (m,2))."""
    a, b = [], []
    for rings in parts:
        for r in rings:
            a.append(r)
            b.append(np.concatenate([r[1:], r[:1]]))
    if not a:
        return np.zeros((0, 2)), np.zeros((0, 2))
    return np.vstack(a), np.vstack(b)


def points_to_boundary_distance(pts: np.ndarray, parts) -> np.ndarray:
    """Min distance from each point to the multipolygon boundary (vectorized
    point->segment). Used by the erosion-survival (inradius) relevance test and
    by snapping/kNN (reference J2 analog)."""
    a, b = _poly_edges(parts)
    if len(a) == 0:
        return np.full(len(pts), np.inf)
    return points_to_segments_distance(np.asarray(pts, dtype=np.float64), a, b)


def points_to_segments_distance(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Min distance from each of k points to any of m segments. O(k*m) with
    chunking to bound memory."""
    k = len(pts)
    out = np.full(k, np.inf)
    if len(a) == 0 or k == 0:
        return out
    ab = b - a
    ab2 = (ab * ab).sum(axis=1)
    ab2[ab2 == 0] = 1e-300
    chunk = max(1, int(4e6 / max(len(a), 1)))
    for s in range(0, k, chunk):
        p = pts[s:s + chunk]
        ap = p[:, None, :] - a[None, :, :]
        t = np.clip((ap * ab[None, :, :]).sum(axis=2) / ab2[None, :], 0.0, 1.0)
        proj = a[None, :, :] + t[:, :, None] * ab[None, :, :]
        d = np.hypot(p[:, None, 0] - proj[:, :, 0], p[:, None, 1] - proj[:, :, 1])
        out[s:s + chunk] = d.min(axis=1)
    return out


def inradius_approx(parts, resolution: float, bbox=None) -> float:
    """Approximate inradius (depth of the deepest interior point) of a
    multipolygon by grid sampling: max over grid points inside of distance to
    boundary. Deterministic for a fixed resolution. Our substitute for the
    reference's buffer-opening relevance test (brdr's relevant-distance method,
    reference README.md:19-27): a region 'survives opening with radius r' iff
    its inradius >= r."""
    if not parts:
        return 0.0
    if bbox is None:
        bbox = geom_bbox(parts)
    xmin, ymin, xmax, ymax = bbox
    if not np.isfinite(xmin):
        return 0.0
    # effective resolution: requested floor, but never more than ~40 cells per
    # axis — the test is a relevance *classifier*, not a measurement, and
    # 40x40 sampling keeps the hot path (one call per candidate pair) cheap
    res = max(resolution, (xmax - xmin) / 40.0, (ymax - ymin) / 40.0, 1e-3)
    nx = min(int((xmax - xmin) / res) + 2, 64)
    ny = min(int((ymax - ymin) / res) + 2, 64)
    xs = np.linspace(xmin, xmax, nx)
    ys = np.linspace(ymin, ymax, ny)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.column_stack([gx.ravel(), gy.ravel()])
    inside = points_in_polygon(pts, parts)
    if not inside.any():
        # thin sliver: all grid points outside; inradius ~ 0
        return 0.0
    d = points_to_boundary_distance(pts[inside], parts)
    return float(d.max())


# ---------------------------------------------------------------------------
# convex hull (Andrew monotone chain)
# ---------------------------------------------------------------------------

def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Convex hull of a point set (Andrew's monotone chain) with STRICT
    turns: the output is exactly the set of extreme points, as an OPEN CCW
    ring starting at the lexicographically smallest vertex — a canonical,
    input-order-independent representation (np.unique lexsorts first), which
    is what makes the distributed combiner exact: a point lying ON a hull
    edge is inside the convex span of its endpoints, so dropping it in a
    partial hull can never lose a global extreme point.

    Degenerate inputs pass through: <3 distinct points (or all collinear)
    return the 1- or 2-point chain. The per-point loop is Python, but every
    caller bounds the input (polygon vertex lists, or combiner-pre-hulled
    partials whose size is the partial hull count)."""
    pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts

    def half(points):
        h: list = []
        for p in points:
            while len(h) >= 2 and (
                    (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                    - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    # all-collinear inputs collapse naturally: strict pops leave the two
    # chain ends in each half, so the result is the 2-point chain
    return np.array(lower[:-1] + upper[:-1])


# ---------------------------------------------------------------------------
# Douglas-Peucker simplification
# ---------------------------------------------------------------------------

def _dp_refine(pts: np.ndarray, tol: float, keep: np.ndarray, stack) -> None:
    """Iterative Douglas-Peucker over ``pts``: split each (i, j) anchor span
    at its farthest interior point while that distance exceeds ``tol``.
    Distances per span are one vectorized cross-product pass."""
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        seg = pts[j] - pts[i]
        length = math.hypot(seg[0], seg[1])
        mid = pts[i + 1:j]
        if length == 0.0:
            d = np.hypot(mid[:, 0] - pts[i, 0], mid[:, 1] - pts[i, 1])
        else:
            d = np.abs((mid[:, 0] - pts[i, 0]) * seg[1]
                       - (mid[:, 1] - pts[i, 1]) * seg[0]) / length
        k = int(d.argmax())
        if d[k] > tol:
            k += i + 1
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))


def dp_keep_mask(ring: np.ndarray, tol: float, closed: bool) -> np.ndarray:
    """Keep-mask of Douglas-Peucker at tolerance ``tol``. Open polylines
    anchor both endpoints; closed rings (stored UNCLOSED) anchor point 0 and
    the point farthest from it (deterministic — ties resolve to the first
    argmax), then refine the two wrap-around halves."""
    pts = np.asarray(ring, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return np.ones(n, dtype=bool)
    if not closed:
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[n - 1] = True
        _dp_refine(pts, tol, keep, [(0, n - 1)])
        return keep
    ext = np.vstack([pts, pts[:1]])  # close the ring for the two half-spans
    far = int(np.hypot(ext[:, 0] - ext[0, 0], ext[:, 1] - ext[0, 1]).argmax())
    keep = np.zeros(n + 1, dtype=bool)
    keep[0] = keep[n] = True
    if far not in (0, n):
        keep[far] = True
        _dp_refine(ext, tol, keep, [(0, far), (far, n)])
    return keep[:n]


def simplify_parts(kind: int, parts, tol: float):
    """Douglas-Peucker simplification of a packed-geometry structure.

    Every output vertex is an input vertex (the snap grid is preserved by
    construction) and every dropped vertex lies within ``tol`` of the kept
    segment that replaced its run — the classic DP contract. Degenerate
    output is dropped: a polygon ring below 3 points or with zero area
    (holes individually; losing the shell drops the whole part), a line
    below 2 points. Points pass through. Plain DP can self-intersect —
    callers that need valid polygons repair with :func:`make_valid`
    (the simplify_geometries operator does by default)."""
    if kind == GEOM_POINT or tol <= 0:
        return kind, parts
    out_parts = []
    for rings in parts:
        if kind == GEOM_LINESTRING:
            line = rings[0]
            kept = line[dp_keep_mask(line, tol, closed=False)]
            if len(kept) >= 2:
                out_parts.append([kept])
            continue
        new_rings = []
        for ri, ring in enumerate(rings):
            kept = ring[dp_keep_mask(ring, tol, closed=True)]
            if len(kept) < 3 or ring_signed_area(kept) == 0.0:
                if ri == 0:
                    break  # shell degenerated: drop the whole part
                continue  # hole degenerated: drop just the hole
            new_rings.append(kept)
        else:
            if new_rings:
                out_parts.append(new_rings)
    return kind, out_parts

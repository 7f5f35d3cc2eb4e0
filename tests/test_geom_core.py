import numpy as np
import pytest

from brdrq_ray.geom import core as g


def sq(x0, y0, x1, y1):
    """CCW open rectangle ring."""
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=float)


def test_wkt_roundtrip_polygon():
    wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    kind, parts = g.parse_wkt(wkt)
    assert kind == g.GEOM_POLYGON
    assert len(parts) == 1 and len(parts[0]) == 1
    assert parts[0][0].shape == (4, 2)  # closing point dropped
    out = g.to_wkt(kind, parts)
    assert out.startswith("MULTIPOLYGON")
    kind2, parts2 = g.parse_wkt(out)
    assert g.geom_area(kind2, parts2) == pytest.approx(100.0)


def test_wkt_multipolygon_with_hole():
    wkt = "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2)))"
    kind, parts = g.parse_wkt(wkt)
    kind, parts = g.make_valid(kind, parts)
    assert g.geom_area(kind, parts) == pytest.approx(100 - 4)
    # shell CCW, hole CW after make_valid
    assert g.ring_signed_area(parts[0][0]) > 0
    assert g.ring_signed_area(parts[0][1]) < 0


def test_wkt_z_dropped():
    kind, parts = g.parse_wkt("POLYGON Z ((0 0 5, 4 0 5, 4 4 5, 0 4 5, 0 0 5))")
    assert g.geom_area(kind, parts) == pytest.approx(16.0)


def test_wkt_point_line():
    k, p = g.parse_wkt("POINT (3 4)")
    assert k == g.GEOM_POINT and p[0][0][0, 0] == 3
    k, p = g.parse_wkt("MULTIPOINT ((1 2), (3 4))")
    assert len(p) == 2
    k, p = g.parse_wkt("LINESTRING (0 0, 3 4)")
    assert g.geom_perimeter(k, p) == pytest.approx(5.0)
    k, p = g.parse_wkt("MULTILINESTRING ((0 0, 1 0), (0 0, 0 2))")
    assert g.geom_perimeter(k, p) == pytest.approx(3.0)


def test_empty_wkt():
    k, p = g.parse_wkt("MULTIPOLYGON EMPTY")
    assert p == []
    assert g.to_wkt(k, p) == "MULTIPOLYGON EMPTY"


def test_pack_roundtrip():
    kind, parts = g.parse_wkt(
        "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2)), ((20 20, 30 20, 25 30, 20 20)))")
    buf = g.pack_geom(kind, parts)
    kind2, parts2 = g.unpack_geom(buf)
    assert kind2 == kind
    assert len(parts2) == 2
    for p1, p2 in zip(parts, parts2):
        for r1, r2 in zip(p1, p2):
            np.testing.assert_array_equal(r1, r2)


def test_area_perimeter_shape_index():
    parts = [[sq(0, 0, 4, 3)]]
    assert g.geom_area(g.GEOM_POLYGON, parts) == pytest.approx(12.0)
    assert g.geom_perimeter(g.GEOM_POLYGON, parts) == pytest.approx(14.0)
    assert g.shape_index(12.0, 14.0) == pytest.approx(14.0 / 12.0)


def test_bbox_centroid():
    parts = [[sq(1, 2, 5, 6)]]
    assert g.geom_bbox(parts) == (1, 2, 5, 6)
    cx, cy = g.geom_centroid(g.GEOM_POLYGON, parts)
    assert (cx, cy) == (pytest.approx(3.0), pytest.approx(4.0))


def test_centroid_with_hole():
    parts = [[sq(0, 0, 10, 10), sq(0, 0, 5, 10)[::-1].copy()]]  # right half remains
    cx, cy = g.geom_centroid(g.GEOM_POLYGON, parts)
    assert cx == pytest.approx(7.5)
    assert cy == pytest.approx(5.0)


def test_point_in_polygon():
    parts = [[sq(0, 0, 10, 10), sq(2, 2, 4, 4)[::-1].copy()]]  # square with hole
    pts = np.array([(1, 1), (3, 3), (11, 5), (5, 5)], dtype=float)
    inside = g.points_in_polygon(pts, parts)
    assert list(inside) == [True, False, False, True]


def test_boundary_distance_and_inradius():
    parts = [[sq(0, 0, 10, 10)]]
    d = g.points_to_boundary_distance(np.array([(5.0, 5.0), (1.0, 5.0)]), parts)
    assert d[0] == pytest.approx(5.0)
    assert d[1] == pytest.approx(1.0)
    r = g.inradius_approx(parts, resolution=0.5)
    assert r == pytest.approx(5.0, abs=0.5)
    sliver = [[sq(0, 0, 100, 0.2)]]
    assert g.inradius_approx(sliver, resolution=0.5) <= 0.2


def test_make_valid_drops_degenerate():
    parts = [[np.array([(0, 0), (1, 0)])], [sq(0, 0, 2, 2)[::-1].copy()]]
    kind, fixed = g.make_valid(g.GEOM_POLYGON, parts)
    assert len(fixed) == 1
    assert g.ring_signed_area(fixed[0][0]) > 0  # reoriented CCW


def test_make_valid_repairs_bowtie():
    """A figure-eight (bowtie) ring splits into two simple lobes whose total
    area equals the winding-rule area (reference: fixgeometries GEOS repair,
    brdrq_utils.py:1536-1547). The raw shoelace area of the bowtie is ~0 —
    the repair must run BEFORE any zero-area filter."""
    bow = np.array([(0, 0), (2, 2), (2, 0), (0, 2)], float)
    kind, parts = g.make_valid(g.GEOM_POLYGON, [[bow]])
    assert len(parts) == 2
    assert g.geom_area(kind, parts) == pytest.approx(2.0)
    for p in parts:
        assert g.ring_signed_area(p[0]) > 0  # shells CCW


def test_make_valid_repairs_pinched_donut():
    """A ring that traces an outer square and an opposite-wound inner triangle
    through a pinch vertex becomes shell + hole (zero-winding enclosure)."""
    ring = np.array([(0, 0), (5, 0), (3, 3), (7, 3), (5, 0),
                     (10, 0), (10, 10), (0, 10)], float)
    kind, parts = g.make_valid(g.GEOM_POLYGON, [[ring]])
    assert len(parts) == 1
    # the triangular enclosure is excluded from the area (whether represented
    # as a separate hole ring or stitched through the pinch vertex)
    assert g.geom_area(kind, parts) == pytest.approx(94.0)  # 100 - 6


def test_make_valid_simple_rings_unchanged():
    """The repair path must not perturb already-simple input (byte stability
    of the golden fixtures)."""
    part = [sq(0, 0, 10, 10), sq(2, 2, 4, 4)[::-1].copy()]  # shell + hole
    k1, before = g.make_valid(g.GEOM_POLYGON, [part])
    assert g.ring_is_simple(part[0])
    k2, again = g.make_valid(g.GEOM_POLYGON, before)
    assert all(np.array_equal(a, b) for p1, p2 in zip(before, again)
               for a, b in zip(p1, p2))


def test_bowtie_ingests_through_pipeline():
    """End-to-end: a bowtie WKT flows through parse_geometries into a valid
    multipolygon with the winding-rule area and finite metrics."""
    import pyarrow as pa
    from brdrq_ray.stages.ingest import parse_geometries

    t = pa.table({"theme_id": ["B1"],
                  "geometry_wkt": ["POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"]})
    out = parse_geometries(t)
    assert out.num_rows == 1
    kind, parts = g.unpack_geom(out.column("geom")[0].as_py())
    assert len(parts) == 2
    assert g.geom_area(kind, parts) == pytest.approx(2.0)


def test_repair_ring_winding_area_fuzz():
    """Property: for random self-intersecting rings, the repaired polygon's
    area equals the area of the nonzero-winding region of the original
    traversal (Monte-Carlo oracle on a grid)."""
    rng = np.random.default_rng(7)
    for trial in range(12):
        n = int(rng.integers(4, 9))
        ring = np.round(rng.uniform(0, 10, size=(n, 2)), 2)
        if len(np.unique(ring, axis=0)) < 3:
            continue
        kind, parts = g.make_valid(g.GEOM_POLYGON, [[ring.copy()]])
        area = g.geom_area(kind, parts)
        # winding oracle on a dense grid
        xs = np.linspace(0.005, 9.995, 140)
        ys = np.linspace(0.005, 9.995, 140)
        X, Y = np.meshgrid(xs, ys)
        pts = np.column_stack([X.ravel(), Y.ravel()])
        wn = g.points_in_rings(pts, [g.snap(ring)])
        cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
        mc_area = float((wn != 0).sum()) * cell
        assert area == pytest.approx(mc_area, abs=1.2), \
            f"trial {trial}: repaired {area} vs winding {mc_area}"


def test_make_valid_repairs_self_intersecting_hole():
    """A valid shell with a bowtie HOLE: the hole's winding region (both
    lobes) is subtracted from the shell."""
    shell = sq(0, 0, 10, 10)
    bow_hole = np.array([(2, 2), (4, 4), (4, 2), (2, 4)], float)  # area 2
    kind, parts = g.make_valid(g.GEOM_POLYGON, [[shell, bow_hole]])
    assert g.geom_area(kind, parts) == pytest.approx(98.0)


def test_ring_is_simple_rejects_star_polygons():
    """All-same-sign turns is not sufficient for simplicity: a pentagram
    turns uniformly left but self-intersects (total turning 4*pi). The
    convexity fast path must not claim it simple — make_valid must repair
    it into the full star region."""
    import numpy as np
    from brdrq_ray.geom import core as g

    ang = np.pi / 2 + np.arange(5) * (4 * np.pi / 5)  # visit every 2nd vertex
    penta = np.column_stack([10 + 5 * np.cos(ang), 10 + 5 * np.sin(ang)])
    assert not g.ring_is_simple(penta)
    k, parts = g.make_valid(g.GEOM_POLYGON, [[penta]])
    a = g.geom_area(g.GEOM_POLYGON, parts)
    # pentagram (nonzero rule keeps the core): area strictly between the
    # inner pentagon and the convex hull pentagon
    assert 7.0 < a < 60.0
    # an actually convex ring still takes the fast path
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    assert g.ring_is_simple(sq)


def test_closing_identity_and_crack_fill():
    """Default-on correction closing: provable no-op on clean geometry
    (byte-identical return), crack-fill on sub-2r gaps."""
    import numpy as np
    from brdrq_ray.geom import core as g
    from brdrq_ray.geom.buffer import closing

    def sq(x0, y0, w, h):
        return np.array([[x0, y0], [x0+w, y0], [x0+w, y0+h], [x0, y0+h]], float)

    clean = [[sq(0, 0, 10, 10)], [sq(20, 0, 5, 5)]]
    assert closing(clean, 0.01) is clean  # identity fast path
    cracked = [[sq(0, 0, 10, 10)], [sq(10.005, 0, 10, 10)]]
    out = closing(cracked, 0.01)
    assert len(out) == 1  # bridged
    a = g.geom_area(g.GEOM_POLYGON, out)
    assert abs(a - 200.05) < 1e-6


def test_make_valid_repairs_collinear_overlaps():
    """Collinear overlapping segments (zero-width spikes, boundary runs
    traversed twice, pinches along a segment) are split at each other's
    interior endpoints and cancelled exactly — the r2 known limitation."""
    import numpy as np
    from brdrq_ray.geom import core as g

    # zero-width vertical spike off the top edge
    spike = np.array([(0, 0), (10, 0), (10, 10), (5, 10), (5, 14),
                      (5, 10), (0, 10)], float)
    k, parts = g.make_valid(g.GEOM_POLYGON, [[spike]])
    assert g.geom_area(k, parts) == pytest.approx(100.0)

    # pinch along a SEGMENT: two boxes joined through a doubly-traversed
    # run of the shared x=10 line
    pinched = np.array([(0, 0), (10, 0), (10, 4), (10, 2), (20, 2),
                        (20, 8), (10, 8), (10, 6), (10, 10), (0, 10)], float)
    assert not g.ring_is_simple(pinched)
    k, parts = g.make_valid(g.GEOM_POLYGON, [[pinched]])
    assert g.geom_area(k, parts) == pytest.approx(160.0)

    # boundary run traversed twice in opposite directions (up-down-up)
    dbl = np.array([(0, 0), (10, 0), (10, 6), (10, 3), (10, 8), (0, 8)], float)
    assert not g.ring_is_simple(dbl)
    k, parts = g.make_valid(g.GEOM_POLYGON, [[dbl]])
    assert g.geom_area(k, parts) == pytest.approx(80.0)


def test_to_wkt_matches_per_value_fmt_contract():
    """to_wkt's batch formatter (one %-format call per ring + regex strip)
    must stay bit-identical to formatting every value with _fmt — fuzzed
    over random grids incl. negatives, tiny values, and negative zeros."""
    rng = np.random.default_rng(11)

    def reference_wkt(kind, parts):
        if not parts:
            return f"{g.KIND_NAMES[kind].upper()} EMPTY"
        if kind == g.GEOM_POINT:
            body = ", ".join(f"({g._fmt(p[0][0, 0])} {g._fmt(p[0][0, 1])})"
                             for p in parts)
            return f"MULTIPOINT ({body})"
        if kind == g.GEOM_LINESTRING:
            body = ", ".join("(" + ", ".join(f"{g._fmt(x)} {g._fmt(y)}"
                                             for x, y in p[0]) + ")"
                             for p in parts)
            return f"MULTILINESTRING ({body})"
        polys = []
        for rings in parts:
            rt = []
            for r in rings:
                closed = np.vstack([r, r[:1]])
                rt.append("(" + ", ".join(f"{g._fmt(x)} {g._fmt(y)}"
                                          for x, y in closed) + ")")
            polys.append("(" + ", ".join(rt) + ")")
        return f"MULTIPOLYGON ({', '.join(polys)})"

    for trial in range(40):
        n = int(rng.integers(3, 30))
        scale = rng.choice([1e-6, 0.1, 1.0, 1e4, 1e9])
        ring = g.snap(rng.uniform(-2, 2, size=(n, 2)) * scale)
        for kind in (g.GEOM_POLYGON, g.GEOM_LINESTRING):
            parts = [[ring]]
            assert g.to_wkt(kind, parts) == reference_wkt(kind, parts), \
                f"trial {trial} scale {scale} kind {kind}"
    # negative zero + EMPTY + points
    nz = g.snap(np.array([[-4e-7, 1.0], [2.0, -3e-7], [5.0, 5.0]]))
    assert g.to_wkt(g.GEOM_POLYGON, [[nz]]) == reference_wkt(g.GEOM_POLYGON, [[nz]])
    assert "-0 " not in g.to_wkt(g.GEOM_POLYGON, [[nz]])
    pts = [[np.array([[1.5, -2.25]])], [np.array([[0.0, 3.0]])]]
    assert g.to_wkt(g.GEOM_POINT, pts) == reference_wkt(g.GEOM_POINT, pts)
    assert g.to_wkt(g.GEOM_POLYGON, []) == "MULTIPOLYGON EMPTY"


# --- batch (flat) unpack kernels: must match the per-row path exactly -------

def _random_geom(rng):
    kind = int(rng.integers(1, 4))
    n_parts = int(rng.integers(0, 4))
    parts = []
    for _ in range(n_parts):
        if kind == g.GEOM_POLYGON:
            n_rings = int(rng.integers(1, 3))
            rings = [np.round(rng.normal(0, 50, (int(rng.integers(3, 9)), 2)),
                              6) for _ in range(n_rings)]
        elif kind == g.GEOM_LINESTRING:
            rings = [np.round(rng.normal(0, 50, (int(rng.integers(2, 9)), 2)),
                              6)]
        else:
            rings = [np.round(rng.normal(0, 50, (1, 2)), 6)]
        parts.append(rings)
    return kind, parts


def test_flat_unpack_matches_per_row():
    """unpack_geoms_flat + iter_flat_geoms reproduce unpack_geom exactly
    (kinds, part/ring structure, coordinates), incl. null blobs, empties,
    and both the list-of-bytes and the zero-copy pyarrow-column paths."""
    import pyarrow as pa

    rng = np.random.default_rng(29)
    geoms = [_random_geom(rng) for _ in range(60)]
    bufs = [g.pack_geom(k, p) for k, p in geoms]
    bufs[7] = None
    bufs[31] = None
    bufs[12] = g.EMPTY_POLYGON

    for col in (bufs, pa.array(bufs, pa.binary()),
                pa.chunked_array([bufs[:20], bufs[20:]], pa.binary()),
                pa.array(bufs, pa.large_binary())):
        fg = g.unpack_geoms_flat(col)
        rows = list(g.iter_flat_geoms(fg))
        assert len(rows) == len(bufs)
        for buf, row in zip(bufs, rows):
            if buf is None:
                assert row is None
                continue
            k0, p0 = g.unpack_geom(buf)
            k1, p1 = row
            assert k1 == k0
            assert len(p1) == len(p0)
            for part0, part1 in zip(p0, p1):
                assert len(part1) == len(part0)
                for r0, r1 in zip(part0, part1):
                    assert np.array_equal(r0, r1)


def test_flat_perimeters_match_per_row():
    """flat_perimeters == geom_perimeter per row (tolerance: summation-order
    ulp; zero/nonzero EXACTLY equal — the empty-diff-filter contract)."""
    rng = np.random.default_rng(31)
    geoms = [_random_geom(rng) for _ in range(80)]
    bufs = [g.pack_geom(k, p) for k, p in geoms]
    bufs[5] = None
    bufs[11] = g.EMPTY_POLYGON
    fg = g.unpack_geoms_flat(bufs)
    per = g.flat_perimeters(fg)
    for i, buf in enumerate(bufs):
        want = 0.0 if buf is None else g.geom_perimeter(*g.unpack_geom(buf))
        assert per[i] == pytest.approx(want, rel=1e-12, abs=1e-12)
        assert (per[i] == 0.0) == (want == 0.0)


def test_flat_wkt_matches_to_wkt():
    """to_wkt over iter_flat_geoms views AND flat_wkts are byte-identical to
    the per-row unpack path (the egress-sink contract), incl. nulls, empty
    geometries, all three kinds, trailing-zero and negative-zero grids."""
    rng = np.random.default_rng(37)
    geoms = [_random_geom(rng) for _ in range(120)]
    # adversarial coordinate grids: integers, coarse grids (trailing zeros),
    # tiny negatives that format to '-0.000000'
    geoms += [
        (g.GEOM_POLYGON, [[np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])]]),
        (g.GEOM_POLYGON, [[np.array([[0.25, -0.0000004], [1.5, 0.0],
                                     [1.5, 2.200000], [-0.0000002, 2.0]])]]),
        (g.GEOM_LINESTRING, [[np.array([[100.0, 200.50], [300.120, 0.0]])]]),
        (g.GEOM_POINT, [[np.array([[-0.0000001, 7.0]])]]),
    ]
    bufs = [g.pack_geom(k, p) for k, p in geoms]
    bufs[3] = None
    bufs[9] = g.EMPTY_POLYGON
    fg = g.unpack_geoms_flat(bufs)
    flat = g.flat_wkts(fg)
    rows = list(g.iter_flat_geoms(fg))
    for buf, row, fw in zip(bufs, rows, flat):
        if buf is None:
            assert row is None and fw is None
            continue
        want = g.to_wkt(*g.unpack_geom(buf))
        assert g.to_wkt(*row) == want
        assert fw == want


def test_strip_zeros_single_pass_contract():
    """The single-pass _STRIP_ZEROS regex reproduces the historical two-pass
    strip ('\\.0{6}' removal then non-greedy trailing-zero strip) on any
    %.6f-formatted coordinate stream."""
    import re
    old_dot0 = re.compile(r"\.0{6}(?=[ ,)])")
    old_trail = re.compile(r"(\.\d*?)0+(?=[ ,)])")
    rng = np.random.default_rng(41)
    vals = np.concatenate([
        np.round(rng.normal(0, 100, 5000), 6),
        np.round(rng.normal(0, 100, 2000), 2),
        rng.integers(-500, 500, 2000).astype(float),
        np.array([0.0, -0.0000004, 0.0000004, 1000000.123456, 100.0, 0.1]),
    ])
    s = ("%.6f %.6f, " * (len(vals) // 2)) % tuple(vals.tolist())
    for text in (s, "MULTIPOLYGON (((1.500000 2.000000, 3.000000 -0.000000, "
                    "4.250000 5.100000, 1.500000 2.000000)))"):
        assert (g._STRIP_ZEROS.sub("", text)
                == old_trail.sub(r"\1", old_dot0.sub("", text)))


def test_flat_wkts_chunk_boundary_and_extreme_coords():
    """flat_wkts formats in 2^16-pair chunks: a batch whose total point
    count crosses the chunk boundary (rings straddling the cut) must stay
    byte-identical to per-row to_wkt; extreme magnitudes and near-zero
    negatives too."""
    rng = np.random.default_rng(43)
    bufs = []
    total = 0
    while total <= (1 << 16) + 500:  # cross the 65536-pair chunk cut
        n = int(rng.integers(50, 200))
        ring = np.round(rng.normal(0, 1e6, (n, 2)), 6)
        bufs.append(g.pack_geom(g.GEOM_POLYGON, [[ring]]))
        total += n
    bufs.append(g.pack_geom(g.GEOM_POLYGON, [[np.array(
        [[1e9, -1e9], [1e9 + 5.5, -1e9], [1e9 + 5.5, -1e9 + 7.25]])]]))
    bufs.append(g.pack_geom(g.GEOM_LINESTRING, [[np.array(
        [[-0.0000004, 0.0000004], [1e-6, -1e-6]])]]))
    fg = g.unpack_geoms_flat(bufs)
    flat = g.flat_wkts(fg)
    for buf, fw in zip(bufs, flat):
        assert fw == g.to_wkt(*g.unpack_geom(buf))

import numpy as np

from brdrq_ray import tiles


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 300000, 1000)
    y = rng.uniform(0, 300000, 1000)
    for level in (8, 12, 16):
        ids = tiles.encode_cells(x, y, level)
        lv, cx, cy = tiles.cell_xy(ids)
        assert (lv == level).all()
        cs = tiles.cell_size(level)
        assert (cx == (x / cs).astype(np.int64)).all()
        assert (cy == (y / cs).astype(np.int64)).all()


def test_cell_bounds_contain_point():
    ids = tiles.encode_cells(np.array([12345.6]), np.array([98765.4]), 14)
    x0, y0, x1, y1 = tiles.cell_bounds(int(ids[0]))
    assert x0 <= 12345.6 < x1
    assert y0 <= 98765.4 < y1


def test_cover_bbox_matches_vectorized():
    level = 12
    box = (1000.0, 2000.0, 5000.0, 9000.0)
    single = set(tiles.cover_bbox(*box, level).tolist())
    rows, cells = tiles.cover_bboxes(
        np.array([box[0]]), np.array([box[1]]), np.array([box[2]]), np.array([box[3]]), level)
    assert (rows == 0).all()
    assert set(cells.tolist()) == single


def test_cover_bboxes_multi_and_expand():
    level = 12
    cs = tiles.cell_size(level)
    # bbox well inside one cell -> 1 cell; expanded by a cell -> 9 cells
    x = cs * 10 + cs / 2
    rows, cells = tiles.cover_bboxes([x], [x], [x + 0.1], [x + 0.1], level)
    assert len(cells) == 1
    rows, cells = tiles.cover_bboxes([x], [x], [x + 0.1], [x + 0.1], level, expand=cs)
    assert len(cells) == 9
    assert len(set(cells.tolist())) == 9


def test_distinct_cells_distinct_ids():
    level = 10
    cs = tiles.cell_size(level)
    xs = np.arange(50) * cs + cs / 2
    ids = tiles.encode_cells(xs, np.full(50, cs / 2), level)
    assert len(set(ids.tolist())) == 50


def test_pick_level():
    lv = tiles.pick_level(max_extent=100.0, relevant_distance=5.0)
    assert tiles.cell_size(lv) >= 4 * (100 + 2 * 1.01 * 5)
    assert tiles.cell_size(lv + 1) < 4 * (100 + 2 * 1.01 * 5)


def test_salt_hot_cells():
    salts = tiles.salt_hot_cells({1: 100, 2: 5000, 3: 100001}, threshold=1000)
    assert 1 not in salts
    assert salts[2] == 5
    assert salts[3] == 64  # capped

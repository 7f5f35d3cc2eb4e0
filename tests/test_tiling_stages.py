import numpy as np
import pyarrow as pa

from brdrq_ray import tiles
from brdrq_ray.stages.tiling import (
    assign_owner_cell, explode_cover, salt_reference, salt_theme)


def _bbox_batch(boxes, ids=None):
    boxes = np.asarray(boxes, dtype=float)
    t = {
        "xmin": pa.array(boxes[:, 0]), "ymin": pa.array(boxes[:, 1]),
        "xmax": pa.array(boxes[:, 2]), "ymax": pa.array(boxes[:, 3]),
    }
    if ids is not None:
        t["theme_id"] = pa.array(ids, pa.string())
    return pa.table(t)


def test_assign_owner_cell_center_rule():
    level = 14
    cs = tiles.cell_size(level)
    # bbox straddling two cells: owner = the cell holding the CENTER
    b = _bbox_batch([[cs * 10 - 1, 0, cs * 10 + 5, 4]])  # center at 10*cs+2
    out = assign_owner_cell(b, level)
    cell = out.column("cell")[0].as_py()
    x0, y0, x1, y1 = tiles.cell_bounds(cell)
    assert x0 <= cs * 10 + 2 < x1


def test_explode_cover_multiplicity():
    level = 14
    cs = tiles.cell_size(level)
    # bbox spanning exactly 2x1 cells (no expand)
    b = _bbox_batch([[cs * 4 + 1, cs * 7 + 1, cs * 5 + 1, cs * 7 + 2]])
    out = explode_cover(b, level)
    assert out.num_rows == 2
    assert len(set(out.column("cell").to_pylist())) == 2
    # +1-ring expand -> (2+2) x (1+2) = 12 cells
    out2 = explode_cover(b, level, expand=cs)
    assert out2.num_rows == 12


def test_salt_theme_deterministic_and_bounded():
    level = 14
    b = _bbox_batch([[10, 10, 12, 12]] * 50, ids=[f"T{i}" for i in range(50)])
    b = assign_owner_cell(b, level)
    cell = int(b.column("cell")[0].as_py())
    out = salt_theme(b, {cell: 4})
    salts = out.column("salt").to_pylist()
    assert set(salts) <= {0, 1, 2, 3}
    assert len(set(salts)) > 1  # actually splits
    out2 = salt_theme(b, {cell: 4})
    assert salts == out2.column("salt").to_pylist()  # deterministic
    # non-hot cell -> all salt 0
    out3 = salt_theme(b, {})
    assert set(out3.column("salt").to_pylist()) == {0}


def test_salt_reference_replication():
    level = 14
    b = _bbox_batch([[10, 10, 12, 12]] * 3)
    b = assign_owner_cell(b, level)
    cell = int(b.column("cell")[0].as_py())
    out = salt_reference(b, {cell: 5})
    assert out.num_rows == 15  # each row replicated 5x
    per_salt = {}
    for s in out.column("salt").to_pylist():
        per_salt[s] = per_salt.get(s, 0) + 1
    assert per_salt == {0: 3, 1: 3, 2: 3, 3: 3, 4: 3}


def test_cost_aware_salting(ray_session):
    """Salting weighs geometry bytes, not just rows: a cell holding few HUGE
    polygons (vertex-heavy, align cost ~ vertices) salts like a cell of many
    small ones; ordinary sub-KB rows are unaffected (row count dominates)."""
    import ray.data

    from brdrq_ray.geom import core as g
    from brdrq_ray.pipelines.autocorrect import plan_tiles

    def circle(cx, cy, r, n):
        a = np.linspace(0, 2 * np.pi, n, endpoint=False)
        return g.snap(np.column_stack([cx + r * np.cos(a), cy + r * np.sin(a)]))

    def batch(cx, n_feats, n_verts):
        rows = {"theme_id": [], "geom": [], "xmin": [], "ymin": [],
                "xmax": [], "ymax": [], "props": []}
        for i in range(n_feats):
            ring = circle(cx, 5.0, 2.0, n_verts)
            rows["theme_id"].append(f"T{cx}-{i}")
            rows["geom"].append(g.pack_geom(g.GEOM_POLYGON, [[ring]]))
            rows["xmin"].append(cx - 2.0); rows["xmax"].append(cx + 2.0)
            rows["ymin"].append(3.0); rows["ymax"].append(7.0)
            rows["props"].append("")
        return pa.table({
            "theme_id": pa.array(rows["theme_id"], pa.string()),
            "geom": pa.array(rows["geom"], pa.binary()),
            "xmin": pa.array(rows["xmin"]), "ymin": pa.array(rows["ymin"]),
            "xmax": pa.array(rows["xmax"]), "ymax": pa.array(rows["ymax"]),
            "props": pa.array(rows["props"], pa.string()),
        })

    # same row count per cell; one cell's features are ~50x heavier
    thin = batch(5.0, 12, 16)        # ~300 B packed each
    fat = batch(5005.0, 12, 1000)    # ~16 KB packed each
    ds = ray.data.from_arrow(pa.concat_tables([thin, fat]))
    plan = plan_tiles(ds, max_rd=2.0, hot_threshold=16)
    assert plan.n_features == 24     # TRUE row count, not effective units

    # locate the two owner cells and compare their salt
    from brdrq_ray import tiles
    thin_cell = int(tiles.encode_cells(np.array([5.0]), np.array([5.0]),
                                       plan.level)[0])
    fat_cell = int(tiles.encode_cells(np.array([5005.0]), np.array([5.0]),
                                      plan.level)[0])
    thin_salt = plan.salts.get(thin_cell, 1)
    fat_salt = plan.salts.get(fat_cell, 1)
    assert fat_salt > thin_salt      # complexity skew detected
    assert thin_salt == 1            # 12 small rows under threshold 16


def test_parse_geometries_passthrough_requires_full_parsed_shape():
    """The already-parsed passthrough needs geom AND the bbox columns; a
    stray 'geom' column without them must still fail loudly on the missing
    WKT column (no silent skip)."""
    import pyarrow as pa
    import pytest
    from brdrq_ray.stages.ingest import parse_geometries

    parsed_shape = pa.table({
        "ref_id": pa.array(["a"]), "geom": pa.array([b"\x01"], pa.binary()),
        "xmin": pa.array([0.0]), "ymin": pa.array([0.0]),
        "xmax": pa.array([1.0]), "ymax": pa.array([1.0])})
    assert parse_geometries(parsed_shape) is parsed_shape

    stray = pa.table({"ref_id": pa.array(["a"]),
                      "geom": pa.array([b"\x01"], pa.binary())})
    with pytest.raises(KeyError):
        parse_geometries(stray)

import duckdb
import numpy as np
import pandas as pd
import pytest

from brdrq_ray.geom import core as g
from brdrq_ray.sources import fixtures as fx
from tests.conftest import SF_DIR


def test_tumbling_window_matches_duckdb(ray_session):
    from brdrq_ray.functions.windows import tumbling_window_agg

    mine = tumbling_window_agg(SF_DIR, 60).to_pandas()
    oracle = duckdb.sql(f"""
        SELECT user_id,
               make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
               count(*) AS n_events, sum(value) AS sum_value
        FROM read_parquet('{SF_DIR}/events.parquet')
        GROUP BY 1, 2
    """).df()
    key = ["user_id", "window_start"]
    m = mine.sort_values(key).reset_index(drop=True)
    o = oracle.sort_values(key).reset_index(drop=True)
    assert len(m) == len(o)
    assert (m["n_events"].to_numpy() == o["n_events"].to_numpy()).all()
    assert np.allclose(m["sum_value"], o["sum_value"])


def test_session_windows(ray_session):
    from brdrq_ray.functions.windows import sliding_session_gap

    out = sliding_session_gap(SF_DIR, 30).to_pandas()
    assert (out["n_events"] >= 1).all()
    assert (out["duration_sec"] >= 0).all()
    # sessions per user never exceed events per user
    ev = duckdb.sql(f"SELECT user_id, count(*) n FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1").df()
    per_user = out.groupby("user_id").agg(sessions=("n_events", "size"),
                                          total=("n_events", "sum"))
    merged = per_user.join(ev.set_index("user_id"))
    assert (merged["total"] == merged["n"]).all()  # every event in exactly one session
    assert (merged["sessions"] <= merged["n"]).all()


@pytest.fixture(scope="module")
def spatial_tables():
    theme = fx.make_thematic_table(nx=10, ny=10, seed=42, n_features=15)
    ref = fx.make_reference_table(nx=10, ny=10, seed=42)
    return theme, ref


def test_intersects_semi_join_vs_bruteforce(ray_session, spatial_tables):
    import ray.data
    from brdrq_ray.functions.spatial_join import intersects_semi_join
    from brdrq_ray.geom.boolean import overlay

    theme, ref = spatial_tables
    got = intersects_semi_join(ray.data.from_arrow(theme),
                               ray.data.from_arrow(ref)).to_pandas()
    got_pairs = set(zip(got["theme_id"], got["ref_id"]))
    # brute force oracle
    parcels, _ = fx.make_reference_parts(nx=10, ny=10, seed=42)
    expect = set()
    for i in range(theme.num_rows):
        tid = theme.column("theme_id")[i].as_py()
        _, tparts = g.parse_wkt(theme.column("geometry_wkt")[i].as_py())
        _, tparts = g.make_valid(g.GEOM_POLYGON, tparts)
        for rid, rparts in parcels.items():
            inter = overlay(tparts, rparts, "intersection")
            if g.geom_area(g.GEOM_POLYGON, inter) > 0:
                expect.add((tid, rid))
    assert got_pairs == expect


def test_knn_reference_lookup(ray_session, spatial_tables):
    import ray.data
    from brdrq_ray.functions.spatial_join import knn_reference_lookup

    theme, ref = spatial_tables
    got = knn_reference_lookup(ray.data.from_arrow(theme),
                               ray.data.from_arrow(ref), k=3,
                               max_distance=100.0).to_pandas()
    # every feature has up to 3 hits, ranked by distance ascending
    assert set(got["theme_id"]) == set(theme.column("theme_id").to_pylist())
    for tid, grp in got.groupby("theme_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert (grp["distance"].diff().dropna() >= 0).all()
        # rank-1 parcel contains or touches the feature -> distance 0-ish for
        # features derived from parcels
        assert grp["distance"].iloc[0] <= 50.0


def test_spatial_join_salts_hot_cells(ray_session):
    """A dense hot spot must be SALTED by the standalone spatial operators:
    group sizes stay bounded (no one-giant-group cell) and results are
    unaffected by the salt split (themes split across sub-keys, reference
    replicated to each)."""
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.spatial_join import (_tag_and_union,
                                                  intersects_semi_join)
    from brdrq_ray.stages.ingest import parse_geometries

    # 600 tiny squares jittered inside ONE parcel-sized spot + a handful of
    # reference parcels covering it
    rng = np.random.default_rng(7)
    t_ids, t_wkts = [], []
    for i in range(600):
        x = 100.0 + rng.uniform(0, 8)
        y = 100.0 + rng.uniform(0, 8)
        t_ids.append(f"H{i:04d}")
        t_wkts.append(f"POLYGON (({x} {y}, {x+0.5} {y}, {x+0.5} {y+0.5}, "
                      f"{x} {y+0.5}, {x} {y}))")
    theme = pa.table({"theme_id": pa.array(t_ids, pa.string()),
                      "geometry_wkt": pa.array(t_wkts, pa.string())})
    r_ids, r_wkts = [], []
    for j in range(4):
        x0 = 98.0 + 3.5 * j
        r_ids.append(f"P{j}")
        r_wkts.append(f"POLYGON (({x0} 98, {x0+3.5} 98, {x0+3.5} 112, "
                      f"{x0} 112, {x0} 98))")
    ref = pa.table({"ref_id": pa.array(r_ids, pa.string()),
                    "geometry_wkt": pa.array(r_wkts, pa.string())})

    lt = ray.data.from_arrow(theme).map_batches(parse_geometries,
                                                batch_format="pyarrow")
    rt = ray.data.from_arrow(ref).map_batches(parse_geometries,
                                              batch_format="pyarrow")
    unified = _tag_and_union(lt, rt, reach=0.0, cell_level=None,
                             hot_threshold=64).to_pandas()
    themes = unified[unified["side"] == "l"]
    per_key = themes.groupby("part_key").size()
    per_cell = themes.groupby("cell").size()
    # the hot cell was split: more part keys than cells, and every group is
    # bounded well below the single-cell theme count
    assert per_key.size > per_cell.size
    assert per_key.max() < per_cell.max()
    assert per_key.max() <= 2 * 64  # ~hot_threshold-bounded

    # results identical to brute force despite the salt split
    got = intersects_semi_join(ray.data.from_arrow(theme),
                               ray.data.from_arrow(ref),
                               hot_threshold=64).to_pandas()
    from brdrq_ray.geom.boolean import overlay
    expect = set()
    rparts = {rid: g.make_valid(*g.parse_wkt(w))[1]
              for rid, w in zip(r_ids, r_wkts)}
    for tid, w in zip(t_ids, t_wkts):
        _, tp = g.parse_wkt(w)
        for rid, rp in rparts.items():
            if g.geom_area(g.GEOM_POLYGON, overlay(tp, rp, "intersection")) > 0:
                expect.add((tid, rid))
    assert set(zip(got["theme_id"], got["ref_id"])) == expect

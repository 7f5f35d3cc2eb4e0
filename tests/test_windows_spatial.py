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

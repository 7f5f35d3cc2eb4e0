import json

import pyarrow as pa
import pytest

from brdrq_ray import alignment as al
from brdrq_ray.sources import fixtures as fx


@pytest.fixture(scope="module")
def tables():
    ref = fx.make_reference_table(nx=12, ny=12, seed=42)
    theme = fx.make_thematic_table(nx=12, ny=12, seed=42, n_features=20)
    meta = fx.make_metadata_table(nx=12, ny=12, seed=42, n_features=20)
    return theme, ref, meta


def test_correction_layer(ray_session, tables):
    import ray.data
    from brdrq_ray.pipelines.autocorrect import run_alignment
    from brdrq_ray.pipelines.correction import (
        ST_AUTO_UPDATED, ST_NOT_CHANGED, ST_TO_REVIEW, build_correction_layer)

    theme, ref, _ = tables
    cfg = al.AlignConfig(relevant_distance=2.0, od_strategy=al.OD_EXCLUDE)
    results = run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref), cfg)
    corr = build_correction_layer(ray.data.from_arrow(theme), results,
                                  review_percentage=50.0)
    pdf = corr.to_pandas()
    # one corrected row per source feature
    assert sorted(pdf["theme_id"]) == sorted(theme.column("theme_id").to_pylist())
    assert set(pdf["brdrq_state"]).issubset(
        {ST_NOT_CHANGED, ST_AUTO_UPDATED, ST_TO_REVIEW, "none", "to_update", "manual_updated"})
    # aligned rows carry the result geometry; original snapshot is kept
    updated = pdf[pdf["brdrq_state"] == ST_AUTO_UPDATED]
    assert len(updated) > 0
    assert (updated["geometry_wkt"] != updated["brdrq_original_wkt"]).any()


def test_metadata_explode(tables):
    from brdrq_ray.pipelines.autoupdate import explode_metadata_refs

    _, _, meta = tables
    out = explode_metadata_refs(meta)
    assert out.num_rows > meta.num_rows  # 1-3 refs per feature
    n_refs = sum(len(json.loads(m)["actuation"]["reference_geometries"])
                 for m in meta.column("brdr_metadata").to_pylist())
    assert out.num_rows == n_refs


def test_autoupdate_selects_stale_only(ray_session, tables):
    import ray.data
    from brdrq_ray.pipelines.autoupdate import run_autoupdate

    _, ref, meta = tables
    results = run_autoupdate(ray.data.from_arrow(meta), ray.data.from_arrow(ref),
                             al.AlignConfig(od_strategy=al.OD_EXCLUDE),
                             max_distance_for_actualisation=2.0)
    pdf = results.to_pandas()
    # oracle: features with >= 1 stale derived_from version
    versions = {r: str(v)[:10] for r, v in zip(ref.column("ref_id").to_pylist(),
                                               ref.column("version_date").to_pylist())}
    affected = set()
    for tid, m in zip(meta.column("theme_id").to_pylist(),
                      meta.column("brdr_metadata").to_pylist()):
        for rg in json.loads(m)["actuation"]["reference_geometries"]:
            cur = versions.get(rg["derived_from"]["id"], "")
            if cur and cur > rg["version_date"]:
                affected.add(tid)
    assert set(pdf["theme_id"]) == affected
    assert 0 < len(affected) < meta.num_rows


def test_autoupdate_distributed_semi_join_agrees(ray_session, tables):
    """Forcing the distributed semi-join path (broadcast_limit=0) must select
    exactly the same affected features as the broadcast path."""
    import ray.data
    from brdrq_ray.pipelines.autoupdate import run_autoupdate

    _, ref, meta = tables
    cfg = al.AlignConfig(od_strategy=al.OD_EXCLUDE)
    a = run_autoupdate(ray.data.from_arrow(meta), ray.data.from_arrow(ref),
                       cfg, max_distance_for_actualisation=2.0).to_pandas()
    b = run_autoupdate(ray.data.from_arrow(meta), ray.data.from_arrow(ref),
                       cfg, max_distance_for_actualisation=2.0,
                       broadcast_limit=0).to_pandas()
    key = ["theme_id", "brdr_relevant_distance"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[key + ["brdr_evaluation", "brdr_area"]].equals(
        b[key + ["brdr_evaluation", "brdr_area"]])


def test_semi_and_anti_join(ray_session):
    import pandas as pd
    import ray.data
    from brdrq_ray.functions.relational import semi_join

    data = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3, 4, 5], "v": ["a", "b", "c", "d", "e"]}))
    keys = ray.data.from_pandas(pd.DataFrame({"k": [2, 4, 4, 9]}))
    got = semi_join(data, keys, on="k").to_pandas().sort_values("k")
    assert got["k"].tolist() == [2, 4]
    got_anti = semi_join(data, keys, on="k", anti=True).to_pandas().sort_values("k")
    assert got_anti["k"].tolist() == [1, 3, 5]


def test_autoupdate_no_changes_short_circuit(ray_session, tables):
    import ray.data
    from brdrq_ray.pipelines.autoupdate import run_autoupdate

    _, ref, meta = tables
    # set every recorded version to the current one -> nothing affected
    versions = {r: str(v)[:10] for r, v in zip(ref.column("ref_id").to_pylist(),
                                               ref.column("version_date").to_pylist())}
    metas = []
    for m in meta.column("brdr_metadata").to_pylist():
        doc = json.loads(m)
        for rg in doc["actuation"]["reference_geometries"]:
            rg["version_date"] = versions[rg["derived_from"]["id"]]
        metas.append(json.dumps(doc, sort_keys=True))
    fresh = meta.set_column(meta.column_names.index("brdr_metadata"),
                            "brdr_metadata", pa.array(metas, pa.string()))
    results = run_autoupdate(ray.data.from_arrow(fresh), ray.data.from_arrow(ref))
    assert results.count() == 0


def _bucket_df(rows):
    import pandas as pd
    return pd.DataFrame(rows)


def test_correction_multi_prediction_to_review():
    """Duplicate join keys (multiple predictions for one id) force at least
    TO_REVIEW (reference: brdrq_utils.py:1251-1254); the result geometry is
    still adopted (geometry_changes is set for any non-TO_UPDATE id,
    brdrq_utils.py:1337-1339) — this engine picks the BEST prediction
    deterministically where the reference takes the last iterated."""
    from brdrq_ray.pipelines.correction import _correct_bucket

    group = _bucket_df({
        "side": ["source", "result", "result"],
        "theme_id": ["T1"] * 3,
        "geometry_wkt": ["ORIG_WKT", None, None],
        "props": [None] * 3,
        "result_wkt": [None, "W1", "W2"],
        "brdr_evaluation": [None, "prediction_unique", "to_check_prediction_multi"],
        "brdr_relevant_distance": [None, 1.0, 2.0],
        "brdr_prediction_score": [None, 40.0, 80.0],
        "brdr_sym_diff_area_index": [None, 5.0, 9.0],
        "brdr_sym_diff_area_index_perc": [None, 1.0, 2.0],
        "brdr_stability": [None, True, True],
        "brdr_metadata": [None, "", ""],
    })
    out = _correct_bucket(group, review_percentage=10.0)
    assert out.num_rows == 1
    assert out.column("brdrq_state")[0].as_py() == "to_review"
    # best prediction (max score) adopted + reported for review
    assert out.column("geometry_wkt")[0].as_py() == "W2"
    assert out.column("brdrq_original_wkt")[0].as_py() == "ORIG_WKT"
    assert out.column("brdr_prediction_score")[0].as_py() == 80.0
    assert out.column("brdr_relevant_distance")[0].as_py() == 2.0
    # an unstable duplicate escalates the whole key to TO_UPDATE
    group.loc[1, "brdr_stability"] = False
    out2 = _correct_bucket(group, review_percentage=10.0)
    assert out2.column("brdrq_state")[0].as_py() == "to_update"
    assert out2.column("geometry_wkt")[0].as_py() == "ORIG_WKT"
    assert out2.column("brdr_sym_diff_area_index")[0].as_py() == -1.0


def test_correction_state_rule_matches_reference_order():
    """The per-result elif chain follows the reference exactly
    (brdrq_utils.py:1259-1291): no_change/equality evaluations short-circuit
    BEFORE the review-percentage gate; empty/unstable results go TO_UPDATE;
    the no-change test is the ABSOLUTE symmetric-difference area (< 0.01 m2),
    checked AFTER the review percentage."""
    from brdrq_ray.pipelines.correction import _correct_bucket

    def one(sym_abs, sym_perc, evaluation="prediction_unique", stability=True,
            review=10.0, result_wkt="RES"):
        group = _bucket_df({
            "side": ["source", "result"],
            "theme_id": ["T1"] * 2,
            "geometry_wkt": ["ORIG", None],
            "props": [None] * 2,
            "result_wkt": [None, result_wkt],
            "brdr_evaluation": [None, evaluation],
            "brdr_relevant_distance": [None, 1.0],
            "brdr_prediction_score": [None, 50.0],
            "brdr_sym_diff_area_index": [None, sym_abs],
            "brdr_sym_diff_area_index_perc": [None, sym_perc],
            "brdr_stability": [None, stability],
            "brdr_metadata": [None, ""],
        })
        out = _correct_bucket(group, review_percentage=review)
        return out.column("brdrq_state")[0].as_py()

    # large parcel, sizable absolute change but tiny percentage: NOT no-change
    assert one(sym_abs=5.0, sym_perc=0.005) == "auto_updated"  # perc<review, abs>=0.01
    # genuinely tiny absolute change -> not_changed
    assert one(sym_abs=0.005, sym_perc=0.005) == "not_changed"
    # percentage above the review threshold wins for plain predictions
    assert one(sym_abs=0.005, sym_perc=60.0) == "to_review"
    # ... but the no_change evaluation short-circuits BEFORE the review gate
    assert one(sym_abs=0.005, sym_perc=60.0, evaluation="no_change") == "not_changed"
    # ... and equality evaluations bypass straight to auto_updated
    assert one(sym_abs=5.0, sym_perc=60.0, evaluation="equality_by_id") == "auto_updated"
    assert one(sym_abs=5.0, sym_perc=2.0,
               evaluation="equality_by_full_reference") == "auto_updated"
    # unstable or empty results demand re-alignment: TO_UPDATE
    assert one(sym_abs=5.0, sym_perc=2.0, stability=False) == "to_update"
    assert one(sym_abs=5.0, sym_perc=2.0,
               result_wkt="MULTIPOLYGON EMPTY") == "to_update"
    # auto path: single stable prediction, acceptable change
    assert one(sym_abs=5.0, sym_perc=2.0) == "auto_updated"

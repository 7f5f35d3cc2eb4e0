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


def test_correction_multi_prediction_to_review():
    """Duplicate join keys (multiple predictions for one id) force TO_REVIEW
    and keep the original geometry (reference: brdrq_utils.py:1251-1254)."""
    import pyarrow as pa
    from brdrq_ray.pipelines.correction import CORRECTION_SCHEMA, _correct_group

    group = pa.table({
        "side": ["source", "result", "result"],
        "theme_id": ["T1"] * 3,
        "geometry_wkt": ["ORIG_WKT", None, None],
        "props": [None] * 3,
        "result_wkt": [None, "W1", "W2"],
        "brdr_evaluation": [None, "prediction_unique", "to_check_prediction_multi"],
        "brdr_relevant_distance": [None, 1.0, 2.0],
        "brdr_prediction_score": [None, 40.0, 80.0],
        "brdr_sym_diff_area_index_perc": [None, 1.0, 2.0],
        "brdr_stability": [None, True, True],
        "brdr_metadata": [None, "", ""],
    })
    out = _correct_group(group, review_percentage=10.0)
    assert out.num_rows == 1
    assert out.column("brdrq_state")[0].as_py() == "to_review"
    assert out.column("geometry_wkt")[0].as_py() == "ORIG_WKT"  # original kept
    # best prediction (max score) reported for review
    assert out.column("brdr_prediction_score")[0].as_py() == 80.0
    assert out.column("brdr_relevant_distance")[0].as_py() == 2.0

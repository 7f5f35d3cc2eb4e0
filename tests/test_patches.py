import pyarrow as pa


def test_apply_patches_last_writer_wins_and_reset(ray_session):
    import ray.data
    from brdrq_ray.functions.patches import apply_patches

    source = pa.table({
        "theme_id": ["a", "b", "c"],
        "geometry_wkt": ["WKT_A0", "WKT_B0", "WKT_C0"],
        "brdrq_original_wkt": [None, "WKT_B_ORIG", None],
    })
    patches = pa.table({
        "theme_id": ["a", "a", "b", "b"],
        "seq": pa.array([1, 2, 1, 2], pa.int64()),
        "op": ["set", "set", "set", "reset"],
        "geometry_wkt": ["WKT_A1", "WKT_A2", "WKT_B1", None],
        "brdrq_state": ["manual_updated", "auto_updated", "manual_updated", None],
        "brdr_metadata": [None, "{\"m\":1}", None, None],
    })
    out = apply_patches(ray.data.from_arrow(source),
                        ray.data.from_arrow(patches)).to_pandas()
    out = out.set_index("theme_id")
    # last writer wins for 'a'
    assert out.loc["a", "geometry_wkt"] == "WKT_A2"
    assert out.loc["a", "brdrq_state"] == "auto_updated"
    assert out.loc["a", "brdr_metadata"] == "{\"m\":1}"
    # reset restores the original snapshot for 'b' (M13 preference)
    assert out.loc["b", "geometry_wkt"] == "WKT_B_ORIG"
    assert out.loc["b", "brdrq_state"] == "none"
    # untouched rows pass through
    assert out.loc["c", "geometry_wkt"] == "WKT_C0"
    # original snapshot is filled from current geometry when absent
    assert out.loc["a", "brdrq_original_wkt"] == "WKT_A0"

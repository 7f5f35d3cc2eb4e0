"""Distributed DBSCAN vs a brute-force oracle implementing the identical
spec (inclusive eps, min_pts counts self, min-core-id cluster labels,
min-label border attachment, null-cluster noise)."""

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray import tiles
from brdrq_ray.functions.spatial_cluster import dbscan_points, level_for_eps


def dbscan_brute(ids, xy, eps, min_pts):
    """Pure-numpy DBSCAN with the module's deterministic spec.
    Returns {id: (cluster_or_None, is_core)}."""
    ids = np.asarray(ids, dtype="U")
    xy = np.asarray(xy, dtype=np.float64)
    n = len(ids)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    nbr = (d2 <= eps * eps)
    np.fill_diagonal(nbr, False)
    core = nbr.sum(1) + 1 >= min_pts

    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and nbr[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri
    comp_label = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            lab = comp_label.get(r)
            if lab is None or ids[i] < lab:
                comp_label[r] = ids[i]
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = (comp_label[find(i)], True)
    for i in range(n):
        if core[i]:
            continue
        labs = [comp_label[find(j)] for j in range(n)
                if core[j] and nbr[i, j]]
        out[ids[i]] = (min(labs) if labs else None, False)
    return out


def _points_table(ids, xy):
    return pa.table({"point_id": pa.array([str(i) for i in ids]),
                     "x": pa.array(np.asarray(xy)[:, 0], pa.float64()),
                     "y": pa.array(np.asarray(xy)[:, 1], pa.float64())})


def _run(ray_session, ids, xy, eps, min_pts, **kw):
    import ray.data
    ds = dbscan_points(ray.data.from_arrow(_points_table(ids, xy)),
                       eps, min_pts, **kw)
    df = ds.to_pandas()
    got = {r.point_id: (r.cluster if isinstance(r.cluster, str) else None,
                        bool(r.is_core))
           for r in df.itertuples()}
    assert len(got) == len(df), "duplicate point_id rows"
    return got


def _rand_points(rng, n, spread=40.0, origin=(1000.0, 1000.0)):
    xy = origin + rng.random((n, 2)) * spread
    ids = [f"p{i:04d}" for i in range(n)]
    return ids, xy


def test_two_blobs_and_noise(ray_session):
    rng = np.random.default_rng(7)
    blob_a = np.array([500.0, 500.0]) + rng.normal(0, 1.5, (30, 2))
    blob_b = np.array([560.0, 500.0]) + rng.normal(0, 1.5, (25, 2))
    lone = np.array([[530.0, 560.0], [470.0, 470.0]])
    xy = np.vstack([blob_a, blob_b, lone])
    ids = [f"p{i:04d}" for i in range(len(xy))]
    got = _run(ray_session, ids, xy, eps=4.0, min_pts=4)
    expect = dbscan_brute(ids, xy, 4.0, 4)
    assert got == expect
    labels = {c for c, _ in got.values() if c is not None}
    assert len(labels) == 2  # the two blobs
    assert got["p0055"] == (None, False) and got["p0056"] == (None, False)


@pytest.mark.parametrize("eps,min_pts,seed", [
    (2.0, 3, 1), (5.0, 4, 2), (1.0, 2, 3), (3.0, 1, 4), (8.0, 6, 5),
])
def test_random_vs_bruteforce(ray_session, eps, min_pts, seed):
    rng = np.random.default_rng(seed)
    ids, xy = _rand_points(rng, 120)
    got = _run(ray_session, ids, xy, eps, min_pts)
    assert got == dbscan_brute(ids, xy, eps, min_pts)


def test_cell_boundary_pairs(ray_session):
    """Points straddling cell borders in every direction still pair up:
    place eps/4-separated pairs across the W, S, SW, SE cell edges of a
    chosen cell at the derived level."""
    eps = 4.0
    level = level_for_eps(eps)
    cs = tiles.cell_size(level)
    # a cell well inside the window
    d = eps / 4
    pts = []
    # each direction pair in its own far-apart cell so clusters stay disjoint
    for k, edge in enumerate(("w", "s", "sw", "se")):
        x0, y0 = (200 + 10 * k) * cs, 200 * cs
        if edge == "w":
            pts += [(x0 - d, y0 + cs / 2), (x0 + d, y0 + cs / 2)]
        elif edge == "s":
            pts += [(x0 + cs / 2, y0 - d), (x0 + cs / 2, y0 + d)]
        elif edge == "sw":
            pts += [(x0 - d, y0 - d), (x0 + d, y0 + d)]
        else:  # se
            pts += [(x0 + cs - d, y0 + d), (x0 + cs + d, y0 - d)]
    xy = np.array(pts)
    ids = [f"p{i:04d}" for i in range(len(xy))]
    got = _run(ray_session, ids, xy, eps=eps, min_pts=2)
    expect = dbscan_brute(ids, xy, eps, 2)
    assert got == expect
    # every pair is a 2-member cluster of cores
    for i in range(0, len(ids), 2):
        a, b = ids[i], ids[i + 1]
        assert got[a][1] and got[b][1]
        assert got[a][0] == got[b][0] == min(a, b)


def test_min_pts_one_isolated_are_singleton_cores(ray_session):
    xy = np.array([[100.0, 100.0], [900.0, 900.0], [100.5, 100.0]])
    ids = ["a", "b", "c"]
    got = _run(ray_session, ids, xy, eps=1.0, min_pts=1)
    assert got == {"a": ("a", True), "b": ("b", True), "c": ("a", True)}


def test_exclude_noise_rows(ray_session):
    xy = np.array([[10.0, 10.0], [10.5, 10.0], [500.0, 500.0]])
    ids = ["a", "b", "z"]
    got = _run(ray_session, ids, xy, eps=1.0, min_pts=2,
               include_noise=False)
    assert set(got) == {"a", "b"}


def test_partition_invariance(ray_session):
    import ray.data
    rng = np.random.default_rng(11)
    ids, xy = _rand_points(rng, 200)
    t = _points_table(ids, xy)
    outs = []
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        df = (dbscan_points(ds, eps=3.0, min_pts=3)
              .to_pandas().sort_values("point_id").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])


def test_too_fine_level_override_rejected(ray_session):
    import ray.data
    xy = np.array([[100.0, 100.0], [102.0, 100.0]])
    ds = ray.data.from_arrow(_points_table(["a", "b"], xy))
    with pytest.raises(ValueError, match="cell edge"):
        dbscan_points(ds, eps=4.0, min_pts=2, level=22)
    # a COARSER level stays correct (8-adjacency still holds)
    got = _run(ray_session, ["a", "b"], xy, 4.0, 2,
               level=level_for_eps(4.0) - 2)
    assert got == {"a": ("a", True), "b": ("a", True)}


def test_level_for_eps_contract():
    for eps in (0.5, 1.0, 3.7, 100.0, 1e6):
        lvl = level_for_eps(eps)
        assert tiles.cell_size(lvl) >= eps or lvl == 0
        if lvl < tiles.MAX_LEVEL and tiles.cell_size(lvl) / 2 >= eps:
            # level is the FINEST satisfying the bound
            assert tiles.cell_size(lvl + 1) < eps
    with pytest.raises(ValueError):
        level_for_eps(0.0)

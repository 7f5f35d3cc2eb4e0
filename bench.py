#!/usr/bin/env python
"""Benchmark harness.

Headline: the interleaved-document alignment pipeline (explode geometry spans
-> tiled alignment -> stitch) on a deterministic synthetic corpus, reported as
seconds + docs/sec. Plus operator-level timings over $GRAFT_SF_DIR (default
/root/testdata/sf0.1).

    python bench.py              # one JSON line with the headline + queries
    python bench.py --scaling    # run the headline in two fresh processes at
                                 # num_cpus=8 and num_cpus=32, report both
                                 # throughputs + scaling efficiency

This script OWNS its Ray session (ray.init/shutdown); nothing else in the
repo does.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("BRDRQ_BENCH_DOCS", "8000"))
BENCH_GRID = int(os.environ.get("BRDRQ_BENCH_GRID", "64"))


def _fixture_version() -> str:
    import hashlib

    import brdrq_ray.sources.fixtures as fxmod
    with open(fxmod.__file__, "rb") as f:
        return hashlib.sha1(f.read()).hexdigest()[:8]


def _bench_fixture_dir() -> str:
    """Deterministic interleaved corpus + reference tessellation for the
    headline (cached; a pure function of the knobs + generator version)."""
    out = f"/tmp/brdrq_bench/docs{BENCH_DOCS}_grid{BENCH_GRID}_{_fixture_version()}"
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        import pyarrow.parquet as pq
        from brdrq_ray.sources import fixtures as fx
        os.makedirs(out, exist_ok=True)
        pq.write_table(fx.make_reference_table(BENCH_GRID, BENCH_GRID, seed=42),
                       f"{out}/reference.parquet")
        docs_tbl = fx.make_documents_table(n_docs=BENCH_DOCS, nx=BENCH_GRID,
                                           ny=BENCH_GRID, seed=42)
        pq.write_table(docs_tbl, f"{out}/documents.parquet")
        pq.write_table(_make_media_table(docs_tbl), f"{out}/media.parquet")
        open(done, "w").close()
    return out


def _make_media_table(docs_tbl):
    """One media row per media-span ref, with ~5x payload duplication (the
    crawl shape): payload bytes are a pure function of hash(ref) % groups."""
    import hashlib

    import pyarrow as pa

    refs = sorted({s["media_ref"] for spans in docs_tbl.column("spans").to_pylist()
                   for s in spans if s["kind"] == "media"})
    groups = max(1, len(refs) // 5)
    payloads = []
    for r in refs:
        g = int(hashlib.md5(r.encode()).hexdigest(), 16) % groups
        payloads.append(f"PAYLOAD-{g}-".encode() * 32)
    return pa.table({"media_ref": pa.array(refs, pa.string()),
                     "payload": pa.array(payloads, pa.binary())})


def _bench_media_real() -> str:
    """Decodable-media variant for the perceptual bench: refs group ~5x like
    the exact table, each group shares a base PPM image, each ref gets a
    lightly-noised re-encode of its group's base (the crawl's re-encoded-copy
    shape). Cached lazily alongside the main fixture (its own _DONE marker so
    pre-existing fixture caches pick it up without a regen)."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from brdrq_ray.functions.multimodal import encode_ppm

    fdir = _bench_fixture_dir()
    path = f"{fdir}/media_real.parquet"
    done = f"{fdir}/_DONE_MEDIA_REAL"
    if os.path.exists(done):
        return path
    docs_tbl = pq.read_table(f"{fdir}/documents.parquet", columns=["spans"])
    refs = sorted({s["media_ref"] for spans in docs_tbl.column("spans").to_pylist()
                   for s in spans if s["kind"] == "media"})
    groups = max(1, len(refs) // 5)
    base = {}
    payloads = []
    for r in refs:
        g = int(hashlib.md5(r.encode()).hexdigest(), 16) % groups
        if g not in base:
            rng = np.random.default_rng(g)
            h, w = 40 + g % 17, 48 + g % 23
            gx = np.linspace(0, 200, w)[None, :, None]
            gy = np.linspace(0, 150, h)[:, None, None]
            base[g] = np.clip(0.4 * gx + 0.35 * gy
                              + rng.uniform(0, 70, size=(h, w, 3)),
                              0, 255).astype(np.uint8)
        rng_r = np.random.default_rng(
            int(hashlib.md5(f"n:{r}".encode()).hexdigest()[:8], 16))
        noisy = np.clip(base[g].astype(np.int16)
                        + rng_r.integers(-2, 3, size=base[g].shape),
                        0, 255).astype(np.uint8)
        payloads.append(encode_ppm(noisy))
    pq.write_table(pa.table({"media_ref": pa.array(refs, pa.string()),
                             "payload": pa.array(payloads, pa.binary())}),
                   path)
    open(done, "w").close()
    return path


def run_headline() -> dict:
    import ray.data
    from brdrq_ray.alignment import AlignConfig, OD_EXCLUDE
    from brdrq_ray.pipelines.documents import align_documents

    fdir = _bench_fixture_dir()
    # warm the page cache AND the Ray worker pool (worker-process spawn is a
    # per-session fixed cost that must not be charged to the measured run)
    ray.data.read_parquet(f"{fdir}/documents.parquet").count()
    ray.data.read_parquet(f"{fdir}/reference.parquet").count()
    def _warm(batch):
        # pull the heavy imports into every worker process so the measured
        # run doesn't pay per-worker module import (cluster warm-up cost)
        import numpy as _np
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        import brdrq_ray.alignment  # noqa: F401
        import brdrq_ray.stages.align_stage  # noqa: F401
        import brdrq_ray.pipelines.documents  # noqa: F401
        return {"x": _np.asarray(batch["id"]) * 2}

    (ray.data.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 8)
     .map_batches(_warm, batch_format="numpy")
     .count())

    # group-size knob, num_cpus-independent so both scaling runs execute the
    # identical job: at least 320 groups (~10 per core at the larger level —
    # the r2-tuned value; finer groups soak the hot-tile skew) AND at most
    # ~410 rows per group (the r3 decade finding: constant rows-per-group,
    # not constant group count, keeps 500k docs at 97% of the 60k-doc
    # throughput; geometry spans are roughly 2.2x docs in this corpus)
    spans = int(BENCH_DOCS * 2.2)
    if os.environ.get("BRDRQ_TARGET_GROUPS"):
        hot = max(24, spans // int(os.environ["BRDRQ_TARGET_GROUPS"]))
    else:
        hot = max(24, min(410, spans // 320))
    hot = int(os.environ.get("BRDRQ_HOT_THRESHOLD", "0")) or hot
    # best-of-N inside the session: the sandbox machine shows +-30% wall noise
    # between minutes; one unlucky rep must not define the round's number
    reps = int(os.environ.get("BRDRQ_HEADLINE_REPS", "2"))
    # sort-partition count == input block count in Ray Data's groupby path.
    # Diagnostic knob for the align straggler tail (r5 stage profile:
    # 3.2-18.3 s task spread at 128 blocks). MEASURED NEGATIVE at 60k docs:
    # 256 blocks ran 156 s vs 89 s at auto (finer partitions pay more task
    # overhead and lose per-task unpack-cache reuse than the shorter tail
    # recovers — BASELINE.md r5). 0 = Ray's automatic sizing; leave it.
    read_blocks = int(os.environ.get("BRDRQ_READ_BLOCKS", "0"))
    rkw = {"override_num_blocks": read_blocks} if read_blocks else {}
    best = None
    n_docs = 0
    for _ in range(max(1, reps)):
        t0 = time.time()
        # the headline measures the SCALE path: reference replicated through
        # the shuffle (broadcast fast path exists but would sidestep the
        # exchange the scaling criterion is about)
        from brdrq_ray.sources.documents import read_interleaved_documents
        out = align_documents(read_interleaved_documents(f"{fdir}/documents.parquet",
                                                         **rkw),
                              ray.data.read_parquet(f"{fdir}/reference.parquet",
                                                    **rkw),
                              AlignConfig(relevant_distance=2.0, od_strategy=OD_EXCLUDE),
                              hot_threshold=hot, broadcast_reference=False)
        n_docs = out.count()
        wall = time.time() - t0
        best = wall if best is None else min(best, wall)
    return {"sec": round(best, 3), "docs": n_docs,
            "docs_per_sec": round(n_docs / best, 2)}


def run_queries() -> dict:
    """Representative operator-level pipelines over the driver tables.

    Sequential, best-of-N per query (machine wall noise is ±30% between
    minutes — single-rep numbers cannot be compared round-over-round).
    `hash_join_broadcast` times the PRODUCTION broadcast-join leg on its
    own; the composite `hash_join` (all three legs + three driver equality
    materializations) stays as the correctness gate, so its time is gate
    cost, not production cost."""
    import __ray_entry__ as entrymod
    from brdrq_ray.functions import relational as rel

    qs = entrymod.queries()
    qs["hash_join_broadcast"] = rel.broadcast_hash_join

    # production dedup legs under their own names (the driver-facing
    # `minhash_pairs` is a composite gate — minhash ⊆ exact-join containment
    # plus two to_pandas materializations — whose time is gate cost)
    def _minhash_prod(sf_dir: str):
        import ray.data
        from brdrq_ray.functions.dedup import minhash_lsh_pairs
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return minhash_lsh_pairs(docs, jaccard_threshold=0.5)

    def _jaccard_exact(sf_dir: str):
        import ray.data
        from brdrq_ray.functions.dedup import jaccard_similarity_join
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return jaccard_similarity_join(docs, threshold=0.5)

    qs["minhash_pairs"] = _minhash_prod
    qs["jaccard_join_exact"] = _jaccard_exact

    # production token counter under its own name — the driver-facing
    # `token_count` is a composite gate since r4 (count + budget flag +
    # UniMax flag + a pinned materialization), whose time is gate cost
    def _token_count_prod(sf_dir: str):
        import ray.data
        from brdrq_ray.functions.text import token_count_batch
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])
        return ds.map_batches(
            lambda b: token_count_batch(b).select(["doc_id", "ws_tokens",
                                                   "bpe_tokens"]),
            batch_format="pyarrow")

    qs["token_count"] = _token_count_prod

    # production brute-force kNN under its own name — the driver-facing
    # `knn_top5` is a composite gate since r5 (brute + knn_join legs)
    def _knn_prod(sf_dir: str):
        import numpy as np
        import pyarrow.parquet as pqt
        import ray.data
        from brdrq_ray.functions.similarity import knn_brute_force
        path = f"{sf_dir}/embeddings.parquet"
        Q = np.asarray(pqt.read_table(path).column("embedding")
                       .to_pylist()[:3])
        return knn_brute_force(ray.data.read_parquet(path), Q, k=5)

    qs["knn_top5"] = _knn_prod

    def _curation(sf_dir: str):
        import ray.data
        from brdrq_ray.pipelines.curation import CurationConfig, curate_and_pack
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        _, packed = curate_and_pack(
            docs, CurationConfig(quality_min=0.3, jaccard_threshold=0.5))
        return packed

    qs["curation_e2e"] = _curation

    def _semantic_dedup(sf_dir: str):
        import ray.data
        from brdrq_ray.functions.similarity import semantic_dedup_keep_ids
        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        return semantic_dedup_keep_ids(emb, threshold=0.3, n_clusters=8,
                                       train_sample=4096,
                                       distributed_train=False)

    def _bpe_train_encode(sf_dir: str):
        import ray.data
        from brdrq_ray.functions.bpe import bpe_encode, train_bpe
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        model = train_bpe(docs, n_merges=200)
        return bpe_encode(docs, model)

    def _dsir(sf_dir: str):
        import pyarrow.compute as pc
        import ray.data
        from brdrq_ray.functions.sampling import dsir_resample
        from brdrq_ray.functions.text import train_ngram_lm
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text", "lang"])
        target = docs.map_batches(
            lambda t: t.filter(pc.equal(t.column("lang"), "en")),
            batch_format="pyarrow")
        t_model = train_ngram_lm(target, n_buckets=1 << 18)
        r_model = train_ngram_lm(docs, n_buckets=1 << 18)
        return dsir_resample(docs.materialize(), t_model, r_model,
                             fraction=0.25)

    def _pq_knn(sf_dir: str):
        import numpy as np
        import pyarrow.parquet as pqt
        import ray.data
        from brdrq_ray.functions.pq import ivfpq_knn
        path = f"{sf_dir}/embeddings.parquet"
        Q = np.asarray(pqt.read_table(path).column("embedding")
                       .to_pylist()[:16])
        return ivfpq_knn(ray.data.read_parquet(path), Q, k=10,
                         n_clusters=None, m=8, ks=64, n_probe=4, rerank=50)

    qs["semantic_dedup"] = _semantic_dedup
    qs["bpe_train_encode"] = _bpe_train_encode
    qs["dsir_resample"] = _dsir
    qs["pq_knn"] = _pq_knn

    def _media_dedup(sf_dir: str):
        # runs over the headline fixture (the sf dir has no media table):
        # interleaved docs + a 5x-duplicated media table, broadcast leg
        import ray.data
        from brdrq_ray.pipelines.documents import dedup_media_payloads
        fdir = _bench_fixture_dir()
        out_docs, _, _ = dedup_media_payloads(
            ray.data.read_parquet(f"{fdir}/documents.parquet"),
            ray.data.read_parquet(f"{fdir}/media.parquet"))
        return out_docs

    qs["media_dedup"] = _media_dedup

    def _media_dedup_perceptual(sf_dir: str):
        # perceptual variant: real PPM payloads, ~5x groups of lightly-noised
        # re-encodes — decode + DCT pHash actor pool, Hamming banding,
        # connected components, span rewrite
        import ray.data
        from brdrq_ray.pipelines.documents import dedup_media_payloads
        fdir = _bench_fixture_dir()
        out_docs, _, _ = dedup_media_payloads(
            ray.data.read_parquet(f"{fdir}/documents.parquet"),
            ray.data.read_parquet(_bench_media_real()),
            perceptual_hamming=8)
        return out_docs

    qs["media_dedup_perceptual"] = _media_dedup_perceptual

    def _bm25(sf_dir: str):
        import ray.data
        from brdrq_ray.functions.search import bm25_search
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return bm25_search(docs, {"q1": "hash join merge sort",
                                  "q2": "customer query window stream",
                                  "q3": "vector scan filter"}, k=10)

    def _dbscan(sf_dir: str):
        # deterministic synthetic point cloud: 5k ten-member clusters +
        # uniform noise (~60k points) over a 4 km window
        import numpy as np
        import pyarrow as pa
        import ray.data
        from brdrq_ray.functions.spatial_cluster import dbscan_points
        rng = np.random.default_rng(42)
        centers = rng.random((5000, 2)) * 4000 + 100000
        pts = (centers[:, None, :]
               + rng.normal(0, 1.0, (5000, 10, 2))).reshape(-1, 2)
        noise = rng.random((10000, 2)) * 4000 + 100000
        xy = np.vstack([pts, noise])
        t = pa.table({"point_id": pa.array([f"p{i:06d}"
                                            for i in range(len(xy))]),
                      "x": pa.array(xy[:, 0]), "y": pa.array(xy[:, 1])})
        return dbscan_points(ray.data.from_arrow(t), eps=1.5, min_pts=4,
                             include_noise=False)

    def _spatial_index(sf_dir: str):
        # build over the bench reference tessellation, probe 8 features
        import ray.data
        from brdrq_ray.functions.spatial_index import (spatial_index_build,
                                                       spatial_index_probe)
        from brdrq_ray.sources import fixtures as fx
        fdir = _bench_fixture_dir()
        idx = spatial_index_build(
            ray.data.read_parquet(f"{fdir}/reference.parquet"),
            index_dir="/tmp/brdrq_bench/sidx")
        theme = fx.make_thematic_table(nx=BENCH_GRID, ny=BENCH_GRID, seed=7,
                                       n_features=8)
        queries = {theme.column("theme_id")[i].as_py():
                   theme.column("geometry_wkt")[i].as_py()
                   for i in range(theme.num_rows)}
        return spatial_index_probe(idx, queries)

    def _reproject(sf_dir: str):
        # Lambert-72 -> WGS84 -> Lambert-72 round trip over the bench
        # reference tessellation (production egress/ingress chain)
        import ray.data
        from brdrq_ray.functions.geometry_ops import reproject_geometries
        from brdrq_ray.stages.ingest import parse_geometries
        fdir = _bench_fixture_dir()
        parsed = ray.data.read_parquet(f"{fdir}/reference.parquet") \
            .map_batches(parse_geometries, batch_format="pyarrow")
        deg = reproject_geometries(parsed, "EPSG:31370", "EPSG:4326")
        return reproject_geometries(deg, "EPSG:4326", "EPSG:31370")

    qs["bm25_search"] = _bm25
    qs["dbscan"] = _dbscan
    qs["spatial_index"] = _spatial_index
    qs["reproject"] = _reproject

    def _spatial_semi_prod(sf_dir: str):
        # the driver-facing query is now a composite gate (tiled join +
        # index build/probe asserted equal); bench the PRODUCTION tiled leg
        import ray.data
        from brdrq_ray.functions.spatial_join import intersects_semi_join
        import __ray_entry__ as em
        fdir = em._fixture_dir(sf_dir)
        return intersects_semi_join(
            ray.data.read_parquet(f"{fdir}/thematic.parquet"),
            ray.data.read_parquet(f"{fdir}/reference.parquet"))

    qs["spatial_semi_join"] = _spatial_semi_prod
    names = ["metrics_agg", "grouped_topk", "hash_join", "hash_join_broadcast",
             "asof_join",
             "exact_dedup_documents", "token_count", "knn_top5", "minhash_pairs",
             "jaccard_join_exact",
             "curation_e2e", "semantic_dedup", "bpe_train_encode",
             "dsir_resample", "media_dedup", "media_dedup_perceptual", "pq_knn",
             "align_predict", "align_evaluate", "autoupdate", "spatial_semi_join",
             "semi_anti_join", "correction", "media_decode",
             "bm25_search", "dbscan", "spatial_index", "reproject"]
    reps = max(1, int(os.environ.get("BRDRQ_QUERY_REPS", "2")))
    out = {}
    for name in names:
        best = None
        for _ in range(reps):
            t0 = time.time()
            res = qs[name](SF_DIR)
            if hasattr(res, "count"):
                res.count()  # consume the lazy Dataset
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
        out[name] = round(best, 3)
    return out


def main_single():
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        from ray.data import DataContext
        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        head = run_headline()
        queries = run_queries()
    finally:
        ray.shutdown()
    print(json.dumps({
        "metric": "interleaved-doc alignment wall time (headline) + operator timings",
        "value": head["sec"],
        "unit": "sec",
        "docs": head["docs"],
        "docs_per_sec": head["docs_per_sec"],
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }))


def _run_child(ncpu: int, headline_only: bool = True) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
               BRDRQ_BENCH_HEADLINE_ONLY="1" if headline_only else "0",
               # the scaling protocol already takes best-of-N across children;
               # no need for the in-session best-of-2 on top
               BRDRQ_HEADLINE_REPS=os.environ.get("BRDRQ_HEADLINE_REPS", "1"))
    out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                         capture_output=True, text=True, check=True,
                         cwd=os.path.dirname(os.path.abspath(__file__))).stdout
    return json.loads(out.strip().splitlines()[-1])


def main_scaling():
    lo, hi = 8, 32
    reps = int(os.environ.get("BRDRQ_SCALING_REPS", "2"))
    # best-of-N per level: one slow outlier (OS jitter, page-cache misses)
    # must not masquerade as super- or sub-linear scaling
    runs_lo = [_run_child(lo) for _ in range(reps)]
    runs_hi = [_run_child(hi) for _ in range(reps)]
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    tp_lo = r_lo["docs_per_sec"]
    tp_hi = r_hi["docs_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    print(json.dumps({
        "metric": "headline scaling efficiency (docs/sec at 8 vs 32 cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sec_8": r_lo["value"], "sec_32": r_hi["value"],
        "sec_8_all": [r["value"] for r in runs_lo],
        "sec_32_all": [r["value"] for r in runs_hi],
        "docs_per_sec_8": tp_lo, "docs_per_sec_32": tp_hi,
        "docs": r_lo["docs"],
        "sf": SF_DIR,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif os.environ.get("BRDRQ_BENCH_HEADLINE_ONLY") == "1":
        import ray

        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
        try:
            from ray.data import DataContext
            DataContext.get_current().enable_progress_bars = False
            head = run_headline()
        finally:
            ray.shutdown()
        print(json.dumps({"metric": "headline", "value": head["sec"], "unit": "sec",
                          "docs": head["docs"], "docs_per_sec": head["docs_per_sec"],
                          "num_cpus": NUM_CPUS, "sf": SF_DIR}))
    else:
        main_single()

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

DOCS = f"{SF_DIR}/documents.parquet"
EMB = f"{SF_DIR}/embeddings.parquet"


def test_token_count_batch():
    from brdrq_ray.functions.text import token_count_batch

    t = pa.table({"doc_id": [1, 2, 3], "text": ["a b c", "", "x,y z"]})
    out = token_count_batch(t)
    assert out.column("ws_tokens").to_pylist() == [3, 0, 2]
    assert out.column("bpe_tokens").to_pylist() == [3, 0, 4]  # x , y z


def test_quality_and_fingerprint():
    from brdrq_ray.functions.text import fingerprint_batch, quality_score_batch

    t = pa.table({"doc_id": [1, 2], "text": ["the quick brown fox", "  THE  quick   brown fox "]})
    q = quality_score_batch(t)
    assert 0 <= q.column("quality_score")[0].as_py() <= 1
    f = fingerprint_batch(t)
    # normalization makes both rows identical fingerprints
    assert f.column("fingerprint_md5")[0].as_py() == f.column("fingerprint_md5")[1].as_py()
    assert f.column("fingerprint_roll")[0].as_py() == f.column("fingerprint_roll")[1].as_py()


def test_langid_stage():
    from brdrq_ray.functions.text import LangIdStage

    stage = LangIdStage()
    out = stage(pa.table({"text": ["the singer and the villain went to the mention"]}))
    assert out.column("lang_pred")[0].as_py() in ("en", "nl", "fr", "de", "und")


def test_langid_large_string_offsets():
    """large_string columns carry int64 offsets — the zero-copy trigram path
    must branch on the type, not silently misparse them as int32."""
    from brdrq_ray.functions.text import LangIdStage

    texts = ["the singer and the villain went to the mention",
             "de aanzienlijke hoeveelheid schattige lijsten"]
    stage = LangIdStage()
    small = stage(pa.table({"text": pa.array(texts, pa.string())}))
    big = stage(pa.table({"text": pa.array(texts, pa.large_string())}))
    assert small.column("lang_pred").to_pylist() == big.column("lang_pred").to_pylist()
    assert small.column("lang_conf").to_pylist() == big.column("lang_conf").to_pylist()


def test_fingerprint_leading_nul_sensitivity():
    """texts differing only by leading NUL bytes (invisible to a base-256
    integer) must roll to distinct fingerprints (length is mixed in)."""
    from brdrq_ray.functions.text import fingerprint_batch

    t = pa.table({"doc_id": [1, 2], "text": ["\x00abc", "abc"]})
    f = fingerprint_batch(t)
    assert (f.column("fingerprint_roll")[0].as_py()
            != f.column("fingerprint_roll")[1].as_py())


def test_exact_dedup(ray_session):
    import ray.data
    from brdrq_ray.functions.dedup import exact_dedup

    t = pa.table({"doc_id": [3, 1, 2, 5], "text": ["x", "x", "y", "y"]})
    out = exact_dedup(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2]


def test_minhash_pairs_finds_near_dups(ray_session):
    import ray
    import ray.data
    from brdrq_ray.functions.dedup import minhash_lsh_pairs, ngram_jaccard

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = {1: base, 2: base + " tail", 3: "completely different words here entirely",
             4: base.replace("quick", "slow"), 5: "another unrelated text about rivers"}
    t = pa.table({"doc_id": list(texts), "text": list(texts.values())})
    pairs = minhash_lsh_pairs(ray.data.from_arrow(t),
                              jaccard_threshold=0.5).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (1, 2) in got
    assert all(ngram_jaccard(texts[a], texts[b]) >= 0.5 for a, b in got)
    assert not any(3 in p or 5 in p for p in got)


def test_minhash_join_verify_matches_broadcast_verify(ray_session):
    """The join-based verify (no corpus broadcast) must return the identical
    pair set + jaccard values as the legacy broadcast verify, on a corpus with
    real near-dup structure."""
    import ray
    import ray.data
    from brdrq_ray.functions.dedup import minhash_lsh_pairs

    rng = __import__("numpy").random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "parcel", "border", "map", "road"]
    texts = {}
    for i in range(60):
        base = " ".join(rng.choice(words, size=20))
        texts[2 * i] = base
        # every even doc gets a near-dup odd twin with a small mutation
        texts[2 * i + 1] = base + (" tail" if i % 2 else "")
    t = pa.table({"doc_id": list(texts), "text": list(texts.values())})

    legacy = (minhash_lsh_pairs(ray.data.from_arrow(t),
                                text_lookup=ray.put(texts),
                                jaccard_threshold=0.5)
              .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(legacy) > 0
    # both scale paths: broadcast-candidate-texts (default) and the pure
    # two-shuffle join (broadcast_texts_limit=0)
    for limit in (100_000, 0):
        new = (minhash_lsh_pairs(ray.data.from_arrow(t), jaccard_threshold=0.5,
                                 broadcast_texts_limit=limit)
               .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
        assert new["id_a"].astype("int64").tolist() == legacy["id_a"].astype("int64").tolist()
        assert new["id_b"].astype("int64").tolist() == legacy["id_b"].astype("int64").tolist()
        assert (new["jaccard"].round(12) == legacy["jaccard"].round(12)).all()


def test_short_text_shingles_are_seed_independent():
    """Texts shorter than k words must hash via blake2b, not builtin hash():
    str hash is PYTHONHASHSEED-randomized per process, so identical short docs
    sketched in different Ray workers would get different MinHash bands."""
    import hashlib
    import subprocess
    import sys

    from brdrq_ray.functions.dedup import _word_shingles

    got = _word_shingles("two words", k=3)
    want = int.from_bytes(hashlib.blake2b(b"two words", digest_size=8).digest(),
                          "little") & 0x7FFFFFFFFFFFFFFF
    assert got == {want}
    # cross-process determinism under a different PYTHONHASHSEED
    code = ("import sys; sys.path.insert(0, '.');"
            "from brdrq_ray.functions.dedup import _word_shingles;"
            "print(sorted(_word_shingles('two words', k=3))[0])")
    for seed in ("0", "12345"):
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, cwd="/root/repo",
                             env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin"})
        assert out.returncode == 0, out.stderr
        assert int(out.stdout.strip()) == want


def test_simhash_deterministic():
    from brdrq_ray.functions.dedup import simhash64

    a = simhash64("hello world foo bar")
    assert a == simhash64("hello world foo bar")
    assert a != simhash64("totally different content")


def test_embedding_neardup(ray_session):
    import ray.data
    from brdrq_ray.functions.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(0)
    V = rng.standard_normal((50, 16))
    V[10] = V[3] + 1e-4          # near-duplicate pair
    t = pa.table({"vec_id": pa.array(range(50), pa.int64()),
                  "embedding": pa.array(V.tolist(), pa.list_(pa.float64()))})
    pairs = embedding_neardup_pairs(ray.data.from_arrow(t), dim=16,
                                    threshold=0.999).to_pandas()
    assert (3, 10) in set(zip(pairs["id_a"], pairs["id_b"]))


def test_knn_brute_force_matches_numpy(ray_session):
    import ray.data
    from brdrq_ray.functions.similarity import knn_brute_force

    emb = pq.read_table(EMB)
    V = np.asarray(emb.column("embedding").to_pylist())
    ids = np.asarray(emb.column("vec_id").to_pylist())
    Q = V[:3]
    got = knn_brute_force(ray.data.from_arrow(emb), Q, k=5)
    # numpy oracle
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sim = np.round(Qn @ Vn.T, 9)
    for qi in range(3):
        order = sorted(zip(-sim[qi], ids), key=lambda x: (x[0], x[1]))[:5]
        expect = [int(i) for _, i in order]
        mine = got[got["query_id"] == qi]["vec_id"].tolist()
        assert mine == expect
        # self is its own nearest neighbour
        assert mine[0] == int(ids[qi])


def test_ivf_knn_recall(ray_session):
    import ray.data
    from brdrq_ray.functions.similarity import ivf_knn, knn_brute_force

    emb = pq.read_table(EMB)
    Q = np.asarray(emb.column("embedding").to_pylist())[:5]
    exact = knn_brute_force(ray.data.from_arrow(emb), Q, k=10)
    approx = ivf_knn(ray.data.from_arrow(emb), Q, k=10, n_clusters=8, n_probe=3)
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6


def test_ivf_inverted_file_probe_io(ray_session, tmp_path):
    """The inverted file is materialized (partitioned parquet per cell) and a
    probe reads ONLY the probed cells: scanned rows ~= sum of probed cell
    sizes << corpus size, with recall identical to the unpartitioned scan."""
    import pyarrow.parquet as ppq
    import ray.data
    from brdrq_ray.functions.similarity import (
        _normalize, ivf_build, ivf_cell_files, ivf_probe)

    emb = pq.read_table(EMB)
    n_total = emb.num_rows
    Q = np.asarray(emb.column("embedding").to_pylist())[:3]
    index = ivf_build(ray.data.from_arrow(emb), n_clusters=8,
                      index_dir=str(tmp_path / "ivf"))

    # which cells do these queries probe?
    C = index["codebook"]
    Qn = _normalize(np.asarray(Q, dtype=np.float64))
    probe_cells = sorted({int(c) for row in
                          np.argsort(-(Qn @ C.T), axis=1)[:, :2] for c in row})
    scanned = sum(ppq.read_metadata(f).num_rows
                  for f in ivf_cell_files(index["index_dir"], probe_cells))
    assert 0 < scanned < n_total  # the probe never scans the whole corpus

    got = ivf_probe(index, Q, k=5, n_probe=2)
    # the probe result equals a brute-force scan RESTRICTED to the probed
    # cells (i.e. partition pruning loses nothing vs. the old full-scan+filter)
    sub = ray.data.read_parquet(ivf_cell_files(index["index_dir"], probe_cells))
    sdf = sub.to_pandas()
    V = np.asarray(sdf["embedding"].tolist())
    ids = sdf["vec_id"].to_numpy()
    cells = sdf["ivf_cell"].astype(int).to_numpy()
    Vn = _normalize(V)
    for qi in range(3):
        mycells = set(np.argsort(-(Qn[qi] @ C.T))[:2].tolist())
        mask = np.isin(cells, list(mycells))
        sim = np.round(Vn[mask] @ Qn[qi], 9)
        order = sorted(zip(-sim, ids[mask]), key=lambda x: (x[0], x[1]))[:5]
        expect = [int(i) for _, i in order]
        mine = got[got["query_id"] == qi]["vec_id"].astype(int).tolist()
        assert mine == expect


def test_multimodal_stub(ray_session):
    import ray.data
    from brdrq_ray.functions.multimodal import (
        FrameSampleStage, ImageDecodeStage, decode_images, synthesize_media_table)

    refs = [f"media://img/{i}.jpg" for i in range(10)]
    media = synthesize_media_table(refs)
    assert media.num_rows == 10
    # undecodable bytes on the real path raise the documented error
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(fake=False)._decode_one(b"xx")
    # REAL decode path: synthesized payloads are genuine PPMs
    out = decode_images(ray.data.from_arrow(media), fake=False).to_pandas()
    assert len(out) == 10
    assert (out["width"] > 0).all()
    assert out["features"].map(len).eq(16).all()
    # determinism (real features from real pixels)
    out2 = decode_images(ray.data.from_arrow(synthesize_media_table(refs)),
                         fake=False).to_pandas()
    assert out.sort_values("media_ref")["features"].map(tuple).tolist() == \
           out2.sort_values("media_ref")["features"].map(tuple).tolist()
    # fake path still works on arbitrary bytes (plumbing smoke)
    fake_media = synthesize_media_table(refs, real=False)
    outf = decode_images(ray.data.from_arrow(fake_media), fake=True).to_pandas()
    assert len(outf) == 10
    frames = ray.data.from_arrow(fake_media).map_batches(
        FrameSampleStage, fn_constructor_kwargs=dict(fake=True),
        batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    assert len(frames) == 40


def test_multimodal_real_codecs():
    """The r2 pure-python codecs round-trip and measure real content."""
    import numpy as np
    from brdrq_ray.functions.multimodal import (
        decode_ppm, decode_bmp, decode_wav, decode_video_frames, encode_ppm,
        encode_wav, encode_video, _resize_nn)

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)

    # hand-rolled 24-bit BMP (bottom-up, padded rows)
    import struct
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):
        row = arr[y, :, ::-1].tobytes()
        rows.append(row + b"\x00" * (stride - len(row)))
    pix = b"".join(rows)
    bmp = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
           + pix)
    assert np.array_equal(decode_bmp(bmp), arr)

    # WAV round trip (16-bit PCM)
    x = np.sin(2 * np.pi * 440 * np.arange(1600) / 16000)
    got, rate = decode_wav(encode_wav(x, 16000))
    assert rate == 16000 and len(got) == 1600
    assert np.abs(got - x).max() < 2e-4

    # video container round trip
    frames = [arr, (arr // 2)]
    dec = list(decode_video_frames(encode_video(frames)))
    assert len(dec) == 2
    assert np.array_equal(decode_ppm(dec[1][1]), arr // 2)

    # nearest-neighbour resize picks real pixels
    small = _resize_nn(arr, 8, 4)
    assert small.shape == (4, 8, 3)
    assert small.dtype == np.uint8


def test_multimodal_truncated_payloads_raise_value_error():
    """Malformed payloads that pass the magic-prefix check must surface as
    ValueError (caught by the decode stages), never struct.error."""
    import numpy as np
    import pytest
    from brdrq_ray.functions.multimodal import (
        ImageDecodeStage, decode_bmp, decode_video_frames, encode_video,
        VIDEO_MAGIC)

    with pytest.raises(ValueError):
        decode_bmp(b"BM\x01\x02")  # truncated after the magic
    with pytest.raises(ValueError):
        list(decode_video_frames(VIDEO_MAGIC + b"\x07"))  # truncated count
    rng = np.random.default_rng(7)
    full = encode_video([rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)])
    with pytest.raises(ValueError):
        list(decode_video_frames(full[:len(VIDEO_MAGIC) + 6]))
    # and the actor stage converts it to the documented NotImplementedError
    import pyarrow as pa
    stage = ImageDecodeStage()
    bad = pa.table({"media_ref": ["x"], "payload": pa.array([b"BM\x00"], pa.binary())})
    with pytest.raises(NotImplementedError):
        stage(bad)


def test_analyze_documents_on_testdata(ray_session):
    import ray.data
    from brdrq_ray.functions.text import analyze_documents

    ds = ray.data.read_parquet(DOCS)
    out = analyze_documents(ds).to_pandas()
    assert {"ws_tokens", "bpe_tokens", "quality_score", "fingerprint_md5",
            "lang_pred"} <= set(out.columns)
    assert len(out) == pq.read_metadata(DOCS).num_rows


def test_duplicate_clusters(ray_session):
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.dedup import duplicate_clusters

    # two clusters {1,2,3,4} (chain) and {10,11}; singleton 99 not in pairs
    pairs = pa.table({"id_a": pa.array([1, 2, 3, 10], pa.int64()),
                      "id_b": pa.array([2, 3, 4, 11], pa.int64())})
    out = duplicate_clusters(ray.data.from_arrow(pairs)).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_minhash_degenerate_bucket_star_guard(ray_session):
    """A collision group over the pair cap emits a spanning star (c-1 edges)
    around its min id instead of C(c,2) pairs; clustering is unchanged."""
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.dedup import duplicate_clusters, minhash_lsh_pairs

    doc = "identical boilerplate footer repeated across the whole crawl " * 5
    tbl = pa.table({"doc_id": pa.array(list(range(40)), pa.int64()),
                    "text": pa.array([doc] * 40, pa.string())})
    capped = minhash_lsh_pairs(ray.data.from_arrow(tbl),
                               jaccard_threshold=0.9,
                               max_group_pairs=16).to_pandas()
    # star: every pair involves the hub id 0, one edge per other member
    assert len(capped) == 39
    assert (capped["id_a"] == 0).all()
    assert sorted(capped["id_b"]) == list(range(1, 40))
    cl = duplicate_clusters(
        ray.data.from_arrow(pa.Table.from_pandas(
            capped[["id_a", "id_b"]], preserve_index=False))).to_pandas()
    assert cl["cluster_id"].nunique() == 1 and len(cl) == 40
    # below the cap the exhaustive listing is unchanged
    full = minhash_lsh_pairs(ray.data.from_arrow(tbl),
                             jaccard_threshold=0.9).to_pandas()
    assert len(full) == 40 * 39 // 2


def test_cell_level_override_guard(ray_session):
    import pytest as _pt
    import ray.data
    from brdrq_ray.pipelines.autocorrect import run_alignment
    from brdrq_ray import alignment as al
    from brdrq_ray.sources import fixtures as fx

    theme = fx.make_thematic_table(nx=8, ny=8, seed=42, n_features=5)
    ref = fx.make_reference_table(nx=8, ny=8, seed=42)
    with _pt.raises(ValueError, match="co-partition guarantee"):
        # 64 m cells (probe clamp) cannot hold an ~82 m feature + 2*30 m reach
        run_alignment(ray.data.from_arrow(theme), ray.data.from_arrow(ref),
                      al.AlignConfig(relevant_distance=30.0),
                      cell_level=18).count()


def test_multimodal_resize_and_audio(ray_session):
    import numpy as np
    import ray.data
    from brdrq_ray.functions.multimodal import (
        AudioFeatureStage, FrameSampleStage, ImageResizeStage, decode_ppm,
        synthesize_media_table)

    refs = [f"media://img/{i}.jpg" for i in range(6)] + \
           [f"media://snd/{i}.wav" for i in range(4)] + \
           [f"media://vid/{i}.mp4" for i in range(2)]
    media = synthesize_media_table(refs)
    imgs = media.filter(pa.compute.equal(media.column("media_type"), "image"))
    # REAL resize: output payloads are decodable PPMs of the target size
    resized = ray.data.from_arrow(imgs).map_batches(
        ImageResizeStage, fn_constructor_kwargs=dict(target_w=128, target_h=96),
        batch_format="pyarrow", batch_size=4, concurrency=(1, 2)).to_pandas()
    assert (resized["width"] == 128).all() and (resized["height"] == 96).all()
    assert all(decode_ppm(p).shape == (96, 128, 3) for p in resized["payload"])

    auds = media.filter(pa.compute.equal(media.column("media_type"), "audio"))
    feats = ray.data.from_arrow(auds).map_batches(
        AudioFeatureStage, batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    assert feats["mel_features"].map(len).eq(32).all()
    assert (feats["duration_sec"] > 0).all()
    # real band energies: a pure tone concentrates energy (non-uniform bands)
    v = np.asarray(feats["mel_features"].iloc[0])
    assert v.max() > 2 * max(v.mean(), 1e-9)

    vids = media.filter(pa.compute.equal(media.column("media_type"), "video"))
    frames = ray.data.from_arrow(vids).map_batches(
        FrameSampleStage, fn_constructor_kwargs=dict(n_frames=3),
        batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    assert len(frames) == 6  # 3 real frames per video, real dims
    assert (frames["width"] == 32).all() and (frames["height"] == 24).all()

    # undecodable bytes on the real path raise
    with pytest.raises(NotImplementedError):
        ImageResizeStage()(synthesize_media_table(
            ["media://img/x.jpg"], real=False))


def test_simhash_neardup_pairs(ray_session):
    """Pigeonhole-banded simhash near-dup: finds pairs within Hamming<=k and
    matches the brute-force all-pairs oracle exactly."""
    import itertools
    import ray.data
    from brdrq_ray.functions.dedup import simhash64, simhash_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog near the old barn"
    texts = {1: base, 2: base + " x", 3: base.replace("quick", "slow"),
             4: "an entirely different document about rivers and boats",
             5: base + " x", 6: "another unrelated piece of text entirely here"}
    t = pa.table({"doc_id": list(texts), "text": list(texts.values())})
    got = simhash_neardup_pairs(ray.data.from_arrow(t), max_hamming=3).to_pandas()
    got_pairs = {(a, b): h for a, b, h in
                 zip(got["id_a"], got["id_b"], got["hamming"])}
    # brute-force oracle
    sh = {k: simhash64(v) for k, v in texts.items()}
    expect = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        h = bin(sh[a] ^ sh[b]).count("1")
        if h <= 3:
            expect[(a, b)] = h
    assert got_pairs == expect
    assert (2, 5) in got_pairs and got_pairs[(2, 5)] == 0  # identical twins


def test_pack_sequences(ray_session):
    """Greedy packing invariants: every doc appears once; within a sequence
    documents are contiguous (offset = running token sum); no sequence except
    oversized single-doc ones exceeds the budget."""
    import ray.data
    from brdrq_ray.functions.text import pack_sequences

    texts = {i: " ".join(["w"] * n) for i, n in
             enumerate([100, 200, 300, 50, 500, 120, 80, 999, 10, 40])}
    t = pa.table({"doc_id": list(texts), "text": list(texts.values())})
    out = pack_sequences(ray.data.from_arrow(t), token_budget=512,
                         n_buckets=2).to_pandas()
    assert sorted(out["doc_id"]) == sorted(texts)
    assert (out.groupby("doc_id").size() == 1).all()
    for _, seq in out.groupby("seq_id"):
        seq = seq.sort_values("seq_offset")
        # contiguity: offsets are the running sum of earlier docs' tokens
        run = 0
        for _, r in seq.iterrows():
            assert r["seq_offset"] == run
            run += r["ws_tokens"]
        if len(seq) > 1:
            assert run <= 512  # only single oversized docs may exceed
    # deterministic across runs
    out2 = pack_sequences(ray.data.from_arrow(t), token_budget=512,
                          n_buckets=2).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_hll_count_distinct(ray_session):
    """HLL estimate within ~3x its standard error of the exact distinct
    count, and identical no matter how the data is batched (mergeable)."""
    import ray.data
    from brdrq_ray.functions.sketches import hll_count_distinct

    n, dups = 3000, 3
    ids = [f"user-{i}" for i in range(n)] * dups
    t = pa.table({"u": ids})
    got = hll_count_distinct(ray.data.from_arrow(t), "u", p=12)
    se = 1.04 / (2 ** 6)  # 1/sqrt(2^12)
    assert abs(got["estimate"] - n) / n < 3 * se + 0.01
    # batching-invariant (max-merge of register sketches)
    got2 = hll_count_distinct(
        ray.data.from_arrow(t).repartition(7), "u", p=12)
    assert round(got["estimate"], 6) == round(got2["estimate"], 6)


def test_heavy_hitters(ray_session):
    """Count-min heavy hitters find the true top keys with counts >= truth
    (CMS never underestimates) and close to exact on a skewed stream."""
    import ray.data
    from brdrq_ray.functions.sketches import heavy_hitters

    vals = (["hot"] * 500 + ["warm"] * 200 + ["mild"] * 80
            + [f"cold-{i}" for i in range(300)])
    t = pa.table({"v": vals})
    top = heavy_hitters(ray.data.from_arrow(t).repartition(5), "v", k=3)
    assert top["value"].tolist()[:3] == ["hot", "warm", "mild"]
    truth = {"hot": 500, "warm": 200, "mild": 80}
    for _, r in top.iterrows():
        assert r["est_count"] >= truth[r["value"]]          # never under
        assert r["est_count"] <= truth[r["value"]] + 30     # tight at this w


def test_redact_pii_batch():
    import pyarrow as pa
    from brdrq_ray.functions.text import redact_pii_batch

    t = pa.table({"doc_id": ["a", "b", "c"], "text": [
        "mail me at jane.doe+x@example.co.uk or call +32 2 123 45 67",
        "server 192.168.0.1 serves https://example.com/path?q=1 fine",
        None,
    ]})
    out = redact_pii_batch(t)
    red = out.column("text_redacted").to_pylist()
    assert red[0] == "mail me at <EMAIL> or call <PHONE>"
    assert red[1] == "server <IP> serves <URL> fine"
    assert red[2] == ""
    assert out.column("pii_email").to_pylist() == [1, 0, 0]
    assert out.column("pii_ipv4").to_pylist() == [0, 1, 0]
    assert out.column("pii_url").to_pylist() == [0, 1, 0]


def test_feature_search_prioritization_and_cap(ray_session):
    """M11 full form: keyword-prioritized field selection, id always
    searched, selection capped at max_fields (reference:
    _feature_matches_filter + _update_search_field_selection,
    brdrq_dockwidget_featurealigner.py:479-529)."""
    import ray.data
    from brdrq_ray.functions.relational import (feature_search,
                                                search_field_selection)

    names = ["p_partkey", "p_name", "p_brand", "p_type", "p_size"]
    # keyword-matched fields first (schema order), then the rest, capped
    assert search_field_selection(names, ("name", "type"), 3) == \
        ["p_name", "p_type", "p_partkey"]
    # no keywords -> schema order, capped
    assert search_field_selection(names, (), 2) == ["p_partkey", "p_name"]
    # max_fields=0 -> uncapped
    assert search_field_selection(names, (), 0) == names

    t = pa.table({
        "fid": [1, 2, 130, 4],
        "name": ["red widget", "blue gear x13", "plain", "plain"],
        "brand": ["B#9", "B#9", "B#9", "B#13"],
        "size": [5, 6, 7, 8],
    })
    ds = ray.data.from_arrow(t)
    # capped to [name (keyword), fid (remaining)] + id always: brand excluded
    got = feature_search(ds, "13", id_col="fid", keywords=("name",),
                         max_fields=2).to_pandas()
    assert sorted(got["fid"]) == [2, 130]  # name hit + id hit, NOT brand
    # uncapped search also finds the brand match
    got_all = feature_search(ds, "13", id_col="fid", max_fields=0).to_pandas()
    assert sorted(got_all["fid"]) == [2, 4, 130]
    # null values never match, int id substring semantics = str(int)
    t2 = pa.table({"fid": [7], "name": pa.array([None], pa.string())})
    assert feature_search(ray.data.from_arrow(t2), "7",
                          id_col="fid").count() == 1


def test_ivf_probe_all_equals_brute_force(ray_session):
    """With n_probe == n_clusters the IVF probe degenerates to an exact scan:
    the per-cell-matmul kernel must reproduce brute-force top-k exactly
    (same ids, same ranks, same rounded cosines)."""
    import ray.data
    from brdrq_ray.functions.similarity import ivf_knn, knn_brute_force

    emb = pq.read_table(EMB)
    Q = np.asarray(emb.column("embedding").to_pylist())[:4]
    exact = knn_brute_force(ray.data.from_arrow(emb), Q, k=7)
    full = ivf_knn(ray.data.from_arrow(emb), Q, k=7, n_clusters=8, n_probe=8)
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True)[["query_id", "vec_id", "cosine", "rank"]],
        full.reset_index(drop=True)[["query_id", "vec_id", "cosine", "rank"]])


def test_ivf_scale_defaults_and_distributed_train(ray_session):
    """n_clusters=None derives ~sqrt(n); distributed Lloyd refinement (the
    above-threshold training path) keeps recall at least as good as the
    sample-only codebook on the same corpus."""
    import ray.data
    from brdrq_ray.functions.similarity import (
        ivf_build, ivf_probe, knn_brute_force, resolve_n_clusters)

    assert resolve_n_clusters(None, 10_000) == 100
    assert resolve_n_clusters(None, 3) == 4           # clamp low
    assert resolve_n_clusters(12, 10_000) == 12       # explicit wins

    emb = pq.read_table(EMB)
    Q = np.asarray(emb.column("embedding").to_pylist())[:4]
    ds = ray.data.from_arrow(emb)
    exact = knn_brute_force(ds, Q, k=10)

    idx = ivf_build(ds, n_clusters=None, distributed_train=True,
                    train_sample=64)  # tiny sample -> refinement must matter
    assert idx["n_clusters"] == resolve_n_clusters(None, emb.num_rows)
    got = ivf_probe(idx, Q, k=10, n_probe=max(2, idx["n_clusters"] // 2))
    recalls = []
    for qi in range(4):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(got[got["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6
    import shutil
    shutil.rmtree(idx["index_dir"], ignore_errors=True)


def test_binned_quantiles(ray_session):
    """Mergeable histogram quantiles: batching-invariant (sum-merge has no
    order dependence), within bin_width of the exact quantile, and exact on
    bin boundaries."""
    import ray.data
    from brdrq_ray.functions.sketches import binned_quantiles

    rng = np.random.default_rng(5)
    vals = np.round(rng.gamma(4.0, 25.0, size=20_000), 2)
    t = pa.table({"v": pa.array(vals, pa.float64())})
    w = 0.5
    r1 = binned_quantiles(ray.data.from_arrow(t), "v", w, (0.5, 0.9, 0.99))
    r2 = binned_quantiles(ray.data.from_arrow(t).repartition(13), "v", w,
                          (0.5, 0.9, 0.99))
    assert r1 == r2                       # block layout cannot change answers
    assert r1["total"] == len(vals)
    for q in (0.5, 0.9, 0.99):
        exact = np.quantile(vals, q, method="inverted_cdf")
        got = r1["quantiles"][q]
        assert got <= exact <= got + w    # bin lower bound brackets the exact
    # empty input
    empty = pa.table({"v": pa.array([], pa.float64())})
    r0 = binned_quantiles(ray.data.from_arrow(empty), "v", w, (0.5,))
    assert r0["total"] == 0 and r0["quantiles"][0.5] is None


def test_bloom_filter_history_dedup(ray_session, tmp_path):
    """Sharded Bloom filter: build is batching-invariant, membership has no
    false negatives, the fp rate holds on fresh keys, drop_seen removes every
    historical duplicate from an increment, and the persisted form round-trips
    bit-for-bit."""
    import ray.data
    from brdrq_ray.functions.sketches import (bloom_build, bloom_filter_seen,
                                              bloom_read, bloom_write)

    hist_ids = [f"h{i}" for i in range(2000)]
    hist = ray.data.from_arrow(pa.table({"doc_id": pa.array(hist_ids)}))
    b = bloom_build(hist.repartition(4), fp_rate=1e-3)
    b_one = bloom_build(hist.repartition(1), fp_rate=1e-3)
    assert np.array_equal(b.words, b_one.words)   # block layout can't matter
    assert b.contains(hist_ids).all()             # no false negatives, ever

    fresh = [f"n{i}" for i in range(1000)]
    assert int(b.contains(fresh).sum()) <= 20     # ~1 expected at fp=1e-3

    inc = pa.table({"doc_id": pa.array(fresh + hist_ids[:200])})
    kept = bloom_filter_seen(ray.data.from_arrow(inc).repartition(3),
                             b).to_pandas()
    assert not kept["doc_id"].str.startswith("h").any()  # history all dropped
    assert len(kept) >= 1000 - 20                        # fresh keys survive
    flagged = bloom_filter_seen(ray.data.from_arrow(inc), b,
                                mode="flag").to_pandas()
    assert flagged.set_index("doc_id")["seen"][hist_ids[:200]].all()
    assert len(flagged) == len(inc)

    path = str(tmp_path / "bloom")
    bloom_write(b, path)
    b2 = bloom_read(path)
    assert np.array_equal(b.words, b2.words)
    assert (b2.k, b2.shard_bits, b2.n_shards) == (b.k, b.shard_bits,
                                                  b.n_shards)
    # int and string forms of the same key agree (keys hash by str value)
    ib = bloom_build(ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())})))
    assert ib.contains(["1", "2", "3"]).all()


def test_remove_boilerplate_lines_both_legs(ray_session):
    """C4-style frequent-line removal: both the broadcast and the distributed
    leg strip lines occurring in >= min_docs docs, keep unique lines with
    their original (untrimmed) bytes, preserve blank-line structure and
    non-text columns, and turn all-boilerplate docs into empty strings."""
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.text import remove_boilerplate_lines

    docs = [(f"unique opening {i}\nAccept all cookies\nbody {i} words\n\n"
             f"  Subscribe to our newsletter  \nclosing {i}")
            for i in range(10)]
    docs += ["only boilerplate\nAccept all cookies",  # partial survivor
             "Accept all cookies"]                    # becomes empty
    tbl = pa.table({"doc_id": pa.array(list(range(12)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                    "extra": pa.array([f"e{i}" for i in range(12)])})
    frames = {}
    for leg, kw in [("broadcast", {}), ("distributed", {"broadcast_limit": 0})]:
        out = (remove_boilerplate_lines(ray.data.from_arrow(tbl), min_docs=5,
                                        **kw)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out.iloc[0]["text"] == \
            "unique opening 0\nbody 0 words\n\nclosing 0"
        assert out.iloc[10]["text"] == "only boilerplate"
        assert out.iloc[11]["text"] == ""
        assert list(out["extra"]) == [f"e{i}" for i in range(12)]
        frames[leg] = out[["doc_id", "text"]]
    assert frames["broadcast"].equals(frames["distributed"])
    # no frequent lines -> input passes through untouched
    clean = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a\nb", "c\nd"])})
    out = (remove_boilerplate_lines(ray.data.from_arrow(clean), min_docs=5)
           .to_pandas().sort_values("doc_id"))
    assert list(out["text"]) == ["a\nb", "c\nd"]


def _repeated_passages_oracle(docs, k, min_docs):
    """Brute-force reference for remove_repeated_passages: count distinct
    docs per lowercase word-k-gram, excise [p, p+k) for frequent grams,
    join survivors with single spaces (untouched docs keep bytes)."""
    from collections import Counter

    grams_per_doc = []
    for t in docs:
        w = t.lower().split()
        grams_per_doc.append([tuple(w[i:i + k]) for i in range(len(w) - k + 1)])
    df = Counter()
    for gs in grams_per_doc:
        for g in set(gs):
            df[g] += 1
    bad = {g for g, c in df.items() if c >= min_docs}
    out, removed = [], []
    for t, gs in zip(docs, grams_per_doc):
        w = t.split()
        kill = [False] * len(w)
        for p, g in enumerate(gs):
            if g in bad:
                for j in range(p, p + k):
                    kill[j] = True
        n_kill = sum(kill)
        removed.append(n_kill)
        out.append(" ".join(c for c, x in zip(w, kill) if not x)
                   if n_kill else t)
    return out, removed


def test_remove_repeated_passages_both_legs(ray_session):
    """Cross-doc repeated-passage excision (Lee et al. 2021 at word-k-gram
    granularity): both legs match a brute-force oracle, untouched docs keep
    original bytes, short docs never match, overlapping windows merge."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.text import remove_repeated_passages

    shared = "the quick brown fox jumps over the lazy sleeping dog tonight"
    docs = [f"intro {i} stuff  here {shared} outro{i} tail words" for i in range(3)]
    docs += [f"wholly unique content number {i} with  double spaces kept"
             for i in range(3)]
    docs += ["tiny doc", "", shared, shared + " extra trailing data beyond"]
    ids = [f"d{i}" for i in range(len(docs))]
    tbl = pa.table({"doc_id": pa.array(ids), "text": pa.array(docs)})

    want_text, want_removed = _repeated_passages_oracle(docs, 6, 2)
    assert sum(want_removed) > 0 and any(r == 0 for r in want_removed)

    frames = {}
    for leg, kw in [("broadcast", {}), ("distributed", {"broadcast_limit": 0})]:
        for blocks in (1, 4):
            out = (remove_repeated_passages(
                       ray.data.from_arrow(tbl).repartition(blocks),
                       k=6, min_docs=2, **kw)
                   .to_pandas().set_index("doc_id").loc[ids])
            assert list(out["text"]) == want_text, (leg, blocks)
            assert list(out["passage_words_removed"]) == want_removed
        frames[leg] = out
    # untouched docs keep their ORIGINAL bytes (double spaces intact)
    assert frames["broadcast"].loc["d3", "text"] == docs[3]
    # randomized oracle check with planted duplications
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    plant = " ".join(rng.choice(vocab, 8))
    rdocs = []
    for i in range(25):
        body = " ".join(rng.choice(vocab, int(rng.integers(2, 40))))
        rdocs.append(f"{body} {plant}" if i % 3 == 0 else body)
    rtbl = pa.table({"doc_id": pa.array([f"r{i}" for i in range(25)]),
                     "text": pa.array(rdocs)})
    wt, wr = _repeated_passages_oracle(rdocs, 5, 3)
    out = (remove_repeated_passages(ray.data.from_arrow(rtbl).repartition(3),
                                    k=5, min_docs=3)
           .to_pandas().set_index("doc_id")
           .loc[[f"r{i}" for i in range(25)]])
    assert list(out["text"]) == wt
    assert list(out["passage_words_removed"]) == wr
    # no repeated grams -> pass-through with a zero audit column
    clean = pa.table({"doc_id": pa.array(["a", "b"]),
                      "text": pa.array(["one two three", "four five six"])})
    out = remove_repeated_passages(ray.data.from_arrow(clean), k=2).to_pandas()
    assert list(out["passage_words_removed"]) == [0, 0]


def test_lookup_join(ray_session):
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.relational import lookup_join

    data = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "payload": pa.array(["a", "b", "c", "d"])})
    lut = pa.table({"k": pa.array([2, 4, 9], pa.int64()),
                    "v": pa.array([20.0, 40.0, 90.0], pa.float64())})
    out = (lookup_join(ray.data.from_arrow(data), ray.data.from_arrow(lut),
                       on="k", value_col="v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out.columns) == ["k", "payload", "v"]
    assert list(out["payload"]) == ["a", "b", "c", "d"]
    assert out["v"].tolist()[1] == 20.0 and out["v"].tolist()[3] == 40.0
    assert out["v"].isna().tolist() == [True, False, True, False]


def test_minhash_incremental_index(ray_session, tmp_path):
    """Incremental near-dup against a persisted band index must equal the
    full-corpus run restricted to pairs touching the increment, read only
    the shards the increment's band keys select, and keep working across
    appends."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.dedup import (
        append_minhash_index, build_minhash_index, minhash_lsh_pairs,
        minhash_pairs_incremental)

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "parcel", "border", "map", "road"]
    old_texts = {i: " ".join(rng.choice(words, size=20)) for i in range(40)}
    new_texts = {}
    for j in range(10):
        nid = 1000 + j
        if j < 5:                      # near-dups of indexed docs
            new_texts[nid] = old_texts[j] + " tail"
        elif j == 5:                   # a new-new near-dup cluster
            new_texts[nid] = " ".join(rng.choice(words, size=20))
        elif j < 8:
            new_texts[nid] = new_texts[1005] + (" x" if j == 6 else " y")
        else:                          # unique
            new_texts[nid] = " ".join(rng.choice(words, size=20)) + f" m{j}"
    old = pa.table({"doc_id": pa.array(list(old_texts), pa.int64()),
                    "text": pa.array(list(old_texts.values()))})
    new = pa.table({"doc_id": pa.array(list(new_texts), pa.int64()),
                    "text": pa.array(list(new_texts.values()))})
    idx_dir = str(tmp_path / "mhidx")

    build_minhash_index(ray.data.from_arrow(old), idx_dir, n_shards=64)
    inc, info = minhash_pairs_incremental(
        ray.data.from_arrow(new), idx_dir,
        corpus_ds=ray.data.from_arrow(old), jaccard_threshold=0.5,
        return_info=True)
    inc = inc.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

    both = pa.concat_tables([old, new])
    full = minhash_lsh_pairs(ray.data.from_arrow(both),
                             jaccard_threshold=0.5).to_pandas()
    want = (full[(full["id_a"] >= 1000) | (full["id_b"] >= 1000)]
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(want) > 0
    assert (inc[["id_a", "id_b"]].astype("int64").values.tolist()
            == want[["id_a", "id_b"]].astype("int64").values.tolist())
    assert np.allclose(inc["jaccard"], want["jaccard"])

    # I/O selectivity: a 1-doc increment has <= bands distinct band keys, so
    # it can touch at most 16 of the 64 shards
    one = pa.table({"doc_id": pa.array([3000], pa.int64()),
                    "text": pa.array([old_texts[0] + " tiny"])})
    _, info1 = minhash_pairs_incremental(
        ray.data.from_arrow(one), idx_dir,
        corpus_ds=ray.data.from_arrow(old), jaccard_threshold=0.5,
        return_info=True)
    assert info1["shards_read"] <= 16 < info1["n_shards"]

    # append the first increment; a second increment near-dups a FIRST-
    # increment doc and must find it through the index
    append_minhash_index(ray.data.from_arrow(new), idx_dir)
    new2 = pa.table({"doc_id": pa.array([2000], pa.int64()),
                     "text": pa.array([new_texts[1008] + " z"])})
    inc2 = minhash_pairs_incremental(
        ray.data.from_arrow(new2), idx_dir,
        corpus_ds=ray.data.from_arrow(both),
        jaccard_threshold=0.5).to_pandas()
    assert (1008, 2000) in set(zip(inc2["id_a"], inc2["id_b"]))


def test_decontaminate(ray_session):
    """GPT-3-style 13-gram decontamination: docs sharing a benchmark
    k-gram drop; clean docs keep; mark_only audits without dropping."""
    import pyarrow as pa
    import ray.data
    from brdrq_ray.functions.dedup import decontaminate

    bench_q = "what is the tallest mountain in the wide green world today friends ask"
    assert len(bench_q.split()) == 13
    bench = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([bench_q])})
    docs = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array([
            f"intro words then {bench_q} and some trailing words",  # leaked
            "a completely clean document about rivers and boats "
            "drifting slowly past the old stone bridges of the town",
            bench_q,                                                # verbatim
        ])})
    out = (decontaminate(ray.data.from_arrow(docs), ray.data.from_arrow(bench),
                         shingle_k=13)
           .to_pandas().sort_values("doc_id"))
    assert list(out["doc_id"]) == [11]
    marked = (decontaminate(ray.data.from_arrow(docs),
                            ray.data.from_arrow(bench), shingle_k=13,
                            mark_only=True)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(marked) == 3
    assert marked["contam_hits"].tolist()[0] >= 1
    assert marked["contam_hits"].tolist()[1] == 0
    assert marked["contam_hits"].tolist()[2] >= 1
    # short benchmark (< k words) matches on its exact joined text
    short_bench = pa.table({"doc_id": pa.array([2], pa.int64()),
                            "text": pa.array(["secret probe phrase"])})
    short_docs = pa.table({
        "doc_id": pa.array([20, 21], pa.int64()),
        "text": pa.array(["secret probe phrase", "another short doc"])})
    out2 = (decontaminate(ray.data.from_arrow(short_docs),
                          ray.data.from_arrow(short_bench), shingle_k=13)
            .to_pandas())
    assert list(out2["doc_id"]) == [21]


def test_repetition_ratio():
    import pyarrow as pa
    from brdrq_ray.functions.text import repetition_ratio_batch

    t = pa.table({"text": pa.array([
        "one two three " * 20,                      # looping phrase -> high
        "all these words appear exactly once here",  # no repeats -> 0
        "ab",                                        # < k words -> 0
        "",                                          # empty -> 0
    ])})
    out = repetition_ratio_batch(t, k=3)
    r = out.column("repetition_ratio").to_pylist()
    assert r[0] > 0.9
    assert r[1] == 0.0 and r[2] == 0.0 and r[3] == 0.0


def test_semi_lookup_join_empty_sides(ray_session):
    """A fully-filtered upstream yields zero blocks and a None schema; the
    joins must pass the empty corpus through instead of crashing (regression:
    remove_near_duplicates on a corpus every gate dropped)."""
    import ray.data

    from brdrq_ray.functions.relational import lookup_join, semi_join

    data = ray.data.from_arrow(pa.table({"doc_id": pa.array(["a", "b"]),
                                         "x": pa.array([1, 2], pa.int64())}))
    empty = data.filter(lambda r: False)
    assert semi_join(empty, data.select_columns(["doc_id"]),
                     on="doc_id").count() == 0
    assert semi_join(empty, data.select_columns(["doc_id"]), on="doc_id",
                     anti=True).count() == 0
    assert lookup_join(empty, data.select_columns(["doc_id"]), on="doc_id",
                       value_col="doc_id").count() == 0
    # empty LOOKUP side: all rows kept, value column all-null
    out = lookup_join(data, empty.select_columns(["doc_id"]).map_batches(
        lambda t: t.rename_columns(["k"]), batch_format="pyarrow"),
        on="doc_id", value_col="k").to_pandas()
    assert len(out) == 2 and out["k"].isna().all()


def test_curation_survives_empty_corpus(ray_session):
    """Every gate drops every doc -> the pipeline returns empty, no crash."""
    import ray.data

    from brdrq_ray.pipelines.curation import CurationConfig, curate_documents

    docs = pa.table({"doc_id": pa.array(["a", "b"]),
                     "text": pa.array(["xx", "yy"])})
    cfg = CurationConfig(quality_min=1.1, near_dup=True)  # floor > max score
    out = curate_documents(ray.data.from_arrow(docs), cfg)
    assert out.count() == 0


def test_grouped_binned_quantiles(ray_session):
    import ray.data
    from brdrq_ray.functions.sketches import (binned_quantiles,
                                              grouped_binned_quantiles,
                                              quantiles_from_hist)

    rng = np.random.default_rng(7)
    n = 5000
    groups = rng.choice(["a", "b", "c", "skew"], size=n,
                        p=[0.4, 0.3, 0.2, 0.1])
    vals = np.where(groups == "skew",
                    rng.exponential(100.0, n), rng.normal(50.0, 12.0, n))
    t = pa.table({"g": groups.tolist(), "v": vals})
    w, qs = 2.5, [0.5, 0.9, 0.99]

    got = (grouped_binned_quantiles(ray.data.from_arrow(t), "g", "v", w, qs)
           .to_pandas().set_index("g").sort_index())
    assert list(got.index) == ["a", "b", "c", "skew"]
    for gname in ["a", "b", "c", "skew"]:
        gv = vals[groups == gname]
        bins, counts = np.unique(np.floor(gv / w).astype(np.int64),
                                 return_counts=True)
        want = quantiles_from_hist(bins, counts, w, qs)
        row = got.loc[gname]
        assert row["total"] == want["total"] == len(gv)
        for q in qs:
            assert row[f"p{q:g}"] == want["quantiles"][q]

    # partition invariance: bit-identical across block layouts
    alt = (grouped_binned_quantiles(
               ray.data.from_arrow(t).repartition(17), "g", "v", w, qs)
           .to_pandas().set_index("g").sort_index())
    assert got.equals(alt)

    # one-group form agrees with the global sketch
    one = pa.table({"g": ["x"] * n, "v": vals})
    g1 = (grouped_binned_quantiles(ray.data.from_arrow(one), "g", "v", w, qs)
          .to_pandas().iloc[0])
    glob = binned_quantiles(ray.data.from_arrow(one), "v", w, qs)
    assert g1["total"] == glob["total"]
    for q in qs:
        assert g1[f"p{q:g}"] == glob["quantiles"][q]

"""Perceptual media hashing + generic 64-bit Hamming near-dup banding.

The exact media dedup (canonical_media_refs) only catches byte-identical
payloads; these tests pin the perceptual family: pHash/dHash invariances on
real codecs, the audio spectral hash, majority-vote video hashes, the
generic pigeonhole banding vs a brute-force popcount oracle, and the
end-to-end perceptual media dedup over an interleaved corpus.
"""
import struct

import numpy as np
import pyarrow as pa
import pytest

from brdrq_ray.functions import multimodal as mm


def _img(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    gx = np.linspace(0, 180, w)[None, :, None]
    gy = np.linspace(0, 120, h)[:, None, None]
    return (0.4 * gx + 0.3 * gy
            + rng.uniform(0, 60, size=(h, w, 3))).astype(np.uint8)


def encode_bmp(arr: np.ndarray) -> bytes:
    """Minimal bottom-up uncompressed 24-bit BMP writer (test-only)."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                            2835, 2835, 0, 0))
    return header + data


def _ham(a, b) -> int:
    x = np.uint64(a) ^ np.uint64(b)
    return int(bin(int(x)).count("1"))


def test_box_resize_exact_block_means():
    g = np.arange(64, dtype=np.float64).reshape(8, 8)
    out = mm._box_resize(g, 4, 4)
    want = g.reshape(4, 2, 4, 2).mean(axis=(1, 3))
    assert np.allclose(out, want)
    # constant image -> constant at any target size, incl. upscaling
    c = np.full((5, 3), 7.0)
    assert np.allclose(mm._box_resize(c, 8, 9), 7.0)


def test_dct_matrix_orthonormal():
    m = mm._dct_matrix(32)
    assert np.allclose(m @ m.T, np.eye(32), atol=1e-12)


def test_phash_format_and_gain_invariance():
    arr = _img(1)
    # PPM and BMP round-trips of the SAME pixels hash identically
    h_ppm = mm.phash64(mm.decode_ppm(mm.encode_ppm(arr)))
    h_bmp = mm.phash64(mm.decode_bmp(encode_bmp(arr)))
    assert h_ppm == h_bmp
    # global gain preserves all comparisons -> identical pHash and dHash
    dim = np.clip(arr.astype(np.float64) * 0.7, 0, 255).astype(np.uint8)
    assert _ham(mm.phash64(arr), mm.phash64(dim)) <= 2
    assert _ham(mm.dhash64(arr), mm.dhash64(dim)) <= 2


def test_phash_noise_robust_distinct_far():
    arr = _img(2)
    rng = np.random.default_rng(0)
    noisy = np.clip(arr.astype(np.int16)
                    + rng.integers(-4, 5, size=arr.shape), 0, 255).astype(np.uint8)
    assert _ham(mm.phash64(arr), mm.phash64(noisy)) <= 8
    assert _ham(mm.dhash64(arr), mm.dhash64(noisy)) <= 8
    # a 2x nearest-upscale is the same picture -> small distance
    up = arr.repeat(2, axis=0).repeat(2, axis=1)
    assert _ham(mm.phash64(arr), mm.phash64(up)) <= 6
    # genuinely different images are far apart
    other = _img(99)
    assert _ham(mm.phash64(arr), mm.phash64(other)) > 12


def test_audio_hash_gain_invariant_content_sensitive():
    rate = 16000
    t = np.arange(rate // 2) / rate
    a = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 880 * t)
    assert mm.audio_hash64(a) == mm.audio_hash64(0.3 * a)  # pure gain
    rng = np.random.default_rng(3)
    assert _ham(mm.audio_hash64(a),
                mm.audio_hash64(a + 0.01 * rng.standard_normal(len(a)))) <= 10
    b = 0.5 * np.sin(2 * np.pi * 523 * t) + 0.3 * np.sin(2 * np.pi * 130 * t)
    assert _ham(mm.audio_hash64(a), mm.audio_hash64(b)) > 6
    # tiny clip doesn't crash (cycle-pad path)
    mm.audio_hash64(np.array([0.1, -0.2]))


def test_video_hash_majority_vote():
    f_a = _img(4, h=24, w=32)
    f_b = _img(5, h=24, w=32)
    vid_aaa = mm.encode_video([f_a, f_a, f_a])
    vid_aab = mm.encode_video([f_a, f_a, f_b])
    assert mm.video_hash64(vid_aaa) == mm.phash64(f_a)
    # strict majority of A frames -> the A hash wins bit-for-bit
    assert mm.video_hash64(vid_aab) == mm.phash64(f_a)


def test_media_hash_stage_dispatch_and_fake():
    refs = ["a.ppm", "b.wav", "c.mp4"]
    tbl = mm.synthesize_media_table(refs, seed=7)
    stage = mm.MediaHashStage()
    out = stage(tbl)
    assert out.column_names == ["media_ref", "phash"]
    assert out.num_rows == 3
    # dispatch agrees with the direct kernels
    pay = tbl.column("payload").to_pylist()
    assert out.column("phash")[0].as_py() == int(
        np.uint64(mm.phash64(mm.decode_ppm(pay[0]))).astype(np.int64))
    assert out.column("phash")[1].as_py() == int(
        np.uint64(mm.audio_hash64(mm.decode_wav(pay[1])[0])).astype(np.int64))
    # undecodable bytes raise unless fake
    junk = pa.table({"media_ref": ["x"], "payload": [b"\x89PNG junk"]})
    with pytest.raises(ValueError):
        stage(junk)
    fk = mm.MediaHashStage(fake=True)(junk)
    assert fk.num_rows == 1


def test_hamming_neardup_pairs_matches_bruteforce(ray_session):
    import ray.data

    from brdrq_ray.functions.dedup import hamming_neardup_pairs

    rng = np.random.default_rng(11)
    base = rng.integers(0, 2 ** 63, size=40, dtype=np.int64)
    # plant near pairs: rows 40..59 are rows 0..19 with <=3 bits flipped
    planted = base[:20].copy()
    for i in range(20):
        for bit in rng.choice(64, size=rng.integers(0, 4), replace=False):
            planted[i] ^= np.int64(1) << np.int64(bit)
    hashes = np.concatenate([base, planted])
    ids = [f"m{i:03d}" for i in range(len(hashes))]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "h": pa.array(hashes, pa.int64())}))
    got = (hamming_neardup_pairs(ds, "h", id_col="doc_id", max_hamming=3)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))

    # brute-force popcount oracle
    u = hashes.view(np.uint64)
    x = u[:, None] ^ u[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(u), len(u), 8),
                        axis=2).sum(axis=2)
    ia, ib = np.nonzero(np.triu(ham <= 3, k=1))
    import pandas as pd
    # ia < ib and ids are index-lexicographic, so ids[ia] < ids[ib] already
    want = pd.DataFrame({
        "id_a": np.array(ids)[ia],
        "id_b": np.array(ids)[ib],
        "hamming": ham[ia, ib].astype(np.int64),
    }).sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["id_a", "id_b", "hamming"]].astype(want.dtypes), want)


def test_media_neardup_pairs_finds_reencodes(ray_session):
    import ray.data

    refs = [f"img{i}.ppm" for i in range(12)]
    tbl = mm.synthesize_media_table(refs, seed=21)
    pays = tbl.column("payload").to_pylist()
    rng = np.random.default_rng(5)
    extra_refs, extra_pays = [], []
    for i in range(4):  # 4 noisy re-encodes of the first 4 images
        arr = mm.decode_ppm(pays[i])
        noisy = np.clip(arr.astype(np.int16)
                        + rng.integers(-3, 4, size=arr.shape),
                        0, 255).astype(np.uint8)
        extra_refs.append(f"img{i}_copy.ppm")
        extra_pays.append(mm.encode_ppm(noisy))
    media = ray.data.from_arrow(pa.table({
        "media_ref": pa.array(list(refs) + extra_refs),
        "payload": pa.array(list(pays) + extra_pays, pa.binary()),
    }))
    pairs = mm.media_neardup_pairs(media, max_hamming=8).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    for i in range(4):
        assert (f"img{i}.ppm", f"img{i}_copy.ppm") in got
    # exactness: pairs == brute force over the same hashes at the same k
    hs = np.array([np.uint64(mm.phash64(mm.decode_ppm(p)))
                   for p in list(pays) + extra_pays])
    all_ids = np.array(list(refs) + extra_refs)
    x = hs[:, None] ^ hs[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(hs), len(hs), 8),
                        axis=2).sum(axis=2)
    ia, ib = np.nonzero(np.triu(ham <= 8, k=1))
    want = {tuple(sorted((all_ids[a], all_ids[b]))) for a, b in zip(ia, ib)}
    assert got == want


def test_dedup_media_payloads_perceptual(ray_session):
    import ray.data

    from brdrq_ray.pipelines.documents import dedup_media_payloads
    from brdrq_ray.sources import fixtures as fx

    refs = [f"p{i}.ppm" for i in range(6)]
    tbl = mm.synthesize_media_table(refs, seed=33)
    pays = tbl.column("payload").to_pylist()
    rng = np.random.default_rng(9)
    arr0 = mm.decode_ppm(pays[0])
    noisy = np.clip(arr0.astype(np.int16)
                    + rng.integers(-2, 3, size=arr0.shape),
                    0, 255).astype(np.uint8)
    all_refs = list(refs) + ["p0_copy.ppm"]
    all_pays = list(pays) + [mm.encode_ppm(noisy)]
    media = ray.data.from_arrow(pa.table({
        "media_ref": pa.array(all_refs),
        "payload": pa.array(all_pays, pa.binary()),
    }))
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["d0", "d1"]),
        "spans": pa.array(
            [[{"kind": "media", "text": "", "media_ref": "p0_copy.ppm",
               "offset": 0},
              {"kind": "text", "text": "hello", "media_ref": "", "offset": 1}],
             [{"kind": "media", "text": "", "media_ref": "p3.ppm",
               "offset": 0}]],
            type=pa.list_(pa.struct([("kind", pa.string()),
                                     ("text", pa.string()),
                                     ("media_ref", pa.string()),
                                     ("offset", pa.int32())]))),
    }))
    out_docs, media_kept, remap = dedup_media_payloads(
        docs, media, perceptual_hamming=8)
    rm = remap.to_pandas()
    assert set(map(tuple, rm.to_numpy())) == {("p0_copy.ppm", "p0.ppm")}
    kept = sorted(media_kept.to_pandas().media_ref)
    assert kept == sorted(refs)  # the noisy copy's payload row is gone
    od = out_docs.to_pandas().sort_values("doc_id")
    s0 = od.iloc[0].spans
    assert s0[0]["media_ref"] == "p0.ppm"        # remapped
    assert s0[1]["text"] == "hello"              # untouched text span
    assert od.iloc[1].spans[0]["media_ref"] == "p3.ppm"
    # exact dedup path still works with the default (md5) mapping
    _, _, remap_exact = dedup_media_payloads(docs, media)
    assert remap_exact.count() == 0  # no byte-identical payloads here

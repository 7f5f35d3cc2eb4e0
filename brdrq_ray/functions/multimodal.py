"""Multimodal (image/audio/video) column processing.

Media payloads are opaque Arrow ``binary`` columns with typed metadata columns
beside them — the layout the interleaved-document table's ``media_ref`` spans
point at. All stages are callable classes => actor pools ('codec init' happens
once per actor in __init__, per the stateful-stage rule; small batch_size on
purpose — payloads are large binaries).

Decode support (r2 — REAL decoders, no external codec libraries needed):

* images: PPM (P6) and uncompressed 24-bit BMP, parsed with numpy; features
  and resize operate on real pixels. JPEG/PNG would need PIL/opencv (absent
  in this container) and raise NotImplementedError unless ``fake=True``.
* audio: PCM WAV via the stdlib ``wave`` module; duration and band-energy
  features come from the real samples (rfft). MP3/OGG raise unless fake.
* video: a raw frame-sequence container (``BRDRVID1`` magic + concatenated
  PPM frames — the uncompressed shape a real pipeline would get from an
  upstream ffmpeg extract); frame sampling decodes real frames. Compressed
  video raises unless fake.

``fake=True`` keeps the original deterministic pseudo-decode for arbitrary
bytes (plumbing tests and codec-free smoke paths).
"""

from __future__ import annotations

import hashlib
import io
import struct

import numpy as np
import pyarrow as pa


MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("media_type", pa.string()),      # image | audio | video
    ("payload", pa.binary()),
    ("byte_len", pa.int64()),
])

VIDEO_MAGIC = b"BRDRVID1"


# ---------------------------------------------------------------------------
# codecs (pure numpy / stdlib)
# ---------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> HxWx3 uint8 (raises ValueError on malformed)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> HxWx3 uint8 (RGB)."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    try:
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:
            raise ValueError("BMP core header unsupported")
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        comp = struct.unpack_from("<I", payload, 30)[0]
    except struct.error as e:
        raise ValueError(f"truncated BMP header: {e}") from e
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return (rgb[::-1] if flip else rgb).copy()


def decode_image_payload(payload: bytes) -> np.ndarray:
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    raise ValueError("undecodable image format (JPEG/PNG need PIL/opencv)")


def decode_wav(payload: bytes):
    """PCM WAV -> (samples float64 in [-1,1] mono, sample_rate)."""
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n = wf.getnframes()
        rate = wf.getframerate()
        width = wf.getsampwidth()
        ch = wf.getnchannels()
        raw = wf.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"{8 * width}-bit WAV unsupported")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((np.clip(samples, -1, 1) * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Frame-sequence container: magic + frame count + length-prefixed PPMs."""
    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        ppm = encode_ppm(f)
        out.append(struct.pack("<I", len(ppm)))
        out.append(ppm)
    return b"".join(out)


def decode_video_frames(payload: bytes):
    """Frame-sequence container -> iterator of (frame_idx, ppm_bytes)."""
    if not payload.startswith(VIDEO_MAGIC):
        raise ValueError("not a BRDRVID1 frame sequence (compressed video "
                         "needs ffmpeg)")
    try:
        n = struct.unpack_from("<I", payload, len(VIDEO_MAGIC))[0]
        pos = len(VIDEO_MAGIC) + 4
        for i in range(n):
            ln = struct.unpack_from("<I", payload, pos)[0]
            pos += 4
            yield i, payload[pos:pos + ln]
            pos += ln
    except struct.error as e:
        raise ValueError(f"truncated BRDRVID1 container: {e}") from e


# ---------------------------------------------------------------------------
# synthetic payloads (deterministic stand-in for the object-store fetch)
# ---------------------------------------------------------------------------

def synthesize_media_table(media_refs, seed: int = 42, real: bool = True,
                           video_frames: int = 6) -> pa.Table:
    """Deterministic payloads for a list of media_ref URIs. ``real=True``
    (default, r2) emits genuinely decodable bytes — PPM images, PCM WAV audio,
    BRDRVID1 frame sequences — a pure function of (seed, ref); ``real=False``
    keeps the r1 opaque pseudo-payloads."""
    payloads, types, lens = [], [], []
    for ref in media_refs:
        h = hashlib.blake2b(f"{seed}:{ref}".encode(), digest_size=32).digest()
        mtype = ("image" if ref.endswith((".jpg", ".png", ".ppm", ".bmp")) else
                 "audio" if ref.endswith((".wav", ".mp3")) else "video")
        if not real:
            size = 256 + h[0] * 16
            payload = (h * ((size // len(h)) + 1))[:size]
        else:
            rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
            if mtype == "image":
                w, ht = 32 + int(h[1]) % 64, 32 + int(h[2]) % 64
                # smooth gradient + noise so features/resize are non-trivial
                gx = np.linspace(0, 255, w)[None, :, None]
                gy = np.linspace(0, 255, ht)[:, None, None]
                arr = (0.5 * gx + 0.3 * gy
                       + rng.uniform(0, 64, size=(ht, w, 3))).astype(np.uint8)
                payload = encode_ppm(arr)
            elif mtype == "audio":
                rate = 16000
                dur = 0.2 + (h[3] % 32) / 64.0
                t = np.arange(int(rate * dur)) / rate
                f0 = 110.0 * (1 + h[4] % 8)
                x = (0.6 * np.sin(2 * np.pi * f0 * t)
                     + 0.2 * np.sin(2 * np.pi * 2.5 * f0 * t)
                     + 0.05 * rng.standard_normal(len(t)))
                payload = encode_wav(x, rate)
            else:
                frames = []
                for i in range(video_frames):
                    base = rng.uniform(0, 255, size=(24, 32, 3))
                    frames.append(np.clip(base + 10 * i, 0, 255).astype(np.uint8))
                payload = encode_video(frames)
        payloads.append(payload)
        types.append(mtype)
        lens.append(len(payload))
    return pa.table({
        "media_ref": pa.array([str(r) for r in media_refs], pa.string()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "byte_len": pa.array(lens, pa.int64()),
    }, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# stages (actor pools)
# ---------------------------------------------------------------------------

def _image_features(arr: np.ndarray, dim: int = 16) -> np.ndarray:
    """Real 16-dim image descriptor: RGB means/stds, 3x3 luminance grid,
    aspect ratio — all from the actual pixels."""
    a = arr.astype(np.float64) / 255.0
    h, w, _ = a.shape
    lum = a.mean(axis=2)
    ys = np.array_split(np.arange(h), 3)
    xs = np.array_split(np.arange(w), 3)
    grid = [lum[np.ix_(y, x)].mean() for y in ys for x in xs]
    feat = np.array([*a.reshape(-1, 3).mean(axis=0), *a.reshape(-1, 3).std(axis=0),
                     *grid, w / h], dtype=np.float64)
    return feat[:dim] if len(feat) >= dim else np.pad(feat, (0, dim - len(feat)))


class ImageDecodeStage:
    """image binary -> (width, height, channels) + a real feature vector for
    decodable formats (PPM/BMP); JPEG/PNG raise unless ``fake=True``."""

    def __init__(self, fake: bool = False, feature_dim: int = 16):
        self.fake = fake
        self.feature_dim = feature_dim

    def _decode_one(self, payload: bytes):
        if self.fake:
            h = hashlib.blake2b(payload, digest_size=32).digest()
            w = 64 + h[1] * 4
            ht = 64 + h[2] * 4
            feat = np.frombuffer(
                hashlib.blake2b(payload, digest_size=self.feature_dim * 4).digest(),
                dtype=np.uint32).astype(np.float64)
            return w, ht, 3, feat / np.float64(2**32)
        try:
            arr = decode_image_payload(payload)
        except ValueError as e:
            raise NotImplementedError(
                f"{e} — this container has no PIL/opencv; pass fake=True for "
                "the deterministic stub") from e
        ht, w, c = arr.shape
        return w, ht, c, _image_features(arr, self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, chans, feats = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            w, h, c, f = self._decode_one(payload)
            widths.append(w)
            heights.append(h)
            chans.append(c)
            feats.append(np.round(f, 9).tolist())
        return (batch.drop_columns(["payload"])
                .append_column("width", pa.array(widths, pa.int32()))
                .append_column("height", pa.array(heights, pa.int32()))
                .append_column("channels", pa.array(chans, pa.int32()))
                .append_column("features", pa.array(feats, pa.list_(pa.float64()))))


def _resize_nn(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbour resample (pure numpy index maps)."""
    h, w, _ = arr.shape
    yi = np.minimum((np.arange(th) * h) // th, h - 1)
    xi = np.minimum((np.arange(tw) * w) // tw, w - 1)
    return arr[np.ix_(yi, xi)]


class ImageResizeStage:
    """image binary -> resized payload + new dims. REAL nearest-neighbour
    resample for PPM/BMP (re-encoded as PPM); fake path for opaque bytes."""

    def __init__(self, target_w: int = 224, target_h: int = 224, fake: bool = False):
        self.tw, self.th = target_w, target_h
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, widths, heights = [], [], []
        for payload in batch.column("payload").to_pylist():
            if self.fake:
                h = hashlib.blake2b(payload + b"resize", digest_size=32).digest()
                size = max(64, (self.tw * self.th) // 256)
                payloads.append((h * ((size // len(h)) + 1))[:size])
            else:
                try:
                    arr = decode_image_payload(payload)
                except ValueError as e:
                    raise NotImplementedError(
                        f"{e} — pass fake=True for the stub") from e
                payloads.append(encode_ppm(_resize_nn(arr, self.tw, self.th)))
            widths.append(self.tw)
            heights.append(self.th)
        idx = batch.column_names.index("payload")
        out = batch.set_column(idx, "payload", pa.array(payloads, pa.binary()))
        return (out.append_column("width", pa.array(widths, pa.int32()))
                   .append_column("height", pa.array(heights, pa.int32())))


class AudioFeatureStage:
    """audio binary -> duration + band-energy feature vector. REAL for PCM
    WAV (stdlib wave + rfft over n_mels log-spaced bands); fake otherwise."""

    def __init__(self, fake: bool = False, n_mels: int = 32):
        self.fake = fake
        self.n_mels = n_mels

    def _features(self, payload: bytes):
        if self.fake:
            need = self.n_mels * 4
            h = b"".join(hashlib.blake2b(payload + bytes([i]), digest_size=64).digest()
                         for i in range((need + 63) // 64))[:need]
            v = np.frombuffer(h, dtype=np.uint32).astype(np.float64) / 2**32
            return v, round(len(payload) / 16000.0, 6)
        try:
            x, rate = decode_wav(payload)
        except Exception as e:
            raise NotImplementedError(
                f"audio decode failed ({e}) — compressed audio needs "
                "soundfile/ffmpeg; pass fake=True for the stub") from e
        spec = np.abs(np.fft.rfft(x)) ** 2
        edges = np.unique(np.geomspace(1, len(spec) - 1,
                                       self.n_mels + 1).astype(int))
        bands = np.zeros(self.n_mels)
        for i in range(min(self.n_mels, len(edges) - 1)):
            seg = spec[edges[i]:edges[i + 1]]
            bands[i] = np.log1p(seg.mean()) if len(seg) else 0.0
        return bands, round(len(x) / rate, 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, durs = [], []
        for payload in batch.column("payload").to_pylist():
            v, dur = self._features(payload)
            feats.append(np.round(v, 9).tolist())
            durs.append(dur)
        return (batch.drop_columns(["payload"])
                .append_column("duration_sec", pa.array(durs, pa.float64()))
                .append_column("mel_features", pa.array(feats, pa.list_(pa.float64()))))


class FrameSampleStage:
    """video binary -> n_frames evenly-sampled frames, one output row each
    (media analog of the span explode). REAL for the BRDRVID1 frame-sequence
    container: decoded dims + a digest of the actual frame bytes."""

    def __init__(self, fake: bool = False, n_frames: int = 4):
        self.fake = fake
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, frame_idx, digests, widths, heights = [], [], [], [], []
        for ref, payload in zip(batch.column("media_ref").to_pylist(),
                                batch.column("payload").to_pylist()):
            if self.fake:
                for i in range(self.n_frames):
                    refs.append(ref)
                    frame_idx.append(i)
                    digests.append(hashlib.blake2b(payload + bytes([i]),
                                                   digest_size=16).hexdigest())
                    widths.append(0)
                    heights.append(0)
                continue
            try:
                frames = list(decode_video_frames(payload))
            except ValueError as e:
                raise NotImplementedError(
                    f"{e} — pass fake=True for the stub") from e
            take = np.linspace(0, len(frames) - 1,
                               min(self.n_frames, len(frames))).astype(int)
            for i in np.unique(take):
                fi, ppm = frames[i]
                arr = decode_ppm(ppm)
                refs.append(ref)
                frame_idx.append(int(fi))
                digests.append(hashlib.blake2b(ppm, digest_size=16).hexdigest())
                heights.append(arr.shape[0])
                widths.append(arr.shape[1])
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame_digest": pa.array(digests, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        })


def decode_images(ds, fake: bool = False, batch_size: int = 64,
                  concurrency=(1, 4)):
    """Actor-pool decode stage over a media table. Small batch_size on
    purpose: payloads are large binaries (memory-aware batching)."""
    return ds.map_batches(ImageDecodeStage,
                          fn_constructor_kwargs=dict(fake=fake),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


# ---------------------------------------------------------------------------
# perceptual hashing (near-duplicate media across re-encodes / light edits)
# ---------------------------------------------------------------------------
#
# The exact media dedup (pipelines/documents.canonical_media_refs) catches
# byte-identical payloads only; re-encoded, lightly-noised or re-gained
# copies need a perceptual fingerprint. One 64-bit hash per payload, then
# the SAME pigeonhole Hamming banding as SimHash text near-dup
# (functions/dedup.hamming_neardup_pairs) — payload bytes never shuffle,
# only the tiny (ref, hash) sketch table does.

def _to_gray(arr: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 -> HxW float64 luma (ITU-R BT.601 weights)."""
    a = arr.astype(np.float64)
    return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]


def _box_resize(gray: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Deterministic area-mean resize to (th, tw): rows/cols are binned into
    nearly-equal integer spans and each output cell is the mean of its box.
    Tiny inputs are nearest-upsampled first so every box is non-empty."""
    h, w = gray.shape
    if h < th:
        gray = gray[(np.arange(th) * h) // th, :]
        h = th
    if w < tw:
        gray = gray[:, (np.arange(tw) * w) // tw]
        w = tw
    rb = (np.arange(th + 1, dtype=np.int64) * h) // th
    cb = (np.arange(tw + 1, dtype=np.int64) * w) // tw
    rs = np.add.reduceat(gray, rb[:-1], axis=0)
    cs = np.add.reduceat(rs, cb[:-1], axis=1)
    counts = np.diff(rb)[:, None] * np.diff(cb)[None, :]
    return cs / counts


def _pack_bits64(bits: np.ndarray) -> np.uint64:
    """64 bools -> uint64, bit i = bits[i] (little-endian bit order, matching
    the SimHash packing so Hamming banding treats both families alike)."""
    return np.packbits(bits.astype(np.uint8),
                       bitorder="little").view(np.uint64)[0]


def dhash64(arr: np.ndarray) -> np.uint64:
    """Difference hash: 8x9 area-mean luma grid, bit = right pixel brighter
    than its left neighbour. Robust to re-encoding and global gain."""
    g8 = _box_resize(_to_gray(arr), 8, 9)
    return _pack_bits64((g8[:, 1:] > g8[:, :-1]).ravel())


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II matrix (type-II, norm='ortho')."""
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


def phash64(arr: np.ndarray, dct: np.ndarray | None = None) -> np.uint64:
    """Perceptual hash: 32x32 area-mean luma -> 2-D orthonormal DCT-II (two
    matmuls) -> the 8x8 lowest-frequency block thresholded at its median.
    Robust to re-encoding, light noise and small local edits."""
    global _DCT32
    if dct is None:
        if _DCT32 is None:
            _DCT32 = _dct_matrix(32)
        dct = _DCT32
    g32 = _box_resize(_to_gray(arr), 32, 32)
    d = dct @ g32 @ dct.T
    block = d[:8, :8].ravel()
    return _pack_bits64(block > np.median(block))


def _log_band_edges(n_bins: int, bands: int = 9) -> np.ndarray:
    """Strictly increasing integer edges 0 = e0 < ... < e_bands = n_bins,
    log-spaced — audio energy concentrates at low frequencies, so linear
    splits would drop every real tone into band 0 and hash everything to
    the same value. Requires n_bins >= bands."""
    e = np.round(np.power(float(n_bins),
                          np.arange(bands + 1) / bands)).astype(np.int64)
    e[0], e[-1] = 0, n_bins
    for i in range(1, bands + 1):              # strict from the left
        e[i] = max(e[i], e[i - 1] + 1)
    for i in range(bands - 1, -1, -1):         # strict from the right
        e[i] = min(e[i], e[i + 1] - 1)
    return e


def audio_hash64(samples: np.ndarray) -> np.uint64:
    """Spectral-delta hash over mono samples (Haitsma-Kalker-style): 8 equal
    time frames x 9 LOG-spaced rfft band energies (DC excluded);
    bit[t, b] = energy rises from band b to b+1 in frame t. Invariant to
    global gain (comparisons only)."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < 160:                     # tiny clips: cycle-pad
        x = np.resize(x, 160)
    fb = (np.arange(9, dtype=np.int64) * len(x)) // 8
    bits = np.empty((8, 8), dtype=bool)
    for t in range(8):
        spec = np.abs(np.fft.rfft(x[fb[t]:fb[t + 1]]))[1:]  # drop DC
        if len(spec) < 9:
            spec = np.resize(spec, 9)
        bb = _log_band_edges(len(spec), 9)
        e = np.add.reduceat(spec * spec, bb[:-1])
        bits[t] = e[1:] > e[:-1]
    return _pack_bits64(bits.ravel())


def video_hash64(payload: bytes, dct: np.ndarray | None = None) -> np.uint64:
    """Majority-vote pHash across the container's frames: bit set iff a
    strict majority of frame pHashes set it (ties -> 0; deterministic)."""
    votes = np.zeros(64, dtype=np.int64)
    n = 0
    for _, ppm in decode_video_frames(payload):
        h = phash64(decode_ppm(ppm), dct)
        votes += np.unpackbits(
            np.asarray([h], dtype=np.uint64).view(np.uint8),
            bitorder="little").astype(np.int64)
        n += 1
    if n == 0:
        return np.uint64(0)
    return _pack_bits64(votes * 2 > n)


class MediaHashStage:
    """Actor-pool stage: one perceptual 64-bit hash per payload, decoder
    picked by payload magic (P6 PPM / BMP -> pHash, RIFF WAV -> spectral
    hash, BRDRVID1 -> majority-vote frame pHash). The DCT matrix is built
    once per actor. ``fake=True`` hashes undecodable bytes with blake2b
    (plumbing/smoke paths), mirroring the other media stages' flag."""

    def __init__(self, fake: bool = False, id_col: str = "media_ref",
                 payload_col: str = "payload"):
        self.fake = fake
        self.id_col = id_col
        self.payload_col = payload_col
        self._dct = _dct_matrix(32)

    def _hash_one(self, payload: bytes) -> np.uint64:
        if payload.startswith(b"P6") or payload.startswith(b"BM"):
            return phash64(decode_image_payload(payload), self._dct)
        if payload.startswith(b"RIFF"):
            return audio_hash64(decode_wav(payload)[0])
        if payload.startswith(VIDEO_MAGIC):
            return video_hash64(payload, self._dct)
        if self.fake:
            dig = hashlib.blake2b(payload, digest_size=8).digest()
            return np.frombuffer(dig, dtype=np.uint64)[0]
        raise ValueError("undecodable media payload (JPEG/PNG/MP3/MP4 need "
                         "external codecs absent in this container); pass "
                         "fake=True for opaque-bytes plumbing")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        hashes = np.fromiter((self._hash_one(p) for p in payloads),
                             dtype=np.uint64, count=len(payloads))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "phash": pa.array(hashes.view(np.int64), pa.int64()),
        })


def media_hashes(media, fake: bool = False, id_col: str = "media_ref",
                 payload_col: str = "payload", batch_size: int = 32,
                 concurrency=None):
    """(id, phash) sketch table for a media Dataset — the only thing later
    stages shuffle; payload bytes stay where they were read."""
    from .pool import actor_pool

    return media.map_batches(
        MediaHashStage,
        fn_constructor_kwargs=dict(fake=fake, id_col=id_col,
                                   payload_col=payload_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or actor_pool())


def media_neardup_pairs(media, max_hamming: int = 6, fake: bool = False,
                        id_col: str = "media_ref",
                        payload_col: str = "payload"):
    """Perceptually near-duplicate media pairs: per-payload 64-bit hash
    (actor pool), then the generic pigeonhole Hamming banding. Returns
    (id_a, id_b, hamming) with id_a < id_b."""
    from .dedup import hamming_neardup_pairs

    hashed = media_hashes(media, fake=fake, id_col=id_col,
                          payload_col=payload_col)
    return hamming_neardup_pairs(hashed, "phash", id_col=id_col,
                                 max_hamming=max_hamming)

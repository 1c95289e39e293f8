"""Multimodal columns for training-data pipelines (task mandate).

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata. The Spark-side plumbing — schemas, Arrow batch shapes, byte-budget
re-chunking, deterministic routing — is real and tested; the codec calls are
STUBBED because this container has no image/audio libraries: each decoder
first tries the real library (Pillow/soundfile) behind an import-guard and
otherwise produces a DETERMINISTIC FAKE decode derived from the payload
bytes (so tests pin exact values). Swap ``_decode_image_real`` /
``_decode_audio_real`` in a full environment; nothing else changes.

Schemas:
    media(media_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
    image_features(media_id, width, height, mean_r/g/b double, phash bigint)
    audio_features(media_id, sample_rate, n_samples, rms double)
    frames(media_id, frame_idx int, frame binary)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyarrow as pa

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)
IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, "
    "mean_r double, mean_g double, mean_b double, phash bigint, decoder string"
)
AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples int, rms double, decoder string"
)
FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_idx int, frame binary"


def _decode_image_real(payload: bytes):
    """Real decode path (absent in this container — import-guarded)."""
    try:
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        return img.size[0], img.size[1], img
    except ImportError:
        return None


def _fake_image_stats(payload: bytes, width: int, height: int):
    """Deterministic fake decode: channel means and a 64-bit perceptual-hash
    stand-in derived from the payload digest. Pure function of the bytes."""
    d = hashlib.sha256(payload).digest()
    mean_r = d[0] / 255.0 * 255
    mean_g = d[1] / 255.0 * 255
    mean_b = d[2] / 255.0 * 255
    phash = int.from_bytes(d[8:16], "big", signed=True)
    return round(mean_r, 4), round(mean_g, 4), round(mean_b, 4), phash


def make_image_features_fn(byte_budget: int = 64 << 20):
    """mapInArrow: media batches (kind='image') → image_features rows."""

    def image_features(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            names = batch.schema.names
            ids = batch.column(names.index("media_id")).to_pylist()
            payloads = batch.column(names.index("payload")).to_pylist()
            metas = batch.column(names.index("meta")).to_pylist()
            out_id, out_w, out_h = [], [], []
            out_r, out_g, out_b, out_ph, out_dec = [], [], [], [], []
            for mid, payload, meta in zip(ids, payloads, metas):
                payload = payload or b""
                w = (meta or {}).get("width") or 0
                h = (meta or {}).get("height") or 0
                real = _decode_image_real(payload)
                if real is not None:  # pragma: no cover - no PIL here
                    w, h, img = real
                    import numpy as np

                    arr = np.asarray(img, dtype="float64")
                    r, g, b = (round(float(arr[..., i].mean()), 4) for i in range(3))
                    ph = 0
                    dec = "pillow"
                else:
                    r, g, b, ph = _fake_image_stats(payload, w, h)
                    dec = "stub"
                out_id.append(mid)
                out_w.append(w)
                out_h.append(h)
                out_r.append(r)
                out_g.append(g)
                out_b.append(b)
                out_ph.append(ph)
                out_dec.append(dec)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, pa.int64()),
                    pa.array(out_w, pa.int32()),
                    pa.array(out_h, pa.int32()),
                    pa.array(out_r, pa.float64()),
                    pa.array(out_g, pa.float64()),
                    pa.array(out_b, pa.float64()),
                    pa.array(out_ph, pa.int64()),
                    pa.array(out_dec, pa.string()),
                ],
                names=[
                    "media_id",
                    "width",
                    "height",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                    "phash",
                    "decoder",
                ],
            )

    return image_features


def image_features_df(media_df):
    """kind='image' media → per-image features (pushes the kind filter to
    the scan; the UDF sees only image rows)."""
    from pyspark.sql import functions as F

    return media_df.filter(F.col("kind") == "image").mapInArrow(
        make_image_features_fn(), IMAGE_FEATURES_SCHEMA
    )


def make_frame_sample_fn(every_n: int = 10):
    """mapInArrow: video media → one fake frame row per ``every_n`` frames.
    The frame payload is a deterministic slice of the video payload (stub
    for a real keyframe decode); the EXPLODING row shape (1 video row → k
    frame rows) is the part that matters for pipeline correctness."""

    def frame_sample(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            names = batch.schema.names
            ids = batch.column(names.index("media_id")).to_pylist()
            payloads = batch.column(names.index("payload")).to_pylist()
            metas = batch.column(names.index("meta")).to_pylist()
            out_id, out_idx, out_frame = [], [], []
            for mid, payload, meta in zip(ids, payloads, metas):
                payload = payload or b""
                n_frames = (meta or {}).get("n_frames") or 0
                for idx in range(0, n_frames, every_n):
                    lo = (idx * 37) % max(1, len(payload) - 16)
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_frame.append(payload[lo : lo + 16])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, pa.int64()),
                    pa.array(out_idx, pa.int32()),
                    pa.array(out_frame, pa.binary()),
                ],
                names=["media_id", "frame_idx", "frame"],
            )

    return frame_sample


def frame_sample_df(media_df, every_n: int = 10):
    from pyspark.sql import functions as F

    return media_df.filter(F.col("kind") == "video").mapInArrow(
        make_frame_sample_fn(every_n), FRAME_SAMPLE_SCHEMA
    )


def gen_media_rows(n: int, seed: int = 42):
    """Deterministic synthetic media table rows (no external data)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        meta = {
            "width": rng.randint(16, 1920) if kind == "image" else None,
            "height": rng.randint(16, 1080) if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": rng.randint(30, 300) if kind == "video" else None,
        }
        rows.append((i, kind, payload, meta))
    return rows

"""Deterministic synthetic media fixture with REAL payloads + independently
composed expected features (round 2, VERDICT r01 #7).

Each row's payload is encoded with htmld_spark.functions.codecs encoders;
the EXPECTED features are composed here from the draw parameters by closed
forms — never by running the decoders:

- image: two-tone 24-bit BMP (left half color A, right half color B,
  width/height divisible by 8) → mean_c = (cA+cB)/2 exactly; aHash = the
  0x0F0F… (left-brighter) / 0xF0F0… (right-brighter) checker mask;
- audio: PCM-16 mono WAV square wave ±A (A odd → round(A/32768, 6) can
  never land on a tie) → rms = A/32768;
- video: RAWV container, frame f constant fill (base+7f)%256 → sampled
  frame mean == the fill byte.

The ``decoder`` column of the expected tables pins 'bmp'/'wav' — the
oracle FAILS if the stub path ran instead of the real decode.
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from htmld_spark.functions import codecs  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "media")
MEDIA_VERSION = "2"
RESIZE_W, RESIZE_H = 16, 8
N_ROWS = 300
FRAME_EVERY_N = 25

_LEFT_MASK = 0x0F0F0F0F0F0F0F0F  # bits of columns 0-3, row-major 8x8
_RIGHT_MASK = 0xF0F0F0F0F0F0F0F0


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def draw_media_row(i: int, rng: random.Random):
    """One (row, expected) pair. row = (media_id, kind, payload, meta);
    expected is a dict of the feature values composed from draw params."""
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        w = 8 * rng.randint(1, 5)
        h = 8 * rng.randint(1, 3)
        ca = tuple(rng.randrange(256) for _ in range(3))  # (r, g, b)
        while True:
            cb = tuple(rng.randrange(256) for _ in range(3))
            if sum(ca) != sum(cb):  # distinct grayscale → unambiguous aHash
                break
        half = w // 2
        # BMP rows are BGR
        row = (
            bytes((ca[2], ca[1], ca[0])) * half
            + bytes((cb[2], cb[1], cb[0])) * (w - half)
        )
        payload = codecs.encode_bmp(w, h, [row] * h)
        gray_a = sum(ca) / 3.0
        gray_b = sum(cb) / 3.0
        phash = _signed(_LEFT_MASK if gray_a > gray_b else _RIGHT_MASK)
        # expected NN-resize output BYTES, composed from the draw params
        # with the operator's pinned floor-sampling rule — never by
        # running the decoder: target col c samples source col (c*w)//tw,
        # which is color A iff it lands in the left half.
        import hashlib as _hashlib

        r_row = b"".join(
            bytes(
                ((ca if (c * w) // RESIZE_W < half else cb)[2],
                 (ca if (c * w) // RESIZE_W < half else cb)[1],
                 (ca if (c * w) // RESIZE_W < half else cb)[0])
            )
            for c in range(RESIZE_W)
        )
        resized_md5 = _hashlib.md5(
            codecs.encode_bmp(RESIZE_W, RESIZE_H, [r_row] * RESIZE_H)
        ).hexdigest()
        expected = {
            "width": w,
            "height": h,
            "mean_r": round((ca[0] + cb[0]) / 2, 4),
            "mean_g": round((ca[1] + cb[1]) / 2, 4),
            "mean_b": round((ca[2] + cb[2]) / 2, 4),
            "phash": phash,
            "decoder": "bmp",
            "resized_md5": resized_md5,
        }
        meta = {"width": w, "height": h, "sample_rate": None, "n_frames": None}
    elif kind == "audio":
        sr = rng.choice([8000, 16000, 44100])
        n = rng.randint(100, 1000)
        amp = 2 * rng.randint(500, 15000) + 1  # odd — see module docstring
        samples = [amp if j % 2 == 0 else -amp for j in range(n)]
        payload = codecs.encode_wav(sr, samples)
        expected = {
            "sample_rate": sr,
            "n_samples": n,
            "rms": round(amp / 32768.0, 6),
            "decoder": "wav",
        }
        meta = {"width": None, "height": None, "sample_rate": sr, "n_frames": None}
    else:
        w = h = 8
        n_frames = rng.randint(30, 300)
        base = rng.randrange(256)
        frames = [
            bytes([(base + 7 * f) % 256]) * (w * h * 3) for f in range(n_frames)
        ]
        payload = codecs.encode_rawv(w, h, frames)
        expected = {
            "frames": [
                (idx, float((base + 7 * idx) % 256), w * h * 3)
                for idx in range(0, n_frames, FRAME_EVERY_N)
            ]
        }
        meta = {"width": w, "height": h, "sample_rate": None, "n_frames": n_frames}
    return (i, kind, payload, meta), expected


def gen_all(n: int = N_ROWS, seed: int = 42):
    rng = random.Random(seed)
    rows, img_exp, aud_exp, frame_exp = [], [], [], []
    for i in range(n):
        row, exp = draw_media_row(i, rng)
        rows.append(row)
        if row[1] == "image":
            img_exp.append((i, exp))
        elif row[1] == "audio":
            aud_exp.append((i, exp))
        else:
            for idx, mean, nb in exp["frames"]:
                frame_exp.append((i, idx, mean, nb))
    return rows, img_exp, aud_exp, frame_exp


def ensure_media() -> str:
    """Generate + cache the media fixture parquet; returns the directory."""
    marker = os.path.join(DATA_DIR, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == MEDIA_VERSION:
                return DATA_DIR
    os.makedirs(DATA_DIR, exist_ok=True)
    rows, img_exp, aud_exp, frame_exp = gen_all()

    meta_type = pa.struct(
        [
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("sample_rate", pa.int32()),
            ("n_frames", pa.int32()),
        ]
    )
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], pa.int64()),
                "kind": pa.array([r[1] for r in rows], pa.string()),
                "payload": pa.array([r[2] for r in rows], pa.binary()),
                "meta": pa.array([r[3] for r in rows], meta_type),
            }
        ),
        os.path.join(DATA_DIR, "media.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([i for i, _ in img_exp], pa.int64()),
                "width": pa.array([e["width"] for _, e in img_exp], pa.int32()),
                "height": pa.array([e["height"] for _, e in img_exp], pa.int32()),
                "mean_r": pa.array([e["mean_r"] for _, e in img_exp], pa.float64()),
                "mean_g": pa.array([e["mean_g"] for _, e in img_exp], pa.float64()),
                "mean_b": pa.array([e["mean_b"] for _, e in img_exp], pa.float64()),
                "phash": pa.array([e["phash"] for _, e in img_exp], pa.int64()),
                "decoder": pa.array([e["decoder"] for _, e in img_exp], pa.string()),
            }
        ),
        os.path.join(DATA_DIR, "image_features_expected.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([i for i, _ in img_exp], pa.int64()),
                "out_w": pa.array([RESIZE_W] * len(img_exp), pa.int32()),
                "out_h": pa.array([RESIZE_H] * len(img_exp), pa.int32()),
                "resized_md5": pa.array(
                    [e["resized_md5"] for _, e in img_exp], pa.string()
                ),
                "decoder": pa.array(["bmp"] * len(img_exp), pa.string()),
            }
        ),
        os.path.join(DATA_DIR, "image_resize_expected.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([i for i, _ in aud_exp], pa.int64()),
                "sample_rate": pa.array(
                    [e["sample_rate"] for _, e in aud_exp], pa.int32()
                ),
                "n_samples": pa.array(
                    [e["n_samples"] for _, e in aud_exp], pa.int32()
                ),
                "rms": pa.array([e["rms"] for _, e in aud_exp], pa.float64()),
                "decoder": pa.array([e["decoder"] for _, e in aud_exp], pa.string()),
            }
        ),
        os.path.join(DATA_DIR, "audio_features_expected.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([r[0] for r in frame_exp], pa.int64()),
                "frame_idx": pa.array([r[1] for r in frame_exp], pa.int32()),
                "frame_mean": pa.array([r[2] for r in frame_exp], pa.float64()),
                "frame_bytes": pa.array([r[3] for r in frame_exp], pa.int32()),
            }
        ),
        os.path.join(DATA_DIR, "frames_expected.parquet"),
    )
    with open(marker, "w") as f:
        f.write(MEDIA_VERSION)
    return DATA_DIR


if __name__ == "__main__":
    d = ensure_media()
    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            print(f, pq.read_table(os.path.join(d, f)).num_rows, "rows")

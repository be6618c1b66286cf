"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(SURVEY-adjacent, training-data pipeline requirement).

Spark-side plumbing is REAL and tested: schemas, Arrow batch shapes,
partitioning, mapInPandas feature extraction over binary payloads. The
actual codec decode is STUBBED — this container ships no image/audio
libraries — behind ``decode_backend="real"`` which raises
NotImplementedError with the intended implementation documented. The
default ``"header"`` backend parses real container headers (PNG IHDR,
RIFF/WAVE fmt, a length-prefixed synthetic video framing) deterministically
with numpy, which exercises the exact same dataflow the real decoder would.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_FIELDS = [
    T.StructField("format", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("decode_error", T.StringType(), True),
]

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FAKE_VIDEO_MAGIC = b"FVID"


def _png(width: int, height: int, body: bytes) -> bytes:
    ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return PNG_SIG + ihdr + body


def _wav(sample_rate: int, body: bytes) -> bytes:
    fmt = (
        b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    )
    return b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE" + fmt + b"data" + struct.pack("<I", len(body)) + body


def _video(n_frames: int, frame_size: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, size=n_frames * frame_size, dtype=np.int64).astype(np.uint8)
    return FAKE_VIDEO_MAGIC + struct.pack(">II", n_frames, frame_size) + frames.tobytes()


def synth_media(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic multimodal corpus: every media_id maps to one payload
    with REAL container headers (parseable by any standard tool)."""
    rng = spark.range(0, n, 1, partitions or 4)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                kind = ("image", "audio", "video")[i % 3]
                if kind == "image":
                    payload = _png(16 + (i % 64) * 4, 16 + (i % 48) * 4, bytes([i % 251]) * (64 + i % 128))
                    meta = {"source": f"cam{i % 7}"}
                elif kind == "audio":
                    payload = _wav(8000 * (1 + i % 6), bytes([(i * 3) % 251]) * (128 + i % 64))
                    meta = {"channel": str(i % 2)}
                else:
                    payload = _video(2 + (i % 6), 32, int(i))
                    meta = {"fps": str(24 + (i % 2) * 6)}
                rows.append((int(i), kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_media_features(df: DataFrame, decode_backend: str = "header") -> DataFrame:
    """Per-kind feature extraction over Arrow batches. Output keeps every
    input column except the payload bytes, plus FEATURE_FIELDS.

    decode_backend="header": parse container headers (real PNG/WAV layouts).
    decode_backend="real": full pixel/sample decode — NotImplementedError
    here (no codec libs in this environment); on a real cluster this branch
    is `PIL.Image.open` / `soundfile.read` over the same Arrow batches.
    """
    passthrough = [f for f in df.schema.fields if f.name != "payload"]
    out_schema = T.StructType(passthrough + FEATURE_FIELDS)
    pass_names = [f.name for f in passthrough]

    if decode_backend == "real":
        raise NotImplementedError(
            "full codec decode requires PIL/soundfile/av; use decode_backend='header'"
        )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = {k: [] for k in ("format", "width", "height", "sample_rate", "n_frames", "n_bytes", "decode_error")}
            for b in pdf["payload"]:
                fmt = w = h = sr = nf = None
                err = None
                try:
                    if b.startswith(PNG_SIG):
                        fmt = "png"
                        w, h = struct.unpack(">II", b[16:24])
                    elif b.startswith(b"RIFF") and b[8:12] == b"WAVE":
                        fmt = "wav"
                        sr = struct.unpack("<I", b[24:28])[0]
                    elif b.startswith(FAKE_VIDEO_MAGIC):
                        fmt = "fvid"
                        nf = struct.unpack(">I", b[4:8])[0]
                    else:
                        err = "unknown container"
                except Exception as ex:  # noqa: BLE001 — decode errors are data
                    err = f"decode error: {ex}"
                feats["format"].append(fmt)
                feats["width"].append(w)
                feats["height"].append(h)
                feats["sample_rate"].append(sr)
                feats["n_frames"].append(nf)
                feats["n_bytes"].append(len(b))
                feats["decode_error"].append(err)
            base = pdf[pass_names].reset_index(drop=True)
            yield pd.concat([base, pd.DataFrame(feats)], axis=1)

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every k-th frame of video payloads → one row per sampled frame
    (media_id, frame_idx, frame_bytes). Real byte-slicing over the synthetic
    framing; the real-codec variant would use `av` keyframe iteration."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), False),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, blobs = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if not b.startswith(FAKE_VIDEO_MAGIC):
                    continue
                nf, fs = struct.unpack(">II", b[4:12])
                base = 12
                for f_i in range(0, nf, every_k):
                    ids.append(int(mid))
                    idxs.append(f_i)
                    blobs.append(b[base + f_i * fs : base + (f_i + 1) * fs])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_bytes": blobs})

    return df.filter(F.col("kind") == "video").mapInPandas(run, schema=out_schema)

"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(SURVEY-adjacent, training-data pipeline requirement).

Spark-side plumbing is REAL and tested: schemas, Arrow batch shapes,
partitioning, mapInPandas feature extraction over binary payloads. Two
backends:

- ``decode_backend="header"`` (default): parse container headers only
  (PNG IHDR, BMP BITMAPINFOHEADER, PPM, RIFF/WAVE fmt, a length-prefixed
  synthetic video framing) — cheap metadata pass.
- ``decode_backend="real"``: full pixel/sample decode, pure numpy, for the
  UNCOMPRESSED formats — BMP 24-bpp (bottom-up rows, 4-byte padding), PPM
  P6, WAV PCM16 (duration + RMS), and the synthetic raw-frame video.
  Compressed codecs (PNG/JPEG/MP3/H.264) yield a ``decode_error`` row
  ("codec not available") — this container ships no codec libraries; on a
  real cluster that branch is PIL/soundfile/av over the same Arrow batches.
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
    # real-decode stats (null under the header backend)
    T.StructField("pixel_mean", T.DoubleType(), True),   # mean RGB byte, 0-255
    T.StructField("sample_rms", T.DoubleType(), True),   # RMS of PCM16 / 32768
    T.StructField("duration_s", T.DoubleType(), True),   # PCM duration seconds
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


def _bmp(width: int, height: int, seed: int) -> bytes:
    """Real 24-bpp uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER +
    bottom-up pixel rows padded to 4 bytes — parseable by any image tool."""
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(height, width, 3), dtype=np.int64).astype(np.uint8)
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    rows = b"".join(px[y].tobytes() + b"\x00" * pad for y in range(height - 1, -1, -1))
    data_off = 14 + 40
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", data_off + len(rows), 0, 0, data_off)
    return header + info + rows


def _ppm(width: int, height: int, seed: int) -> bytes:
    """Binary PPM (P6), maxval 255."""
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=height * width * 3, dtype=np.int64).astype(np.uint8)
    return f"P6\n{width} {height}\n255\n".encode() + px.tobytes()


def _pcm_wav(sample_rate: int, n_samples: int, freq_hz: float) -> bytes:
    """Real 16-bit mono PCM WAV: a deterministic sine at freq_hz, 0.5 FS
    amplitude (known RMS = 0.5/√2 ≈ 0.353553 for whole periods)."""
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    x = (0.5 * np.sin(2 * np.pi * freq_hz * t) * 32767.0).astype(np.int16)
    return _wav(sample_rate, x.tobytes())


def synth_media(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic multimodal corpus: every media_id maps to one payload
    with REAL container headers (parseable by any standard tool)."""
    rng = spark.range(0, n, 1, partitions or 4)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                sel = i % 6
                if sel == 0:  # compressed image (header-only decodable here)
                    kind = "image"
                    payload = _png(16 + (i % 64) * 4, 16 + (i % 48) * 4, bytes([i % 251]) * (64 + i % 128))
                    meta = {"source": f"cam{i % 7}"}
                elif sel in (1, 5):  # real PCM16 sine — fully decodable
                    kind = "audio"
                    sr = 8000 * (1 + (i // 6) % 6)
                    payload = _pcm_wav(sr, sr // 10, 200.0 + 10.0 * (i % 30))
                    meta = {"channel": str(i % 2)}
                elif sel == 2:
                    kind = "video"
                    payload = _video(2 + (i % 6), 32, int(i))
                    meta = {"fps": str(24 + (i % 2) * 6)}
                elif sel == 3:  # uncompressed BMP — fully decodable
                    kind = "image"
                    payload = _bmp(8 + (i % 5) * 4, 6 + (i % 3) * 4, int(i))
                    meta = {"source": f"cam{i % 7}"}
                else:  # sel == 4: binary PPM — fully decodable
                    kind = "image"
                    payload = _ppm(5 + (i % 4) * 3, 4 + (i % 4) * 2, int(i))
                    meta = {"source": f"cam{i % 7}"}
                rows.append((int(i), kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_media_features(df: DataFrame, decode_backend: str = "header") -> DataFrame:
    """Per-kind feature extraction over Arrow batches. Output keeps every
    input column except the payload bytes, plus FEATURE_FIELDS.

    decode_backend="header": parse container headers only (cheap metadata).
    decode_backend="real": full pixel/sample decode for uncompressed
    formats — BMP 24-bpp, PPM P6, WAV PCM16, raw-frame video — pure numpy.
    Compressed codecs (PNG here) yield decode_error="codec not available"
    rows; on a real cluster that branch is PIL/soundfile/av over the same
    Arrow batches.
    """
    if decode_backend not in ("header", "real"):
        raise ValueError(f"unknown decode_backend: {decode_backend!r}")
    passthrough = [f for f in df.schema.fields if f.name != "payload"]
    out_schema = T.StructType(passthrough + FEATURE_FIELDS)
    pass_names = [f.name for f in passthrough]
    deep = decode_backend == "real"

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = [f.name for f in FEATURE_FIELDS]
        for pdf in it:
            feats = {k: [] for k in keys}
            for b in pdf["payload"]:
                r = _decode_one(bytes(b), deep)
                r["n_bytes"] = len(b)
                for k in keys:
                    feats[k].append(r.get(k))
            base = pdf[pass_names].reset_index(drop=True)
            yield pd.concat([base, pd.DataFrame(feats)], axis=1)

    return df.mapInPandas(run, schema=out_schema)


def _decode_one(b: bytes, deep: bool) -> dict:
    """Decode one payload. ``deep=False``: headers only. ``deep=True``: full
    pixel/sample decode for the uncompressed formats. Decode errors are data
    (the row always flows on)."""
    try:
        if b.startswith(PNG_SIG):
            w, h = struct.unpack(">II", b[16:24])
            out = {"format": "png", "width": int(w), "height": int(h)}
            if deep:
                # DEFLATE-compressed IDAT: no codec libs in this container.
                out["decode_error"] = "codec not available: png (compressed; needs PIL)"
            return out
        if b.startswith(b"BM"):
            data_off = struct.unpack("<I", b[10:14])[0]
            w, h = struct.unpack("<ii", b[18:26])
            bpp, comp = struct.unpack("<H", b[28:30])[0], struct.unpack("<I", b[30:34])[0]
            out = {"format": "bmp", "width": int(w), "height": abs(int(h))}
            if deep:
                if bpp != 24 or comp != 0:
                    out["decode_error"] = f"codec not available: bmp bpp={bpp} comp={comp}"
                    return out
                stride = ((w * 3 + 3) // 4) * 4
                rows = np.frombuffer(
                    b, dtype=np.uint8, count=stride * abs(h), offset=data_off
                ).reshape(abs(h), stride)[:, : w * 3]
                out["pixel_mean"] = float(rows.astype(np.float64).mean())
            return out
        if b.startswith(b"P6"):
            import re as _re

            m = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", b)
            if not m:
                return {"format": "ppm", "decode_error": "decode error: bad P6 header"}
            w, h, maxval = (int(m.group(i)) for i in (1, 2, 3))
            out = {"format": "ppm", "width": w, "height": h}
            if deep:
                if maxval != 255:
                    out["decode_error"] = f"codec not available: ppm maxval={maxval}"
                    return out
                px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=m.end())
                out["pixel_mean"] = float(px.astype(np.float64).mean())
            return out
        if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
            out = {"format": "wav"}
            # walk RIFF chunks for fmt + data (real layout, not fixed offsets)
            pos, fmt_chunk, data = 12, None, None
            while pos + 8 <= len(b):
                cid, clen = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
                if cid == b"fmt ":
                    fmt_chunk = b[pos + 8 : pos + 8 + clen]
                elif cid == b"data":
                    data = b[pos + 8 : pos + 8 + clen]
                pos += 8 + clen + (clen & 1)
            if fmt_chunk is None:
                return {"format": "wav", "decode_error": "decode error: no fmt chunk"}
            afmt, channels, sr, _br, _ba, bits = struct.unpack("<HHIIHH", fmt_chunk[:16])
            out["sample_rate"] = int(sr)
            if deep:
                if afmt != 1 or bits != 16 or data is None:
                    out["decode_error"] = f"codec not available: wav fmt={afmt} bits={bits}"
                    return out
                x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
                out["duration_s"] = float(len(x) / (sr * channels))
                out["sample_rms"] = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
            return out
        if b.startswith(FAKE_VIDEO_MAGIC):
            nf, fs = struct.unpack(">II", b[4:12])
            out = {"format": "fvid", "n_frames": int(nf)}
            if deep:  # raw uncompressed frames — fully decodable
                px = np.frombuffer(b, dtype=np.uint8, count=nf * fs, offset=12)
                out["pixel_mean"] = float(px.astype(np.float64).mean())
            return out
        return {"decode_error": "unknown container"}
    except Exception as ex:  # noqa: BLE001 — decode errors are data
        return {"decode_error": f"decode error: {ex}"}


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

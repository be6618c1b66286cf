"""Partitioned Bloom seen-set (SURVEY.md §2.5 A4; north-rule requirement).

The reference's seen-set is the `urls` primary key itself — exact, fine for
SQLite scale. At a 10^10-URL frontier an exact per-epoch anti-join shuffles
the whole key set; the scale path is a *partitioned Bloom pre-filter*:

- one Bloom bitmap per key bucket (``pmod(key, n_buckets)``), built
  distributed (applyInPandas per bucket, numpy bit ops), a few MB/bucket;
- the frontier probes its own bucket's bitmap via a cogrouped
  applyInPandas — no row ever pairs with a foreign bucket's bitmap;
- "definitely unseen" rows skip the exact join entirely; only the
  "maybe seen" minority (true hits + FPP) goes through the exact
  anti-join for confirmation, so the final result is EXACT.

Bitmaps are rebuilt per epoch from the (TTL-pruned) store — never mutated
incrementally — so expiry correctly *removes* membership (SURVEY §7 risk
list). PySpark exposes no DataFrame Bloom builder, so this is implemented
from first principles (double hashing h1 + i*h2, splitmix64-style mixing).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_bits", T.LongType(), False),
        T.StructField("n_hashes", T.IntegerType(), False),
        T.StructField("bitmap", T.BinaryType(), False),
    ]
)

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per key (splitmix64 finalizer halves)."""
    x = keys.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * _C1
    x = (x ^ (x >> np.uint64(27))) * _C2
    h1 = x ^ (x >> np.uint64(31))
    h2 = (x * _C1) | np.uint64(1)  # odd → full-period stepping
    return h1, h2


def _positions(keys: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    h1, h2 = _mix(keys)
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(n_bits)).astype(np.int64)


def bloom_params(n_keys: int, bits_per_key: int = 10) -> tuple[int, int]:
    n_bits = max(64, int(n_keys) * bits_per_key)
    n_bits = (n_bits + 7) // 8 * 8
    n_hashes = max(1, int(round(bits_per_key * math.log(2))))
    return n_bits, n_hashes


def build_bloom(
    keys: DataFrame,
    key_col: str = "key",
    n_buckets: int = 16,
    bits_per_key: int = 10,
) -> DataFrame:
    """Build one bitmap per bucket. Bits are sized from the per-bucket count
    estimate (count()/n_buckets) — cheap relative to the build itself."""
    total = keys.count()
    n_bits, n_hashes = bloom_params(max(1, total // max(1, n_buckets)), bits_per_key)

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        k = pdf[key_col].to_numpy(dtype=np.int64)
        bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
        if len(k):
            pos = _positions(k, n_bits, n_hashes).ravel()
            np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["__bb"].iloc[0]) if len(pdf) else 0],
                "n_bits": [n_bits],
                "n_hashes": [n_hashes],
                "bitmap": [bitmap.tobytes()],
            }
        )

    with_bucket = keys.withColumn("__bb", F.pmod(F.col(key_col), F.lit(n_buckets)).cast("int"))
    return with_bucket.groupBy("__bb").applyInPandas(make, schema=BLOOM_SCHEMA)


def probe_bloom(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    n_buckets: int = 16,
    flag_col: str = "maybe_seen",
) -> DataFrame:
    """Append `maybe_seen`: False ⇒ definitely not in the built key set.
    Cogrouped per bucket so each task touches exactly one bitmap."""
    out_schema = T.StructType(candidates.schema.fields + [T.StructField(flag_col, T.BooleanType(), False)])
    cand_cols = candidates.columns

    def check(cand: pd.DataFrame, bl: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(columns=[*cand_cols, flag_col])
        base = cand[cand_cols]
        if bl.empty:
            return base.assign(**{flag_col: False})
        n_bits = int(bl["n_bits"].iloc[0])
        n_hashes = int(bl["n_hashes"].iloc[0])
        bitmap = np.frombuffer(bl["bitmap"].iloc[0], dtype=np.uint8)
        k = cand[key_col].to_numpy(dtype=np.int64)
        pos = _positions(k, n_bits, n_hashes)
        bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return base.assign(**{flag_col: bits.all(axis=0).astype(bool)})

    cb = candidates.withColumn("__bb", F.pmod(F.col(key_col), F.lit(n_buckets)).cast("int"))
    bb = bloom.withColumnRenamed("bucket", "__bb")
    return (
        cb.groupBy("__bb")
        .cogroup(bb.groupBy("__bb"))
        .applyInPandas(check, schema=out_schema)
    )

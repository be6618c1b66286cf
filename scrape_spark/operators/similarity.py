"""Similarity search over embedding columns (array<float>).

- ``cosine``: explicit-formula cosine in double precision via JVM
  zip_with/aggregate folds (sequential left-to-right sums → bit-stable and
  engine-comparable; no UDF, no Python).
- ``ann_topk``: brute-force exact top-k — the correctness baseline. The
  query side is broadcast; the corpus stays distributed; per-query top-k is
  a window rank. At 100 TB the window shuffle is bounded by
  |queries| × |corpus partition| candidates.
- ``ann_topk_lsh``: the scale path — random-hyperplane sign buckets
  (deterministic seeded planes), candidates = bucket collisions with
  optional 1-bit multiprobe, then exact cosine rank within candidates.
  Approximate recall, exact precision on what it returns (recall tested).
- ``embedding_neardup_pairs``: all pairs above a cosine threshold (the
  embedding variant of near-dup dedupe).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    """dot / (sqrt(||a||²) * sqrt(||b||²)) in double precision."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (F.sqrt(_norm2(ad)) * F.sqrt(_norm2(bd)))


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k neighbors per query (excluding self), ranked
    by (cosine DESC, neighbor id ASC) — fully deterministic."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("sim", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "rk", F.round("sim", 6).alias("sim_r"))
    )


def hyperplane_signature(
    vec_col: Column, dim: int, n_planes: int = 16, seed: int = 7
) -> Column:
    """Sign-bit bucket id from deterministic random hyperplanes (seeded
    numpy, materialized as literal arrays → pure JVM evaluation)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    vd = F.transform(vec_col, lambda x: x.cast("double"))
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[p]])
        d = _dot(vd, plane)
        bucket = bucket + F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
    return bucket


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 10,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH: a candidate shares a
    sign bucket with the query in ANY of n_tables independent tables (plus
    1-bit-flipped buckets when multiprobe). Candidates are then ranked by
    exact cosine — approximate recall, exact precision. The bucket equi-join
    replaces the cross join: per table the probe fan-out is
    |queries| × (n_planes+1), so work scales with bucket occupancy, not
    |corpus| × |queries|."""
    c_sides, q_sides = [], []
    for t in range(n_tables):
        sig = hyperplane_signature(F.col(vec_col), dim, n_planes, seed=7 + 101 * t)
        c_sides.append(
            corpus.select(
                F.col(id_col).alias("n_id"),
                F.col(vec_col).alias("n_vec"),
                F.lit(t).alias("table"),
                sig.alias("bucket"),
            )
        )
        q_sides.append(
            queries.select(
                F.col(id_col).alias("q_id"),
                F.col(vec_col).alias("q_vec"),
                F.lit(t).alias("table"),
                sig.alias("qb"),
            )
        )
    c = c_sides[0]
    for s in c_sides[1:]:
        c = c.unionByName(s)
    q = q_sides[0]
    for s in q_sides[1:]:
        q = q.unionByName(s)
    if multiprobe:
        probes = F.array(
            F.col("qb"),
            *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
    else:
        probes = F.array(F.col("qb"))
    q_probes = q.select("q_id", "q_vec", "table", F.explode(probes).alias("bucket"))
    cand = (
        c.join(F.broadcast(q_probes), ["table", "bucket"])
        .filter(F.col("n_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "n_id"])
    )
    scored = cand.withColumn("sim", cosine(F.col("q_vec"), F.col("n_vec")))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "rk", F.round("sim", 6).alias("sim_r"))
    )


def normalized(vec_col: Column) -> Column:
    """Unit-normalize in double precision: x / sqrt(Σx²), sequential fold."""
    vd = F.transform(vec_col, lambda x: x.cast("double"))
    n = F.sqrt(_norm2(vd))
    return F.transform(vd, lambda x: x / n)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (i < j) with cosine > threshold — brute-force exact.
    Each vector is unit-normalized ONCE (cached — Catalyst would otherwise
    inline the normalization into every pair), so the O(n²) stage is a
    single 64-wide dot fold per pair instead of dot+two norms."""
    base = df.select(
        F.col(id_col).alias("__id"), normalized(F.col(vec_col)).alias("__vn")
    ).cache()
    a = base.select(F.col("__id").alias("i"), F.col("__vn").alias("va"))
    b = base.select(F.col("__id").alias("j"), F.col("__vn").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("i") < F.col("j"))
        .withColumn("sim", _dot(F.col("va"), F.col("vb")))
        .filter(F.col("sim") > threshold)
        .select("i", "j", F.round("sim", 6).alias("sim_r"))
    )

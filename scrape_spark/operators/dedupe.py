"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design notes (the whole point of each variant):
- **exact**: one shuffle — groupBy fingerprint. At 100 TB use it first; it
  kills the bulk cheaply.
- **jaccard_pairs**: exact set-similarity via an inverted-index self-join
  (explode token → join on token → count pairs). Quadratic in the worst
  case; intended for verification and small blocks, which is exactly how
  the MinHash verifier uses it.
- **minhash_lsh**: the scale path. Signatures are built with *nested JVM
  transforms* (no Python): shingle → xxhash64 → k affine permutations →
  array_min. Banding turns near-dup detection into an equi-join on
  (band_idx, band_hash) — one shuffle keyed by band hash, skew-safe since
  bucket sizes are bounded by collision rate, then candidates are verified
  with exact Jaccard so the output has NO false positives (recall is the
  only approximation, tested).
- **simhash**: 48-bit sign-sum fingerprint (fits a BIGINT), banded for
  candidate generation, verified by Hamming distance via bit_count(xor).
- **embedding near-dup**: exact cosine threshold pairs; brute-force
  self-join here, LSH-bucketed variant in similarity.py for scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scrape_spark.functions.textstats import fingerprint, shingles, word_set

# ---------------------------------------------------------------------------
# exact dedupe
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-equal (normalized) documents: fingerprint → members.
    One map-side-combinable shuffle."""
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per fingerprint group."""
    w = F.row_number().over(
        Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col))
    )
    return df.withColumn("__rn", w).filter(F.col("__rn") == 1).drop("__rn")


# ---------------------------------------------------------------------------
# exact set-similarity pairs (inverted index self-join)
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    ngram: int = 1,
) -> DataFrame:
    """All pairs (i < j) with Jaccard(token-set_i, token-set_j) > threshold.
    ngram=1 → word sets; ngram>=2 → shingle sets. Jaccard is a small-integer
    ratio → bit-identical across engines."""
    tok = word_set(text_col) if ngram == 1 else shingles(text_col, ngram)
    base = df.select(F.col(id_col).alias("doc_id"), tok.alias("toks"))
    sizes = base.select("doc_id", F.size("toks").alias("n"))
    inv = base.select("doc_id", F.explode("toks").alias("tok"))
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("i"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("j"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "i").join(sb, "j")
        .withColumn("jac", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .filter(F.col("jac") > threshold)
        .select("i", "j", "c", (F.col("na") + F.col("nb") - F.col("c")).alias("u"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# Mersenne prime 2^31-1: with a, b, h all < 2^31, a*h + b < 2^62 — no
# BIGINT overflow under ANSI mode, and 31-bit minhash values are plenty.
MERSENNE_31 = (1 << 31) - 1


def _perm_params(k: int, seed: int = 0x5EED) -> list[tuple[int, int]]:
    """Deterministic affine permutation params (a odd, in [1, p))."""
    params = []
    x = seed & 0xFFFFFFFF
    for _ in range(k):
        x = (1103515245 * x + 12345) & 0x7FFFFFFF
        a = (x | 1) % MERSENNE_31 or 1
        x = (1103515245 * x + 12345) & 0x7FFFFFFF
        b = x % MERSENNE_31
        params.append((a, b))
    return params


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 32, ngram: int = 3
) -> DataFrame:
    """k-wide MinHash signature per document, entirely in JVM expressions:
    sig[i] = min over shingles of (a_i * xxhash64(shingle) + b_i) mod 2^61-1."""
    sh = shingles(text_col, ngram)
    hashes = F.transform(sh, lambda s: F.abs(F.xxhash64(s)))

    def _affine(a: int, b: int):
        return lambda h: F.pmod(
            F.lit(a) * F.pmod(h, F.lit(MERSENNE_31)) + F.lit(b), F.lit(MERSENNE_31)
        )

    sig_cols = [
        F.array_min(F.transform(hashes, _affine(a, b))) for a, b in _perm_params(k)
    ]
    return df.select(
        F.col(id_col).alias("doc_id"), F.array(*sig_cols).alias("sig")
    ).where(F.size(sh) > 0)


def lsh_candidates(sig_df: DataFrame, k: int = 32, bands: int = 8) -> DataFrame:
    """Band the k-wide signatures and emit candidate pairs (i < j) that
    collide in at least one band: explode bands → equi-join on (band, hash)."""
    rows = k // bands
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at("sig", i * rows + r + 1).cast("string")
                        for r in range(rows)
                    ],
                )
            ).alias("bh"),
        )
        for i in range(bands)
    ]
    banded = sig_df.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", "b.band", "b.bh")
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("i"), F.col("r.doc_id").alias("j"))
        .distinct()
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    k: int = 32,
    bands: int = 8,
    ngram: int = 3,
) -> DataFrame:
    """LSH candidates verified with exact shingle Jaccard — zero false
    positives; recall bounded by the (k, bands) S-curve (tested)."""
    # cache the signatures: each band consumer would otherwise re-evaluate
    # the full k-permutation expression tree per exploded band row
    sig = minhash_signatures(df, id_col, text_col, k, ngram).cache()
    cand = lsh_candidates(sig, k, bands)
    toks = df.select(
        F.col(id_col).alias("doc_id"), shingles(text_col, ngram).alias("toks")
    ).cache()
    ti = toks.select(F.col("doc_id").alias("i"), F.col("toks").alias("ta"))
    tj = toks.select(F.col("doc_id").alias("j"), F.col("toks").alias("tb"))
    return (
        cand.join(ti, "i").join(tj, "j")
        .withColumn("c", F.size(F.array_intersect("ta", "tb")))
        .withColumn("u", F.size(F.array_union("ta", "tb")))
        .filter(F.col("c") / F.col("u") > threshold)
        .select("i", "j", "c", "u")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 48


def simhash(col: str | Column, bits: int = SIMHASH_BITS) -> Column:
    """Sign-sum SimHash over whitespace tokens, built with a JVM aggregate
    fold (no UDF). bits<=62 so the value fits a signed BIGINT. Bit masks are
    a literal powers-of-two array (shift amounts can't be Columns)."""
    toks = word_set(col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    zero = F.array_repeat(F.lit(0), bits)
    counts = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(powers, lambda p: F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1)),
            lambda x, y: x + y,
        ),
    )
    packed = F.aggregate(
        F.zip_with(
            counts,
            powers,
            lambda cnt, p: F.when(cnt > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return packed


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    bands: int = 4,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Candidate pairs via banded simhash segments (pigeonhole: any pair
    within max_hamming collides in ≥1 of bands segments when
    bands > max_hamming is not required but improves recall), verified by
    exact Hamming distance bit_count(i XOR j) <= max_hamming."""
    seg = bits // bands
    sh = df.select(F.col(id_col).alias("doc_id"), simhash(text_col, bits).alias("sh"))
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("sh"), i * seg)
            .bitwiseAND(F.lit((1 << seg) - 1))
            .alias("seg"),
        )
        for i in range(bands)
    ]
    banded = sh.select(
        "doc_id", "sh", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", "sh", "b.band", "b.seg")
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.seg") == F.col("r.seg"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("i"),
            F.col("r.doc_id").alias("j"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )

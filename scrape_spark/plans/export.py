"""Training-corpus export: crawl store → cleaned document set.

The reference stops at "extracted pages in a store"; the reason anyone
crawls at 100 TB is to FEED something — so this plan composes the
LLM-data-pipeline operators (textstats annotation, exact fingerprint
dedup, optional MinHash/SimHash near-dup drop) into the one journey a
training-data user actually runs:

    store rows ─ ok-filter ─ annotate(lang, quality, tokens)
               ─ quality/lang gates ─ exact dedup (fingerprint groupBy)
               ─ [near-dup pairs → connected components → drop losers]
               ─ parquet corpus

Scale shape: annotation is pure JVM column work (no shuffle); the quality/
lang gates run BEFORE any dedup so the expensive similarity stages see only
surviving rows; exact dedup is one map-combinable shuffle on the 64-bit
fingerprint; near-dup discovery is banded LSH (bounded candidate pairs,
never all-pairs) and clustering is O(log diameter) rounds over the pair
set. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scrape_spark.functions.textstats import lang_id, quality_score, token_count_ws


def annotate(rows: DataFrame, text_col: str = "content_text") -> DataFrame:
    """Add the per-document text statistics every downstream gate keys on:
    ``lang`` (n-gram heuristic), ``quality`` (length/alpha/punct mix),
    ``n_tokens`` (whitespace). One projection, zero shuffles."""
    return (
        rows.withColumn("lang", lang_id(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("n_tokens", token_count_ws(text_col))
    )


def export_corpus(
    rows: DataFrame,
    id_col: str = "key",
    text_col: str = "content_text",
    min_quality: float | None = None,
    langs: list[str] | None = None,
    neardup: str | None = None,
    threshold: float = 0.7,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Store rows → deduplicated, quality-gated corpus rows.

    ``neardup``: None (exact dedup only), ``'minhash'`` (shingle MinHash+LSH
    candidates, exact-Jaccard verified) or ``'simhash'`` (banded Hamming).
    ``keep_cols`` selects extra passthrough columns (url/title/...); the
    output always carries ``id_col, lang, quality, n_tokens``.
    """
    ok = rows
    if "status_code" in rows.columns:
        ok = ok.filter(F.col("status_code") == 200)
    ok = ok.filter(F.length(F.coalesce(F.col(text_col), F.lit(""))) > 0)

    ann = annotate(ok, text_col)
    if min_quality is not None:
        ann = ann.filter(F.col("quality") >= F.lit(min_quality))
    if langs:
        ann = ann.filter(F.col("lang").isin(list(langs)))

    # exact dedup FIRST (one window shuffle on the 64-bit fingerprint, the
    # same min-id-representative semantics as exact_dedup_groups) so
    # byte-duplicates never reach the similarity stages
    from scrape_spark.operators.dedupe import exact_dedup

    w_cols = [id_col, "lang", "quality", "n_tokens", text_col] + [
        c for c in (keep_cols or []) if c in ann.columns
    ]
    ann = ann.select(*dict.fromkeys(w_cols))
    deduped = exact_dedup(ann, id_col, text_col)

    if neardup:
        from scrape_spark.operators.dedupe import (
            drop_near_duplicates,
            minhash_neardup_pairs,
            simhash_neardup_pairs,
        )

        if neardup == "minhash":
            pairs = minhash_neardup_pairs(deduped, id_col, text_col, threshold)
        elif neardup == "simhash":
            pairs = simhash_neardup_pairs(deduped, id_col, text_col)
        else:
            raise ValueError(f"unknown neardup method: {neardup!r}")
        deduped = drop_near_duplicates(deduped, id_col, pairs.select("i", "j"))

    return deduped

"""Text-analysis functions for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting, document
fingerprinting, word sets and shingles. All pure JVM-side expressions
(whole-stage codegen; no Python) so they run at scan speed over 100 TB.

These are net-new relative to the reference (its unit of work is one page;
corpus-level analytics is the point of the rebuild) but follow the same
error-tolerant, deterministic style.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col: str | Column) -> Column:
    """Whitespace tokens of the raw text (empties dropped)."""
    return F.filter(F.split(F.trim(_c(col)), r"\s+"), lambda x: x != F.lit(""))


def word_set(col: str | Column) -> Column:
    """Distinct lowercase tokens — the unit for set-similarity dedupe."""
    return F.array_distinct(F.filter(F.split(F.lower(F.trim(_c(col))), r"\s+"), lambda x: x != F.lit("")))


def token_count_ws(col: str | Column) -> Column:
    """Whitespace token count. ``regexp_count`` of non-space runs, not
    ``size(words(...))``: the two are equal for every string (a maximal
    \\S+ run IS a non-empty split token — pinned by a property test), but
    the lambda in ``words`` is a higher-order function that falls out of
    whole-stage codegen, and this count sits in the export annotation's
    per-row hot path."""
    return F.regexp_count(_c(col), F.lit(r"\S+"))


def token_count_bpe(col: str | Column) -> Column:
    """BPE-ish token count: word pieces + standalone punctuation, the usual
    pre-tokenizer regex shape."""
    return F.size(
        F.regexp_extract_all(_c(col), F.lit(r"([a-zA-Z0-9]+|[^a-zA-Z0-9\s])"), F.lit(1))
    )


def shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), built with nested JVM transforms —
    no UDF. Documents shorter than n words get their full-text single shingle."""
    w = words(F.lower(_c(col)))
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(w) - F.lit(n - 1)))
    gram = F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))
    return F.array_distinct(gram)


# Marker stopwords per language — tiny deterministic heuristic sets.
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is)\b",
    "fr": r"\b(le|la|et|les|des)\b",
    "de": r"\b(die|der|und|das|ist)\b",
    "es": r"\b(el|los|de|las|y)\b",
}
CJK_RANGE = r"[一-鿿]"


def lang_scores(col: str | Column) -> dict[str, Column]:
    low = F.lower(_c(col))
    scores = {
        lang: F.size(F.regexp_extract_all(low, F.lit(pat), F.lit(1)))
        for lang, pat in LANG_MARKERS.items()
    }
    scores["zh"] = F.length(low) - F.length(F.regexp_replace(low, CJK_RANGE, ""))
    return scores


def lang_id(col: str | Column) -> Column:
    """Argmax of marker-hit counts, deterministic tie-break by language code
    order; 'und' when nothing matches."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in sorted(scores, reverse=True):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best <= 0, F.lit("und")).otherwise(out)


def quality_score(col: str | Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band, punctuation ratio,
    alpha ratio, mean token length band. Rounded to 4dp for engine-stable
    comparison."""
    c = _c(col)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z一-鿿]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    n_tok = token_count_ws(c)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_tok = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    len_band = F.when(n_chars >= 200, F.lit(1.0)).when(n_chars >= 50, F.lit(0.5)).otherwise(F.lit(0.0))
    tok_band = F.when((mean_tok >= 3) & (mean_tok <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    score = (
        F.lit(0.4) * len_band
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * tok_band
        - F.lit(0.1) * punct_ratio
    )
    return F.round(F.greatest(F.lit(0.0), F.least(F.lit(1.0), score)), 4)


def fingerprint(col: str | Column) -> Column:
    """Content fingerprint: md5 over the case/punctuation-normalized text —
    the exact-dedupe key."""
    return F.md5(F.regexp_replace(F.lower(_c(col)), r"[^a-z0-9一-鿿]", ""))

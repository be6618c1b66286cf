"""Scalar column functions (SURVEY.md §2.2, §2.4) — all JVM-side built-in
expressions (whole-stage codegen; no Python in the hot path).

Each function documents its reference citation for parity auditing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from scrape_spark.schemas import DEFAULT_TTL_SECONDS


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def author_split(col: str | Column) -> Column:
    """Split an author string on ';', trim, drop empties — never null.
    Reference: fetch/trafilatura/fetcher.go:115-121 (pinned by
    apply_result_test.go:86-99)."""
    c = _c(col)
    arr = F.filter(
        F.transform(F.split(F.coalesce(c, F.lit("")), ";"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    return arr


def stamp_fetch_time() -> Column:
    """now().UTC().Truncate(second) — resource/web_page.go:28."""
    return F.date_trunc("second", F.current_timestamp())


def expires_at(fetch_time: str | Column, ttl_seconds: int | Column = DEFAULT_TTL_SECONDS) -> Column:
    """expires = fetch_time + ttl (resource/web_page.go:64-74; default stamped
    at save when zero, internal/storage/storage.go:63-65)."""
    ttl = F.lit(ttl_seconds) if isinstance(ttl_seconds, int) else _c(ttl_seconds)
    return (_c(fetch_time).cast("long") + ttl.cast("long")).cast("timestamp")


def is_fresh(expires: str | Column, now: Column | None = None) -> Column:
    """TTL-expiry predicate: expired ⇒ not-found on read
    (internal/storage/storage.go:184-186). Pushed down to the scan."""
    return _c(expires) > (now if now is not None else F.current_timestamp())


# Content-type whitelist — fetch/trafilatura/fetcher.go:73-88
ALLOWED_CONTENT_TYPES = ("text/html", "application/xhtml+xml", "text/plain")


def mime_type(content_type: str | Column) -> Column:
    """Media type of a Content-Type header value: lowercased token before ';'
    (reference uses mime.ParseMediaType, fetcher.go:73). substring_index
    instead of a regex — this runs per row on the fetch hot path."""
    return F.lower(F.trim(F.substring_index(_c(content_type), ";", 1)))


def content_type_error(content_type: str | Column) -> Column:
    """415 error-row routing for disallowed content types (F2).
    Error rows are data, never exceptions (resource/web_page.go:46)."""
    mt = mime_type(content_type)
    return F.when(
        mt.isin(*ALLOWED_CONTENT_TYPES), F.lit(None).cast("string")
    ).otherwise(F.concat(F.lit("unsupported content type: "), mt))


def status_error(status_code: str | Column) -> Column:
    """HTTP status gate: <200 or >=400 ⇒ error string; resource still emitted
    partially (F4; fetch/trafilatura/fetcher.go:67-72, fetch/fetch.go:53-63).
    504 is the client-timeout class — the reference maps a net timeout to
    HttpError{504, "... did not reply within 30 seconds"}
    (fetch/client.go:70-81, pinned fetcher_test.go:249-272)."""
    sc = _c(status_code)
    return (
        F.when(sc.between(200, 399), F.lit(None).cast("string"))
        .when(
            sc == 504,
            F.lit("HTTP error: status code 504 (did not reply within 30 seconds)"),
        )
        .otherwise(F.concat(F.lit("HTTP error: status code "), sc.cast("string")))
    )


# Domain validation — internal/settings/domain.go:266-313: total length 4-253,
# labels 1-63 chars of [a-z0-9-], no leading/trailing '-', no '--', ≥1 dot,
# alpha TLD of 2-63 chars.
_DOMAIN_RE = (
    r"^(?=.{4,253}$)"
    r"((?!-)[a-z0-9]([a-z0-9]|-(?!-)){0,61}[a-z0-9]\.|[a-z0-9]\.)+"
    r"[a-z]{2,63}$"
)


def is_valid_domain(col: str | Column) -> Column:
    return F.lower(_c(col)).rlike(_DOMAIN_RE)


def wildcard_to_like(pattern: str) -> str:
    """Wildcard query rewrite (F6; internal/settings/domain.go:214-231):
    '*' → '%'; a bare term gets both-side wildcards."""
    if "*" in pattern:
        return pattern.replace("*", "%")
    return f"%{pattern}%"


def canonical_mime_headers(col: str | Column) -> Column:
    """K10: canonicalize header-map keys to MIME form (Content-Type, not
    content-type) — internal/settings/mime_header.go:12-18. Pure JVM:
    transform_keys with per-dash-segment title-casing."""
    c = _c(col)
    seg_fixed = lambda k: F.concat_ws(  # noqa: E731
        "-",
        F.transform(
            F.split(F.lower(k), "-"),
            lambda s: F.concat(F.upper(F.substring(s, 1, 1)), F.substring(s, 2, 1000)),
        ),
    )
    return F.transform_keys(c, lambda k, _v: seg_fixed(k))


# UA alias expansion — ua/user_agent.go:6-30.
UA_ALIASES = {
    ":firefox:": (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:109.0) Gecko/20100101 Firefox/111.0"
    ),
    ":safari:": (
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
        "(KHTML, like Gecko) Version/16.1 Safari/605.1.15"
    ),
    ":chrome:": (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/111.0.0.0 Safari/537.36"
    ),
}


def expand_ua(col: str | Column) -> Column:
    m = F.create_map(*[F.lit(x) for kv in UA_ALIASES.items() for x in kv])
    c = _c(col)
    return F.coalesce(F.element_at(m, c), c)


# Skip-when-marshaling set — fields excluded from the metadata JSON blob
# (resource/web_page.go:13-20, applied internal/storage/storage.go:75-83).
SKIP_IN_METADATA = (
    "url",          # canonical_url
    "content_text",
    "original_url",
    "fetch_time",
    "fetch_method",
)


def metadata_json(df_columns: list[str]) -> Column:
    """K8: omit-empty JSON of the metadata subset (compat/round-trip only —
    the engine itself keeps everything shredded)."""
    keep = [c for c in df_columns if c not in SKIP_IN_METADATA and c != "key"]
    return F.to_json(F.struct(*[F.col(c) for c in keep]), {"ignoreNullFields": "true"})

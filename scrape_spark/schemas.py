"""Canonical schemas for the engine (SURVEY.md §1.3).

The reference stores one partially-shredded row per URL
(reference: database/sqlite/migrations/00001_init.sql:15-28 + the WebPage
struct, resource/web_page.go:37-62). We shred everything into first-class
columns — Spark is columnar; a JSON metadata blob would defeat pruning.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input pages table (Common-Crawl-style, per BASELINE.json input_hint).
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Pages table extended with the HTTP-response model (how the corpus stands in
# for the network): Content-Type header (F2 gate, fetcher.go:73-88), status
# code (fetch/fetch.go:53-63; 504 ≙ client timeout, fetch/client.go:70-81),
# and redirect target (the Go http.Client follows 301/302/303/307/308
# transparently — fetcher_test.go:68-111). fetch_join accepts either shape;
# missing columns degrade to ctype-unknown / 200-if-present / no-redirect.
PAGES_FETCH_SCHEMA = T.StructType(
    list(PAGES_SCHEMA.fields)
    + [
        T.StructField("ctype", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("redirect_to", T.StringType(), True),
    ]
)

# Full fetch+extract result row: fetch provenance + page metadata + content.
# Mirrors the reference's `urls` row + WebPage shred
# (resource/web_page.go:37-62; internal/storage/storage.go:29-36).
RESULT_FIELDS = [
    T.StructField("key", T.LongType(), False),
    T.StructField("url", T.StringType(), True),          # canonical (og:url)
    T.StructField("parsed_url", T.StringType(), True),   # cleaned requested
    T.StructField("original_url", T.StringType(), True),  # echoed, never stored
    T.StructField("fetch_time", T.TimestampType(), True),
    T.StructField("fetch_method", T.IntegerType(), True),
    # Resolved per-domain fetch config provenance (S3 parity beyond
    # fetch_method: settings/domain.go:43-49 routes UA + extra headers to
    # the client; here the resolved values ride the result row). NULL =
    # engine defaults (no per-domain override configured).
    T.StructField("user_agent", T.StringType(), True),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("expires", T.TimestampType(), True),
    T.StructField("status_code", T.IntegerType(), True),
    T.StructField("error", T.StringType(), True),         # error rows are data
    T.StructField("hostname", T.StringType(), True),
    T.StructField("title", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("sitename", T.StringType(), True),
    T.StructField("authors", T.ArrayType(T.StringType()), True),
    T.StructField("date", T.TimestampType(), True),
    T.StructField("categories", T.ArrayType(T.StringType()), True),
    T.StructField("tags", T.ArrayType(T.StringType()), True),
    T.StructField("language", T.StringType(), True),
    T.StructField("image", T.StringType(), True),
    T.StructField("page_type", T.StringType(), True),
    T.StructField("license", T.StringType(), True),
    T.StructField("content_text", T.StringType(), True),
]
RESULT_SCHEMA = T.StructType(RESULT_FIELDS)

# url_store = RESULT minus original_url (reference never stores it:
# internal/storage/storage.go:78-80, pinned by storage_test.go:109-111).
URL_STORE_SCHEMA = T.StructType(
    [f for f in RESULT_FIELDS if f.name != "original_url"]
)

ID_MAP_SCHEMA = T.StructType(
    [
        T.StructField("requested_id", T.LongType(), False),
        T.StructField("canonical_id", T.LongType(), False),
    ]
)

DOMAIN_SETTINGS_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("sitename", T.StringType(), True),
        T.StructField("fetch_client", T.StringType(), True),
        T.StructField("user_agent", T.StringType(), True),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# North-rule frontier (not in the reference — net-new).
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.LongType(), False),
        T.StructField("discovered_epoch", T.IntegerType(), False),
    ]
)

# Per-host politeness rules (RFC 9309-style semantics; the reference has
# none — rate limiting is an acknowledged TODO at internal/scrape.go:143).
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)

# fetch_method enum — parity with resource/fetch_method.go:10-22.
FETCH_METHOD_UNSPECIFIED = 0
FETCH_METHOD_DIRECT = 1  # text form "direct" / "unspecified" on client
FETCH_METHOD_HEADLESS = 2  # text form "chromium-headless"
FETCH_METHOD_NAMES = {0: "unspecified", 1: "direct", 2: "chromium-headless"}

DEFAULT_TTL_SECONDS = 720 * 3600  # 30 days — resource/web_page.go:24

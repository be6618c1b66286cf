"""The flagship end-to-end plan (SURVEY.md §3.1, M4): batch fetch+extract
with memoization — the Spark re-expression of StorageBackedFetcher.Batch
(internal/scrape.go:100-124).

One declarative job per batch:

    requests → validate (malformed ⇒ error row, F10)
             → canonicalize (F1) → key (K1) → in-flight dedupe (J4)
             → fetch-client routing (S3: batch headless / per-domain settings)
             → alias-resolve (J1) → cache split vs fresh store (J2: one left
               join consumed twice — semi ≙ hits, anti ≙ misses; both the
               id_map and the store reads are bucket-pruned to the batch)
             → misses ⋈ pages table (the network-free fetch stage, S1;
               3xx redirect chains followed by per-hop equi-joins)
             → extract (M3) → error taxonomy (F10 / 404 / status incl. 504
               timeout / Content-Type whitelist F2 / byte-sniff fallback)
             → hits ∪ fetched (U1) → MERGE INTO store (S9) → results

Scale notes: the cache-split join is key-equi on `key long` (never URL
strings, O1); the pages join prunes to (url, html, ctype, status,
redirect_to) at the scan and skips the redirect-hop plan branches entirely
for redirect-free corpora; the store read is bucket-manifest-backed so only
fresh files of touched buckets are opened. Output order is not guaranteed
(parity: internal/scrape.go:98-99) — consumers that need determinism sort
by (key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scrape_spark.functions.textfns import (
    author_split,
    content_type_error,
    expires_at,
    mime_type,
    stamp_fetch_time,
    status_error,
)
from scrape_spark.functions.urlkeys import clean_url, hostname_col, url_key
from scrape_spark.operators.extract import extract_pages
from scrape_spark.operators.store import UrlStore
from scrape_spark.schemas import (
    FETCH_METHOD_DIRECT,
    FETCH_METHOD_HEADLESS,
    RESULT_SCHEMA,
)

_VALID_URL = r"^https?://[^/?#]+"

RESULT_COLS = RESULT_SCHEMA.fieldNames()

# ---- automatic fetch-join strategy gate --------------------------------------
# Above this estimated corpus size, a plain left join's corpus shuffle is no
# longer page-cache-local — it crosses a network on any real cluster — so the
# zero-corpus-shuffle decomposed plan wins. Below it, the measured single-box
# numbers (119k vs 104k pages/s at 1.3M pages, local[16]) keep the plain
# join the default. Module-level so tests/ops can tune it.
CORPUS_SHUFFLE_BYTES = 8 << 30
# Never broadcast a probe side bigger than this many rows (a ~200 B request
# row × 4M ≈ 800 MB broadcast — beyond this the decomposition's premise that
# the batch is "bounded" has failed and the plain join is safer).
MAX_BROADCAST_PROBE_ROWS = 4_000_000


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's estimated size of the plan's output (for a parquet scan:
    the file bytes × compression factor) — free, no job."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - py4j estimation unavailable
        return None


# Catalyst's sizeInBytes for stat-less plans (in-memory frames, missing
# statistics) defaults to Long.MaxValue — such an estimate means "unknown",
# not "huge", and must never qualify a plan for the broadcast arm.
IMPLAUSIBLE_SIZE_BYTES = 1 << 60


# A probe side whose Catalyst size estimate is at or under this is broadcast
# unconditionally: the decomposed plan then removes the corpus-side shuffle
# for a hash map that fits CPU cache. Measured (r6, local[32], sf0.1 54k-row
# batch, probe estimate 1.1 MB): decomposed 1.69 s vs plain 3.44 s min-of-3.
# The 1.3M-row batch (estimate 26 MB) stays on the plain join — its broadcast
# hash relation thrashes CPU cache (r5 measurement: 104k vs 119k pages/s).
PROBE_BROADCAST_BYTES = 8 << 20


def choose_probe_strategy(
    corpus_bytes: int | None,
    probe_rows: int | None,
    probe_bytes: int | None = None,
) -> bool:
    """True ⇒ use the decomposed zero-corpus-shuffle plan (broadcast the
    request batch, stream the corpus in place); False ⇒ plain left join.
    The decision the crawl epoch / CLI no longer has to know about. Two arms
    choose the decomposed plan:

    - probe side PROVABLY small (Catalyst estimate ≤ PROBE_BROADCAST_BYTES):
      the broadcast is bounded by construction and removing the corpus
      shuffle wins at every corpus size (measured 2× at sf0.1);
    - corpus PROVABLY big enough that its shuffle would cross a network
      (≥ CORPUS_SHUFFLE_BYTES) AND the probe side bounded by the caller's
      row hint.

    Unknowns fall back to the plain join — an unknown probe size must never
    become an unbounded broadcast (driver/executor OOM), and an implausible
    Catalyst estimate (stat-less plan ⇒ Long.MaxValue) reads as unknown,
    not small/large."""
    if (
        probe_bytes is not None
        and 0 <= probe_bytes <= PROBE_BROADCAST_BYTES
    ):
        return True
    if corpus_bytes is None or corpus_bytes >= IMPLAUSIBLE_SIZE_BYTES:
        return False
    if corpus_bytes < CORPUS_SHUFFLE_BYTES:
        return False
    if probe_rows is None or probe_rows > MAX_BROADCAST_PROBE_ROWS:
        return False
    return True


def prepare_requests(requests: DataFrame, url_col: str = "url") -> DataFrame:
    """Validate + canonicalize + key a batch of requested URLs.
    Malformed URLs never kill the job — they become error rows (F10,
    reference: internal/scrape.go:170-177, api/payloads.go:27-49).

    clean_url + url_key run as ONE fused pandas UDF (clean_and_key): the
    chained form was two ArrowEvalPython nodes with the URL strings crossing
    the JVM↔Python boundary three times per batch (guide §4.1)."""
    from scrape_spark.functions.urlkeys import clean_and_key

    req = requests.select(F.col(url_col).alias("original_url"))
    req = req.withColumn("__valid", F.col("original_url").rlike(_VALID_URL))
    req = req.withColumn("__ck", clean_and_key("original_url"))
    req = req.withColumn(
        "parsed_url",
        F.when(F.col("__valid"), F.col("__ck.parsed_url")),
    ).withColumn(
        "key", F.when(F.col("__valid"), F.col("__ck.key"))
    ).withColumn(
        "request_error",
        F.when(~F.col("__valid"), F.concat(F.lit("invalid url: "), F.col("original_url"))),
    ).drop("__valid", "__ck")
    return req


def _as_result(df: DataFrame) -> DataFrame:
    return df.select(*[F.col(c) for c in RESULT_COLS])


_CORPUS_COLS = ("__page_url", "html", "__ctype", "__status", "__redirect_to")


def _probe_corpus(requests: DataFrame, corpus: DataFrame, url_col: str) -> DataFrame:
    """requests LEFT JOIN corpus — built so the html NEVER shuffles.

    A plain left-outer join hash-shuffles BOTH sides, moving the whole
    corpus (2 KB html/row; 100 TB at production scale) across the wire just
    to attach a bounded request batch. Spark cannot broadcast the preserved
    side of an outer join, so the outer join is decomposed:

      found    = corpus ⋈ broadcast(requests)   (inner BHJ, corpus streamed
                                                 in place, zero corpus shuffle)
      notfound = requests ⟕̸ corpus.url           (left-anti against the url
                                                 column only — a shuffle of
                                                 one short string column,
                                                 planner's choice of strategy)
      result   = found ∪ notfound(null page columns)

    The request side is bounded by construction — a CLI/API batch, or one
    politeness-capped crawl epoch (hosts × per-epoch budget) — which is what
    makes broadcasting it the right plan once the corpus shuffle crosses a
    NETWORK. Measured single-box (local[16], 1.3M pages) the plain left
    join is ~15% faster (119k vs 104k pages/s): the "shuffle" there is
    page-cache-local while the 1.3M-entry broadcast map thrashes CPU cache.
    The choice is AUTOMATIC (``choose_probe_strategy``: Catalyst's corpus
    size estimate vs the caller's batch-count hint); the redirect-hop
    probes (tiny request subsets) use this shape unconditionally."""
    probe = F.broadcast(requests)
    found = corpus.join(probe, requests[url_col] == corpus["__page_url"], "inner")
    notfound = requests.join(
        corpus.select("__page_url"),
        requests[url_col] == F.col("__page_url"),
        "left_anti",
    )
    # Null casts derived from the actual corpus schema (not hardcoded types):
    # the CLI reads arbitrary user parquet, where e.g. html may be string-
    # typed, and a type mismatch here fails unionByName analysis.
    corpus_types = {f.name: f.dataType for f in corpus.schema.fields}
    for c in _CORPUS_COLS:
        notfound = notfound.withColumn(c, F.lit(None).cast(corpus_types[c]))
    return found.unionByName(notfound.select(*found.columns))


def fetch_join(
    misses: DataFrame,
    pages: DataFrame,
    max_redirect_hops: int = 4,
    broadcast_probe: bool | None = None,
    probe_rows_hint: int | None = None,
) -> DataFrame:
    """The 'network' stage: equi-join against the pages corpus (absent ⇒
    404 later), then one vectorized extraction pass. Keeps the extract's
    raw columns (incl. `links`) so callers can derive both result rows and
    outlink discovery from a single cached extraction.

    HTTP-response model: the corpus may carry `ctype` (Content-Type header),
    `status`, and `redirect_to` columns (PAGES_FETCH_SCHEMA); a bare
    5-column pages table degrades to header-unknown / 200-if-present /
    no-redirect. 3xx rows with a redirect target are followed transparently
    up to ``max_redirect_hops`` (the Go http.Client follows up to 10;
    fetcher_test.go:68-111) — each hop is one more equi-join over only the
    still-redirecting subset, so the common no-redirect case pays a single
    join. Rows still redirecting after the hop budget surface the redirect
    status as an HTTP error (parity: Go returns 'stopped after 10 redirects'
    as an error)."""
    cols = set(pages.columns)
    corpus = pages.select(
        F.col("url").alias("__page_url"),
        "html",
        (F.col("ctype") if "ctype" in cols else F.lit(None).cast("string")).alias("__ctype"),
        (F.col("status") if "status" in cols else F.lit(None).cast("int")).alias("__status"),
        (F.col("redirect_to") if "redirect_to" in cols else F.lit(None).cast("string")).alias(
            "__redirect_to"
        ),
    )
    if broadcast_probe is None:
        # Automatic strategy: no flag the user must know about. The hint
        # comes from the caller when it knows the batch size for free (the
        # crawl epoch's politeness-capped selected count); the probe-side
        # size estimate comes from Catalyst — never a count() job here.
        broadcast_probe = choose_probe_strategy(
            _plan_size_bytes(pages), probe_rows_hint, _plan_size_bytes(misses)
        )
    if broadcast_probe:
        joined = _probe_corpus(misses, corpus, "parsed_url")
    else:
        joined = misses.join(
            corpus, misses["parsed_url"] == corpus["__page_url"], "left"
        )
    # The hop machinery multiplies plan branches (each union arm re-scans the
    # fetch join), and the text/plain passthrough ships an extra column
    # through the Arrow boundary — pay for either ONLY when the corpus
    # actually contains such rows. One combined column-pruned probe scan,
    # memoized per pages DataFrame; a plain html-only corpus (the common
    # crawl epoch) keeps the single-join, no-extra-column hot path.
    traits = getattr(pages, "_scrape_fetch_traits", None)
    if traits is None:
        if "redirect_to" in cols or "ctype" in cols:
            row = pages.agg(
                F.max(
                    (F.col("redirect_to").isNotNull() if "redirect_to" in cols else F.lit(False)).cast("int")
                ).alias("r"),
                F.max(
                    ((mime_type(F.col("ctype")) == "text/plain") if "ctype" in cols else F.lit(False)).cast("int")
                ).alias("p"),
            ).collect()[0]
            traits = {"redirects": bool(row.r), "plain": bool(row.p)}
        else:
            traits = {"redirects": False, "plain": False}
        try:
            pages._scrape_fetch_traits = traits
        except AttributeError:  # pragma: no cover
            pass

    def _with_plain(df: DataFrame) -> DataFrame:
        col = _plain_text_col(df) if traits["plain"] else F.lit(None).cast("string")
        return df.withColumn("__plain_text", col)

    def _tag(df: DataFrame) -> DataFrame:
        try:
            df._scrape_probe_strategy = "decomposed" if broadcast_probe else "plain"
        except AttributeError:  # pragma: no cover
            pass
        return df

    if not traits["redirects"]:
        return _tag(extract_pages(_with_plain(joined), html_col="html"))
    # never-null predicate: False when redirect_to is null (False AND NULL ≡
    # False), defined when it isn't (coalesce guards a null status)
    is_redirect = F.col("__redirect_to").isNotNull() & F.coalesce(
        F.col("__status").between(300, 399), F.lit(True)
    )
    done = joined.filter(~is_redirect)
    pending = joined.filter(is_redirect)
    req_cols = [c for c in misses.columns]
    for _hop in range(max_redirect_hops):
        # follow one hop: re-probe the corpus with the redirect target; the
        # requested columns ride along unchanged (parsed_url stays the
        # requested URL — the reference echoes RequestedURL on redirects)
        hop = pending.select(*req_cols, F.col("__redirect_to").alias("__target"))
        hopped = _probe_corpus(hop, corpus, "__target").drop("__target")
        still = F.col("__redirect_to").isNotNull() & F.coalesce(
            F.col("__status").between(300, 399), F.lit(True)
        )
        done = done.unionByName(hopped.filter(~still))
        pending = hopped.filter(still)
    # hop budget exhausted: surface as an error row (Go http.Client:
    # "stopped after 10 redirects"); 3xx itself is not an error status
    exhausted = pending.withColumn(
        "request_error",
        F.coalesce(
            F.col("request_error"),
            F.lit(f"stopped after {max_redirect_hops} redirects"),
        ),
    )
    done = done.unionByName(exhausted)
    return _tag(extract_pages(_with_plain(done), html_col="html"))


def _plain_text_col(df: DataFrame):
    """text/plain bodies ARE the content (no markup to extract) — captured
    before extract_pages drops the raw bytes. Decode only when html is
    actually binary: user parquet read via the CLI may carry a string-typed
    html column, where F.decode would fail analysis."""
    from pyspark.sql.types import BinaryType

    html_is_binary = isinstance(df.schema["html"].dataType, BinaryType)
    body = (
        F.decode(F.col("html"), "UTF-8")
        if html_is_binary
        else F.col("html").cast("string")
    )
    return F.when(mime_type(F.col("__ctype")) == "text/plain", body)


_EXTRACTED_FIELDS = (
    "title", "description", "sitename", "authors", "date", "categories",
    "tags", "language", "image", "page_type", "license", "content_text",
)


def finalize_results(extracted: DataFrame, ttl_seconds: int) -> DataFrame:
    """Map one extraction pass to RESULT_SCHEMA rows with the full error
    taxonomy, gate order as in the reference fetcher (fetcher.go:52-95):
    invalid-url → 404 absent → HTTP status (<200/≥400, incl. the 504
    timeout class) → Content-Type header whitelist (415) → byte-sniff 415
    fallback when no header is modeled. Error rows carry fetch provenance
    only — the reference never extracts after a gate fires, so extracted
    metadata is nulled (resource partial-data semantics, fetcher.go:55-72)."""
    found = F.col("__page_url").isNotNull()
    status = F.coalesce(
        F.col("__status"), F.when(found, F.lit(200)).otherwise(F.lit(404))
    ).cast("int")
    error = F.coalesce(
        F.col("request_error"),
        F.when(~found, status_error(F.lit(404))),
        status_error(status),
        # Header gate when the corpus models one, but a whitelisted type does
        # NOT swallow a downstream extraction failure — the reference still
        # returns trafilatura errors after the Content-Type gate passes
        # (fetcher.go:89-105). text/plain is the one exemption: its
        # extract_error is expected (no markup) and the body is delivered
        # verbatim via __plain_text below. Byte-sniff 415 when no header.
        F.when(
            F.col("__ctype").isNotNull(),
            F.coalesce(
                content_type_error(F.col("__ctype")),
                F.when(
                    mime_type(F.col("__ctype")) != "text/plain",
                    F.col("extract_error"),
                ),
            ),
        ).otherwise(F.col("extract_error")),
    )
    # error rows echo the requested URL (reference: RequestedURL, no canonical)
    canonical = F.when(
        error.isNull(), F.coalesce(F.col("canonical_url"), F.col("parsed_url"))
    ).otherwise(F.col("parsed_url"))

    out = (
        extracted.withColumn("status_code", status)
        .withColumn("error", error)
        .withColumn("url", canonical)
        .withColumn("key", F.when(error.isNull(), url_key(canonical)).otherwise(F.col("key")))
        .withColumn("hostname", hostname_col(F.col("url")))
        .withColumn("fetch_time", stamp_fetch_time())
        .withColumn(
            "fetch_method",
            (
                F.coalesce(F.col("__fetch_method"), F.lit(FETCH_METHOD_DIRECT))
                if "__fetch_method" in extracted.columns
                else F.lit(FETCH_METHOD_DIRECT)
            ),
        )
        .withColumn(
            "user_agent",
            F.col("__user_agent")
            if "__user_agent" in extracted.columns
            else F.lit(None).cast("string"),
        )
        .withColumn(
            "headers",
            F.col("__headers")
            if "__headers" in extracted.columns
            else F.lit(None).cast("map<string,string>"),
        )
        .withColumn("expires", expires_at("fetch_time", ttl_seconds))
        .withColumn("authors", author_split("author"))
    )
    for c in _EXTRACTED_FIELDS:
        out = out.withColumn(c, F.when(F.col("error").isNull(), F.col(c)))
    # text/plain is whitelisted but carries no markup — the content IS the
    # body (trafilatura extracts it verbatim; fetcher_test.go:203-207)
    out = out.withColumn(
        "content_text",
        F.coalesce(
            F.col("content_text"),
            F.when(F.col("error").isNull(), F.col("__plain_text")),
        ),
    )
    return _as_result(out)


def fetch_and_extract(
    misses: DataFrame,
    pages: DataFrame,
    ttl_seconds: int,
    probe_rows_hint: int | None = None,
) -> DataFrame:
    return finalize_results(
        fetch_join(misses, pages, probe_rows_hint=probe_rows_hint), ttl_seconds
    )


def _live_pages(misses: DataFrame, live) -> DataFrame:
    """Materialize the fetch stage from the real network (S1/S3 live path):
    only MISS rows are fetched, each routed per-row to the direct or
    headless client with its settings-resolved UA/headers riding along
    (settings/domain.go:43-49). Cached — the network is not idempotent, so
    recomputes must not refetch."""
    from scrape_spark.sources.live import fetch_pages

    routed = misses.filter(F.col("parsed_url").isNotNull()).select(
        F.col("parsed_url").alias("url"),
        F.when(
            F.col("__fetch_method") == FETCH_METHOD_HEADLESS,
            F.lit("chromium-headless"),
        )
        .otherwise(F.lit("direct"))
        .alias("client"),
        F.col("__user_agent").alias("ua"),
        F.col("__headers").alias("hdrs"),
    )
    return fetch_pages(
        routed, live, url_col="url", client_col="client",
        ua_col="ua", headers_col="hdrs",
    ).cache()


def batch_extract(
    spark: SparkSession,
    requests: DataFrame,
    pages: DataFrame | None = None,
    store: UrlStore | None = None,
    save: bool = True,
    settings=None,
    fetch_method: int = FETCH_METHOD_DIRECT,
    live=None,
) -> DataFrame:
    """Full batch pipeline. With a store: memoized (hits skip the fetch stage
    and keep their stored fetch_time — parity with internal/scrape_test.go's
    cache-hit stability assertion); without: straight fetch+extract.

    Fetch-client routing (S3): ``fetch_method`` is the batch-level client —
    FETCH_METHOD_HEADLESS reproduces the reference's /extract/headless
    surface (internal/server/routes.go:41-42), which forces the headless
    client for the whole batch. A ``settings`` DomainSettingsStore overrides
    per host: a domain whose fetch_client is 'chromium-headless' routes its
    requests through the headless client (internal/scrape.go:54-58,
    settings/domain.go:43-49). In this engine both clients resolve to the
    same corpus equi-join (there is no browser in the sandbox) — the routing
    decision, the broadcast settings join, and the fetch_method provenance
    on every result row are the real, tested surface. With ``live`` (a
    :class:`scrape_spark.sources.live.LiveFetchConfig`) the corpus join is
    replaced by REAL network fetches of the miss rows — direct urllib or a
    headless-Chrome CDP endpoint per the same routing — and ``pages`` may
    be None."""
    if pages is None and live is None:
        raise ValueError("batch_extract needs a pages corpus or live=LiveFetchConfig")
    req = prepare_requests(requests)
    req = req.withColumn("__fetch_method", F.lit(fetch_method))
    if settings is not None:
        # Per-domain routing AND provenance: the resolved user_agent/headers
        # ride the request (and land on the result row) — parity with the
        # reference handing them to the fetch client (settings/domain.go:43-49).
        req = (
            settings.join_fetch_config(
                req.withColumn("__host", hostname_col(F.col("parsed_url"))), "__host"
            )
            .withColumn(
                "__fetch_method",
                F.when(
                    F.col("fetch_client") == "chromium-headless",
                    F.lit(FETCH_METHOD_HEADLESS),
                ).otherwise(F.col("__fetch_method")),
            )
            .withColumnRenamed("user_agent", "__user_agent")
            .withColumnRenamed("headers", "__headers")
            .drop("__host", "sitename", "fetch_client")
        )
    else:
        req = req.withColumn("__user_agent", F.lit(None).cast("string")).withColumn(
            "__headers", F.lit(None).cast("map<string,string>")
        )
    # In-flight dedupe by requested key — strictly stronger than the
    # reference's REPLACE-race (SURVEY §2.8), same observable store state.
    # Invalid URLs have key = NULL; dropDuplicates treats NULLs as equal, so
    # dedupe on coalesce(key, hash(original_url)) — the reference emits one
    # error row per malformed input (internal/scrape.go:170-177).
    req = req.withColumn(
        "__dedupe_key", F.coalesce(F.col("key"), F.xxhash64("original_url"))
    ).dropDuplicates(["__dedupe_key"]).drop("__dedupe_key")

    if store is None:
        if pages is None:
            pages = _live_pages(req, live)
        results = fetch_and_extract(req, pages, ttl_seconds=30 * 24 * 3600)
        return results

    req = req.cache()  # consumed by the bucket-prune pass, hits, and misses
    # Bucket-pruned cache probe: the store is hash-bucketed by key, so a batch
    # only opens the buckets its canonical keys hash to — at 100 TB a batch
    # never pays a full-table scan (same pattern as UrlStore.fetch). One
    # pass over the batch discovers the buckets for BOTH tables (r6).
    resolved, probe_buckets = store.resolve_keys_pruned(req)
    fresh = store.urls.read(buckets=probe_buckets).filter(
        F.col("expires") > F.current_timestamp()
    )
    fresh = fresh.select([F.col(c).alias(f"s_{c}") for c in fresh.columns])
    # NOT cached (r6): the hit branch needs the store payload once, and the
    # miss branch's s_key-null filter prunes the store side to a
    # (key, expires) column scan — materializing the full hit payload to
    # block storage cost more than the second pruned scan at every
    # measured size (req stays cached, the id_map side is a broadcast).
    joined = resolved.join(
        fresh, resolved["canonical_key"] == fresh["s_key"], "left"
    )

    hits = joined.filter(F.col("s_key").isNotNull())
    hit_results = _as_result(
        hits.select(
            F.col("s_key").alias("key"),
            F.col("s_url").alias("url"),
            F.col("s_parsed_url").alias("parsed_url"),
            F.col("original_url"),
            F.col("s_fetch_time").alias("fetch_time"),
            F.col("s_fetch_method").alias("fetch_method"),
            F.col("s_user_agent").alias("user_agent"),
            F.col("s_headers").alias("headers"),
            F.col("s_expires").alias("expires"),
            F.col("s_status_code").alias("status_code"),
            F.col("s_error").alias("error"),
            F.col("s_hostname").alias("hostname"),
            F.col("s_title").alias("title"),
            F.col("s_description").alias("description"),
            F.col("s_sitename").alias("sitename"),
            F.col("s_authors").alias("authors"),
            F.col("s_date").alias("date"),
            F.col("s_categories").alias("categories"),
            F.col("s_tags").alias("tags"),
            F.col("s_language").alias("language"),
            F.col("s_image").alias("image"),
            F.col("s_page_type").alias("page_type"),
            F.col("s_license").alias("license"),
            F.col("s_content_text").alias("content_text"),
        )
    )

    misses = joined.filter(F.col("s_key").isNull()).select(
        "original_url", "parsed_url", "key", "request_error",
        "__fetch_method", "__user_agent", "__headers",
    )
    own_pages = None
    if pages is None:
        # live path: fetch ONLY the misses
        own_pages = pages = _live_pages(misses, live)
    fetched = fetch_and_extract(misses, pages, store.ttl_seconds)

    results = hit_results.unionByName(fetched)
    if save:
        results = results.cache()
        store.merge(results)  # materializes the results cache
        # the returned frame now reads its own cache — the upstream probe
        # caches are dead weight (leaking one per batch degrades long
        # sessions / crawl loops)
        req.unpersist()
        if own_pages is not None:
            own_pages.unpersist()
    return results


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: wrap the driver's `documents` table as a pages corpus
    (vectorized column concat — used by entry() so the flagship plan runs
    directly over /root/testdata parquet)."""
    url = F.concat(
        F.lit("https://doc"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".test/d/"),
        F.col("doc_id").cast("string"),
    )
    html = F.concat(
        F.lit('<!DOCTYPE html>\n<html lang="'), F.col("lang"),
        F.lit('">\n<head>\n<title>Document '), F.col("doc_id").cast("string"),
        F.lit('</title>\n<meta name="description" content="doc from '), F.col("source"),
        F.lit('">\n<meta name="author" content="Gen '), F.col("source"),
        F.lit('">\n<meta property="og:site_name" content="'), F.col("source"),
        F.lit('">\n<meta property="og:url" content="'), url,
        F.lit('">\n<meta property="og:type" content="article">\n</head>\n<body>\n<article>\n<h1>Document '),
        F.col("doc_id").cast("string"),
        F.lit("</h1>\n<p>"), F.col("text"), F.lit("</p>\n</article>\n</body>\n</html>\n"),
    )
    return docs.select(
        url.alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )

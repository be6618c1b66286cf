"""End-to-end flagship plan tests — analog of internal/scrape_test.go:
batch fetch+extract through the store: utm-strip, alias resolution, dedupe,
error rows, cache hits with stable fetch_time, errors never stored."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scrape_spark.operators.store import UrlStore
from scrape_spark.plans.batch_extract import batch_extract
from scrape_spark.sources.pages import page_url, synth_pages


@pytest.fixture(scope="module")
def pages(spark):
    df = synth_pages(spark, n_hosts=5, per_host=60).cache()
    df.count()
    return df


def _req_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


def test_batch_end_to_end(spark, pages, tmp_path):
    store = UrlStore(spark, str(tmp_path / "s"), n_buckets=8)
    urls = [
        page_url(0, 1),
        page_url(0, 1) + "?utm_source=feed",       # dupes to the same key
        page_url(1, 2),
        page_url(2, 11) + "/amp",                  # alias page → canonical
        page_url(3, 5),
        "https://missing.test/nope",               # 404 error row
        "not a url",                               # invalid → error row
        page_url(0, 37),                           # binary page → 415-class row
    ]
    out = batch_extract(spark, _req_df(spark, urls), pages, store).cache()
    rows = {r.original_url: r for r in out.collect()}

    # utm dupe collapsed in-flight: only one of the two forms present
    assert len(rows) == len(urls) - 1

    ok = rows[page_url(1, 2)]
    assert ok.error is None and ok.status_code == 200
    assert ok.content_text and ok.title
    assert ok.hostname == "h00001.ex1.test"
    assert ok.authors and all(a.strip() for a in ok.authors)

    amp = rows[page_url(2, 11) + "/amp"]
    assert amp.error is None
    assert amp.url == page_url(2, 11)  # canonical from og:url

    missing = rows["https://missing.test/nope"]
    assert missing.error == "HTTP error: status code 404"
    assert missing.status_code == 404

    bad = rows["not a url"]
    assert bad.error.startswith("invalid url")

    pdf = rows[page_url(0, 37)]
    # header gate fires first now that the corpus models Content-Type
    # (fetcher.go:73-88: the error message is the offending media type)
    assert pdf.error == "unsupported content type: application/pdf"

    # errors never stored; good rows are
    stored = store.urls.read()
    assert stored.filter(F.col("error").isNotNull()).count() == 0
    n_good = sum(1 for r in rows.values() if r.error is None)
    assert stored.count() == n_good


def test_multiple_invalid_urls_each_get_an_error_row(spark, pages, tmp_path):
    """One error row PER malformed input (internal/scrape.go:170-177,
    api/payloads.go:27-49) — null keys must not collapse in the dedupe."""
    store = UrlStore(spark, str(tmp_path / "s5"), n_buckets=8)
    urls = ["not a url", "also::not::a::url", "ftp://wrong-scheme.test/x", page_url(0, 1)]
    out = batch_extract(spark, _req_df(spark, urls), pages, store).collect()
    assert len(out) == 4
    errs = {r.original_url: r.error for r in out if r.error is not None}
    assert set(errs) == {"not a url", "also::not::a::url", "ftp://wrong-scheme.test/x"}
    assert all(e.startswith("invalid url") for e in errs.values())
    # identical invalid URLs still dedupe like identical valid ones do
    out2 = batch_extract(
        spark, _req_df(spark, ["not a url", "not a url"]), pages, store
    ).collect()
    assert len(out2) == 1


def test_cache_hit_keeps_fetch_time_and_skips_fetch(spark, pages, tmp_path):
    store = UrlStore(spark, str(tmp_path / "s2"), n_buckets=8)
    url = page_url(1, 3)
    first = batch_extract(spark, _req_df(spark, [url]), pages, store).collect()[0]
    again = batch_extract(
        spark, _req_df(spark, [url + "?utm_source=x"]), pages, store
    ).collect()[0]
    # cache hit: fetch_time unchanged (scrape_test.go fetch-time stability)
    assert again.fetch_time == first.fetch_time
    assert again.content_text == first.content_text
    # requested URL echoed even on hit
    assert again.original_url == url + "?utm_source=x"


def test_alias_lookup_after_store(spark, pages, tmp_path):
    store = UrlStore(spark, str(tmp_path / "s3"), n_buckets=8)
    amp_url = page_url(2, 22) + "/amp"
    batch_extract(spark, _req_df(spark, [amp_url]), pages, store).collect()
    # a later point fetch by the amp URL resolves through id_map
    got = store.fetch([amp_url]).collect()
    assert len(got) == 1 and got[0].url == page_url(2, 22)


def test_cache_split_is_bucket_pruned(spark, pages, tmp_path):
    """A batch probes only the store buckets its keys hash to — never a
    full-table scan (at 100 TB the unpruned read is the whole store)."""
    store = UrlStore(spark, str(tmp_path / "s6"), n_buckets=8)
    warm = [page_url(0, i) for i in range(1, 9)]  # spread across buckets
    batch_extract(spark, _req_df(spark, warm), pages, store).count()

    seen_buckets = []
    orig_read = store.urls.read

    def spy_read(snapshot=None, buckets=None):
        seen_buckets.append(buckets)
        return orig_read(snapshot=snapshot, buckets=buckets)

    store.urls.read = spy_read
    out = batch_extract(
        spark, _req_df(spark, [page_url(0, 1)]), pages, store, save=False
    )
    assert out.count() == 1
    probe_reads = [b for b in seen_buckets if b is not None]
    assert probe_reads and all(len(b) == 1 for b in probe_reads)
    assert None not in seen_buckets  # no unpruned full read anywhere


def test_broadcast_probe_join_is_equivalent(spark, pages):
    """The no-corpus-shuffle probe decomposition (inner BHJ + left-anti)
    must return exactly what the plain left join returns, misses included."""
    from scrape_spark.plans.batch_extract import fetch_join, prepare_requests

    req = prepare_requests(
        _req_df(spark, [page_url(0, 1), page_url(1, 2), "https://missing.test/x"])
    ).withColumn("__fetch_method", F.lit(1))
    shape = lambda df: {  # noqa: E731
        (r["original_url"], r["__page_url"], r["title"]) for r in
        df.select("original_url", "__page_url", "title").collect()
    }
    assert shape(fetch_join(req, pages, broadcast_probe=True)) == shape(
        fetch_join(req, pages, broadcast_probe=False)
    )


def test_fetch_client_routing(spark, pages, tmp_path):
    """S3: batch-level headless (the /extract/headless surface) and
    per-domain settings override (fetch_client='chromium-headless') both
    stamp fetch_method on the results; everything else stays direct."""
    from scrape_spark.operators.settings import DomainSettingsStore
    from scrape_spark.schemas import FETCH_METHOD_DIRECT, FETCH_METHOD_HEADLESS

    # whole batch forced headless
    out = batch_extract(
        spark, _req_df(spark, [page_url(0, 1)]), pages, store=None,
        fetch_method=FETCH_METHOD_HEADLESS,
    ).collect()
    assert out[0].fetch_method == FETCH_METHOD_HEADLESS

    # per-domain override: host 1 configured headless, host 0 not
    settings = DomainSettingsStore(spark, str(tmp_path / "ds"))
    from scrape_spark.schemas import DOMAIN_SETTINGS_SCHEMA

    settings.upsert(
        spark.createDataFrame(
            [("h00001.ex1.test", None, "chromium-headless", None, None)],
            schema=DOMAIN_SETTINGS_SCHEMA,
        )
    )
    rows = {
        r.original_url: r
        for r in batch_extract(
            spark, _req_df(spark, [page_url(0, 1), page_url(1, 2)]), pages,
            store=None, settings=settings,
        ).collect()
    }
    assert rows[page_url(1, 2)].fetch_method == FETCH_METHOD_HEADLESS
    assert rows[page_url(0, 1)].fetch_method == FETCH_METHOD_DIRECT


def test_settings_provenance_on_results(spark, pages, tmp_path):
    """The RESOLVED per-domain user_agent + headers land on result rows
    (settings/domain.go:43-49 hands them to the fetch client; the engine
    records what was handed). Hosts without settings carry NULLs (engine
    defaults), and the provenance survives the store round-trip."""
    from scrape_spark.operators.settings import DomainSettingsStore
    from scrape_spark.operators.store import UrlStore
    from scrape_spark.schemas import DOMAIN_SETTINGS_SCHEMA

    settings = DomainSettingsStore(spark, str(tmp_path / "ds2"))
    settings.upsert(
        spark.createDataFrame(
            [("h00001.ex1.test", None, None, ":chrome:", {"x-test": "1"})],
            schema=DOMAIN_SETTINGS_SCHEMA,
        )
    )
    store = UrlStore(spark, str(tmp_path / "s2"), n_buckets=8)
    rows = {
        r.original_url: r
        for r in batch_extract(
            spark, _req_df(spark, [page_url(0, 1), page_url(1, 2)]), pages,
            store=store, settings=settings,
        ).collect()
    }
    assert rows[page_url(1, 2)].user_agent.startswith("Mozilla/5.0")  # expanded alias
    assert rows[page_url(1, 2)].headers == {"X-Test": "1"}            # canonicalized
    assert rows[page_url(0, 1)].user_agent is None
    assert rows[page_url(0, 1)].headers is None
    # cache hit keeps the stored provenance
    hit = batch_extract(
        spark, _req_df(spark, [page_url(1, 2)]), pages, store=store, settings=settings,
    ).collect()[0]
    assert hit.user_agent.startswith("Mozilla/5.0")


def test_unordered_union_has_all_columns(spark, pages, tmp_path):
    from scrape_spark.schemas import RESULT_SCHEMA

    store = UrlStore(spark, str(tmp_path / "s4"), n_buckets=8)
    out = batch_extract(spark, _req_df(spark, [page_url(0, 2), page_url(0, 4)]), pages, store)
    assert out.schema.fieldNames() == RESULT_SCHEMA.fieldNames()


def test_auto_probe_strategy_gate(spark, pages, monkeypatch):
    """broadcast_probe=None picks the plan automatically: plain join on a
    small/single-box corpus (the measured-faster default), the decomposed
    zero-corpus-shuffle plan when the corpus size estimate crosses the
    network-shuffle threshold and the batch is verifiably bounded."""
    import scrape_spark.plans.batch_extract as bx

    # pure decision-function boundaries
    assert bx.choose_probe_strategy(None, 100) is False           # unknown corpus
    assert bx.choose_probe_strategy(1 << 20, 100) is False        # small corpus
    assert bx.choose_probe_strategy(bx.CORPUS_SHUFFLE_BYTES, 100) is True
    assert bx.choose_probe_strategy(
        bx.CORPUS_SHUFFLE_BYTES, bx.MAX_BROADCAST_PROBE_ROWS + 1
    ) is False                                                     # unbounded batch
    # unknown probe size must NOT broadcast (an unhinted call site would
    # otherwise ship an unboundedly large batch), and Catalyst's stat-less
    # Long.MaxValue estimate reads as unknown corpus, not huge corpus
    assert bx.choose_probe_strategy(bx.CORPUS_SHUFFLE_BYTES, None) is False
    assert bx.choose_probe_strategy(1 << 62, 100) is False
    # probe-side-small arm (r6): a provably tiny probe estimate broadcasts
    # at ANY corpus size; implausible/unknown estimates never do
    assert bx.choose_probe_strategy(1 << 20, None, probe_bytes=1 << 20) is True
    assert bx.choose_probe_strategy(None, None, probe_bytes=1 << 20) is True
    assert bx.choose_probe_strategy(
        1 << 20, None, probe_bytes=bx.PROBE_BROADCAST_BYTES + 1
    ) is False
    assert bx.choose_probe_strategy(1 << 20, None, probe_bytes=None) is False

    req = bx.prepare_requests(
        _req_df(spark, [page_url(0, 1), "https://missing.test/x"])
    ).withColumn("__fetch_method", F.lit(1))

    # a createDataFrame request frame is RDD-backed — Catalyst reports
    # Long.MaxValue, which must read as UNKNOWN probe size → plain join
    out_plain = bx.fetch_join(req, pages, probe_rows_hint=2)
    assert out_plain._scrape_probe_strategy == "plain"

    # a parquet-backed request frame carries a real (tiny) size estimate →
    # the probe-side-small arm picks the decomposed plan at any corpus size
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        _req_df(spark, [page_url(0, 1), "https://missing.test/x"]).write.mode(
            "overwrite"
        ).parquet(f"{td}/req")
        req_pq = bx.prepare_requests(spark.read.parquet(f"{td}/req")).withColumn(
            "__fetch_method", F.lit(1)
        )
        out_small = bx.fetch_join(req_pq, pages, probe_rows_hint=2)
        assert out_small._scrape_probe_strategy == "decomposed"
        # probe-side arm disabled → back to the mid-size default (plain)
        monkeypatch.setattr(bx, "PROBE_BROADCAST_BYTES", -1)
        out_mid = bx.fetch_join(req_pq, pages, probe_rows_hint=2)
        assert out_mid._scrape_probe_strategy == "plain"

    # corpus "large" (threshold forced down): decomposed plan chosen,
    # visible in the physical plan as the left-anti arm of the union
    monkeypatch.setattr(bx, "CORPUS_SHUFFLE_BYTES", 1)
    out_auto = bx.fetch_join(req, pages, probe_rows_hint=2)
    assert out_auto._scrape_probe_strategy == "decomposed"
    plan = out_auto._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    # and both plans agree on the rows
    shape = lambda df: {  # noqa: E731
        (r["original_url"], r["title"]) for r in df.select("original_url", "title").collect()
    }
    assert shape(out_auto) == shape(out_plain)

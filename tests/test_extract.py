"""Extraction golden tests — the byte-identity invariant (BASELINE.json):
extracted text per url must match the committed goldens exactly, through the
full distributed Spark path, under any partitioning.

Analog of the reference's smoker/ars golden tests
(fetch/trafilatura/fetcher_test.go:113-178; internal/scrape_test.go:31-140).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from scrape_spark.operators.extract import extract_pages
from scrape_spark.sources.pages import synth_pages

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "extract_golden.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN, encoding="utf-8") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def extracted(spark, golden):
    df = synth_pages(
        spark, golden["n_hosts"], golden["per_host"], partitions=7
    )  # deliberately odd partitioning
    rows = extract_pages(df).collect()
    return {r.url: r for r in rows}


def test_every_golden_url_present(golden, extracted):
    assert set(golden["pages"]) == set(extracted)


def test_content_text_byte_identical(golden, extracted):
    for url, want in golden["pages"].items():
        got = extracted[url]
        assert got.content_text == want["content_text"], url


def test_metadata_fields_identical(golden, extracted):
    for url, want in golden["pages"].items():
        got = extracted[url]
        for f in (
            "canonical_url", "title", "description", "sitename", "author",
            "language", "image", "page_type", "license", "extract_error",
        ):
            assert getattr(got, f) == want[f], (url, f)
        assert (got.categories or None) == want["categories"], url
        assert (got.tags or None) == want["tags"], url
        assert (got.links or None) == (want["links"] or None), url
        got_date = got.date.isoformat() if got.date is not None else None
        assert got_date == want["date"], url


def test_error_rows_are_data(golden, extracted):
    errs = [u for u, w in golden["pages"].items() if w["extract_error"]]
    assert errs, "corpus must contain non-HTML pages"
    for u in errs:
        r = extracted[u]
        assert r.extract_error == "unsupported content type: not html"
        assert r.content_text is None and r.title is None


def test_alias_pages_point_at_clean_canonical(extracted):
    amps = {u: r for u, r in extracted.items() if u.endswith("/amp")}
    assert amps
    for u, r in amps.items():
        assert r.canonical_url == u[: -len("/amp")]


def test_kernel_determinism_no_spark(golden):
    # The pure-pandas kernel reproduces the goldens too (no Spark involved).
    from scrape_spark.operators.extract import extract_batch
    from scrape_spark.sources.pages import _gen_batch

    corpus = _gen_batch(
        pd.DataFrame({"id": range(golden["n_hosts"] * golden["per_host"])}),
        golden["n_hosts"],
        golden["per_host"],
    )
    ext = extract_batch(corpus["html"])
    for i in range(len(corpus)):
        url = corpus["url"].iloc[i]
        assert ext.iloc[i].content_text == golden["pages"][url]["content_text"], url


def test_fallback_cascade_goldens(spark, golden):
    """Spec v2 (reference: trafilatura EnableFallback, fetcher.go:13-14):
    article-less pages go through the readability-style scoring pass —
    byte-identical to the committed goldens through the distributed path,
    and semantically the ARTICLE body, not the navigation chrome."""
    from tests.gen_goldens import FALLBACK_PAGES

    df = spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in FALLBACK_PAGES], ["url", "html"]
    ).repartition(3)
    rows = {r.url: r for r in extract_pages(df).collect()}
    for url, want in golden["fallback_pages"].items():
        assert rows[url].content_text == want["content_text"], url
        assert rows[url].title == want["title"], url

    nested = rows["https://fallback.test/nested-divs"].content_text
    assert nested.startswith("The committee met")
    assert "Home" not in nested and "Subscribe" not in nested  # chrome dropped
    nav = rows["https://fallback.test/nav-heavy"].content_text
    assert "real story" in nav and "Category" not in nav       # link farm loses
    tiny = rows["https://fallback.test/no-candidate"].content_text
    assert "Too short." in tiny                                # whole-body fallback kept


def test_metadata_robustness_goldens(spark, golden):
    """Spec v3: attribute-order/quote/case-insensitive <meta> parsing plus
    <time datetime> and JSON-LD datePublished date fallbacks (go-trafilatura
    tolerance, fetcher.go:108-135) — byte-identical to the committed goldens
    through the distributed path."""
    from tests.gen_goldens import METADATA_PAGES

    df = spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in METADATA_PAGES], ["url", "html"]
    ).repartition(2)
    rows = {r.url: r for r in extract_pages(df).collect()}
    assert set(rows) == set(golden["metadata_pages"])
    for url, want in golden["metadata_pages"].items():
        got = rows[url]
        for f in ("canonical_url", "title", "description", "author", "content_text"):
            assert getattr(got, f) == want[f], (url, f)
        got_date = got.date.isoformat() if got.date is not None else None
        assert got_date == want["date"], url
    # the semantics the fixtures exist to pin (not just golden echo):
    assert rows["https://meta.test/reversed-attrs"].author == "Jane Roe; John Doe"
    assert rows["https://meta.test/single-quotes"].date is not None
    assert rows["https://meta.test/attrs-between"].description == "mixed case tag and attrs"
    assert rows["https://meta.test/time-datetime"].date.isoformat() == "2026-03-05T10:00:00"
    assert rows["https://meta.test/json-ld"].date.isoformat() == "2026-04-06T07:08:09"
    lc = rows["https://meta.test/link-canonical"]
    assert lc.canonical_url == "https://meta.test/the-canonical"  # href-before-rel
    assert lc.license == "https://creativecommons.org/licenses/by-sa/4.0/"


def test_link_resolution_matches_urljoin():
    """Spec v4: the vectorized relative-link resolver must agree with
    urllib.parse.urljoin on every RFC 3986 reference form it claims to
    resolve (absolute, protocol-relative, root-relative, query-only, plain
    relative with ./ and ../ dot segments, excess ../ at root)."""
    from urllib.parse import urljoin

    import pandas as pd

    from scrape_spark.operators.extract import _resolve_links

    cases = [
        ("https://ex.test/a/b/page.html", "c.html"),
        ("https://ex.test/a/b/page.html", "./c.html"),
        ("https://ex.test/a/b/page.html", "../c.html"),
        ("https://ex.test/a/b/page.html", "../../c.html"),
        ("https://ex.test/a/b/page.html", "../../../c.html"),  # excess ../
        ("https://ex.test/a/b/page.html", "/root.html"),
        ("https://ex.test/a/b/page.html", "//other.test/x"),
        ("https://ex.test/a/b/page.html", "?q=1"),
        ("https://ex.test/a/b/page.html", "https://abs.test/x"),
        ("https://ex.test/a/b/page.html", "sub/dir/../x.html"),
        ("https://ex.test/a/b/page.html", "a/./b/./c"),
        ("https://ex.test", "rel.html"),       # authority-only base
        ("https://ex.test/", "rel.html"),
        ("https://ex.test/a/", ".."),
        ("https://ex.test/a/b/", "../"),
        ("http://ex.test/p?x=1#f", "q.html"),  # base query/frag stripped
        ("https://ex.test/a/b/page.html", "x.html?y=2#z"),
    ]
    bases = pd.Series([b for b, _ in cases], dtype=object)
    lists = pd.Series([[h] for _, h in cases], dtype=object)
    got = _resolve_links(lists, bases)
    for i, (b, h) in enumerate(cases):
        assert got.iloc[i] == [urljoin(b, h)], (b, h, got.iloc[i])

    # dropped forms: bare fragments, non-http schemes, empty hrefs; and
    # every relative form when no base is available
    drops = ["#frag", "mailto:x@y", "javascript:void(0)", ""]
    got2 = _resolve_links(
        pd.Series([[h] for h in drops], dtype=object),
        pd.Series(["https://ex.test/a"] * len(drops), dtype=object),
    )
    for i, h in enumerate(drops):
        assert got2.iloc[i] == [], h
    got3 = _resolve_links(pd.Series([["https://a.test/x", "/rel", "r.html"]]), None)
    assert got3.iloc[0] == ["https://a.test/x"]


def test_link_harvest_quote_styles():
    """Spec v4 harvest: double-quoted, single-quoted, and unquoted hrefs are
    all captured, in document order, and resolved against the page URL."""
    import pandas as pd

    from scrape_spark.operators.extract import harvest_links

    html = (
        '<html><body>'
        '<a href="https://abs.test/one">1</a> '
        "<a href='/two'>2</a> "
        "<a class='x' href=three.html>3</a> "
        '<a href="#top">skip</a>'
        "</body></html>"
    )
    got = harvest_links(
        pd.Series([html], dtype=object),
        pd.Series(["https://base.test/dir/page.html"], dtype=object),
    )
    assert got.iloc[0] == [
        "https://abs.test/one",
        "https://base.test/two",
        "https://base.test/dir/three.html",
    ]


def test_charset_goldens(spark, golden):
    """Spec v4 charset tier: latin-1 / shift-jis pages (sniffed via
    <meta charset>, http-equiv, or the Content-Type header param) must
    extract the CORRECT non-ASCII text — byte-identical to the committed
    goldens through the distributed path — while pure-UTF-8 pages never pay
    the re-decode."""
    from tests.gen_goldens import CHARSET_PAGES

    df = spark.createDataFrame(
        [(u, b, c) for u, b, c in CHARSET_PAGES],
        "url string, html binary, ctype string",
    ).repartition(2)
    rows = {r.url: r for r in extract_pages(df).collect()}
    assert set(rows) == set(golden["charset_pages"])
    for url, want in golden["charset_pages"].items():
        got = rows[url]
        for f in ("title", "content_text", "extract_error"):
            assert getattr(got, f) == want[f], (url, f)
    # the semantics the fixtures pin (not just golden echo): no mojibake
    assert rows["https://charset.test/latin1-meta"].title == "Café Münster, déjà vu"
    assert "�" not in rows["https://charset.test/sjis-httpequiv"].content_text
    assert rows["https://charset.test/sjis-httpequiv"].title == "日本語のページ"
    # header-only page carries no meta charset at all
    assert rows["https://charset.test/latin1-header-only"].title == "Größenwahn"


def test_charset_unknown_codec_is_harmless():
    """A page naming a bogus or non-text codec keeps its replace-decoded
    text (no crash, no error row)."""
    import pandas as pd

    from scrape_spark.operators.extract import extract_batch

    html = (
        '<html><head><meta charset="no-such-codec"><title>T\xe9</title></head>'
        "<body><article><p>body</p></article></body></html>"
    ).encode("latin-1")
    out = extract_batch(pd.Series([html]))
    assert out.iloc[0].extract_error is None
    assert "T" in out.iloc[0].title  # é is a replacement char, rest intact

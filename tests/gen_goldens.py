"""Regenerate the committed extraction goldens (tests/goldens/).

Run deliberately and only when EXTRACT_SPEC_VERSION is bumped:
    python tests/gen_goldens.py
Mirrors the reference's golden-regeneration tool
(internal/testdata/testdata.go:31-91): fixed corpus in, committed JSON out;
the test suite then asserts byte-identical extraction per url.

Pure pandas (no Spark) — the generator and extractor kernels are plain
batch functions, which is itself the determinism guarantee: the Spark path
must reproduce these bytes under any partitioning.
"""

from __future__ import annotations

import json
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrape_spark.operators.extract import EXTRACT_SPEC_VERSION, extract_batch
from scrape_spark.sources.pages import _gen_batch

GOLDEN_HOSTS = 6
GOLDEN_PER_HOST = 40
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens", "extract_golden.json")

# Handcrafted article-less fixtures for the readability-style fallback
# cascade (spec v2; reference: trafilatura EnableFallback, fetcher.go:13-14):
# real-world-messy shapes — content in nested divs, nav-heavy chrome, link
# farms — that the <article>-scoped fast path cannot handle.
FALLBACK_PAGES: list[tuple[str, str]] = [
    (
        "https://fallback.test/nested-divs",
        '<!DOCTYPE html>\n<html lang="en">\n<head>\n'
        "<title>Nested story</title>\n"
        '<meta name="description" content="story buried in divs">\n'
        "</head>\n<body>\n"
        '<div class="chrome"><a href="https://fallback.test/">Home</a> | '
        '<a href="https://fallback.test/world">World</a> | '
        '<a href="https://fallback.test/tech">Tech</a></div>\n'
        '<div class="page">\n <div class="wrapper">\n  <div class="post-body">\n'
        "   <p>The committee met on Tuesday, after weeks of delay, to review the draft report.</p>\n"
        "   <p>Its findings, released later that day, point to a steady rise in river temperatures, "
        "with the sharpest change recorded downstream of the plant.</p>\n"
        "   <p>Officials said monitoring would continue through the winter.</p>\n"
        "  </div>\n </div>\n</div>\n"
        '<div class="related"><a href="https://fallback.test/a">More coverage</a> '
        '<a href="https://fallback.test/b">Subscribe today</a></div>\n'
        "</body>\n</html>\n",
    ),
    (
        "https://fallback.test/nav-heavy",
        '<!DOCTYPE html>\n<html lang="en">\n<head><title>Menus everywhere</title></head>\n<body>\n'
        '<div class="menu">\n'
        + "".join(
            f'<a href="https://fallback.test/cat{i}">Category {i}</a>, ' for i in range(24)
        )
        + "\n</div>\n"
        '<div id="content">\n'
        "<p>Despite the clutter, the page does carry one real story, and it lives here, "
        "in a plain div, with commas to prove it carries prose.</p>\n"
        "<p>A second paragraph confirms the block, adding enough text that density wins "
        "over the link farm above.</p>\n"
        "</div>\n"
        '<div class="menu2">'
        + "".join(f'<a href="https://fallback.test/tag{i}">tag{i}</a> ' for i in range(16))
        + "</div>\n</body>\n</html>\n",
    ),
    (
        "https://fallback.test/shallow",
        '<!DOCTYPE html>\n<html lang="en">\n<head><title>Shallow</title></head>\n<body>\n'
        "<p>Content sits directly under the body, no wrapper at all, which is common on "
        "old pages, and it should still extract.</p>\n"
        "<p>Second paragraph, also directly under body.</p>\n"
        "</body>\n</html>\n",
    ),
    (
        "https://fallback.test/no-candidate",
        '<!DOCTYPE html>\n<html lang="en">\n<head><title>Tiny</title></head>\n<body>\n'
        "<p>Too short.</p>\n<span>bare inline text</span>\n</body>\n</html>\n",
    ),
]


# Spec v3 fixtures: real-world-messy metadata markup that go-trafilatura's
# DOM walk tolerates (fetch/trafilatura/fetcher.go:108-135) and a rigid
# name-before-content double-quote regex does not — reversed attribute
# order, single quotes, attributes in between, mixed case, and date
# fallbacks via <time datetime> and JSON-LD datePublished.
METADATA_PAGES: list[tuple[str, str]] = [
    (
        "https://meta.test/reversed-attrs",
        '<!DOCTYPE html>\n<html lang="en">\n<head>\n<title>Reversed</title>\n'
        '<meta content="Jane Roe; John Doe" name="author">\n'
        '<meta content="attrs reversed, still extracted" name="description">\n'
        '<meta content="https://meta.test/canonical-r" property="og:url">\n'
        "</head>\n<body>\n<article><p>Reversed-attribute body text.</p></article>\n"
        "</body>\n</html>\n",
    ),
    (
        "https://meta.test/single-quotes",
        "<!DOCTYPE html>\n<html lang='en'>\n<head>\n<title>Quoted</title>\n"
        "<meta name='description' content='single quotes everywhere'>\n"
        "<meta name='author' content='Quincy Quote'>\n"
        "<meta property='article:published_time' content='2026-02-03T04:05:06Z'>\n"
        "</head>\n<body>\n<article><p>Single-quote body text.</p></article>\n"
        "</body>\n</html>\n",
    ),
    (
        "https://meta.test/attrs-between",
        '<!DOCTYPE html>\n<html lang="en">\n<head>\n<title>Between</title>\n'
        '<meta name="author" class="seo" data-x="1" content="Betty Between">\n'
        '<META NAME="description" CONTENT="mixed case tag and attrs">\n'
        "</head>\n<body>\n<article><p>Attribute-gap body text.</p></article>\n"
        "</body>\n</html>\n",
    ),
    (
        "https://meta.test/time-datetime",
        '<!DOCTYPE html>\n<html lang="en">\n<head>\n<title>Timed</title>\n'
        "</head>\n<body>\n<article>\n"
        '<time datetime="2026-03-05T10:00:00Z">March 5, 2026</time>\n'
        "<p>Dated via a time element, no og meta at all.</p>\n"
        "</article>\n</body>\n</html>\n",
    ),
    (
        "https://meta.test/link-canonical",
        '<!DOCTYPE html>\n<html lang="en">\n<head>\n<title>Canonical</title>\n'
        '<link href="https://meta.test/the-canonical" rel="canonical">\n'
        "<link href='https://creativecommons.org/licenses/by-sa/4.0/' rel='license'>\n"
        "</head>\n<body>\n<article><p>Canonical via link tag, href before rel, "
        "single-quoted license.</p></article>\n</body>\n</html>\n",
    ),
    (
        "https://meta.test/json-ld",
        '<!DOCTYPE html>\n<html lang="en">\n<head>\n<title>Structured</title>\n'
        '<script type="application/ld+json">\n'
        '{"@context": "https://schema.org", "@type": "NewsArticle",\n'
        ' "headline": "Structured", "datePublished": "2026-04-06T07:08:09Z"}\n'
        "</script>\n</head>\n<body>\n<article>"
        "<p>Dated via JSON-LD structured data.</p></article>\n</body>\n</html>\n",
    ),
]


# Spec v4 charset fixtures: legacy-encoded pages (latin-1, shift-jis; a
# Common-Crawl-style corpus carries plenty) whose UTF-8 decode produces
# replacement characters. The charset tier sniffs <meta charset> /
# Content-Type params and re-decodes; extraction must yield the CORRECT
# non-ASCII text, byte-identically pinned here. Stored as (url, bytes,
# content_type_header).
CHARSET_PAGES: list[tuple[str, bytes, str | None]] = [
    (
        "https://charset.test/latin1-meta",
        (
            '<!DOCTYPE html>\n<html lang="fr">\n<head>\n'
            '<meta charset="iso-8859-1">\n'
            "<title>Café Münster, déjà vu</title>\n"
            '<meta name="description" content="Les défis à la carte">\n'
            "</head>\n<body>\n<article>"
            "<p>Le château est fermé; la journée s'achève déjà.</p>"
            "</article>\n</body>\n</html>\n"
        ).encode("latin-1"),
        None,
    ),
    (
        "https://charset.test/sjis-httpequiv",
        (
            '<!DOCTYPE html>\n<html lang="ja">\n<head>\n'
            '<meta http-equiv="Content-Type" content="text/html; charset=Shift_JIS">\n'
            "<title>日本語のページ</title>\n"
            "</head>\n<body>\n<article>"
            "<p>これは日本語のテキストです。文字化けしないこと。</p>"
            "</article>\n</body>\n</html>\n"
        ).encode("shift_jis"),
        None,
    ),
    (
        "https://charset.test/latin1-header-only",
        (
            '<!DOCTYPE html>\n<html lang="de">\n<head>\n'
            "<title>Größenwahn</title>\n"
            "</head>\n<body>\n<article>"
            "<p>Über allen Gipfeln ist Ruh, schöner Text.</p>"
            "</article>\n</body>\n</html>\n"
        ).encode("latin-1"),
        "text/html; charset=ISO-8859-1",  # charset ONLY in the HTTP header
    ),
]


def build_golden() -> dict:
    corpus = _gen_batch(
        pd.DataFrame({"id": range(GOLDEN_HOSTS * GOLDEN_PER_HOST)}),
        GOLDEN_HOSTS,
        GOLDEN_PER_HOST,
    )
    ext = extract_batch(corpus["html"], corpus["url"])  # spec v4: resolved links
    recs = {}
    for i in range(len(corpus)):
        row = ext.iloc[i]
        recs[corpus["url"].iloc[i]] = {
            "canonical_url": row.canonical_url,
            "title": row.title,
            "description": row.description,
            "sitename": row.sitename,
            "author": row.author,
            "date": row.date.isoformat() if pd.notna(row.date) else None,
            "categories": row.categories,
            "tags": row.tags,
            "language": row.language,
            "image": row.image,
            "page_type": row.page_type,
            "license": row.license,
            "content_text": row.content_text,
            "links": row.links,
            "extract_error": row.extract_error,
        }
    fb = {}
    fb_html = pd.Series([h.encode("utf-8") for _u, h in FALLBACK_PAGES])
    fb_ext = extract_batch(fb_html)
    for i, (url, _h) in enumerate(FALLBACK_PAGES):
        row = fb_ext.iloc[i]
        fb[url] = {
            "title": row.title,
            "content_text": row.content_text,
            "extract_error": row.extract_error,
        }
    md = {}
    md_html = pd.Series([h.encode("utf-8") for _u, h in METADATA_PAGES])
    md_ext = extract_batch(md_html)
    for i, (url, _h) in enumerate(METADATA_PAGES):
        row = md_ext.iloc[i]
        md[url] = {
            "canonical_url": row.canonical_url,
            "title": row.title,
            "description": row.description,
            "author": row.author,
            "date": row.date.isoformat() if pd.notna(row.date) else None,
            "content_text": row.content_text,
        }
    cset = {}
    cs_html = pd.Series([b for _u, b, _c in CHARSET_PAGES])
    cs_ctype = pd.Series([c for _u, _b, c in CHARSET_PAGES], dtype=object)
    cs_ext = extract_batch(cs_html, None, cs_ctype)
    for i, (url, _b, _c) in enumerate(CHARSET_PAGES):
        row = cs_ext.iloc[i]
        cset[url] = {
            "title": row.title,
            "description": row.description,
            "content_text": row.content_text,
            "extract_error": row.extract_error,
        }
    return {
        "spec_version": EXTRACT_SPEC_VERSION,
        "n_hosts": GOLDEN_HOSTS,
        "per_host": GOLDEN_PER_HOST,
        "pages": recs,
        "fallback_pages": fb,
        "metadata_pages": md,
        "charset_pages": cset,
    }


if __name__ == "__main__":
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    golden = build_golden()
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(golden, f, ensure_ascii=False, indent=1, sort_keys=True)
    print(f"wrote {OUT}: {len(golden['pages'])} pages, spec v{golden['spec_version']}")

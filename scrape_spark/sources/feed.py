"""RSS/Atom feed source (SURVEY.md §2.1 S5, §2.3 J5, §3.3).

The reference parses feeds with gofeed and flattens item links into a batch
request (resource/feed.go:9-21; api/server.go:330-333). Here:

- ``parse_feeds``: vectorized pandas regex extraction of RSS 2.0 ``<item>``
  / Atom ``<entry>`` / RSS 1.0 RDF ``<item rdf:about>`` links and titles
  over Arrow batches → one row per feed with ``items
  array<struct<title,link>>`` (the UDTF shape). Covers CDATA, XML entities,
  atom rel semantics (alternate default, first-alternate-wins across
  hreflang variants), and the xml:base scope chain (feed URL ← root ←
  entry ← link). If the optional ``feedparser`` package is importable it is
  used instead (full spec coverage); the regex path is the deterministic
  default and the only one exercised in CI.
- ``feed_to_requests``: explode item links → the batch-extract pipeline's
  request shape — the reference's /feed → /batch fan-out.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover — not installed in this environment
    import feedparser  # type: ignore

    HAVE_FEEDPARSER = True
except ImportError:
    feedparser = None
    HAVE_FEEDPARSER = False

# Item shape mirrors the gofeed.Item fields the reference's /feed API
# returns verbatim (resource/feed.go:9-21 embeds gofeed.Feed whole): link +
# title for the fan-out, plus the metadata tail — guid, published (raw +
# parsed), description, author (incl. dc:creator), categories, enclosure.
ITEM_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("link", T.StringType(), True),
        T.StructField("guid", T.StringType(), True),
        T.StructField("published", T.StringType(), True),
        T.StructField("published_ts", T.TimestampType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("categories", T.ArrayType(T.StringType()), True),
        T.StructField("enclosure_url", T.StringType(), True),
        T.StructField("enclosure_type", T.StringType(), True),
        T.StructField("enclosure_length", T.LongType(), True),
        # namespaced extension tags (gofeed.Item.Extensions analog —
        # podcast/iTunes, Media RSS, DC, any ns:tag): flattened to
        # "ns:tag" → text and "ns:tag@attr" → attribute value, first
        # occurrence wins (gofeed keeps arrays; the flat map covers the
        # single-valued common case and is Spark-friendly)
        T.StructField("extensions", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEED_SCHEMA = T.StructType(
    [
        T.StructField("feed_url", T.StringType(), False),
        T.StructField("feed_title", T.StringType(), True),
        T.StructField("items", T.ArrayType(ITEM_SCHEMA), True),
    ]
)

# Matches RSS 2.0 <item>, Atom <entry>, AND RSS 1.0 RDF <item rdf:about=..>
# (RDF items are SIBLINGS of <channel>, not children — gofeed's RSS 1.0
# translator flattens them the same way, fetch/feed/feed.go:95-117).
# Group 1 = the opening tag's attributes, group 2 = the element content.
_ITEM_RE = r"(?s)<(?:item|entry)\b([^>]*)>(.*?)</(?:item|entry)>"
_RSS_LINK_RE = r"(?s)<link>\s*(.*?)\s*</link>"
_ATOM_LINK_TAG_RE = r"<link\b([^>]*?)/?>"
_ATTR_RE = r"""([\w:-]+)\s*=\s*["']([^"']*)["']"""
_TITLE_RE = r"(?s)<title[^>]*>\s*(.*?)\s*</title>"
_CDATA_RE = r"(?s)^<!\[CDATA\[(.*?)\]\]>$"
_ROOT_TAG_RE = r"(?s)<(?:feed|rss|rdf:RDF)\b([^>]*)>"
# namespaced extension element: <ns:tag attrs/> or <ns:tag attrs>text</ns:tag>
_EXT_TAG_RE = r"(?s)<([A-Za-z][\w.\-]*):([A-Za-z][\w.\-]*)\b([^>]*?)(?:/>|>(.*?)</\1:\2>)"
_XML_BASE_RE = r"""xml:base\s*=\s*["']([^"']*)["']"""

# minimal XML entity set (spec-defined five + numeric forms handled below)
_XML_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&"),
)


def _clean_text(s: str | None) -> str | None:
    """CDATA unwrap + XML entity unescape (gofeed does both via its XML
    parser — fetch/feed/feed.go:95-117 consumes the parsed strings)."""
    import re

    if s is None:
        return None
    m = re.match(_CDATA_RE, s.strip())
    if m:
        return m.group(1).strip()
    out = s
    out = re.sub(r"&#(\d+);", lambda mm: chr(int(mm.group(1))), out)
    out = re.sub(r"&#x([0-9a-fA-F]+);", lambda mm: chr(int(mm.group(1), 16)), out)
    for ent, ch in _XML_ENTITIES:  # &amp; last — it guards double-escapes
        out = out.replace(ent, ch)
    return out.strip() or None


def _atom_link(chunk: str, base: str) -> str | None:
    """Pick the item link among <link> tags the way a feed consumer does:
    rel="alternate" (or no rel — the Atom default IS alternate, RFC 4287
    §4.2.7.2) wins over rel=self/enclosure/edit; among MULTIPLE alternates
    (e.g. per-hreflang variants) the FIRST in document order wins — gofeed's
    firstLinkWithType behavior. Each href resolves against the in-scope
    xml:base (link-level attribute overrides the inherited base)."""
    import re
    from urllib.parse import urljoin

    fallback = None
    for attrs in re.findall(_ATOM_LINK_TAG_RE, chunk):
        d = {k.lower(): v for k, v in re.findall(_ATTR_RE, attrs)}
        href = d.get("href")
        if not href:
            continue
        link_base = urljoin(base, d["xml:base"]) if d.get("xml:base") else base
        resolved = urljoin(link_base, href) if link_base else href
        rel = d.get("rel", "alternate").lower()
        if rel == "alternate":
            return resolved
        if fallback is None:
            fallback = resolved
    return fallback


def _first(chunk: str, *patterns: str) -> str | None:
    """First non-empty cleaned match among ordered alternatives."""
    import re

    for pat in patterns:
        m = re.search(pat, chunk)
        if m:
            v = _clean_text(m.group(1))
            if v:
                return v
    return None


def _item_meta(attrs: str, chunk: str) -> dict:
    """gofeed.Item-shaped metadata from one <item>/<entry> chunk.
    Namespaced Dublin Core (dc:creator, dc:date) folds into author/published
    the way gofeed's DC extension translator does; enclosures come from the
    RSS <enclosure> tag or an Atom <link rel="enclosure">."""
    import re

    guid = _first(
        chunk,
        r"(?s)<guid[^>]*>\s*(.*?)\s*</guid>",
        r"(?s)<id[^>]*>\s*(.*?)\s*</id>",
    )
    if guid is None:  # RDF items carry identity on rdf:about
        m = re.search(r"""rdf:about\s*=\s*["']([^"']*)["']""", attrs)
        guid = m.group(1) if m else None
    published = _first(
        chunk,
        r"(?s)<pubDate[^>]*>\s*(.*?)\s*</pubDate>",
        r"(?s)<published[^>]*>\s*(.*?)\s*</published>",
        r"(?s)<updated[^>]*>\s*(.*?)\s*</updated>",
        r"(?s)<dc:date[^>]*>\s*(.*?)\s*</dc:date>",
    )
    description = _first(
        chunk,
        r"(?s)<description[^>]*>\s*(.*?)\s*</description>",
        r"(?s)<summary[^>]*>\s*(.*?)\s*</summary>",
    )
    author = _first(
        chunk,
        r"(?s)<dc:creator[^>]*>\s*(.*?)\s*</dc:creator>",
        r"(?s)<author[^>]*>\s*<name[^>]*>\s*(.*?)\s*</name>",  # Atom nested
        r"(?s)<author[^>]*>\s*([^<]*?)\s*</author>",  # RSS flat (email form)
    )
    cats = [
        _clean_text(c)
        for c in re.findall(r"(?s)<category[^>]*>\s*(.*?)\s*</category>", chunk)
    ]
    cats += [
        _clean_text(t)
        for t in re.findall(r"""<category\b[^>]*\bterm\s*=\s*["']([^"']*)["']""", chunk)
    ]
    cats = [c for c in cats if c]
    enc_url = enc_type = None
    enc_len = None
    em = re.search(r"<enclosure\b([^>]*?)/?>", chunk)
    if em:
        d = {k.lower(): v for k, v in re.findall(_ATTR_RE, em.group(1))}
        enc_url, enc_type = d.get("url"), d.get("type")
        enc_len = int(d["length"]) if str(d.get("length", "")).isdigit() else None
    else:  # Atom enclosure link
        for link_attrs in re.findall(_ATOM_LINK_TAG_RE, chunk):
            d = {k.lower(): v for k, v in re.findall(_ATTR_RE, link_attrs)}
            if d.get("rel", "").lower() == "enclosure" and d.get("href"):
                enc_url, enc_type = d["href"], d.get("type")
                enc_len = (
                    int(d["length"]) if str(d.get("length", "")).isdigit() else None
                )
                break
    # namespaced extensions (podcast/iTunes, Media RSS, DC, …): every
    # ns:tag element, self-closing or not, flattened to "ns:tag" → text and
    # "ns:tag@attr" → attr value; first occurrence wins
    ext: dict[str, str] = {}
    for ns, tag, tag_attrs, text in re.findall(_EXT_TAG_RE, chunk):
        key = f"{ns}:{tag}"
        if text is not None:
            t = _clean_text(text)
            if t and key not in ext:
                ext[key] = t
        for k, v in re.findall(_ATTR_RE, tag_attrs):
            ak = f"{key}@{k.lower()}"
            if ak not in ext:
                ext[ak] = v
    return {
        "guid": guid,
        "published": published,
        "description": description,
        "author": author,
        "categories": cats or None,
        "enclosure_url": enc_url,
        "enclosure_type": enc_type,
        "enclosure_length": enc_len,
        "extensions": ext or None,
    }


def _parse_one(xml: str, feed_url: str | None = None) -> tuple[str | None, list[dict]]:
    import re
    from urllib.parse import urljoin

    if not isinstance(xml, str) or not xml.strip():
        return None, []
    # xml:base scope chain (XML Base spec; gofeed resolves relative URIs the
    # same way): feed URL ← root xml:base ← entry xml:base ← link xml:base
    base = feed_url or ""
    rm = re.search(_ROOT_TAG_RE, xml)
    if rm:
        bm = re.search(_XML_BASE_RE, rm.group(1))
        if bm:
            base = urljoin(base, bm.group(1)) if base else bm.group(1)
    head = re.split(_ITEM_RE, xml)[0]
    m = re.search(_TITLE_RE, head)
    feed_title = _clean_text(m.group(1)) if m else None
    items = []
    for attrs, chunk in re.findall(_ITEM_RE, xml):
        ebm = re.search(_XML_BASE_RE, attrs)
        ebase = urljoin(base, ebm.group(1)) if ebm else base
        lm = re.search(_RSS_LINK_RE, chunk)
        if lm:
            link = _clean_text(lm.group(1))
            if link and ebase:
                link = urljoin(ebase, link)
        else:
            link = _atom_link(chunk, ebase)
        tm = re.search(_TITLE_RE, chunk)
        meta = _item_meta(attrs, chunk)
        pub_ts = pd.to_datetime(meta["published"], errors="coerce", utc=True)
        meta["published_ts"] = (
            pub_ts.tz_localize(None).to_pydatetime() if pd.notna(pub_ts) else None
        )
        items.append(
            {
                "title": _clean_text(tm.group(1)) if tm else None,
                "link": link,
                **meta,
            }
        )
    return feed_title, items


def parse_feeds(df: DataFrame, url_col: str = "feed_url", xml_col: str = "xml") -> DataFrame:
    """(feed_url, xml) → FEED_SCHEMA rows."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [
                _parse_one(x, u) for x, u in zip(pdf[xml_col], pdf[url_col])
            ]
            yield pd.DataFrame(
                {
                    "feed_url": pdf[url_col].to_numpy(),
                    "feed_title": [p[0] for p in parsed],
                    "items": [p[1] for p in parsed],
                }
            )

    return df.mapInPandas(run, schema=FEED_SCHEMA)


def feed_to_requests(feeds: DataFrame) -> DataFrame:
    """Explode item links into the batch pipeline's request shape (J5)."""
    return (
        feeds.select("feed_url", F.explode_outer("items").alias("item"))
        .select("feed_url", F.col("item.link").alias("url"))
        .where(F.col("url").isNotNull())
    )

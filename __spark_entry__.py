"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship memoized batch fetch+extract over sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per operator from SURVEY.md §2
(names match the driver-test keys in the §2 tables), DuckDB-checked at
sf0.01. Keys without an oracle entry are genuinely non-SQL-expressible
(FNV-1a keying parity, the full extraction pipeline) and get rows-only checks.

Column-name discipline: every computed column is aliased identically in the
Spark plan and the oracle SQL (the driver sorts columns by name and hashes
values). Float-valued aggregates are rounded/cast on BOTH sides so the
value-hash is engine-stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# entry: flagship query
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the memoized batch fetch+extract plan (SURVEY §3.1) over a
    pages corpus derived from sf0.001 documents — canonicalize → key →
    dedupe → fetch-join → vectorized extract → result rows."""
    from scrape_spark.plans.batch_extract import batch_extract, pages_from_documents

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    pages = pages_from_documents(docs)
    requests = pages.select("url")
    return batch_extract(spark, requests, pages, store=None)


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

_Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_SQL: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        _Q[name] = fn
        if sql is not None:
            _SQL[name] = sql
        return fn
    return deco


# -- S7/W1: range scan: filter + order + limit/offset ------------------------

@_q(
    "range_scan",
    """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
       FROM customer WHERE c_mktsegment = 'BUILDING'
       ORDER BY c_custkey LIMIT 50 OFFSET 10""",
)
def range_scan(spark, sf):
    return (
        _t(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .orderBy("c_custkey")
        .offset(10)
        .limit(50)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


@_q(
    "order_limit_offset",
    """SELECT p_partkey, p_name, p_retailprice FROM part
       ORDER BY p_partkey DESC LIMIT 20 OFFSET 5""",
)
def order_limit_offset(spark, sf):
    return (
        _t(spark, sf, "part")
        .orderBy(F.col("p_partkey").desc())
        .offset(5)
        .limit(20)
        .select("p_partkey", "p_name", "p_retailprice")
    )


# -- F1/K1: URL canonicalization through the real clean_url UDF --------------

@_q(
    "clean_url_project",
    """SELECT p_partkey,
              'https://parts.test/p/' || p_partkey || '?a=' ||
                replace(p_brand, '#', '%23') || '&b=' || p_size AS cleaned
       FROM part ORDER BY p_partkey""",
)
def clean_url_project(spark, sf):
    from scrape_spark.functions.urlkeys import clean_url

    part = _t(spark, sf, "part")
    # '#' in a query value must be pre-encoded (%23) or it starts the fragment
    dirty = F.concat(
        F.lit("https://parts.test/p/"), F.col("p_partkey").cast("string"),
        F.lit("?utm_source=x&utm_campaign=y&b="), F.col("p_size").cast("string"),
        F.lit("&a="), F.regexp_replace(F.col("p_brand"), "#", "%23"), F.lit("#frag"),
    )
    return (
        part.select("p_partkey", clean_url(dirty).alias("cleaned"))
        .orderBy("p_partkey")
    )


@_q("key_hash")  # rows-only: FNV-1a-63 has no DuckDB analog (parity-pinned in pytest)
def key_hash(spark, sf):
    from scrape_spark.functions.urlkeys import clean_url, url_key

    part = _t(spark, sf, "part")
    url = F.concat(
        F.lit("https://parts.test/p/"), F.col("p_partkey").cast("string"),
        F.lit("?utm_source=x"),
    )
    return part.select(
        "p_partkey",
        clean_url(url).alias("cleaned"),
        url_key(clean_url(url)).alias("key"),
    ).orderBy("p_partkey")


# -- F3: TTL-expiry predicate -------------------------------------------------

@_q(
    "ttl_filter",
    """SELECT event_id, ts, event_type FROM events
       WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
         AND ts <  TIMESTAMP '2024-01-22 00:00:00'""",
)
def ttl_filter(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-08 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-22 00:00:00").cast("timestamp"))
    ).select("event_id", "ts", "event_type")


# -- F4: status-code error routing (conditional projection) -------------------

@_q(
    "status_split",
    """SELECT o_orderkey, o_orderstatus,
              CASE WHEN o_orderstatus = 'O' THEN NULL
                   ELSE 'order error: status ' || o_orderstatus END AS error
       FROM orders""",
)
def status_split(spark, sf):
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("order error: status "), F.col("o_orderstatus")))
        .alias("error"),
    )


# -- F5: domain validation ----------------------------------------------------

@_q(
    "domain_valid",
    """SELECT s_suppkey, candidate,
              (length(candidate) BETWEEN 4 AND 253
               AND NOT contains(candidate, '--')
               AND regexp_matches(candidate,
                   '^([a-z0-9]([a-z0-9-]*[a-z0-9])?\\.)+[a-z]{2,63}$')) AS valid
       FROM (SELECT s_suppkey,
                    CASE WHEN s_suppkey % 3 = 0 THEN 'bad--host.com'
                         WHEN s_suppkey % 3 = 1 THEN 'sup' || s_suppkey || '.example.com'
                         ELSE 'no-tld' END AS candidate
             FROM supplier)""",
)
def domain_valid(spark, sf):
    from scrape_spark.functions.textfns import is_valid_domain

    s = _t(spark, sf, "supplier")
    cand = (
        F.when(F.col("s_suppkey") % 3 == 0, F.lit("bad--host.com"))
        .when(
            F.col("s_suppkey") % 3 == 1,
            F.concat(F.lit("sup"), F.col("s_suppkey").cast("string"), F.lit(".example.com")),
        )
        .otherwise(F.lit("no-tld"))
    )
    return s.select(
        "s_suppkey", cand.alias("candidate"), is_valid_domain(cand).alias("valid")
    )


# -- J1: alias-resolution lookup join with coalesce fallback ------------------

@_q(
    "alias_join",
    """SELECT o.o_orderkey,
              coalesce(a.canonical_id, o.o_custkey) AS resolved_key
       FROM orders o
       LEFT JOIN (SELECT c_custkey AS requested_id,
                         c_custkey % 100 AS canonical_id
                  FROM customer WHERE c_custkey % 7 = 0) a
         ON o.o_custkey = a.requested_id""",
)
def alias_join(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    id_map = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .select(
            F.col("c_custkey").alias("requested_id"),
            (F.col("c_custkey") % 100).alias("canonical_id"),
        )
    )
    return (
        o.join(F.broadcast(id_map), o["o_custkey"] == id_map["requested_id"], "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("canonical_id"), F.col("o_custkey")).alias("resolved_key"),
        )
    )


# -- J2: cache hit/miss split (semi / anti) ------------------------------------

@_q(
    "hit_miss_semi",
    """SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem l
       WHERE EXISTS (SELECT 1 FROM part p
                     WHERE p.p_partkey = l.l_partkey AND p.p_size > 40)""",
)
def hit_miss_semi(spark, sf):
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(F.col("p_size") > 40)
    return li.join(p, li["l_partkey"] == p["p_partkey"], "left_semi").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )


@_q(
    "hit_miss_anti",
    """SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM part p
                         WHERE p.p_partkey = l.l_partkey AND p.p_size > 40)""",
)
def hit_miss_anti(spark, sf):
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(F.col("p_size") > 40)
    return li.join(p, li["l_partkey"] == p["p_partkey"], "left_anti").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )


# -- J3: broadcast dim join + aggregation --------------------------------------

@_q(
    "dim_broadcast",
    """SELECT s.s_name, count(*) AS n_items,
              CAST(round(sum(l.l_extendedprice)) AS BIGINT) AS total_price
       FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
       GROUP BY s.s_name""",
)
def dim_broadcast(spark, sf):
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice")).cast("bigint").alias("total_price"),
        )
    )


# -- J4/A1: last-write-wins dedupe ----------------------------------------------

@_q(
    "dedupe_lastwin",
    """SELECT user_id, event_id, event_type FROM (
         SELECT user_id, event_id, event_type,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
         FROM events) WHERE rn = 1""",
)
def dedupe_lastwin(spark, sf):
    ev = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@_q(
    "lastwin_agg",
    """SELECT user_id, arg_max(event_type, event_id) AS last_type,
              count(*) AS n_events
       FROM events GROUP BY user_id""",
)
def lastwin_agg(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", "event_id").alias("last_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


# -- A2: counts -----------------------------------------------------------------

@_q(
    "store_counts",
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
)
def store_counts(spark, sf):
    return _t(spark, sf, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# -- A3: per-host multi-aggregation ----------------------------------------------

@_q(
    "per_host_agg",
    """SELECT l_suppkey, count(*) AS n,
              CAST(round(sum(l_quantity)) AS BIGINT) AS total_qty,
              round(avg(l_discount), 4) AS avg_disc
       FROM lineitem GROUP BY l_suppkey""",
)
def per_host_agg(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity")).cast("bigint").alias("total_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
    )


# -- A4/U2: seen-set anti join ----------------------------------------------------

@_q(
    "seen_anti",
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')""",
)
def seen_anti(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


# -- A5: distinct counts ------------------------------------------------------------

@_q(
    "distinct_hosts",
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs
       FROM orders GROUP BY o_orderpriority""",
)
def distinct_hosts(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_custs"))
    )


# -- W3: top-k per group --------------------------------------------------------------

@_q(
    "topk_per_group",
    """SELECT l_suppkey, l_orderkey, l_linenumber, rk FROM (
         SELECT l_suppkey, l_orderkey, l_linenumber,
                row_number() OVER (PARTITION BY l_suppkey
                                   ORDER BY l_extendedprice DESC,
                                            l_orderkey, l_linenumber) AS rk
         FROM lineitem) WHERE rk <= 3""",
)
def topk_per_group(spark, sf):
    li = _t(spark, sf, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "rk")
    )


# -- U1: union of hit + miss paths ------------------------------------------------------

@_q(
    "union_results",
    """SELECT o_orderkey, o_orderstatus, 'hit' AS path FROM orders
       WHERE o_orderstatus = 'F' AND o_totalprice > 100000
       UNION ALL
       SELECT o_orderkey, o_orderstatus, 'miss' AS path FROM orders
       WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F'""",
)
def union_results(spark, sf):
    o = _t(spark, sf, "orders")
    hits = o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000)).select(
        "o_orderkey", "o_orderstatus", F.lit("hit").alias("path")
    )
    misses = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") != "F")
    ).select("o_orderkey", "o_orderstatus", F.lit("miss").alias("path"))
    return hits.unionByName(misses)


# -- K7: author split ---------------------------------------------------------------------

@_q(
    "author_split",
    """SELECT p_partkey,
              len(string_split(p_name, ' ')) AS n_tokens,
              string_split(p_name, ' ')[1] AS first_token,
              array_to_string(string_split(p_name, ' '), '|') AS joined
       FROM part""",
)
def author_split(spark, sf):
    p = _t(spark, sf, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(toks, "|").alias("joined"),
    )


# -- flagship pipeline as a rows-only query -------------------------------------------------

@_q("batch_pipeline")  # rows-only: full UDF pipeline, no SQL analog
def batch_pipeline(spark, sf):
    from scrape_spark.plans.batch_extract import batch_extract, pages_from_documents

    pages = pages_from_documents(_t(spark, sf, "documents"))
    return batch_extract(spark, pages.select("url"), pages, store=None)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_Q)


def oracle_sql() -> dict[str, str]:
    return dict(_SQL)

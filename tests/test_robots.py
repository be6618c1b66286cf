"""RFC 9309 robots.txt parsing + longest-match precedence tests, and the
parsed-rules crawl path vs the reference model."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from scrape_spark.sources.robots import (
    ROBOTS_RULES_SCHEMA,
    _to_like,
    denied_expr,
    parse_robots,
    parse_robots_text,
)


# ---- text parser (pure python) ----------------------------------------------


def test_group_selection_specific_beats_star():
    txt = """
User-agent: *
Disallow: /all/

User-agent: scrape-spark
Disallow: /mine/
Crawl-delay: 2.5
"""
    d, a, c = parse_robots_text(txt, "scrape-spark/1.0")
    assert d == ["/mine/"] and a == [] and c == 2.5
    d2, _, c2 = parse_robots_text(txt, "otherbot")
    assert d2 == ["/all/"] and c2 is None


def test_longest_agent_token_wins():
    txt = """
User-agent: scrape
Disallow: /short/

User-agent: scrape-spark
Disallow: /long/
"""
    d, _, _ = parse_robots_text(txt, "scrape-spark/1.0")
    assert d == ["/long/"]


def test_same_agent_groups_merge_and_agent_runs():
    txt = """
User-agent: a
User-agent: scrape-spark
Disallow: /one/

user-AGENT: scrape-spark
disallow: /two/   # trailing comment
Allow: /two/ok
"""
    d, a, _ = parse_robots_text(txt, "scrape-spark")
    assert sorted(d) == ["/one/", "/two/"]
    assert a == ["/two/ok"]


def test_rules_before_any_group_are_ignored_and_empty_disallow():
    txt = "Disallow: /orphan/\nUser-agent: *\nDisallow:\nDisallow: /x/\n"
    d, _, _ = parse_robots_text(txt, "bot")
    assert d == ["/x/"]


def test_no_matching_group_allows_all():
    d, a, c = parse_robots_text("User-agent: othercrawler\nDisallow: /\n", "me")
    assert d == [] and a == [] and c is None


def test_to_like_translation():
    assert _to_like("/a/*") == "/a/%%"
    assert _to_like("/a*b$") == "/a%b"
    assert _to_like("/p") == "/p%"
    assert _to_like("/100%_x") == "/100\\%\\_x%"


# ---- JVM-side longest-match precedence --------------------------------------


@pytest.fixture(scope="module")
def rules_df(spark):
    txt = """
User-agent: *
Disallow: /p
Allow: /page
Disallow: /private/
Allow: /private/pub*
Disallow: /*.pdf$
Crawl-delay: 1.5
"""
    df = spark.createDataFrame([("h.test", txt)], ["host", "robots_txt"])
    return parse_robots(df, "scrape-spark").cache()


@pytest.mark.parametrize(
    "path,denied",
    [
        ("/pottery", True),  # /p disallow, no allow matches
        ("/page/1", False),  # allow /page (5) beats disallow /p (2)
        ("/private/x", True),
        ("/private/pubfile", False),  # allow wildcard longer than disallow
        ("/doc/file.pdf", True),  # $-anchored wildcard
        ("/doc/file.pdfx", False),  # anchor must hold
        ("/other", False),  # no rule matches
    ],
)
def test_denied_longest_match(spark, rules_df, path, denied):
    row = (
        spark.createDataFrame([(path,)], ["path"])
        .crossJoin(rules_df)
        .select(denied_expr(F.col("path"), F.col("disallow"), F.col("allow")).alias("d"))
        .collect()[0]
    )
    assert row.d == denied, path


def test_allow_wins_exact_tie(spark):
    txt = "User-agent: *\nDisallow: /dir/\nAllow: /dir/\n"
    df = parse_robots(
        spark.createDataFrame([("h.test", txt)], ["host", "robots_txt"]), "x"
    )
    row = (
        spark.createDataFrame([("/dir/a",)], ["path"])
        .crossJoin(df)
        .select(denied_expr(F.col("path"), F.col("disallow"), F.col("allow")).alias("d"))
        .collect()[0]
    )
    assert row.d is False


def test_crawl_delay_and_null_txt(spark, rules_df):
    assert rules_df.collect()[0].crawl_delay == 1.5
    df = parse_robots(
        spark.createDataFrame(
            [("empty.test", None)], "host string, robots_txt string"
        ),
        "x",
    ).collect()[0]
    assert df.disallow == [] and df.allow == []


# ---- parsed-rules crawl equals the reference model --------------------------


def test_crawl_with_parsed_robots_matches_model(spark, tmp_path_factory):
    """Feed the crawl raw robots.txt (parsed via RFC 9309 path) that encodes
    exactly the rules robots_table() synthesizes — the crawl must reproduce
    the reference model byte-for-byte like the table-driven path does."""
    from scrape_spark.operators.frontier import Crawl, CrawlConfig
    from scrape_spark.operators.store import UrlStore
    from scrape_spark.sources.pages import host_name, seed_urls, synth_pages
    from tests.reference_model import build_corpus, run_model

    n_hosts, per_host, epoch_s, n_epochs = 4, 30, 4.0, 3
    delays = [0.2, 0.5, 1.0, 2.0]
    txts = [
        (
            host_name(h),
            "User-agent: unrelatedbot\nDisallow: /\n\n"
            "User-agent: *\nDisallow: /private/\n"
            f"Crawl-delay: {delays[h % len(delays)] if h else 0.1}\n",
        )
        for h in range(n_hosts)
    ]
    robots = parse_robots(
        spark.createDataFrame(txts, ["host", "robots_txt"]), "scrape-spark"
    )
    pages = synth_pages(spark, n_hosts, per_host)
    tmpdir = str(tmp_path_factory.mktemp("crawl_robots"))
    crawl = Crawl(
        spark,
        f"{tmpdir}/state",
        UrlStore(spark, f"{tmpdir}/store", n_buckets=8),
        pages,
        robots,
        CrawlConfig(
            epoch_seconds=epoch_s, max_depth=6, n_buckets=8, shuffle_partitions=4
        ),
    )
    crawl.run(n_epochs, seeds=seed_urls(n_hosts))
    corpus = build_corpus(n_hosts, per_host)
    model_robots = {
        host_name(h): (["/private/"], delays[h % len(delays)] if h else 0.1)
        for h in range(n_hosts)
    }
    model = run_model(
        corpus, seed_urls(n_hosts), model_robots, epoch_s, n_epochs, max_depth=6
    )
    got = {r.key for r in crawl.store.urls.read().select("key").collect()}
    assert got == model.store_keys
    for epoch in range(n_epochs):
        df = spark.read.parquet(f"{crawl.state_dir}/epochs/e{epoch:05d}/selected.parquet")
        got_sel = sorted(
            (r.key, r.url, r.host, r.depth, r.priority, r.rank) for r in df.collect()
        )
        assert got_sel == [tuple(t) for t in model.selected_per_epoch[epoch]]
    shutil.rmtree(tmpdir, ignore_errors=True)

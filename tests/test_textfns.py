from __future__ import annotations

import pyspark.sql.functions as F

from scrape_spark.functions import textfns


def test_author_split(spark):
    df = spark.createDataFrame(
        [("A. One; B. Two ;", ), ("", ), ("  ; ; ", ), ("Solo",), (None,)], ["author"]
    )
    out = [r.a for r in df.select(textfns.author_split("author").alias("a")).collect()]
    assert out == [["A. One", "B. Two"], [], [], ["Solo"], []]


def test_content_type_gate(spark):
    df = spark.createDataFrame(
        [
            ("text/html; charset=utf-8",),
            ("application/xhtml+xml",),
            ("text/plain",),
            ("image/png",),
            ("application/json; charset=utf-8",),
        ],
        ["ct"],
    )
    errs = [r.e for r in df.select(textfns.content_type_error("ct").alias("e")).collect()]
    assert errs[0] is None and errs[1] is None and errs[2] is None
    assert errs[3] == "unsupported content type: image/png"
    assert errs[4] == "unsupported content type: application/json"


def test_status_gate(spark):
    df = spark.createDataFrame([(200,), (301,), (399,), (404,), (500,), (199,)], ["sc"])
    errs = [r.e for r in df.select(textfns.status_error("sc").alias("e")).collect()]
    assert errs[:3] == [None, None, None]
    assert errs[3] == "HTTP error: status code 404"
    assert errs[5] == "HTTP error: status code 199"


def test_domain_validation(spark):
    # Mirrors internal/settings/domain.go:266-313 semantics.
    cases = [
        ("example.com", True),
        ("sub.example.com", True),
        ("a.co", True),
        ("ex--ample.com", False),
        ("-example.com", False),
        ("example-.com", False),
        ("example.c", False),
        ("example.123", False),
        ("nodots", False),
        ("EXAMPLE.COM", True),  # case-folded before validation (F9)
    ]
    df = spark.createDataFrame(cases, ["d", "want"])
    rows = df.select("d", "want", textfns.is_valid_domain("d").alias("got")).collect()
    for r in rows:
        assert r.got == r.want, r.d


def test_ttl_and_expiry(spark):
    df = spark.createDataFrame([("2026-01-01 00:00:00",)], ["ft"]).select(
        F.to_timestamp("ft").alias("ft")
    )
    row = df.select(textfns.expires_at("ft", 3600).alias("exp")).collect()[0]
    assert str(row.exp) == "2026-01-01 01:00:00"


def test_wildcard_rewrite():
    assert textfns.wildcard_to_like("*foo*") == "%foo%"
    assert textfns.wildcard_to_like("foo") == "%foo%"
    assert textfns.wildcard_to_like("foo*") == "foo%"


def test_mime_header_canonicalization(spark):
    df = spark.createDataFrame(
        [({"content-type": "text/html", "x-CUSTOM-header": "1"},)], "h map<string,string>"
    )
    out = df.select(textfns.canonical_mime_headers("h").alias("h")).collect()[0].h
    assert out == {"Content-Type": "text/html", "X-Custom-Header": "1"}


def test_ua_alias(spark):
    df = spark.createDataFrame([(":chrome:",), ("custom-ua",)], ["ua"])
    out = [r.u for r in df.select(textfns.expand_ua("ua").alias("u")).collect()]
    assert out[0].startswith("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit")
    assert out[1] == "custom-ua"

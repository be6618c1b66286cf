"""Stage-isolated timing of one batch_extract run (guide §1.4 noop-sink
methodology): where does the non-extraction time of the headline go?

    python tools/pipeline_breakdown.py

Times, each as min-of-N same-session runs over the sf0.1 bench corpus:
  corpus_scan   — pages parquet scan alone (noop)
  requests      — prepare_requests + in-flight dedupe (noop)
  join_only     — fetch_join minus the extract mapInPandas (noop)
  extract_only  — corpus scan + extract_pages, no request join (noop)
  full          — the whole batch_extract(store=None) (count, as bench does)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from scrape_spark.session import get_spark

    spark = get_spark("breakdown", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    from scrape_spark.plans.batch_extract import (
        batch_extract,
        fetch_join,
        prepare_requests,
    )
    from scrape_spark.operators.extract import extract_pages
    from scrape_spark.sources.pages import ensure_pages

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pages = ensure_pages(spark, os.path.join(root, ".bench_data", "pages_50x1000"), 50, 1000)
    pages.count()

    # warm
    batch_extract(spark, pages.select("url").limit(2000), pages, store=None).count()

    ITERS = 3
    results = {}

    def timed(name, fn):
        runs = []
        for _ in range(ITERS):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        results[name] = (min(runs), sorted(runs)[len(runs) // 2])

    timed("corpus_scan", lambda: noop(pages))
    timed("requests", lambda: noop(prepare_requests(pages.select("url"))))

    def _requests_dedup():
        req = prepare_requests(pages.select("url"))
        req = req.withColumn(
            "__dedupe_key", F.coalesce(F.col("key"), F.xxhash64("original_url"))
        ).dropDuplicates(["__dedupe_key"]).drop("__dedupe_key")
        noop(req)

    timed("requests_dedup", _requests_dedup)

    def _join_only():
        req = prepare_requests(pages.select("url"))
        req = req.withColumn("__fetch_method", F.lit(1))
        req = req.withColumn("__user_agent", F.lit(None).cast("string")).withColumn(
            "__headers", F.lit(None).cast("map<string,string>")
        )
        req = req.withColumn(
            "__dedupe_key", F.coalesce(F.col("key"), F.xxhash64("original_url"))
        ).dropDuplicates(["__dedupe_key"]).drop("__dedupe_key")
        cols = set(pages.columns)
        corpus = pages.select(
            F.col("url").alias("__page_url"),
            "html",
            F.lit(None).cast("string").alias("__ctype"),
            F.lit(None).cast("int").alias("__status"),
            F.lit(None).cast("string").alias("__redirect_to"),
        )
        joined = req.join(corpus, req["parsed_url"] == corpus["__page_url"], "left")
        noop(joined.drop("html"))

    timed("join_only", _join_only)

    timed("extract_only", lambda: noop(extract_pages(pages.select("url", "html"), html_col="html", base_col="url")))

    timed("full_noop", lambda: noop(batch_extract(spark, pages.select("url"), pages, store=None)))
    timed("full_count", lambda: batch_extract(spark, pages.select("url"), pages, store=None).count())

    for k, (mn, md) in results.items():
        print(f"{k:16s} min {mn:7.3f}  median {md:7.3f}")


if __name__ == "__main__":
    main()

"""Capture .explain("formatted") for every bench-visible query plus the
flagship pipeline shapes, writing plans/<tag>/<query>.txt — the judge's
evidence that plan claims (exchange counts, join strategies, pushdown)
match the code.

    python tools/capture_plans.py r06 after     # -> plans/r06/<q>_after.txt
    python tools/capture_plans.py r06 before    # run from a round-start tree
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_formatted(df) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    out_root = os.environ.get("PLANS_OUT")
    out_dir = out_root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from scrape_spark.session import get_spark

    spark = get_spark("plans", master="local[4]", shuffle_partitions=4)

    import __spark_entry__ as E

    names = [
        "per_host_agg", "dim_broadcast", "topk_per_group", "hit_miss_anti",
        "dedupe_lastwin", "sessionize", "fingerprint_dedup", "corpus_export",
        "jaccard_pairs_trigram", "minhash_neardup", "embedding_neardup",
        "ann_topk", "batch_pipeline",
    ]
    qs = E.queries()
    for name in names:
        try:
            text = explain_formatted(qs[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - record the failure, keep going
            text = f"EXPLAIN FAILED: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print("wrote", name)

    # flagship fetch+extract over the bench corpus (both strategy arms),
    # and the store MERGE delta plan
    from pyspark.sql import functions as F

    from scrape_spark.plans.batch_extract import (
        batch_extract,
        fetch_join,
        prepare_requests,
    )
    from scrape_spark.sources.pages import ensure_pages

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pages = ensure_pages(
        spark, os.path.join(root, ".bench_data", "pages_50x1000"), 50, 1000
    )
    flagship = batch_extract(spark, pages.select("url"), pages, store=None)
    with open(os.path.join(out_dir, f"batch_pipeline_sf_{suffix}.txt"), "w") as f:
        f.write(explain_formatted(flagship))
    print("wrote batch_pipeline_sf")

    try:
        from scrape_spark.operators.store import merge_delta_plan

        delta = prepare_requests(pages.select("url")).select(
            F.col("key"), F.col("parsed_url"), F.current_timestamp().alias("fetch_time")
        )
        with open(os.path.join(out_dir, f"store_merge_delta_{suffix}.txt"), "w") as f:
            f.write(explain_formatted(merge_delta_plan(delta, "key", "fetch_time", 32)))
        print("wrote store_merge_delta")
    except ImportError:
        # round-start tree: replicate the old merge shape for the before-plan
        delta = prepare_requests(pages.select("url")).select(
            F.col("key"), F.col("parsed_url"), F.current_timestamp().alias("fetch_time")
        )
        cols = delta.columns
        deduped = (
            delta.where(F.col("key").isNotNull())
            .groupBy("key")
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in cols if c != "key"]),
                    F.struct(F.col("fetch_time")),
                ).alias("__row")
            )
            .select("key", "__row.*")
        )
        from scrape_spark.operators.store import BUCKET_COL, bucket_expr

        shaped = deduped.withColumn(BUCKET_COL, bucket_expr("key", 32)).repartition(
            BUCKET_COL
        )
        with open(os.path.join(out_dir, f"store_merge_delta_{suffix}.txt"), "w") as f:
            f.write(explain_formatted(shaped))
        print("wrote store_merge_delta (legacy shape)")


if __name__ == "__main__":
    main()

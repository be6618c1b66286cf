"""Streaming veneer: availableNow micro-batches run the same batch plan —
memoization and exactly-once over input files hold across restarts."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from scrape_spark.operators.store import UrlStore
from scrape_spark.sources.pages import page_url, synth_pages
from scrape_spark.streaming.micro_batch import run_stream_extract


def _write_requests(d: str, name: str, urls: list[str]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for u in urls:
            f.write(json.dumps({"url": u}) + "\n")


def test_stream_extract_and_memoization(spark, tmp_path):
    pages = synth_pages(spark, 4, 30).cache()
    pages.count()
    store = UrlStore(spark, str(tmp_path / "store"), n_buckets=8)
    req_dir = str(tmp_path / "requests")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_requests(req_dir, "f1.json", [page_url(0, 1), page_url(1, 2)])
    run_stream_extract(spark, req_dir, pages, store, ckpt, out_dir)
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == 2
    t1 = {r.parsed_url: r.fetch_time for r in out1.collect()}

    # second file: one repeat (cache hit keeps fetch_time) + one new URL;
    # the first file is NOT reprocessed (checkpoint exactly-once)
    _write_requests(req_dir, "f2.json", [page_url(0, 1), page_url(2, 3)])
    run_stream_extract(spark, req_dir, pages, store, ckpt, out_dir)
    out2 = spark.read.parquet(out_dir)
    assert out2.count() == 4
    repeat = [r for r in out2.collect() if r.parsed_url == page_url(0, 1)]
    assert len(repeat) == 2
    assert {r.fetch_time for r in repeat} == {t1[page_url(0, 1)]}
    assert store.urls.read().filter(F.col("error").isNull()).count() == 3

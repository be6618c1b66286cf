"""Benchmark harness (driver contract): runs the headline pipeline + operator
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], printing ONE JSON line:

  {"metric": "batch_extract_seconds", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "throughput_pages_per_sec": ...}

The headline number is the flagship fetch+extract pipeline over a synthetic
pages corpus scaled to the SF (generated once, cached as Parquet under
.bench_data/). Two-cluster-size scaling evidence lives in
tools/scaling_bench.py (subprocess per parallelism level) and is recorded
in BASELINE.md / BENCH notes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Corpus size by SF dir (pages ≈ lineitem rows / 12; html ≈ 2 KB/page)
CORPUS = {
    "sf0.001": (6, 100),     # n_hosts, per_host
    "sf0.01": (20, 300),
    "sf0.1": (50, 1000),
}

BENCH_QUERIES = [
    "batch_pipeline_sf",      # special: pages corpus, not sf tables
    "per_host_agg",
    "dim_broadcast",
    "topk_per_group",
    "hit_miss_anti",
    "dedupe_lastwin",
    "sessionize",
    "fingerprint_dedup",
    "corpus_export",
    "jaccard_pairs_trigram",
    "minhash_neardup",
    "embedding_neardup",
    "ann_topk",
    "ann_topk_lsh",
    "ann_topk_ivf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    n_hosts, per_host = CORPUS.get(sf_name, (20, 300))

    from scrape_spark.session import get_spark

    # match tools/scaling_bench.py: the 1.3M-page level GC-thrashes at the
    # 8g default heap (measured 40s vs ~11s), the box has 128 GiB
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    import __spark_entry__ as E
    from scrape_spark.plans.batch_extract import batch_extract
    from scrape_spark.sources.pages import ensure_pages

    corpus_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".bench_data",
        f"pages_{n_hosts}x{per_host}",
    )
    pages = ensure_pages(spark, corpus_path, n_hosts, per_host)
    n_pages = pages.count()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    # warmup: JIT/codegen/Arrow path compile on a slice, then measure
    batch_extract(spark, pages.select("url").limit(2000), pages, store=None).count()

    # headline: full memoization-less fetch+extract over the whole corpus.
    # min AND median of ITERS runs: the min is the steady-state number a
    # long-running cluster sees; the median shows how floor-dominated the
    # min is (sandbox JVM warm-in converges over several iterations).
    ITERS = 3
    runs = []
    for _ in range(ITERS):
        t0 = time.time()
        out = batch_extract(spark, pages.select("url"), pages, store=None)
        n_out = out.count()
        runs.append(time.time() - t0)
    headline = min(runs)
    timings["batch_pipeline_sf"] = round(headline, 3)
    medians["batch_pipeline_sf"] = round(_median(runs), 3)

    # memoized path: warm a store with ~half the corpus, then run the FULL
    # corpus through the store-backed plan (mixed hit/miss: alias-resolve,
    # bucket-pruned cache split, fetch+extract of misses, MERGE commit) —
    # this is the path production crawls pay; the headline above is the
    # cold-store path. Iterated like every other query (round-3 verdict:
    # a single-shot store number cannot be told apart from this box's up-to-
    # 4x single-shot variance): each iteration gets a FRESH warmed store
    # (the warm-up is untimed), min + median reported. A split measurement
    # (probe+extract with save=False, then the MERGE of the cached results)
    # attributes the time between the read path and the commit path.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from scrape_spark.operators.store import UrlStore

    def store_round(corpus_df, n_buckets, split=False):
        """One fresh-store iteration: warm (untimed) → timed full run.
        With split=True also returns (probe_seconds, merge_seconds)."""
        root = tempfile.mkdtemp(prefix="bench_store_")
        try:
            st = UrlStore(spark, root, n_buckets=n_buckets)
            warm = corpus_df.select("url").filter(F.xxhash64("url") % 2 == 0)
            batch_extract(spark, warm, corpus_df, st).count()
            if not split:
                t0 = time.time()
                batch_extract(spark, corpus_df.select("url"), corpus_df, st).count()
                return time.time() - t0
            t0 = time.time()
            res = batch_extract(
                spark, corpus_df.select("url"), corpus_df, st, save=False
            ).cache()
            res.count()
            t_probe = time.time() - t0
            t0 = time.time()
            st.merge(res)
            t_merge = time.time() - t0
            res.unpersist()
            return t_probe, t_merge
        finally:
            shutil.rmtree(root, ignore_errors=True)

    sruns = [store_round(pages, int(cpus)) for _ in range(ITERS)]
    timings["batch_pipeline_store"] = round(min(sruns), 3)
    medians["batch_pipeline_store"] = round(_median(sruns), 3)
    t_probe, t_merge = store_round(pages, int(cpus), split=True)
    timings["batch_pipeline_store_probe"] = round(t_probe, 3)
    timings["batch_pipeline_store_merge"] = round(t_merge, 3)

    # one larger corpus level so round-over-round comparisons aren't
    # floor-dominated by the ~55k-row sf0.1 corpus (SPARK_GRAFT_LARGE=0
    # skips it; corpus parquet is generated once and cached on disk)
    large_stats = None
    if os.environ.get("SPARK_GRAFT_LARGE", "1") != "0" and sf_name == "sf0.1":
        lh, lp = 600, 2000
        large_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".bench_data", f"pages_{lh}x{lp}"
        )
        large = ensure_pages(spark, large_path, lh, lp)
        n_large = large.count()
        lruns = []
        for _ in range(4):  # JVM warm-in converges over ~3-4 runs at this size
            t0 = time.time()
            batch_extract(spark, large.select("url"), large, store=None).count()
            lruns.append(time.time() - t0)
        timings["batch_pipeline_large"] = round(min(lruns), 3)
        medians["batch_pipeline_large"] = round(_median(lruns), 3)
        large_stats = {
            "n_pages": n_large,
            "throughput_pages_per_sec": round(n_large / min(lruns), 1),
        }
        # warm-store large level (round-3 verdict #7): merge-on-read measured
        # at a scale where bucket counts matter — 64 buckets at 1.3M pages
        # (the sizing curve the store docstring prescribes; fresh warmed
        # store per iteration, half hits / half miss+merge)
        # >=3 iterations + a probe/merge split, like the small store level
        # (round-4 verdict #6: 2 iterations left a 1.85x min/median spread
        # unattributed on the flagship level)
        lsruns = [store_round(large, 64) for _ in range(3)]
        timings["batch_pipeline_large_store"] = round(min(lsruns), 3)
        medians["batch_pipeline_large_store"] = round(_median(lsruns), 3)
        large_stats["store_throughput_pages_per_sec"] = round(n_large / min(lsruns), 1)
        lt_probe, lt_merge = store_round(large, 64, split=True)
        timings["batch_pipeline_large_store_probe"] = round(lt_probe, 3)
        timings["batch_pipeline_large_store_merge"] = round(lt_merge, 3)

    # min + median of ITERS runs per query (JVM warm-in: measured 19s -> 6s
    # across iterations on the ssjoin; min = steady state, median = honesty)
    qs = E.queries()
    for name in BENCH_QUERIES[1:]:
        fn = qs[name]
        runs = []
        for _ in range(ITERS):
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        medians[name] = round(_median(runs), 3)

    payload = {
        "metric": "batch_extract_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "sf": sf_name,
        "n_pages": n_pages,
        "n_results": n_out,
        "throughput_pages_per_sec": round(n_pages / headline, 1),
        "cpus": int(cpus),
        "iterations_per_query": ITERS,
        "ann_path": "forced (min_corpus_rows=0): LSH/IVF timings measure the ANN code paths, not the gate's brute-force fallback",
    }
    if large_stats:
        payload["large_corpus"] = large_stats
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

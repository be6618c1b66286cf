"""Measure the corpus-size crossover where LSH ANN starts beating exact
brute-force top-k (calibrates ann_topk_lsh's min_corpus_rows gate).

Protocol per sandbox-perf notes: fixed query count (10), synthetic unit-ish
64-d embeddings, ≥3 timed iterations per (method, n) after a warmup, min
taken. Run solo (timings are contention-sensitive):

    python tools/ann_crossover.py [n ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from scrape_spark.operators.similarity import ann_topk, ann_topk_lsh
    from scrape_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 20_000, 50_000, 100_000]
    spark = get_spark("ann_crossover", master="local[32]", shuffle_partitions=32)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def rand_vec(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            out.append(np.random.RandomState(11 + int(i)).standard_normal(64).astype(np.float32))
        return pd.Series(out)

    for n in sizes:
        corpus = (
            spark.range(n)
            .select(F.col("id").alias("vec_id"), rand_vec(F.col("id")).alias("embedding"))
            .cache()
        )
        corpus.count()
        queries = corpus.filter(F.col("vec_id") < 10).cache()
        queries.count()

        results = {}
        for name, fn in (
            ("brute", lambda: ann_topk(corpus, queries, k=5)),
            ("lsh", lambda: ann_topk_lsh(corpus, queries, k=5, min_corpus_rows=0)),
        ):
            times = []
            for it in range(4):  # first iteration is the JVM warm-in, dropped
                t0 = time.time()
                fn().count()
                times.append(time.time() - t0)
            results[name] = min(times[1:])
        corpus.unpersist()
        queries.unpersist()
        print(
            f"n={n:>8}  brute={results['brute']:.2f}s  lsh={results['lsh']:.2f}s  "
            f"ratio={results['lsh'] / results['brute']:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two parallelism levels — local[8] (N) and local[32] (4N) —
on the SAME input, reporting throughput at both plus scaling efficiency
(T_par ratio / core ratio). Each level runs in its own subprocess (a JVM
can't change master mid-process).

    python tools/scaling_bench.py [--pages 50x1000] [--epochs 3]

Writes JSON to stdout and appends a row to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from scrape_spark.session import get_spark
from scrape_spark.plans.batch_extract import batch_extract
from scrape_spark.sources.pages import ensure_pages

cores = int(sys.argv[1])
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
spark = get_spark("scaling", master=f"local[{{cores}}]", shuffle_partitions=cores)
# NOT cached: re-reading zstd parquet (OS-page-cached) measured ~2.5x faster
# than deserializing cached binary rows for this html-heavy corpus
pages = ensure_pages(spark, {corpus!r}, {n_hosts}, {per_host})
n = pages.count()
# full-width warmup: one task per slot so every python worker is forked and
# has imported its libraries before the measured region
batch_extract(
    spark, pages.select("url").limit(50 * cores).repartition(cores), pages, store=None
).count()
# steady-state throughput: iterate until the minimum stops improving
# (plateau of 3) — the JVM warms in slowly (C2 compilation of
# parquet/Arrow paths) and convergence takes a similar NUMBER of
# executions at every width, so a fixed small count gives the wide level
# (short iterations) systematically less total warm-in than the narrow
# one. The plateau rule is symmetric: both levels are measured at their
# steady state, which is what a long-running cluster job sees.
best = None
since_improve = 0
for i in range(12):
    t0 = time.time()
    batch_extract(spark, pages.select("url"), pages, store=None).count()
    dt = time.time() - t0
    if best is None or dt < best * 0.995:
        best = min(best, dt) if best is not None else dt
        since_improve = 0
    else:
        since_improve += 1
    if i >= 4 and since_improve >= 3:
        break
print(json.dumps({{"cores": cores, "seconds": round(best, 3), "pages": n,
                   "throughput": round(n / best, 1)}}))
"""


def run_level(cores: int, corpus: str, n_hosts: int, per_host: int) -> dict:
    code = CHILD.format(repo=REPO, corpus=corpus, n_hosts=n_hosts, per_host=per_host)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores)],
        capture_output=True, text=True, timeout=3600, check=False,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from cores={cores}: {out.stderr[-2000:]}")


def main() -> None:
    n_hosts, per_host = 600, 2000
    for a in sys.argv[1:]:
        if a.startswith("--pages"):
            n_hosts, per_host = map(int, a.split("=", 1)[1].split("x"))
    corpus = os.path.join(REPO, ".bench_data", f"pages_{n_hosts}x{per_host}")

    n_lo = int(os.environ.get("SCALING_N", "4"))
    n_hi = 4 * n_lo
    # alternate levels across rounds and take each level's best run: the
    # subprocess-to-subprocess variance on this host is ±20%, which swamps
    # the 0.8 criterion if each level is sampled once; alternating keeps the
    # protocol symmetric (neither level systematically benefits from running
    # later in a warmer OS page cache)
    rounds = int(os.environ.get("SCALING_ROUNDS", "2"))
    lo = hi = None
    for _ in range(rounds):
        r_lo = run_level(n_lo, corpus, n_hosts, per_host)
        r_hi = run_level(n_hi, corpus, n_hosts, per_host)
        if lo is None or r_lo["throughput"] > lo["throughput"]:
            lo = r_lo
        if hi is None or r_hi["throughput"] > hi["throughput"]:
            hi = r_hi
    eff = (hi["throughput"] / lo["throughput"]) / (n_hi / n_lo)
    result = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_cores": {"N": n_lo, "4N": n_hi},
        "throughput_pages_per_sec": {"N": lo["throughput"], "4N": hi["throughput"]},
        "seconds": {"N": lo["seconds"], "4N": hi["seconds"]},
        "pages": lo["pages"],
        "criterion": "efficiency >= 0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_SCALING_RUNS.md"), "a") as f:
        f.write(
            f"| {lo['pages']} | {lo['throughput']} | {hi['throughput']} | {round(eff,3)} | "
            f"{'PASS' if eff >= 0.8 else 'FAIL'} |\n"
        )


if __name__ == "__main__":
    main()

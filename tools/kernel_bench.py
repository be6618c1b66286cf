"""Extraction/URL-kernel evidence harness (OPTIMIZATION_r06 changes 9-11).

Spark-free — runs the pandas/Arrow kernels directly over the cached bench
corpus, so the measurements and byte-identity claims are reproducible
without a cluster:

    python tools/kernel_bench.py profile            # per-section timings
    python tools/kernel_bench.py identity [REV]     # extract_batch byte-A/B
                                                    # vs a git rev (default
                                                    # HEAD~1) on the corpus
    python tools/kernel_bench.py urlparity          # clean_url/url_key bit
                                                    # parity vs the pure-
                                                    # Python reference

`identity` materializes REV in a temp git worktree, runs BOTH kernels over
the full 54.4k-page sf0.1 corpus, and compares every output column
element-wise (lists included). This is the harness behind the
"byte-identical" claims for the round-6 kernel rewrites.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402


def _corpus():
    files = sorted(glob.glob(os.path.join(REPO, ".bench_data", "pages_50x1000", "*.parquet")))
    if not files:
        sys.exit("bench corpus missing — run bench.py once to generate .bench_data")
    pdf = pq.read_table(files, columns=["url", "html"]).to_pandas()
    return pdf["html"], pdf["url"]


def _timed(name, fn, reps=3):
    best, out = 1e9, None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    print(f"{name:28s} {best:7.3f}s")
    return out


def profile():
    from scrape_spark.operators import extract as X

    html, base = _corpus()
    print(f"pages: {len(html)}")
    X.extract_batch(html, base)  # warm
    _timed("FULL extract_batch", lambda: X.extract_batch(html, base))
    raw = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "").astype(object)
    looks = raw.str.match(r"\s*<").eq(True)
    h = raw.where(looks, "")
    head = _timed(
        "head scope",
        lambda: h.str.extract(
            r"(?is)<head[^>]*>([^<]*(?:<(?!/head>)[^<]*)*)</head>", expand=False
        ).fillna(h),
    )
    _timed("9x _meta tiers", lambda: [
        X._meta(head, a, k)
        for a, k in (
            ("property", "og:url"), ("name", "description"),
            ("property", "og:site_name"), ("name", "author"),
            ("property", "og:image"), ("property", "og:type"),
            ("property", "article:published_time"), ("name", "keywords"),
            ("property", "article:section"),
        )
    ])
    scoped = _timed(
        "article scope",
        lambda: h.str.extract(
            r"(?is)<article[^>]*>([^<]*(?:<(?!/article>)[^<]*)*)</article>",
            expand=False,
        ),
    )
    miss = scoped.isna()
    if miss.any():
        scoped = scoped.copy()
        scoped[miss] = h[miss].str.extract(
            r"(?is)<body[^>]*>([^<]*(?:<(?!/body>)[^<]*)*)</body>", expand=False
        ).fillna(h[miss])
    _timed("_clean_content (arrow)", lambda: X._clean_content(scoped))
    _timed("harvest_links (resolve)", lambda: X.harvest_links(h, base))


def identity(rev: str = "HEAD~1"):
    html, base = _corpus()

    def run(tree):
        sys.path.insert(0, tree)
        for m in [k for k in list(sys.modules) if k.startswith("scrape_spark")]:
            del sys.modules[m]
        from scrape_spark.operators.extract import extract_batch

        t0 = time.time()
        out = extract_batch(html, base)
        dt = time.time() - t0
        sys.path.pop(0)
        return out, dt

    tmp = tempfile.mkdtemp(prefix="kernel_ab_")
    wt = os.path.join(tmp, "wt")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, rev],
        check=True, capture_output=True,
    )
    try:
        new, t_new = run(REPO)
        old, t_old = run(wt)
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            capture_output=True,
        )
    print(f"{rev}: {t_old:.2f}s   worktree(current): {t_new:.2f}s")
    same = True
    for c in old.columns:
        a, b = old[c], new[c]
        if c in ("categories", "tags", "links"):
            eq = all(
                (x == y) or (not isinstance(x, list) and not isinstance(y, list))
                for x, y in zip(a.tolist(), b.tolist())
            )
        else:
            eq = a.where(a.notna(), None).equals(b.where(b.notna(), None))
        if not eq:
            same = False
            print(f"DIFF column: {c}")
    print("IDENTICAL" if same else "NOT IDENTICAL")
    sys.exit(0 if same else 1)


def urlparity():
    from scrape_spark.functions import urlkeys as U

    _, base = _corpus()
    cleaned = U.clean_url_np(base)
    keys = U.url_key_np(cleaned)
    sample = list(range(0, len(base), max(1, len(base) // 500)))
    edges = [
        "https://h.test/a?b=1&utm_source=x#f", "http://u:p@h:8080/x",
        "https://h/", "notaurl", "https://h.test/a?z=2&a=1&a=3", "",
        "https://h.test/ü?é=ß", "ftp://x/y", "https://h.test/a\n",
        "https://h.test/a?utm_source=1&utm_medium=2",
    ]
    for i in sample:
        u = base.iloc[i]
        assert cleaned.iloc[i] == U.clean_url_py(u), u
        assert int(keys[i]) == U.url_key_py(cleaned.iloc[i]), u
    ec = U.clean_url_np(pd.Series(edges, dtype=object))
    ek = U.url_key_np(ec)
    for i, u in enumerate(edges):
        assert ec.iloc[i] == U.clean_url_py(u), u
        assert int(ek[i]) == U.url_key_py(ec.iloc[i]), u
    print(f"parity OK: {len(sample)} corpus URLs + {len(edges)} edge cases, "
          "clean_url and url_key bit-identical to the pure-Python reference")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "profile"
    if cmd == "profile":
        profile()
    elif cmd == "identity":
        identity(sys.argv[2] if len(sys.argv) > 2 else "HEAD~1")
    elif cmd == "urlparity":
        urlparity()
    else:
        sys.exit(f"unknown command: {cmd}")

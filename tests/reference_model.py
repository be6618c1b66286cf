"""Single-threaded pure-Python crawl reference model.

Implements the engine's crawl semantics (robots disallow, crawl-delay
quotas, BFS ordering by (priority, depth, key) within host, seen-set with
error memoization, outlink discovery at depth+1) with plain dicts — no
Spark. The distributed crawl must reproduce, per epoch, the exact selected
set and per-host ranks, and the same final store key set (north rule:
"matching the reference's crawl ordering and URL-seen set under the same
seed list + politeness budget").
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd

from scrape_spark.functions.urlkeys import clean_url_py, hostname_py, url_key_py
from scrape_spark.operators.extract import extract_batch
from scrape_spark.sources.pages import _gen_batch

DEFAULT_CRAWL_DELAY = 1.0


def build_corpus(n_hosts: int, per_host: int) -> dict[str, dict]:
    pdf = _gen_batch(pd.DataFrame({"id": range(n_hosts * per_host)}), n_hosts, per_host)
    ext = extract_batch(pdf["html"], pdf["url"])  # spec v4: resolve vs page URL
    corpus = {}
    for i in range(len(pdf)):
        corpus[pdf["url"].iloc[i]] = {
            "error": ext["extract_error"].iloc[i],
            "links": ext["links"].iloc[i] or [],
            "canonical": ext["canonical_url"].iloc[i],
        }
    return corpus


@dataclass
class ModelState:
    frontier: dict[int, tuple] = field(default_factory=dict)  # key → (url, host, depth, prio, disc)
    seen: set[int] = field(default_factory=set)       # stored canonical keys ∪ attempted
    store_keys: set[int] = field(default_factory=set)  # canonical keys of stored rows
    selected_per_epoch: list[list[tuple]] = field(default_factory=list)


def run_model(
    corpus: dict[str, dict],
    seeds: list[str],
    robots: dict[str, tuple[list[str], float]],
    epoch_seconds: float,
    n_epochs: int,
    max_depth: int = 6,
) -> ModelState:
    st = ModelState()
    for u in seeds:
        cu = clean_url_py(u)
        k = url_key_py(cu)
        st.frontier.setdefault(k, (cu, hostname_py(cu), 0, 0, 0))

    for _epoch in range(n_epochs):
        # robots exclusion
        allowed = {}
        for k, (url, host, depth, prio, disc) in st.frontier.items():
            dis, _delay = robots.get(host, ([], DEFAULT_CRAWL_DELAY))
            path = url.split(host, 1)[1] if host and host in url else url
            if any(path.startswith(p) for p in dis):
                continue  # dropped permanently
            if k in st.seen:
                continue
            allowed[k] = (url, host, depth, prio, disc)

        # politeness quota + rank
        by_host: dict[str, list] = {}
        for k, (url, host, depth, prio, disc) in allowed.items():
            by_host.setdefault(host, []).append((prio, depth, k, url, disc))
        selected: list[tuple] = []
        deferred: dict[int, tuple] = {}
        for host, items in by_host.items():
            _dis, delay = robots.get(host, ([], DEFAULT_CRAWL_DELAY))
            budget = max(1, math.floor(epoch_seconds / (delay or DEFAULT_CRAWL_DELAY)))
            items.sort()
            for rank, (prio, depth, k, url, disc) in enumerate(items, start=1):
                if rank <= budget:
                    selected.append((k, url, host, depth, prio, rank))
                else:
                    deferred[k] = (url, host, depth, prio, disc)
        st.selected_per_epoch.append(sorted(selected))

        # fetch + extract + discover — link filtering uses the PRE-epoch
        # seen-set (the distributed engine computes seen before the merge)
        seen_pre = set(st.seen)
        selected_keys = {s[0] for s in selected}
        new_links: dict[int, tuple] = {}
        for k, url, host, depth, prio, rank in selected:
            page = corpus.get(url)
            if page is None or page["error"]:
                st.seen.add(k)  # attempted (error) — never retried
                continue
            canonical = page["canonical"] or url
            ck = url_key_py(canonical)
            st.store_keys.add(ck)
            st.seen.add(ck)
            st.seen.add(k)
            if depth + 1 > max_depth:
                continue
            for raw in page["links"]:
                cu = clean_url_py(raw)
                lk = url_key_py(cu)
                if lk in seen_pre or lk in deferred or lk in selected_keys:
                    continue
                prev = new_links.get(lk)
                if prev is None or depth + 1 < prev[2]:
                    new_links[lk] = (cu, hostname_py(cu), depth + 1, depth + 1, _epoch + 1)

        nxt = dict(deferred)
        for lk, row in new_links.items():
            if lk not in nxt or (row[2], row[3]) < (nxt[lk][2], nxt[lk][3]):
                nxt[lk] = row
        st.frontier = {k: v for k, v in nxt.items() if v[2] <= max_depth}
        if not selected and not st.frontier:
            break
    return st

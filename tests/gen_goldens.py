"""Regenerate the committed extraction goldens (tests/goldens/).

Run deliberately and only when EXTRACT_SPEC_VERSION is bumped:
    python tests/gen_goldens.py
Mirrors the reference's golden-regeneration tool
(internal/testdata/testdata.go:31-91): fixed corpus in, committed JSON out;
the test suite then asserts byte-identical extraction per url.

Pure pandas (no Spark) — the generator and extractor kernels are plain
batch functions, which is itself the determinism guarantee: the Spark path
must reproduce these bytes under any partitioning.
"""

from __future__ import annotations

import json
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrape_spark.operators.extract import EXTRACT_SPEC_VERSION, extract_batch
from scrape_spark.sources.pages import _gen_batch

GOLDEN_HOSTS = 6
GOLDEN_PER_HOST = 40
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens", "extract_golden.json")


def build_golden() -> dict:
    corpus = _gen_batch(
        pd.DataFrame({"id": range(GOLDEN_HOSTS * GOLDEN_PER_HOST)}),
        GOLDEN_HOSTS,
        GOLDEN_PER_HOST,
    )
    ext = extract_batch(corpus["html"])
    recs = {}
    for i in range(len(corpus)):
        row = ext.iloc[i]
        recs[corpus["url"].iloc[i]] = {
            "canonical_url": row.canonical_url,
            "title": row.title,
            "description": row.description,
            "sitename": row.sitename,
            "author": row.author,
            "date": row.date.isoformat() if pd.notna(row.date) else None,
            "categories": row.categories,
            "tags": row.tags,
            "language": row.language,
            "image": row.image,
            "page_type": row.page_type,
            "license": row.license,
            "content_text": row.content_text,
            "links": row.links,
            "extract_error": row.extract_error,
        }
    return {
        "spec_version": EXTRACT_SPEC_VERSION,
        "n_hosts": GOLDEN_HOSTS,
        "per_host": GOLDEN_PER_HOST,
        "pages": recs,
    }


if __name__ == "__main__":
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    golden = build_golden()
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(golden, f, ensure_ascii=False, indent=1, sort_keys=True)
    print(f"wrote {OUT}: {len(golden['pages'])} pages, spec v{golden['spec_version']}")

"""Package the engine for `spark-submit --py-files` (the north-rule launch
path: `spark-submit --py-files dist/scrape_spark.zip tools/submit_entry.py
crawl ...` on a multi-executor cluster).

Builds `dist/scrape_spark.zip` containing the `scrape_spark` package only —
no tests, no tools, no caches. The zip is deterministic (sorted member
order, fixed timestamps) so repeated builds of the same tree are
byte-identical: a cluster deploy can content-address it and executors'
py-files caches never see spurious invalidations.

Usage:
    python tools/make_pyfiles.py [out_zip]        # default dist/scrape_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

_FIXED_DATE = (1980, 1, 1, 0, 0, 0)  # zip epoch: determinism, not history


def build(out_zip: str | None = None, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "scrape_spark")
    out = out_zip or os.path.join(root, "dist", "scrape_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)

    members: list[tuple[str, str]] = []  # (arcname, path)
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            members.append((os.path.relpath(path, root), path))

    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_DEFLATED) as z:
        for arcname, path in sorted(members):
            with open(path, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=_FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    os.replace(tmp, out)
    return out


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)

"""The north-rule launch path: `spark-submit --py-files dist/scrape_spark.zip
tools/submit_entry.py ...` — the packaged zip plus entry script must run the
CLI end-to-end in a fresh JVM whose sys.path holds ONLY the zip (spark-submit
puts the script's own directory on the path, not the repo root, so a passing
run proves the zip is complete and self-contained)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    from shutil import which

    found = which("spark-submit")
    if not found:
        pytest.skip("no spark-submit on this host")
    return found


def test_pyfiles_zip_is_deterministic_and_complete(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    z1 = make_pyfiles.build(str(tmp_path / "a.zip"))
    z2 = make_pyfiles.build(str(tmp_path / "b.zip"))
    b1, b2 = open(z1, "rb").read(), open(z2, "rb").read()
    assert b1 == b2  # deterministic: content-addressable deploys
    import zipfile

    names = set(zipfile.ZipFile(z1).namelist())
    assert "scrape_spark/cli.py" in names
    assert "scrape_spark/operators/store.py" in names
    assert not any(n.startswith("tests/") or "__pycache__" in n for n in names)


def test_spark_submit_runs_cli_from_zip(spark, tmp_path):
    from scrape_spark.sources.pages import page_url, synth_pages

    corpus = str(tmp_path / "pages")
    synth_pages(spark, n_hosts=2, per_host=4).write.mode("overwrite").parquet(corpus)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    zip_path = make_pyfiles.build(str(tmp_path / "scrape_spark.zip"))

    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_entry.py"),
            "extract", "--pages", corpus, page_url(0, 1),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),  # not the repo root: the zip must supply the package
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    rows = json.loads(proc.stdout)
    assert len(rows) == 1 and rows[0]["original_url"] == page_url(0, 1)
    assert rows[0]["content_text"]

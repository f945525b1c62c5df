"""Packaging smoke: the north-star deployment contract is `spark-submit
--py-files wss.zip jobs/run_crawl.py` (reference: scraper_service.py's
supervised entrypoint; here the cluster manager supervises). This test
proves the package really is self-contained: it zips web_scraper_spark,
copies ONLY the entrypoint into an empty directory, and runs spark-submit
there — the engine code can resolve solely through --py-files, and the
master comes from spark-submit (session.get_spark must not override it).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAGES, VPP = 4, 6  # 24 detail URLs — small but multi-batch at batch_size 10


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    cand = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_py_files_demo(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on PATH")

    zpath = tmp_path / "wss.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "web_scraper_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    shutil.copy(os.path.join(REPO, "jobs", "run_crawl.py"), tmp_path / "run_crawl.py")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source of the package
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    out = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--py-files", str(zpath),
            "run_crawl.py",
            "--state", str(tmp_path / "state"),
            "--demo",
            "--pages", str(PAGES),
            "--vpp", str(VPP),
            "--batch-size", "10",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stderr[-4000:]}"
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON output:\n{out.stdout[-2000:]}"
    final = json.loads(lines[-1])
    assert final["done"] is True
    # the submitted master must win over get_spark's local[$SPARK_GRAFT_CPUS]
    # fallback (a plain SparkConf() read before the gateway attaches is empty
    # — session._submitted_conf attaches first; this catches a regression)
    assert final["master"] == "local[4]", final["master"]
    # robots excludes a deterministic subset (cold3 disallows /video/; the
    # hot host blocks one item) — exact counts are pinned by the e2e suites,
    # here the claim is the packaged job runs the full crawl end-to-end
    assert 0 < final["trace_rows"] <= PAGES * VPP
    assert final["seen"] == final["trace_rows"]
    assert final["batches"] >= 2

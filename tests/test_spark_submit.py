"""Ship-path test: the pipeline runs via ``spark-submit --py-files
engine.zip`` from a directory that does NOT contain the package (so the
import must come from the shipped zip) — the north rule's deployment shape.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_engine(dest: str) -> str:
    zip_path = os.path.join(dest, "engine.zip")
    pkg = os.path.join(REPO, "mistral_ocr_spark")
    with zipfile.ZipFile(zip_path, "w") as z:
        for dirpath, _dirs, names in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for n in names:
                if n.endswith(".py"):
                    full = os.path.join(dirpath, n)
                    z.write(full, os.path.relpath(full, REPO))
    return zip_path


def _find_spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    # not on PATH in this container — fall back to SPARK_HOME / the
    # standard install prefix so the ship-path test actually runs
    for base in (os.environ.get("SPARK_HOME"), "/opt/spark"):
        if base:
            cand = os.path.join(base, "bin", "spark-submit")
            if os.access(cand, os.X_OK):
                return cand
    return None


def test_spark_submit_pyfiles():
    spark_submit = _find_spark_submit()
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit not found")
    tmp = tempfile.mkdtemp(prefix="ocr_submit_")
    try:
        zip_path = _zip_engine(tmp)
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        out = subprocess.run(
            [
                spark_submit,
                "--master",
                "local[4]",
                "--conf",
                "spark.sql.shuffle.partitions=8",
                "--conf",
                "spark.ui.enabled=false",
                "--py-files",
                zip_path,
                os.path.join(REPO, "scripts", "run_pipeline.py"),
                "--generate",
                "300",
                "--table",
                os.path.join(tmp, "tbl"),
                "--chunks",
                "2",
            ],
            cwd=tmp,  # not the repo: package must come from the zip
            env=env,
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        stats = json.loads(out.stdout.strip().splitlines()[-1])
        assert stats["docs"] == 300 and stats["chunks_done"] == 2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

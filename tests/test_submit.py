"""spark-submit --py-files packaging (north rule: the pipeline 'ships as a
spark-submit --py-files package ... run via spark-submit on a
multi-executor cluster').

The test builds dist/sqllog_analysis_spark.zip, then runs the REAL
``spark-submit`` binary from a temp directory OUTSIDE the repo with a
clean PYTHONPATH — so the package import provably resolves from the
--py-files zip, exactly as it would on a cluster — and checks the CLI
contract end-to-end (JSON summary, sink outputs, exit 0).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "sqllog_analysis_spark.zip"))

    # input corpus, written without importing the package into THIS process's
    # namespace mattering (the subprocess is the system under test)
    from sqllog_analysis_spark.sources.transcripts import write_transcripts

    inp = str(tmp_path / "transcripts.parquet")
    write_transcripts(inp, 500, seed=21)
    out = str(tmp_path / "out")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "submit_main.py"),
            "--input", inp,
            "--output", out,
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["turns_processed"] == 500
    assert summary["records_routed"] > 0
    assert set(summary["per_sink"]) <= {"chat", "error", "slow_query", "tool_call"}
    assert os.path.exists(os.path.join(out, "records", "_SUCCESS"))
    assert os.path.isdir(os.path.join(out, "_manifest"))


def test_pyfiles_zip_is_deterministic_and_package_only(tmp_path):
    sys.path.insert(0, REPO)
    import zipfile

    from tools.make_pyfiles import build

    p1 = build(str(tmp_path / "a.zip"))
    p2 = build(str(tmp_path / "b.zip"))
    assert open(p1, "rb").read() == open(p2, "rb").read()  # reproducible
    names = zipfile.ZipFile(p1).namelist()
    assert all(n.startswith("sqllog_analysis_spark/") for n in names)
    assert "sqllog_analysis_spark/__main__.py" in names
    assert not any("__pycache__" in n or n.startswith("tests") for n in names)

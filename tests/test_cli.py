"""CLI contract tests (__main__.py ≙ reference src/main.rs / app.rs)."""

from __future__ import annotations

import os

from sqllog_analysis_spark.__main__ import main
from sqllog_analysis_spark.sources.transcripts import write_transcripts


def test_invalid_config_exits_2(tmp_path):
    rc = main(["--input", "x", "--output", str(tmp_path), "--slow-ms", "0"])
    assert rc == 2  # config validation (config.rs:298-308)


def test_missing_input_warns_returns_0(tmp_path):
    rc = main(["--input", str(tmp_path / "nope.parquet"), "--output", str(tmp_path / "o")])
    assert rc == 0  # empty input: warn and return (app.rs:110-113)


def test_cli_end_to_end_with_export(spark, tmp_path, capsys):
    inp = str(tmp_path / "t.parquet")
    out = str(tmp_path / "out")
    write_transcripts(inp, 400, seed=13)
    rc = main(["--input", inp, "--output", out, "--export", "csv"])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "records"))
    assert os.path.isdir(os.path.join(out, "export"))
    assert "turns_processed" in capsys.readouterr().out

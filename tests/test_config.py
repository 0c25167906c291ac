"""Config discovery & precedence tests — the graft of
reference tests/config_tests.rs:4-26 plus the discovery rules of
src/config.rs:182-219 and the validation rules of config.rs:298-308.
"""

from __future__ import annotations

import os

import pytest

from sqllog_analysis_spark.config import (
    AppConfig,
    ConfigError,
    find_config_path,
    load_config,
)
from sqllog_analysis_spark.__main__ import main
from sqllog_analysis_spark.sources.transcripts import write_transcripts


def test_defaults_when_no_config(tmp_path):
    cfg = load_config(env={}, cwd=str(tmp_path), config_home=str(tmp_path / "xdg"))
    assert cfg == AppConfig()  # config_tests.rs:4-15 default resolution
    assert cfg.slow_ms == 1000 and cfg.bucket == "hour" and not cfg.in_memory


def test_env_tier_wins(tmp_path):
    envp = tmp_path / "from_env.toml"
    envp.write_text("[pipeline]\nslow_ms = 77\n")
    (tmp_path / "config.toml").write_text("[pipeline]\nslow_ms = 88\n")
    cfg = load_config(
        env={"SQLLOG_CONFIG": str(envp)}, cwd=str(tmp_path), config_home=str(tmp_path)
    )
    assert cfg.slow_ms == 77 and cfg.config_path == str(envp)


def test_cwd_tier(tmp_path):
    (tmp_path / "config.toml").write_text("[pipeline]\nslow_ms = 88\nbucket = 'day'\n")
    cfg = load_config(env={}, cwd=str(tmp_path), config_home=str(tmp_path / "xdg"))
    assert cfg.slow_ms == 88 and cfg.bucket == "day"


def test_user_dir_tier(tmp_path):
    home = tmp_path / "confighome"
    d = home / "sqllog-analysis"
    d.mkdir(parents=True)
    (d / "config.toml").write_text("[warehouse]\nin_memory = true\n")
    cfg = load_config(env={}, cwd=str(tmp_path), config_home=str(home))
    assert cfg.in_memory is True


def test_env_path_unreadable_falls_back_to_defaults(tmp_path, capsys):
    # config.rs:216-218: read failure is a WARNING + defaults, not exit 2
    cfg = load_config(
        env={"SQLLOG_CONFIG": str(tmp_path / "missing.toml")},
        cwd=str(tmp_path),
        config_home=str(tmp_path),
    )
    assert cfg == AppConfig()


def test_malformed_toml_raises(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text("[pipeline\nslow_ms = ")
    with pytest.raises(ConfigError):
        load_config(path=str(p))


def test_export_file_size_zero_invalid(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text("[export]\nfile_size_bytes = 0\n")
    with pytest.raises(ConfigError):  # config.rs:298-308
        load_config(path=str(p))


def test_export_file_size_negative_invalid(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text("[export]\nfile_size_bytes = -5\n")
    with pytest.raises(ConfigError):
        load_config(path=str(p))


def test_bool_slow_ms_invalid(tmp_path):
    # Python bool is an int subclass; `slow_ms = true` must not pass as 1
    p = tmp_path / "c.toml"
    p.write_text("[pipeline]\nslow_ms = true\n")
    with pytest.raises(ConfigError):
        load_config(path=str(p))


def test_discovery_order_function(tmp_path):
    assert find_config_path(env={}, cwd=str(tmp_path), config_home=str(tmp_path)) is None
    (tmp_path / "config.toml").write_text("")
    assert find_config_path(env={}, cwd=str(tmp_path), config_home=str(tmp_path)) == str(
        tmp_path / "config.toml"
    )
    assert find_config_path(
        env={"SQLLOG_CONFIG": "/elsewhere.toml"}, cwd=str(tmp_path), config_home=str(tmp_path)
    ) == "/elsewhere.toml"


def test_cli_malformed_config_exits_2(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text("not [valid toml")
    rc = main(["--config", str(p), "--input", "x", "--output", "y"])
    assert rc == 2


def test_cli_flags_override_config_file(spark, tmp_path, capsys):
    inp = str(tmp_path / "t.parquet")
    write_transcripts(inp, 300, seed=3)
    p = tmp_path / "c.toml"
    p.write_text(
        f"[pipeline]\ninput = '{inp}'\noutput = '{tmp_path / 'cfg_out'}'\nslow_ms = 5\n"
    )
    out = str(tmp_path / "cli_out")
    rc = main(["--config", str(p), "--output", out])  # output overridden, input from file
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "records"))
    assert not os.path.isdir(str(tmp_path / "cfg_out"))
    assert str(p) in capsys.readouterr().out  # summary reports the config used


def test_in_memory_mode_persists_nothing(spark, tmp_path, capsys):
    """C4 (duckdb_impl.rs:66-84): ephemeral warehouse — the run succeeds,
    the summary is printed, and nothing remains on disk; export is skipped
    with the reference's documented caveat."""
    inp = str(tmp_path / "t.parquet")
    write_transcripts(inp, 300, seed=4)
    rc = main(["--input", inp, "--output", str(tmp_path / "never"), "--in-memory",
               "--export", "csv"])
    assert rc == 0
    outerr = capsys.readouterr()
    assert '"in_memory": true' in outerr.out
    assert "export skipped" in outerr.err
    assert not os.path.exists(str(tmp_path / "never"))

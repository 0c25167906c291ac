"""Config discovery & precedence — parity with the reference's config
subsystem (src/config.rs:182-219 discovery, 222-357 defaults/validation,
pinned by tests/config_tests.rs:4-26).

Resolution order (find_config_path, mirrors config.rs:181-199):

  1. ``$SQLLOG_CONFIG``   — used unconditionally if set; an unreadable
                            path logs a warning and falls back to DEFAULTS
                            (config.rs:216-218 read-failure branch)
  2. ``./config.toml``    — if it exists
  3. ``<config dir>/sqllog-analysis/config.toml`` — if it exists

Missing everywhere ⇒ defaults.  MALFORMED TOML ⇒ exit 2 (config.rs:211
"保持历史行为").  Invalid values (slow_ms ≤ 0; export.file_size_bytes == 0,
config.rs:298-308) ⇒ exit 2.

File format (all keys optional):

    [pipeline]
    input = "transcripts.parquet"   # transcripts parquet path
    output = "out"                  # sink directory
    slow_ms = 1000
    bucket = "hour"                 # minute|hour|day

    [warehouse]
    in_memory = false               # C4: ephemeral warehouse — results are
                                    # NOT persisted (duckdb_impl.rs:66-84 /
                                    # config.toml.example:29-34 caveat)

    [export]
    enabled = false
    format = "csv"                  # csv|json (ExportFormat, types.rs:21-61)
    file_size_bytes = 104857600     # 0 is invalid → exit 2

    [spark]
    cores = 8                       # local[N]; omitted → local[*]

CLI flags override file values; file values override defaults.
"""

from __future__ import annotations

import os
import sys
import tomllib
from dataclasses import dataclass


class ConfigError(Exception):
    """Malformed config or invalid value — callers exit 2."""


@dataclass
class AppConfig:
    input: str = "transcripts.parquet"
    # 'transcripts' = parquet table (the graft input); 'raw' = a directory
    # of dmsql_*.log files read via the splittable chunk reader — the
    # reference CLI's native input (src/app.rs:105-124)
    input_format: str = "transcripts"
    output: str = "out"
    slow_ms: int = 1000
    bucket: str = "hour"
    in_memory: bool = False
    export_enabled: bool = False
    export_format: str = "csv"
    export_file_size_bytes: int | None = None
    cores: int | None = None
    log_enabled: bool = False  # deviation: app logging is opt-in (Spark has
    #   its own JVM logging); the reference always initializes its logger
    log_file: str | None = None  # None → <cwd>/logs/sqllog-analysis-<date>.log
    log_level: str = "INFO"
    log_stdout: bool = False
    config_path: str | None = None  # where it came from (None = defaults)


def find_config_path(
    env: dict | None = None,
    cwd: str | None = None,
    config_home: str | None = None,
) -> str | None:
    """config.rs:181-199 discovery.  The env path is returned WITHOUT an
    existence check (an unreadable env path warns + defaults at load time);
    the cwd / config-dir tiers require the file to exist."""
    env = env if env is not None else os.environ
    p = env.get("SQLLOG_CONFIG")
    if p:
        return p
    cwd = cwd or os.getcwd()
    local = os.path.join(cwd, "config.toml")
    if os.path.exists(local):
        return local
    config_home = config_home or os.path.join(
        env.get("XDG_CONFIG_HOME", os.path.expanduser("~/.config"))
    )
    user = os.path.join(config_home, "sqllog-analysis", "config.toml")
    if os.path.exists(user):
        return user
    return None


def load_config(
    path: str | None = None,
    env: dict | None = None,
    cwd: str | None = None,
    config_home: str | None = None,
) -> AppConfig:
    """Discover (unless ``path`` given), parse, validate, merge defaults.

    Raises ConfigError for malformed TOML or invalid values (exit 2 at the
    CLI).  An unreadable file is a warning + defaults (config.rs:216-218).
    """
    if path is None:
        path = find_config_path(env, cwd, config_home)
    cfg = AppConfig()
    if path is None:
        return cfg
    try:
        with open(path, "rb") as f:
            data = tomllib.load(f)
    except OSError as e:
        print(f"warning: cannot read config {path}: {e}", file=sys.stderr)
        return cfg
    except tomllib.TOMLDecodeError as e:
        raise ConfigError(f"malformed config {path}: {e}") from e

    cfg.config_path = path
    pipe = data.get("pipeline", {})
    cfg.input = pipe.get("input", cfg.input)
    cfg.input_format = str(pipe.get("input_format", cfg.input_format)).lower()
    cfg.output = pipe.get("output", cfg.output)
    cfg.slow_ms = pipe.get("slow_ms", cfg.slow_ms)
    cfg.bucket = pipe.get("bucket", cfg.bucket)
    cfg.in_memory = data.get("warehouse", {}).get("in_memory", cfg.in_memory)
    exp = data.get("export", {})
    cfg.export_enabled = exp.get("enabled", cfg.export_enabled)
    cfg.export_format = str(exp.get("format", cfg.export_format)).lower()
    cfg.export_file_size_bytes = exp.get("file_size_bytes")
    cfg.cores = data.get("spark", {}).get("cores", cfg.cores)
    log = data.get("log", {})
    cfg.log_enabled = log.get("enabled", cfg.log_enabled)
    cfg.log_file = log.get("file", cfg.log_file)
    cfg.log_level = str(log.get("level", cfg.log_level)).upper()
    cfg.log_stdout = log.get("stdout", cfg.log_stdout)

    validate(cfg)
    return cfg


def validate(cfg: AppConfig) -> None:
    # bool is an int subclass in Python — `slow_ms = true` in TOML must not
    # sneak through as 1
    if (
        isinstance(cfg.slow_ms, bool)
        or not isinstance(cfg.slow_ms, int)
        or cfg.slow_ms <= 0
    ):
        raise ConfigError("invalid slow_ms: must be a positive integer")
    if cfg.bucket not in ("minute", "hour", "day"):
        raise ConfigError(f"invalid bucket: {cfg.bucket!r}")
    if cfg.input_format not in ("transcripts", "raw"):
        raise ConfigError(f"invalid input_format: {cfg.input_format!r}")
    if cfg.export_file_size_bytes is not None and (
        isinstance(cfg.export_file_size_bytes, bool)
        or not isinstance(cfg.export_file_size_bytes, int)
        or cfg.export_file_size_bytes <= 0
    ):
        # config.rs:298-308 rule, extended: any non-positive size is invalid
        raise ConfigError(
            "export.file_size_bytes 不能为 0；请设置为正整数或删除该项以表示无上限"
        )
    if cfg.export_format not in ("csv", "json"):
        raise ConfigError(f"unsupported export format: {cfg.export_format}")

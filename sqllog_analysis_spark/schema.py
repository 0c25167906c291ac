"""Canonical schemas — the single source of truth the reference spreads
across three places (regex groups ``src/sqllog/parser.rs:79``, struct
``src/sqllog/types.rs:44-74``, DDL ``src/database/duckdb_impl.rs:98-115``).

Every stage (parse UDF, sinks, tests, oracle comparison) imports from here.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: transcripts table (BASELINE.json input_hint)
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Parsed record: the 14 Sqllog fields (types.rs:44-74)
# ---------------------------------------------------------------------------
SQLLOG_FIELDS = [
    T.StructField("occurrence_time", T.StringType(), True),
    T.StructField("ep", T.IntegerType(), True),
    T.StructField("session", T.StringType(), True),
    T.StructField("thread", T.StringType(), True),
    T.StructField("user", T.StringType(), True),
    T.StructField("trx_id", T.StringType(), True),
    T.StructField("statement", T.StringType(), True),
    T.StructField("appname", T.StringType(), True),
    T.StructField("ip", T.StringType(), True),
    T.StructField("sql_type", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("execute_time", T.LongType(), True),
    T.StructField("rowcount", T.LongType(), True),
    T.StructField("execute_id", T.LongType(), True),
]

# ---------------------------------------------------------------------------
# Parser output: one row per flushed segment (record OR error) per turn.
# ``rec_idx`` orders multiple segments within one turn deterministically.
# ``has_ts`` is the turn-level has_first_row flag (io.rs:147-167 needs the
# conversation-level max of it for the degenerate-input rule).
# ---------------------------------------------------------------------------
PARSED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("rec_idx", T.IntegerType(), False),
        *SQLLOG_FIELDS,
        T.StructField("error", T.StringType(), True),
        T.StructField("error_class", T.StringType(), True),
        T.StructField("error_line", T.LongType(), True),
        T.StructField("raw", T.StringType(), True),
        T.StructField("has_ts", T.BooleanType(), False),
    ]
)

# parse_errors sink mirrors error_writer.rs:147-152 {path, line, error, raw}
ERROR_SINK_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), True),
        T.StructField("line", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("raw", T.StringType(), True),
    ]
)

# Enrich lookup dim (FIXTURES.md §3)
DIM_SCHEMA = T.StructType(
    [
        T.StructField("role", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("category_hint", T.StringType(), True),
        T.StructField("cost_weight", T.DoubleType(), True),
    ]
)

CATEGORIES = ("slow_query", "error", "tool_call", "chat")

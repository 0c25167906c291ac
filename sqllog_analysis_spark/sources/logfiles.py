"""Raw Dameng SQL-log file ingestion — the reference's native input mode.

Discovery parity with src/app.rs:82-102: non-recursive directory listing,
keep regular files whose name starts with ``dmsql_`` AND whose extension is
``.log`` case-insensitively.

Each file becomes ONE transcripts-shaped row (conv_id = file name,
turn_idx = 0, text = whole decoded content): the oracle state machine
already stitches multi-segment text (parser.rs:338-367), so feeding the
standard pipeline reproduces the reference's per-file semantics exactly —
segment-relative error line numbers, the per-file degenerate "无有效日志行"
rule (io.rs:147-167), UTF-8 repair — with one task per file, which is also
the reference's unit of parallelism.

Scale note: this mode exists for drop-in compatibility with existing
dmsql_*.log directories.  The scale path is the pre-segmented transcripts
table (turn-per-row), where parallelism is per-turn, not per-file; a GB
file in this mode is one task, exactly like the reference's one-thread
stream parse (io.rs:181-199), minus its O(1)-memory property.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def discover_sqllog_files(directory: str) -> list[str]:
    """app.rs:82-102: non-recursive, prefix ``dmsql_``, ci-extension .log."""
    if not os.path.isdir(directory):
        return []
    out = []
    for name in sorted(os.listdir(directory)):
        p = os.path.join(directory, name)
        root, ext = os.path.splitext(name)
        if os.path.isfile(p) and name.startswith("dmsql_") and ext.lower() == ".log":
            out.append(p)
    return out


def read_sqllog_dir(spark: SparkSession, directory: str) -> DataFrame:
    """Directory of dmsql_*.log → transcripts-shaped DataFrame
    (conv_id string, turn_idx int, role, text, tool, ts)."""
    files = discover_sqllog_files(directory)
    if not files:
        # empty-input parity: warn-and-return semantics live in the caller
        # (app.rs:110-113); here we return an empty, correctly-typed frame
        from sqllog_analysis_spark.schema import TRANSCRIPT_SCHEMA

        return spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)
    # empty files produce nothing at all — not even a degenerate-input
    # error (io.rs:104-107 early return; test sqllog_tests.rs:86-94)
    raw = spark.read.format("binaryFile").load(files).filter(F.length("content") > 0)
    return raw.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("conv_id"),
        F.lit(0).alias("turn_idx").cast("int"),
        F.lit("log").alias("role"),
        # lossy UTF-8 decode (replacement chars), like the reference's
        # String::from_utf8_lossy (utils.rs:141) — the parse pipeline's
        # U+FFFD repair path then handles invalid sequences
        F.decode(F.col("content"), "UTF-8").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("modificationTime").cast("timestamp").alias("ts"),
    )

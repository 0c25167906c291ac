"""Fan-out sink writes (SURVEY.md §2.4 K1-K9, Spark-native).

- Category sinks: ONE parquet write partitioned by (category, dt) — the
  physical fan-out happens inside the write, so the routed DataFrame is
  scanned once, not once per category (the reference's per-file temp-DB +
  merge dance, duckdb_impl.rs:349-596, collapses into task-isolated
  partition files + an atomic directory commit).
- parse_errors: JSONL with the reference's {path, line, error, raw} shape
  (error_writer.rs:147-152).
- Exports: CSV / JSON of any sink table (duckdb_impl.rs:292-317), format
  string dispatched like ExportFormat (database/types.rs:21-61).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_category_sinks(routed: DataFrame, out_dir: str) -> None:
    """One pass, partitioned fan-out: <out_dir>/category=<c>/dt=<d>/*.parquet.

    Rows are sorted WITHIN each task partition by (session, thread, trx_id)
    before the write — the Spark analog of the reference's deferred indexes
    on exactly those columns (duckdb_impl.rs:124-136, 663-667): parquet
    row-group min/max stats on a sorted column give data skipping for
    point/range lookups, with no shuffle added (the sort is task-local)."""
    (
        routed.withColumn("dt", F.to_date("ts"))
        # partition columns lead the sort so the file writer's required
        # ordering (category, dt) is already satisfied and it does NOT
        # inject its own sort on top (which would discard ours)
        .sortWithinPartitions("category", "dt", "session", "thread", "trx_id")
        .write.mode("overwrite")
        .partitionBy("category", "dt")
        .parquet(os.path.join(out_dir, "records"))
    )


def write_error_sink(errors: DataFrame, out_dir: str) -> None:
    """JSONL parse_errors sink (K6)."""
    errors.write.mode("overwrite").json(os.path.join(out_dir, "parse_errors"))


def write_aggregates(sink_counts: DataFrame, conv_buckets: DataFrame, out_dir: str) -> None:
    sink_counts.write.mode("overwrite").parquet(os.path.join(out_dir, "sink_counts"))
    conv_buckets.write.mode("overwrite").parquet(os.path.join(out_dir, "conv_buckets"))


def export_table(df: DataFrame, fmt: str, path: str) -> None:
    """CSV/JSON export dispatch (K7-K9). Case-insensitive like
    ExportFormat::FromStr; unknown format raises ValueError."""
    f = fmt.strip().lower()
    if f == "csv":
        df.write.mode("overwrite").option("header", True).csv(path)
    elif f == "json":
        df.write.mode("overwrite").json(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")


def read_sink(spark: SparkSession, out_dir: str, category: str | None = None) -> DataFrame:
    df = spark.read.parquet(os.path.join(out_dir, "records"))
    return df.filter(F.col("category") == category) if category else df

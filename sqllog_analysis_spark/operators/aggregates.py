"""Per-sink aggregates (SURVEY.md §2.5).

The reference's analytics are COUNT(*) (duckdb_impl.rs:619-626) plus
pipeline summary stats (duckdb_impl.rs:676-683); the graft generalizes to
per-category counts and per-(conversation, time-bucket) rollups — all
plain groupBy/agg so Catalyst's partial (map-side) aggregation applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sink_counts(routed: DataFrame) -> DataFrame:
    """category, n — the reference CLI's per-sink analysis summary."""
    return routed.groupBy("category").agg(F.count("*").alias("n"))


def conv_buckets(routed: DataFrame, bucket: str = "hour") -> DataFrame:
    """Per (category, conv_id, time-bucket) rollup with exec-time stats.

    Keys are fine-grained (conv × hour) so the shuffle distributes evenly
    even with mega-conversations; the map-side combine collapses most rows
    before the exchange.
    """
    return (
        routed.groupBy("category", "conv_id", F.date_trunc(bucket, "ts").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("execute_time").alias("sum_exec_ms"),
            F.max("execute_time").alias("max_exec_ms"),
            F.sum(F.col("cost_weight")).alias("sum_cost"),
        )
    )


def summary(
    n_turns: int, routed_counts: dict[str, int], n_errors: int
) -> dict:
    """Global pipeline summary — the graft's IndependentDatabaseStats
    (duckdb_impl.rs:676-683): plain dict, computed from already-aggregated
    numbers (no extra job)."""
    return {
        "turns_processed": n_turns,
        "records_routed": sum(routed_counts.values()),
        "per_sink": routed_counts,
        "parse_errors": n_errors,
    }

"""Structured Streaming variant of the parse → route pipeline.

The reference is batch-only (SURVEY.md §2.10); its `stream_parse`
(io.rs:82) is streaming only in the bounded-memory sense.  This module
shows the same operator graph under ``readStream`` so the engine extends
to continuous ingestion: the vectorized parse (mapInPandas) and the
routing when-chain are streaming-safe as-is; aggregates become
watermarked event-time windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sqllog_analysis_spark.functions.parse import parse_transcripts
from sqllog_analysis_spark.operators.routing import route_records
from sqllog_analysis_spark.schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def streaming_routed(stream: DataFrame, slow_ms: int = 1000) -> DataFrame:
    """Parse + route a transcript stream (append-mode safe)."""
    return route_records(parse_transcripts(stream), slow_ms=slow_ms)


def streaming_sink_counts(
    routed: DataFrame, watermark: str = "1 hour", window: str = "10 minutes"
) -> DataFrame:
    """Event-time windowed per-category counts with late-data handling."""
    return (
        routed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "category")
        .agg(F.count("*").alias("n"))
    )


def run_stream_to_memory(
    spark: SparkSession, path: str, query_name: str = "routed_counts"
):
    """Drive the stream synchronously to completion against a static
    directory (test/demo harness): memory sink + processAllAvailable."""
    routed = streaming_routed(read_transcript_stream(spark, path))
    counts = streaming_sink_counts(routed)
    # complete mode so windows are visible without advancing the watermark
    # past end-of-data (static-directory test harness)
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")

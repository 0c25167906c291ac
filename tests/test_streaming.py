"""Structured Streaming variant: same parse + route semantics under
readStream (batch parity checked against the batch pipeline)."""

from __future__ import annotations

import pytest

from sqllog_analysis_spark.sources.transcripts import write_transcripts
from sqllog_analysis_spark.streaming.stream_pipeline import run_stream_to_memory


@pytest.mark.slow
def test_stream_counts_match_batch(spark, tmp_path):
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sqllog_analysis_spark.functions.parse import parse_transcripts
    from sqllog_analysis_spark.operators.routing import route_records
    from sqllog_analysis_spark.schema import TRANSCRIPT_SCHEMA

    d = tmp_path / "stream_in"
    d.mkdir()
    write_transcripts(str(d / "part0.parquet"), 600, seed=9)

    out = run_stream_to_memory(spark, str(d), query_name="t_stream")
    got = {
        r["category"]: r["n"]
        for r in out.groupBy("category").agg(F.sum("n").alias("n")).collect()
    }

    # streaming variant has no conversation-level degenerate pass (needs
    # global state); compare against the pre-degenerate batch routed set
    pdf = pq.read_table(str(d / "part0.parquet")).to_pandas()
    sdf = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    routed = route_records(parse_transcripts(sdf))
    want = {
        r["category"]: r["n"]
        for r in routed.groupBy("category").agg(F.count("*").alias("n")).collect()
    }
    assert got == want

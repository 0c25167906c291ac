"""End-to-end parse → enrich → route → aggregate pipeline (SURVEY.md §7.2).

Mirrors the reference CLI's flagship path (src/app.rs:105-182 →
duckdb_impl.rs:796-936) restated Spark-first:

  transcripts ──window(conv_id, turn_idx)──► ordered turns
      └► parse (Arrow-vectorized mapInPandas, narrow)
      └► enrich (broadcast dim join)
      └► route  (when-chain category + parse_errors split,
                 conversation-level degenerate rule)
      └► sinks  (one partitioned parquet fan-out + JSONL errors)
      └► aggregates (per-sink counts, conv × time-bucket rollups)
      └► manifest (per-stage fingerprint + per-partition lineage → resume)

Shuffle budget: exactly ONE exchange of the full data (hash by conv_id for
the ordering window); the parse/enrich/route stages are narrow on top of
it, the degenerate-conv flags aggregation reuses the same partitioning,
and every join against driver-small sides is broadcast.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from sqllog_analysis_spark.functions.parse import parse_transcripts
from sqllog_analysis_spark.operators.aggregates import (
    conv_buckets as agg_conv_buckets,
    partition_lineage,
    sink_counts as agg_sink_counts,
    summary as make_summary,
)
from sqllog_analysis_spark.operators.enrich import enrich_with_dim
from sqllog_analysis_spark.operators.routing import (
    degenerate_convs,
    route_errors,
    route_records,
    route_records_clean,
)
from sqllog_analysis_spark.schema import DIM_SCHEMA
from sqllog_analysis_spark.sinks.manifest import Manifest, fingerprint_input
from sqllog_analysis_spark.sinks.writers import (
    write_aggregates,
    write_category_sinks,
    write_error_sink,
)
from sqllog_analysis_spark.sources.transcripts import role_tool_dim_rows


@dataclass
class PipelineConfig:
    input_path: str
    output_dir: str
    slow_ms: int = 1000
    bucket: str = "hour"
    stable_order: bool = True
    resume: bool = True
    conf: dict = field(default_factory=dict)


def load_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(role_tool_dim_rows(), schema=DIM_SCHEMA)


def build(
    spark: SparkSession,
    transcripts: DataFrame,
    dim: DataFrame | None = None,
    slow_ms: int = 1000,
    bucket: str = "hour",
    stable_order: bool = True,
    persist: bool = True,
    target_partitions: int | None = None,
) -> dict[str, DataFrame]:
    """Transformation graph — no writes, no actions.  Returns every logical
    output so tests / the driver contract can materialize any of them
    independently.

    Shuffle plan: ONE explicit hash repartition on conv_id sizes the stage
    to the cluster and co-locates conversations, so the ordering window and
    the degenerate-conv aggregation reuse that partitioning instead of
    exchanging again.  ``persist=True`` caches the parsed output
    (memory-and-disk) because every downstream sink/aggregate fans out from
    it — without it each action would re-run the parse (the single most
    expensive stage) once per output.
    """
    if dim is None:
        dim = load_dim(spark)
    n = target_partitions or spark.sparkContext.defaultParallelism
    transcripts = transcripts.repartition(n, "conv_id")
    if stable_order:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        transcripts = transcripts.withColumn("turn_seq", F.row_number().over(w))
    parsed = parse_transcripts(transcripts)
    if persist:
        from pyspark import StorageLevel

        parsed = parsed.persist(StorageLevel.MEMORY_AND_DISK)
        # materialize eagerly: the degenerate-conv broadcast subquery and the
        # probe side would otherwise race to fill the cache and run the
        # parse twice concurrently
        parsed.count()
    degen = degenerate_convs(parsed)
    routed = route_records_clean(
        route_records(enrich_with_dim(parsed, dim), slow_ms=slow_ms), degen
    )
    if persist:
        routed = routed.persist(StorageLevel.MEMORY_AND_DISK)
    errors = route_errors(parsed, degen)
    return {
        "transcripts": transcripts,
        "parsed": parsed,
        "routed": routed,
        "errors": errors,
        "sink_counts": agg_sink_counts(routed),
        "conv_buckets": agg_conv_buckets(routed, bucket=bucket),
    }


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> dict:
    """Execute with manifest-gated, idempotent, resumable stage writes."""
    manifest = Manifest(os.path.join(cfg.output_dir, "_manifest"))
    fp = fingerprint_input(
        cfg.input_path, {"slow_ms": cfg.slow_ms, "bucket": cfg.bucket, **cfg.conf}
    )

    transcripts = spark.read.parquet(cfg.input_path)
    g = build(
        spark,
        transcripts,
        slow_ms=cfg.slow_ms,
        bucket=cfg.bucket,
        stable_order=cfg.stable_order,
    )

    stages = {
        "records": lambda: write_category_sinks(g["routed"], cfg.output_dir),
        "parse_errors": lambda: write_error_sink(g["errors"], cfg.output_dir),
        "aggregates": lambda: write_aggregates(
            g["sink_counts"], g["conv_buckets"], cfg.output_dir
        ),
    }
    stage_df = {
        "records": g["routed"],
        "parse_errors": g["errors"],
        "aggregates": g["sink_counts"],
    }

    ran, skipped = [], []
    for stage, write in stages.items():
        if cfg.resume and manifest.is_committed(stage, fp):
            skipped.append(stage)
            continue
        write()
        lineage = [
            r.asDict()
            for r in partition_lineage(stage_df[stage], stage).collect()
        ]
        manifest.commit(
            stage,
            fp,
            row_count=sum(p["row_count"] for p in lineage),
            partitions=lineage,
        )
        ran.append(stage)

    counts = {r["category"]: r["n"] for r in g["sink_counts"].collect()}
    n_errors = (manifest.read("parse_errors") or {}).get("row_count", 0)
    n_turns = transcripts.count()
    g["parsed"].unpersist()
    g["routed"].unpersist()
    s = make_summary(n_turns, counts, n_errors)
    s.update({"stages_ran": ran, "stages_skipped": skipped, "fingerprint": fp})
    return s

"""End-to-end parse → enrich → route → aggregate pipeline (SURVEY.md §7.2).

Mirrors the reference CLI's flagship path (src/app.rs:105-182 →
duckdb_impl.rs:796-936) restated Spark-first:

  transcripts ──window(conv_id, turn_idx)──► ordered turns
      └► parse (Arrow-vectorized mapInPandas, narrow)
      └► STAGE: one columnar write of the parsed output (run_pipeline)
      └► enrich (broadcast dim join)
      └► route  (when-chain category + parse_errors split,
                 conversation-level degenerate rule)
      └► sinks  (one partitioned parquet fan-out + JSONL errors)
      └► aggregates (per-sink counts, conv × time-bucket rollups)
      └► manifest (per-stage fingerprint + per-partition lineage → resume)

Shuffle budget: exactly ONE exchange of the full data (hash by conv_id for
the ordering window); the parse/enrich/route stages are narrow on top of
it, the degenerate-conv flags aggregation reads only (conv_id, has_ts)
from the staged columnar output, and every join against driver-small
sides is broadcast.

Scale design: the parse stage (the single most expensive stage) runs
EXACTLY ONCE per run — its output is written to a staging parquet dir and
every downstream consumer (routing fan-out, error sink, aggregates) scans
that staged data with column pruning.  This replaces the round-1 design
(MEMORY_AND_DISK persist + eager count), which (a) cannot cache a 100 TB
parse output, and (b) serialized a full driver barrier before any sink
ran — the measured scaling-efficiency killer.  A staging write is the
standard checkpoint pattern: it parallelizes like any other task work and
adds no driver synchronization beyond the job boundary.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from sqllog_analysis_spark.functions.parse import parse_transcripts
from sqllog_analysis_spark.operators.aggregates import (
    conv_buckets as agg_conv_buckets,
    sink_counts as agg_sink_counts,
    summary as make_summary,
)
from sqllog_analysis_spark.sinks.lineage import (
    jsonl_lineage,
    parquet_file_count,
    parquet_lineage,
    path_exists,
    read_parquet_table,
)
from sqllog_analysis_spark.operators.enrich import enrich_with_dim
from sqllog_analysis_spark.operators.routing import (
    degenerate_convs,
    route_errors,
    route_records,
    route_records_clean,
    split_sink_contract,
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
    # 'transcripts' = parquet table; 'raw' = dmsql_*.log directory via the
    # splittable chunk reader (sources/logfiles.py) — the reference CLI's
    # native input, same downstream graph
    input_format: str = "transcripts"
    slow_ms: int = 1000
    bucket: str = "hour"
    stable_order: bool = True
    resume: bool = True
    # partition count for the conv_id exchange; None → 4 × defaultParallelism
    # (multiple task WAVES per core, so stragglers amortize — a single-wave
    # layout makes the slowest partition the wall clock).  Pin it explicitly
    # when comparing the SAME job across cluster sizes (the scaling bench):
    # partitioning belongs to the data, not the executor count.
    target_partitions: int | None = None
    # bound on sink files per (category, dt) directory — also the salt width
    # that spreads a hot sink partition over that many write tasks
    files_per_partition: int = 4
    # inputs below this many turns skip the salted sink exchange; default 0
    # = never skip (measured free even at 200k turns — see writers.py)
    salt_min_rows: int = 0
    conf: dict = field(default_factory=dict)


def load_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(role_tool_dim_rows(), schema=DIM_SCHEMA)


def parse_stage(
    spark: SparkSession,
    transcripts: DataFrame,
    stable_order: bool = True,
    target_partitions: int | None = None,
) -> DataFrame:
    """The parse stage: one conv_id exchange + ordering window + the
    Arrow-vectorized parser.  Narrow on top of the single shuffle."""
    n = target_partitions or 4 * spark.sparkContext.defaultParallelism
    t = transcripts.repartition(n, "conv_id")
    if stable_order:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        t = t.withColumn("turn_seq", F.row_number().over(w))
    return parse_transcripts(t)


def downstream(
    spark: SparkSession,
    parsed: DataFrame,
    dim: DataFrame | None = None,
    slow_ms: int = 1000,
    bucket: str = "hour",
) -> dict[str, DataFrame]:
    """Everything after the parse stage, as a pure transformation graph.

    ``parsed`` is ideally a staged (already materialized) source so the
    branches below share its scan instead of re-running the parse."""
    if dim is None:
        dim = load_dim(spark)
    degen = degenerate_convs(parsed)
    routed = route_records_clean(
        route_records(enrich_with_dim(parsed, dim), slow_ms=slow_ms), degen
    )
    # projected to exactly the columns the error union consumes (shape +
    # the critical-class split): when run_pipeline persists this frame,
    # the cache fill scans 5 columns of the staged parquet instead of the
    # full parsed width (guide §2.3 — project before the opaque boundary;
    # measured −9% on the isolated errors chain at 2M turns)
    error_rows = parsed.filter(F.col("error").isNotNull()).select(
        "conv_id", "error_line", "error", "raw", "error_class"
    )
    errors = route_errors(parsed, degen, errors=error_rows)
    return {
        "parsed": parsed,
        "degen": degen,
        "error_rows": error_rows,
        "routed": routed,
        "errors": errors,
        "sink_counts": agg_sink_counts(routed),
        "conv_buckets": agg_conv_buckets(routed, bucket=bucket),
    }


def build(
    spark: SparkSession,
    transcripts: DataFrame,
    dim: DataFrame | None = None,
    slow_ms: int = 1000,
    bucket: str = "hour",
    stable_order: bool = True,
    target_partitions: int | None = None,
) -> dict[str, DataFrame]:
    """Pure transformation graph — no writes, no actions, no caching.
    Each returned output materializes independently (the parse re-runs per
    action); callers that materialize several outputs should either stage
    the parse via :func:`run_pipeline` / :func:`build_staged` or mark
    ``graph['parsed'].persist()`` themselves for small inputs."""
    parsed = parse_stage(spark, transcripts, stable_order, target_partitions)
    g = downstream(spark, parsed, dim, slow_ms=slow_ms, bucket=bucket)
    g["transcripts"] = transcripts
    return g


def build_staged(
    spark: SparkSession,
    transcripts: DataFrame,
    stage_dir: str,
    dim: DataFrame | None = None,
    slow_ms: int = 1000,
    bucket: str = "hour",
    stable_order: bool = True,
    target_partitions: int | None = None,
    reuse_stage: bool = False,
) -> dict[str, DataFrame]:
    """Run the parse ONCE, write it to ``stage_dir``, and build the
    downstream graph over the staged scan.  The one action here is the
    staging write; everything else stays lazy."""
    if not (reuse_stage and path_exists(os.path.join(stage_dir, "_SUCCESS"))):
        parse_stage(spark, transcripts, stable_order, target_partitions).write.mode(
            "overwrite"
        ).parquet(stage_dir)
    parsed = spark.read.parquet(stage_dir)
    g = downstream(spark, parsed, dim, slow_ms=slow_ms, bucket=bucket)
    g["transcripts"] = transcripts
    return g


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> dict:
    """Execute with manifest-gated, idempotent, resumable stage writes.

    Stage list (each independently resumable):
      parsed       → <out>/staged_parsed    (the single parse materialization)
      records      → <out>/records          (partitioned category fan-out)
      parse_errors → <out>/parse_errors     (JSONL)
      aggregates   → <out>/sink_counts, <out>/conv_buckets

    Driver-side concurrency (the Amdahl budget at scale): after the staged
    parse, TWO driver threads run the independent sink chains —
    (records write → footer lineage → aggregates) and (errors write →
    lineage) — so no executor-idle gap opens between jobs; all lineage is
    threaded metadata reads (sinks/lineage.py); the input row count rides
    an ``observe()`` on the staged-write job instead of a second walk of
    the input.
    """
    manifest = Manifest(os.path.join(cfg.output_dir, "_manifest"))
    fp = fingerprint_input(
        cfg.input_path,
        {
            "slow_ms": cfg.slow_ms,
            "bucket": cfg.bucket,
            "stable_order": cfg.stable_order,
            "target_partitions": cfg.target_partitions,
            "input_format": cfg.input_format,
            **cfg.conf,
        },
    )
    # no leading underscore: Spark's file index treats _-prefixed paths as
    # hidden metadata (reading them relies on explicit-root-path behavior)
    stage_dir = os.path.join(cfg.output_dir, "staged_parsed")

    from pyspark.sql import Observation

    in_obs = Observation()
    # counts the pipeline's input turns DURING the staged-write job —
    # zero extra jobs, no driver-side walk of the (possibly remote) input
    if cfg.input_format == "raw":
        from sqllog_analysis_spark.sources.logfiles import read_sqllog_dir

        source = read_sqllog_dir(spark, cfg.input_path)
    else:
        source = spark.read.parquet(cfg.input_path)
    transcripts = source.observe(in_obs, F.count(F.lit(1)).alias("n"))
    parse_committed = cfg.resume and manifest.is_committed("parsed", fp)
    t_parse = time.perf_counter()
    g = build_staged(
        spark,
        transcripts,
        stage_dir,
        slow_ms=cfg.slow_ms,
        bucket=cfg.bucket,
        stable_order=cfg.stable_order,
        target_partitions=cfg.target_partitions,
        reuse_stage=parse_committed,
    )
    ran, skipped = [], []

    def commit(stage: str, lineage: list[dict], n: int, t0: float, **extra) -> None:
        sec = max(time.perf_counter() - t0, 1e-9)
        manifest.commit(
            stage,
            fp,
            row_count=n,
            partitions=lineage,
            # per-stage insert stats — the InsertStats/records_per_second
            # analog (reference src/database/types.rs:112-153)
            extra={
                "wall_sec": round(sec, 3),
                "rows_per_sec": round(n / sec, 1),
                **extra,
            },
        )
        ran.append(stage)

    if parse_committed:
        skipped.append("parsed")
        n_turns = (manifest.read("parsed") or {}).get("input_turns")
        if n_turns is None:  # manifest from an older run: fall back to footers
            n_turns = sum(p["row_count"] for p in parquet_lineage(cfg.input_path))
    else:
        # lineage from the written files' parquet footers — metadata-only,
        # no recompute (sinks/lineage.py)
        n_turns = int(in_obs.get["n"])
        lineage = parquet_lineage(stage_dir)
        commit(
            "parsed",
            lineage,
            sum(p["row_count"] for p in lineage),
            t_parse,
            input_turns=n_turns,
        )

    # sink-write isolation (R2): rows violating the records sink's write
    # contract are skipped-and-logged like the reference's failed insert
    # batches (duckdb_impl.rs:475-488) instead of failing the stage.
    # category_total: route_records' category is a closed when-chain, so
    # the violation predicate reduces to (ts, conv_id) null checks that
    # push down to the staged scan — the error chain no longer re-runs
    # the enrich/route regex chain over the full staged data (r6).
    writable, contract_bad = split_sink_contract(g["routed"], category_total=True)
    err_obs = Observation()
    errors_obs = g["errors"].unionByName(contract_bad).observe(
        err_obs, F.count(F.lit(1)).alias("n")
    )

    def run_records() -> None:
        t0 = time.perf_counter()
        write_category_sinks(
            writable,
            cfg.output_dir,
            files_per_partition=cfg.files_per_partition,
            # observed input size decides whether the bounded-files exchange
            # pays for itself.  NOTE the hint counts input TURNS; routed
            # rows can exceed it (a turn may hold several records), so a
            # nonzero salt_min_rows is a coarse latency knob, not an exact
            # row bound — the scale-safe default (0 = always exchange)
            # never consults it
            row_count_hint=n_turns,
            salt_min_rows=cfg.salt_min_rows,
        )
        lineage = parquet_lineage(os.path.join(cfg.output_dir, "records"))
        commit("records", lineage, sum(p["row_count"] for p in lineage), t0)

    def run_errors() -> None:
        t0 = time.perf_counter()
        write_error_sink(errors_obs, cfg.output_dir)
        # JSONL has no footers: row count comes from the write job's
        # observe() counter (zero extra jobs), lineage records file sizes
        lineage = jsonl_lineage(os.path.join(cfg.output_dir, "parse_errors"))
        commit("parse_errors", lineage, int(err_obs.get["n"]), t0)

    def run_aggregates() -> None:
        t0 = time.perf_counter()
        # aggregate over the WRITTEN records sink, not a recompute: the
        # enrich/route chain runs exactly once (inside the records write);
        # these groupBys are column-pruned scans of the columnar sink —
        # at 100 TB that is the difference between re-routing the corpus
        # twice and reading 3 columns of it
        rec_dir = os.path.join(cfg.output_dir, "records")
        routed_src = (
            spark.read.parquet(rec_dir)
            if parquet_file_count(rec_dir)
            # zero-record edge (empty dir has no schema): fall back to the
            # post-contract-split branch, NOT g["routed"] — rows excluded
            # by sink-write isolation must not reappear in the aggregates
            else writable
        )
        # r6: conv_buckets is written from ONE records-sink scan, and
        # sink_counts is then derived from the written conv_buckets table
        # (sum of per-(conv, bucket) counts per category == count(*) per
        # category) — a KB-scale read instead of a second sink scan
        cb = agg_conv_buckets(routed_src, bucket=cfg.bucket)
        cb.write.mode("overwrite").parquet(
            os.path.join(cfg.output_dir, "conv_buckets")
        )
        sc_src = spark.read.parquet(os.path.join(cfg.output_dir, "conv_buckets"))
        write_aggregates(
            sc_src.groupBy("category").agg(F.sum("n").alias("n")),
            None,
            cfg.output_dir,
        )
        lineage = parquet_lineage(os.path.join(cfg.output_dir, "sink_counts"))
        commit("aggregates", lineage, sum(p["row_count"] for p in lineage), t0)

    # two independent driver-side chains over the staged scan, run
    # CONCURRENTLY (separate driver threads → separate Spark jobs sharing
    # executor slots: the standard multi-sink pattern):
    #   chain A: records write → aggregates (aggregates reads the records
    #            sink, so it chains — but does NOT wait for errors)
    #   chain B: errors write
    def chain_records() -> None:
        if cfg.resume and manifest.is_committed("records", fp):
            skipped.append("records")
        else:
            run_records()
        if cfg.resume and manifest.is_committed("aggregates", fp):
            skipped.append("aggregates")
        else:
            run_aggregates()

    def chain_errors() -> None:
        if cfg.resume and manifest.is_committed("parse_errors", fp):
            skipped.append("parse_errors")
        else:
            run_errors()

    from concurrent.futures import ThreadPoolExecutor

    # the degenerate-conversation frame is referenced by FOUR broadcast
    # subtrees across the two concurrent chains; without materialization
    # each broadcast re-runs the (conv_id, has_ts) aggregate over the
    # staged scan.  It is tiny by construction (one row per conversation
    # with no valid timestamp line), so persist + one eager fill makes
    # every broadcast a cache read (r6; guide §2.4 — share one exchange).
    # error_rows backs THREE subtrees of the error union (normal /
    # degen-critical / synthetic sources); persisting it (lazily — the
    # errors job is its only consumer, and the in-memory relation fills
    # once within that job) collapses three pruned staged scans into one
    g["degen"].persist()
    g["error_rows"].persist()
    try:
        g["degen"].count()
        with ThreadPoolExecutor(max_workers=2) as ex:
            for f in [ex.submit(chain_records), ex.submit(chain_errors)]:
                f.result()  # propagate failures
    finally:
        g["degen"].unpersist()
        g["error_rows"].unpersist()

    # summary inputs come from written files / footers, not extra jobs
    # (fs-abstracted: works for local dirs and remote URIs alike)
    counts_tbl = read_parquet_table(
        os.path.join(cfg.output_dir, "sink_counts")
    ).to_pylist()
    counts = {r["category"]: r["n"] for r in counts_tbl}
    n_errors = (manifest.read("parse_errors") or {}).get("row_count", 0)
    s = make_summary(n_turns, counts, n_errors)
    s.update({"stages_ran": ran, "stages_skipped": skipped, "fingerprint": fp})
    return s

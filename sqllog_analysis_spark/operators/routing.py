"""Rule-based fan-out routing (SURVEY.md §2.3 R1 generalized).

The reference routes every flushed segment to exactly one of two sinks
(parsed → DuckDB, error → JSONL; parser.rs:282-305).  The graft extends
this to 4+1 categories with a single ``when()`` chain — one JVM-side,
codegen-friendly pass, no UDF:

  priority: error  (Dameng-style ``ERR[-70xx]`` code in the description)
          > slow_query (execute_time ≥ threshold)
          > tool_call  (``TOOL_CALL: name(...)`` marker)
          > chat       (everything else)

Parse failures go to the ``parse_errors`` sink with the reference's
{path, line, error, raw} shape (error_writer.rs:147-152), after the
conversation-level degenerate-input rule (io.rs:147-167) is applied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sqllog_analysis_spark.oracle import NO_VALID_LINE

ERR_CODE_RE = r"ERR\[(-?\d+)\]"
TOOL_CALL_RE = r"TOOL_CALL: (\w+)\("


def route_records(parsed: DataFrame, slow_ms: int = 1000) -> DataFrame:
    """Add ``category`` (+ extracted ``err_code`` / ``tool_called``) to
    successfully parsed rows.  Pure column expressions → whole-stage codegen.
    """
    # occurrence_time guard drops the no-output sentinel rows (turns that
    # produced neither records nor errors; they exist only for the
    # conversation-level degenerate rule)
    rec = parsed.filter(
        F.col("error").isNull() & F.col("occurrence_time").isNotNull()
    )
    err_code = F.regexp_extract("description", ERR_CODE_RE, 1)
    tool_called = F.regexp_extract("description", TOOL_CALL_RE, 1)
    return (
        rec.withColumn("err_code", F.when(err_code != "", err_code.cast("int")))
        .withColumn("tool_called", F.when(tool_called != "", tool_called))
        .withColumn(
            "category",
            F.when(F.col("err_code").isNotNull(), "error")
            .when(F.col("execute_time") >= slow_ms, "slow_query")
            .when(F.col("tool_called").isNotNull(), "tool_call")
            .otherwise("chat"),
        )
    )


def degenerate_convs(parsed: DataFrame) -> DataFrame:
    """Conversations where no turn ever contained a valid timestamp line
    (the graft's analog of a file with no valid log line, io.rs:147-167).

    Partial-aggregated map-side, so the shuffle carries ≤ one row per
    (conversation, partition); the result is tiny and broadcastable.
    """
    return (
        parsed.groupBy("conv_id")
        .agg(F.max("has_ts").alias("conv_has_ts"))
        .filter(~F.col("conv_has_ts"))
        .select("conv_id")
    )


def route_errors(
    parsed: DataFrame,
    degen: DataFrame | None = None,
    errors: DataFrame | None = None,
) -> DataFrame:
    """parse_errors sink rows {path, line, error, raw} with the
    degenerate-conversation rule applied:

    - normal conversations: every collected error routes through;
    - degenerate conversations (no valid timestamp line anywhere): if the
      conversation collected at least one critical (Utf8-class) error, ALL
      of its collected errors pass through (io.rs:159-160 hands the full
      chunk_errors list to err_hook, Format errors included); if none,
      exactly one synthetic ``(0, 无有效日志行)`` row is emitted
      (io.rs:147-167).  Their parsed records (possible via mid-segment
      regex matches) are dropped too — see route_records_clean.
    """
    if degen is None:
        degen = degenerate_convs(parsed)
    if errors is None:
        # callers may pass (and persist) this frame so the three error
        # subtrees below share one scan (r6; run_pipeline does)
        errors = parsed.filter(F.col("error").isNotNull())

    normal = errors.join(F.broadcast(degen), "conv_id", "left_anti")
    degen_errors = errors.join(F.broadcast(degen), "conv_id", "left_semi")
    critical_convs = (
        degen_errors.filter(F.col("error_class") == "Utf8")
        .select("conv_id")
        .distinct()
    )
    degen_critical = degen_errors.join(
        F.broadcast(critical_convs), "conv_id", "left_semi"
    )
    synthetic = (
        degen.join(critical_convs, "conv_id", "left_anti")
        .select(
            F.col("conv_id").alias("path"),
            F.lit(0).cast("long").alias("line"),
            F.lit(f"未知错误: {NO_VALID_LINE}").alias("error"),
            F.lit(NO_VALID_LINE).alias("raw"),
        )
    )
    shape = lambda df: df.select(  # noqa: E731
        F.col("conv_id").alias("path"),
        F.col("error_line").alias("line"),
        "error",
        "raw",
    )
    return shape(normal).unionByName(shape(degen_critical)).unionByName(synthetic)


def route_records_clean(routed: DataFrame, degen: DataFrame) -> DataFrame:
    """Drop records from degenerate conversations (the reference discards a
    degenerate file's chunk without calling the record hook, io.rs:147-167).
    """
    return routed.join(F.broadcast(degen), "conv_id", "left_anti")


# ---------------------------------------------------------------------------
# Sink-write isolation (SURVEY §2.3 R2): the reference logs and SKIPS a
# failed insert batch and keeps loading (duckdb_impl.rs:475-488).  Spark's
# task-retry covers transient failures; the analog of a *data-shaped* insert
# failure is a row violating the sink's write contract.  Instead of letting
# one poison row fail the whole stage, rows failing the contract are split
# off DECLARATIVELY before the write and routed to the error sink — the
# batch-skip semantics at row granularity, with zero extra passes (both
# branches share the routed scan).
# ---------------------------------------------------------------------------

SINK_CONTRACT_ERROR = "写入约束错误"  # sink-contract violation (insert-failure analog)


def sink_contract(routed: DataFrame, category_total: bool = False) -> "F.Column":
    """The records sink's write contract as one boolean column: a known
    category, a partitionable timestamp, and a conversation key (the sink
    layout and sort order depend on exactly these).

    ``category_total=True`` (r6 optimization) asserts the caller's
    ``category`` column is a CLOSED when-chain over ``CATEGORIES`` (true
    for :func:`route_records` — pinned by
    tests/test_pipeline.py::test_route_records_category_is_total), so the
    set-membership term is statically TRUE and is dropped.  This matters
    for the pipeline's error chain: the membership test references the
    regexp-derived ``category`` expression, so pushing the violation
    filter toward the scan would otherwise re-evaluate the whole
    enrich/route expression chain for EVERY row of a second full pass;
    the remaining (ts, conv_id) null checks push down to the parquet scan
    as cheap native predicates instead."""
    from sqllog_analysis_spark.schema import CATEGORIES

    ok = F.col("ts").isNotNull() & F.col("conv_id").isNotNull()
    if not category_total:
        ok = F.col("category").isin(list(CATEGORIES)) & ok
    return F.coalesce(ok, F.lit(False))


def split_sink_contract(
    routed: DataFrame, category_total: bool = False
) -> tuple[DataFrame, DataFrame]:
    """(writable, violations) — violations carry the error-sink shape
    {path, line, error, raw} so they append to parse_errors directly."""
    ok = sink_contract(routed, category_total=category_total)
    good = routed.filter(ok)
    bad = routed.filter(~ok).select(
        F.coalesce(F.col("conv_id"), F.lit("<unknown>")).alias("path"),
        F.coalesce(F.col("turn_idx").cast("long"), F.lit(0).cast("long")).alias(
            "line"
        ),
        F.concat(
            F.lit(f"{SINK_CONTRACT_ERROR}: category="),
            F.coalesce(F.col("category"), F.lit("NULL")),
            F.lit(" ts="),
            F.coalesce(F.col("ts").cast("string"), F.lit("NULL")),
        ).alias("error"),
        F.coalesce(F.col("description"), F.lit("")).alias("raw"),
    )
    return good, bad

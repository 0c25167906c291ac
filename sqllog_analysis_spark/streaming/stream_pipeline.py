"""Structured Streaming variant of the parse → route pipeline.

The reference is batch-only (SURVEY.md §2.10); its `stream_parse`
(io.rs:82) is streaming only in the bounded-memory sense.  This module
shows the same operator graph under ``readStream`` so the engine extends
to continuous ingestion: the vectorized parse (mapInPandas) and the
routing when-chain are streaming-safe as-is; aggregates become
watermarked event-time windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from sqllog_analysis_spark.functions.parse import parse_transcripts
from sqllog_analysis_spark.operators.routing import route_records
from sqllog_analysis_spark.schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def read_sqllog_stream(spark: SparkSession, directory: str) -> DataFrame:
    """Streaming counterpart of sources/logfiles.read_sqllog_dir: a growing
    directory of ``dmsql_*.log`` files becomes a transcripts-shaped stream
    (conv_id = file name, turn_idx = segment byte offset, one row per
    segment).

    Source is Spark's ``binaryFile`` file stream — each NEW file arrives
    exactly once as (path, modificationTime, content) and is segmented
    with the SAME byte-level boundary protocol as the batch reader
    (logfiles.segment_bytes), so routed results on a directory equal the
    batch pipeline's on the same files.  Whole-file rows bound memory at
    the log-rotation size (dmsql logs rotate well under the 2 GiB turn_idx
    limit); the byte-range-splittable batch reader remains the path for
    oversized backfills.

    File-source contract (standard Spark file-stream semantics): a file is
    ingested ONCE, at first sight, with the content it has then — suited
    to rotated/complete log files appearing in the directory, NOT to
    tailing a file that is still being appended (later appends to an
    already-seen path are never re-read; batch mode over the same
    directory would see them).
    """
    import os

    import pandas as pd

    from sqllog_analysis_spark.sources.logfiles import segment_bytes

    raw = (
        spark.readStream.format("binaryFile")
        # binaryFile's fixed schema must be spelled out for streaming use
        .schema("path string, modificationTime timestamp, length long, content binary")
        # discovery parity with logfiles.discover_sqllog_files (app.rs:82-102):
        # dmsql_ prefix, case-insensitive .log extension, non-recursive
        .option("pathGlobFilter", "dmsql_*.[lL][oO][gG]")
        .option("recursiveFileLookup", "false")
        .load(directory)
        .select("path", "modificationTime", "content")
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                data = bytes(t.content) if t.content is not None else b""
                if not data:
                    continue  # empty files produce nothing (io.rs:104-107)
                for off, text in segment_bytes(data):
                    rows.append(
                        {
                            "conv_id": os.path.basename(t.path),
                            "turn_idx": off,
                            "role": "log",
                            "text": text,
                            "tool": None,
                            "ts": t.modificationTime,
                        }
                    )
            out = pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )
            if len(out):
                out["turn_idx"] = out["turn_idx"].astype("int32")
                out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
            yield out

    return raw.mapInPandas(run, schema=TRANSCRIPT_SCHEMA)


def streaming_routed(stream: DataFrame, slow_ms: int = 1000) -> DataFrame:
    """Parse + route a transcript stream (append-mode safe) — the
    LOW-LATENCY variant: rows route as they arrive, so the
    conversation-level degenerate rule and error sink (which need the
    whole conversation) are not applied.  For exact batch parity use
    :func:`stream_transcript_pipeline`, which buffers conversations to
    completion first."""
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


def streaming_conv_sessions(
    parsed_stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Custom stateful operator: per-conversation session summaries via
    ``applyInPandasWithState`` (SURVEY §2.10 extension — the reference has
    no streaming at all; Spark's own built-ins have no conversation-close
    semantics either, so this is the applyInPandasWithState tier of the
    custom-operator ladder).

    State per conv_id accumulates (turns, records, errors, first/last
    event time) across micro-batches; when a conversation goes quiet for
    ``gap`` of EVENT time (enforced against the watermark, so late data
    within the watermark still lands in its session), the operator emits
    exactly one summary row and drops the state — bounded memory at any
    conversation cardinality.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)

    out_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("n_turns", T.LongType()),
            T.StructField("n_records", T.LongType()),
            T.StructField("n_errors", T.LongType()),
            T.StructField("first_ts", T.TimestampType()),
            T.StructField("last_ts", T.TimestampType()),
            T.StructField("duration_sec", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_turns", T.LongType()),
            T.StructField("n_records", T.LongType()),
            T.StructField("n_errors", T.LongType()),
            T.StructField("first_ms", T.LongType()),
            T.StructField("last_ms", T.LongType()),
        ]
    )

    def close_sessions(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, n_rec, n_err, first_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    # n_turns = sum of per-micro-batch distinct turn ids.
                    # EXACT for both stream shapes this engine produces: a
                    # turn's parsed rows always share the micro-batch,
                    # because file-source batches are whole files and a
                    # turn is one input row (transcripts) or one segment of
                    # one file (raw logs).  A custom source that splits one
                    # turn's rows across batches would double-count it —
                    # an id-RANGE formula is no fix (raw-log turn ids are
                    # byte offsets, not contiguous).
                    "n_turns": [n_turns],
                    "n_records": [n_rec],
                    "n_errors": [n_err],
                    "first_ts": [pd.Timestamp(first_ms, unit="ms")],
                    "last_ts": [pd.Timestamp(last_ms, unit="ms")],
                    "duration_sec": [(last_ms - first_ms) / 1000.0],
                }
            )
            return
        n_rec = n_err = 0
        first_ms = last_ms = None
        turn_ids: set = set()
        for pdf in pdfs:  # vectorized per Arrow batch, no per-row python
            # distinct across this micro-batch's Arrow chunks (one group's
            # batch may arrive as several pdfs; dedup within the batch)
            turn_ids.update(pdf["turn_idx"].unique().tolist())
            n_rec += int(pdf["occurrence_time"].notna().sum())
            n_err += int(pdf["error"].notna().sum())
            # unit-robust: datetime64[ns] or [us] → epoch ms
            ts_ms = pd.Series(
                pd.to_datetime(pdf["ts"]).values.astype("datetime64[ms]").astype("int64")
            )
            first_ms = min(first_ms, int(ts_ms.min())) if first_ms is not None else int(ts_ms.min())
            last_ms = max(last_ms, int(ts_ms.max())) if last_ms is not None else int(ts_ms.max())
        prev = state.get if state.exists else (0, 0, 0, first_ms, last_ms)
        merged = (
            prev[0] + len(turn_ids),
            prev[1] + n_rec,
            prev[2] + n_err,
            min(prev[3], first_ms),
            max(prev[4], last_ms),
        )
        state.update(merged)
        # close when event time passes last activity + gap; the timeout must
        # sit beyond the current watermark or Spark rejects it
        state.setTimeoutTimestamp(
            max(merged[4] + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — makes this a generator on the update path

    return (
        parsed_stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            close_sessions,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_to_category_sinks(
    routed_stream: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Continuous ingestion into a partitioned records sink via
    ``foreachBatch`` (X1 batch-consumer hook), with EXACTLY-ONCE delivery:

    each micro-batch lands in its own ``ingest_batch=<id>`` partition
    directory written with mode=overwrite — a retried/reprocessed batch id
    REPLACES its own output instead of appending duplicates, and the
    streaming checkpoint guarantees batch ids are assigned once.  Readers
    scan the root (ingest_batch / category / dt are all partition
    columns, so pruning works on any of them).  This is the plain-parquet
    analog of an Iceberg snapshot-per-batch commit.
    """
    import os

    rec_root = os.path.join(out_dir, "records_stream")

    def write_batch(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("dt", F.to_date("ts"))
            .sortWithinPartitions("category", "dt", "session")
            .write.mode("overwrite")
            .partitionBy("category", "dt")
            .parquet(os.path.join(rec_root, f"ingest_batch={batch_id}"))
        )

    return (
        routed_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def stream_sqllog_pipeline(
    spark: SparkSession,
    directory: str,
    out_dir: str,
    checkpoint_dir: str,
    slow_ms: int = 1000,
):
    """FULL-fidelity continuous ingestion of raw dmsql logs: parse →
    degenerate-conversation rule → route → records/errors sinks, streaming.

    The transcript-parquet stream (:func:`streaming_routed`) cannot apply
    the conversation-level degenerate rule — a conversation may span
    files, so no micro-batch ever knows it has seen all of it.  Raw-log
    mode has no such problem: conv_id IS the file, and the binaryFile
    source delivers each file whole, exactly once.  Every micro-batch
    therefore contains only complete conversations, and running the
    COMPLETE batch routing graph (degenerate rule, error routing,
    sink-contract isolation) inside ``foreachBatch`` yields results
    identical to the batch pipeline over the same files.

    Sinks follow the exactly-once ``ingest_batch=<id>`` overwrite pattern
    of :func:`stream_to_category_sinks`: a reprocessed batch id replaces
    its own output, never duplicates it.
    """
    segments = read_sqllog_stream(spark, directory)
    return (
        segments.writeStream.foreachBatch(_full_graph_batch_writer(out_dir, slow_ms))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def _full_graph_batch_writer(out_dir: str, slow_ms: int):
    """foreachBatch body running the COMPLETE batch routing graph
    (degenerate rule, error routing, sink-contract isolation) on a
    micro-batch of transcript turns, writing the exactly-once
    ``ingest_batch=<id>`` sinks.  Correct ONLY when every conversation in
    the batch is complete — raw-log mode guarantees that per file;
    transcripts mode gets it from :func:`closed_conversations`."""
    import os

    rec_root = os.path.join(out_dir, "records_stream")
    err_root = os.path.join(out_dir, "errors_stream")

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Observation

        from sqllog_analysis_spark.functions.parse import parse_transcripts
        from sqllog_analysis_spark.operators.routing import split_sink_contract
        from sqllog_analysis_spark.plans.pipeline import downstream
        from sqllog_analysis_spark.sinks.writers import _ERROR_PATH_COLS

        g = downstream(bdf.sparkSession, parse_transcripts(bdf), slow_ms=slow_ms)
        # category_total: route_records' when-chain is closed over
        # CATEGORIES, so the violation predicate is just the null checks
        writable, contract_bad = split_sink_contract(g["routed"], category_total=True)
        # persisted for the batch: the records write AND the two partial
        # sinks below share ONE execution of the Python parse instead of
        # re-running the graph per action
        writable = (
            writable.drop(*_ERROR_PATH_COLS)  # all-NULL on routed records
            .withColumn("dt", F.to_date("ts"))
            .persist()
        )
        (
            writable.sortWithinPartitions("category", "dt", "session", "thread", "trx_id")
            .write.mode("overwrite")
            .partitionBy("category", "dt")
            .parquet(os.path.join(rec_root, f"ingest_batch={batch_id}"))
        )
        # error-row count rides an observe() on the write job itself —
        # the follow-mode summary sums these per-batch sidecars instead of
        # re-reading error file CONTENTS on the driver (JSONL has no
        # footers, so the count must be captured at write time)
        obs = Observation()
        (
            g["errors"]
            .unionByName(contract_bad)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .json(os.path.join(err_root, f"ingest_batch={batch_id}"))
        )
        _write_batch_metrics(out_dir, batch_id, n_errors=int(obs.get["n"]))
        _write_digest_partial(writable, out_dir, batch_id)
        _write_latency_hist_partial(writable, out_dir, batch_id)
        writable.unpersist()

    return write_batch


def _write_digest_partial(routed: DataFrame, out_dir: str, batch_id: int) -> None:
    """Per-batch statement-shape digest PARTIAL — the algebraic half of a
    streaming workload digest.  The digest is (count, count, sum) per
    shape, so a batch's partial folds losslessly into the total; each
    partial lands in its own exactly-once ``ingest_batch=<id>`` overwrite
    (a retried batch REPLACES its partial, never double-counts), and
    :func:`read_stream_digest` folds the tiny partials at read time —
    O(#batches × #shapes) rows, never a rescan of the records."""
    import os

    from sqllog_analysis_spark.operators.loganalytics import sql_shape_digest

    (
        sql_shape_digest(routed)
        .coalesce(1)  # a zero-record batch still writes a schema-bearing file
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "digest_stream", f"ingest_batch={batch_id}"))
    )


def _write_latency_hist_partial(routed: DataFrame, out_dir: str, batch_id: int) -> None:
    """Per-batch latency histogram PARTIAL: execute_time bucketed into
    log2 bins per category.  Like the digest, a histogram is a bag of
    counts — associative — so per-batch partials under exactly-once
    ``ingest_batch=`` overwrites fold losslessly into the running
    distribution, from which any percentile is answerable within one
    bin's width (factor-2 on log2 bins) without retaining a single raw
    latency.  This is the streaming analog of the reference's slow-query
    analysis (EXECTIME thresholds, README.md:470-493) at unbounded
    retention."""
    import os

    (
        routed.filter(F.col("execute_time").isNotNull())
        .groupBy(
            "category",
            F.least(
                F.floor(F.log2(F.col("execute_time") + 1)), F.lit(40)
            ).cast("int").alias("bin"),
        )
        .agg(F.count("*").alias("n"))
        .coalesce(1)  # a zero-record batch still writes a schema-bearing file
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "latency_hist_stream", f"ingest_batch={batch_id}"))
    )


def read_stream_latency(
    spark: SparkSession, out_dir: str, quantiles: tuple[float, ...] = (0.5, 0.99)
) -> DataFrame:
    """Per-category latency percentiles from the folded histogram
    partials: for each requested quantile q, the TIGHT upper bound of
    the first bin whose cumulative count reaches q·total — bin b holds
    exactly t ∈ [2^b − 1, 2^(b+1) − 2] (floor(log2(t+1)) = b), so the
    reported value is 2^(b+1) − 2 and the true percentile lies within
    one bin width below it.

    Returns (category, n, q50_ub_ms, q99_ub_ms, …) — one row per
    category; column per quantile, named ``q<pct>_ub_ms`` (fractional
    percentiles keep their digits: 0.999 → ``q99_9_ub_ms``).
    """
    import os

    hist = (
        spark.read.parquet(os.path.join(out_dir, "latency_hist_stream"))
        .groupBy("category", "bin")
        .agg(F.sum("n").alias("n"))
    )
    w = Window.partitionBy("category").orderBy("bin")
    tot = Window.partitionBy("category")
    cum = hist.select(
        "category",
        "bin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(tot).alias("total"),
    )
    aggs = [F.max("total").alias("n")]
    for q in quantiles:
        ub = F.min(
            F.when(
                F.col("cum") >= q * F.col("total"),
                # tight bin upper bound 2^(bin+1)-2; SQL shiftleft accepts
                # a column bit count (the DataFrame fn wants a literal)
                F.expr("shiftleft(CAST(1 AS BIGINT), bin + 1) - 2"),
            )
        )
        # %g keeps fractional percentiles distinct (0.999 → q99_9, not a
        # second q99) without trailing zeros
        pct = ("%g" % (q * 100)).replace(".", "_")
        aggs.append(ub.alias(f"q{pct}_ub_ms"))
    return cum.groupBy("category").agg(*aggs).orderBy("category")


def read_stream_digest(
    spark: SparkSession, out_dir: str, top_k: int | None = None
) -> DataFrame:
    """Current workload digest of a streaming session: fold the per-batch
    partials written by :func:`_write_digest_partial`.  Identical output
    to running ``sql_shape_digest`` over all routed records at once
    (counts and sums are associative), pinned by
    test_streaming.py::test_stream_digest_matches_batch_digest."""
    import os

    out = (
        spark.read.parquet(os.path.join(out_dir, "digest_stream"))
        .groupBy("shape")
        .agg(
            F.sum("n").alias("n"),
            F.sum("n_timed").alias("n_timed"),
            F.sum("total_exec_ms").alias("total_exec_ms"),
        )
        .orderBy(F.desc("n"), "shape")
    )
    return out.limit(top_k) if top_k else out


def closed_conversations(
    transcript_stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Stateful conversation-completion buffer (``applyInPandasWithState``
    keyed on conv_id): hold every conversation's turns in state until the
    conversation has gone quiet for ``gap`` of EVENT time, then release
    ALL of its turns into one micro-batch and drop the state.

    This is what gives the transcripts-mode stream full batch parity: a
    parquet conversation may span micro-batches, so no single batch can
    apply the conversation-level degenerate rule (无有效日志行) — but every
    batch this operator EMITS contains only complete conversations, so the
    downstream foreachBatch can run the identical batch routing graph.

    Memory bound: state holds open conversations only — the same bound
    raw-log mode pays per in-flight file.  Late data within the watermark
    still joins its conversation; a turn later than (close + watermark) is
    a new conversation instance, the standard watermark trade-off.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)

    state_schema = T.StructType(
        [
            T.StructField("turn_idx", T.ArrayType(T.IntegerType())),
            T.StructField("role", T.ArrayType(T.StringType())),
            T.StructField("text", T.ArrayType(T.StringType())),
            T.StructField("tool", T.ArrayType(T.StringType())),
            T.StructField("ts_ms", T.ArrayType(T.LongType())),
            T.StructField("last_ms", T.LongType()),
        ]
    )

    def release(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            ti, ro, tx, tl, tm, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": pd.Series(list(ti), dtype="int32"),
                    "role": list(ro),
                    "text": list(tx),
                    "tool": list(tl),
                    "ts": pd.Series(
                        [pd.Timestamp(int(m), unit="ms") for m in tm]
                    ).astype("datetime64[us]"),
                }
            )
            return
        ti, ro, tx, tl, tm = [], [], [], [], []
        for pdf in pdfs:  # Arrow chunks of this batch's group
            ti += [int(x) for x in pdf["turn_idx"]]
            ro += [None if pd.isna(x) else str(x) for x in pdf["role"]]
            tx += [None if pd.isna(x) else str(x) for x in pdf["text"]]
            tl += [None if pd.isna(x) else str(x) for x in pdf["tool"]]
            tm += (
                pd.to_datetime(pdf["ts"])
                .values.astype("datetime64[ms]")
                .astype("int64")
                .tolist()
            )
        if state.exists:
            p = state.get
            ti, ro, tx, tl, tm = (
                list(p[0]) + ti,
                list(p[1]) + ro,
                list(p[2]) + tx,
                list(p[3]) + tl,
                list(p[4]) + tm,
            )
        last = max(tm)
        state.update((ti, ro, tx, tl, tm, last))
        # release when event time passes last activity + gap; the timeout
        # must sit beyond the current watermark or Spark rejects it
        state.setTimeoutTimestamp(
            max(last + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — makes this a generator on the update path

    from sqllog_analysis_spark.schema import TRANSCRIPT_SCHEMA as _TS

    return (
        transcript_stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            release,
            outputStructType=_TS,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_transcript_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    slow_ms: int = 1000,
    gap: str = "5 minutes",
    watermark: str = "10 seconds",
):
    """FULL-fidelity continuous ingestion of parquet transcripts: the
    batch-parity counterpart of :func:`stream_sqllog_pipeline` for the
    transcripts table input.

    :func:`streaming_routed` stays the low-latency variant (per-turn
    routing, no conversation-close semantics); this pipeline trades
    latency (a conversation's rows land only after it has been quiet for
    ``gap``) for EXACT batch parity: :func:`closed_conversations` buffers
    turns per conversation in state, and each released micro-batch —
    complete conversations only — runs the identical batch routing graph
    (conversation-level degenerate rule, error sink, contract isolation)
    via the shared :func:`_full_graph_batch_writer`.  A degenerate
    conversation SPLIT ACROSS micro-batches therefore yields exactly the
    batch pipeline's single synthetic 无有效日志行 error row, not one per
    batch.
    """
    closed = closed_conversations(
        read_transcript_stream(spark, input_path), gap=gap, watermark=watermark
    )
    return (
        closed.writeStream.foreachBatch(_full_graph_batch_writer(out_dir, slow_ms))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def _write_batch_metrics(out_dir: str, batch_id: int, **metrics) -> None:
    """Per-micro-batch metadata sidecar (``_stream_metrics/batch_<id>.json``)
    — the JSONL-sink analog of parquet footer lineage.  Overwrite per batch
    id, so a reprocessed batch replaces its own metrics (exactly-once, like
    the data sinks)."""
    import json
    import os

    d = os.path.join(out_dir, "_stream_metrics")
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".batch_{batch_id}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"batch_id": batch_id, **metrics}, fh)
    os.replace(tmp, os.path.join(d, f"batch_{batch_id}.json"))


def read_batch_metrics(out_dir: str) -> list[dict]:
    """All committed per-batch metric sidecars (any order)."""
    import glob
    import json
    import os

    out = []
    for f in glob.glob(os.path.join(out_dir, "_stream_metrics", "batch_*.json")):
        with open(f, encoding="utf-8") as fh:
            out.append(json.load(fh))
    return out


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

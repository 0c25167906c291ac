"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime re-planning + skew-join splitting), shuffle partitions sized to
cores (not the 200 default), Arrow enabled for the pandas-UDF parse path,
and a pinned UTC session timezone so results compare bit-for-bit against
the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sqllog_analysis_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``cores=None`` uses ``local[*]``.  On a real cluster the master comes
    from spark-submit and everything here still applies unchanged.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(8, n)

    # Under spark-submit the launcher's JVM gateway already exists (it
    # exports PYSPARK_GATEWAY_PORT to the python driver) and carries the
    # --master the user chose; forcing local[...] here would silently turn
    # a cluster submission into a single-node run.  Everything else below
    # (AQE, shuffle sizing, Arrow, UTC) applies unchanged on a cluster.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    b = SparkSession.builder if under_submit else SparkSession.builder.master(master)
    b = (
        b.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # r6 (guide §3.1/§9): joins.  The 10 MB default broadcast threshold
        # under-uses a 128 GiB-class node — a few-tens-of-MB dimension side
        # (e.g. TPC-H orders projected to two longs) is far cheaper to
        # broadcast than to shuffle the fact side.  Estimate-driven, so it
        # stays scale-adaptive: at 100 TB the big tables' size estimates
        # blow past any threshold and the planner falls back to shuffle
        # joins.  Parameterised for clusters with smaller executors.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD", "64m"),
        )
        # prefer shuffled-hash over sort-merge when the per-partition build
        # side fits (guide §9) — skips both sort passes
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # parse UDF ships whole turns; bigger Arrow batches amortize the
        # Python worker round-trip and the per-batch pandas fixed costs
        # without blowing memory (turns are ~300 B → ~6 MB/batch; r6
        # measured the parse hot path ~11% faster at 20k than 10k rows)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # single-node: shuffle files + cache spill on tmpfs instead of the (slow,
    # jittery) VM disk; on a real cluster spark.local.dir is the node's SSDs
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        b = b.config("spark.local.dir", "/dev/shm/spark-local")
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

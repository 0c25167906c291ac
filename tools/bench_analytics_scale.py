"""At-scale evidence for the round-5 analytics operators (reproducible
form of the one-off numbers in BENCH/DATASCALE.md):

- statement-shape digest over the records sink of a 2M-turn pipeline run
- exact heavy hitters over the 80M-token explosion of the 2M-doc corpus

Protocol matches tools/bench_datascale.py: warm-up first, then min over
SAMPLES runs (the sandbox host injects one-sided multi-second stalls, so
the floor is the machine's capability).  Prints one JSON line per leg.

    python tools/bench_analytics_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLES = 2


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from sqllog_analysis_spark.operators.loganalytics import (
        heavy_hitters,
        sql_shape_digest,
    )
    from sqllog_analysis_spark.plans.pipeline import PipelineConfig, run_pipeline
    from sqllog_analysis_spark.session import get_spark
    from sqllog_analysis_spark.sinks.writers import read_sink
    from sqllog_analysis_spark.sources.transcripts import write_transcripts

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "analytics_scale",
        cores=cpus,
        shuffle_partitions=128,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
        },
    )

    # ---- digest over the 2M-turn records sink -------------------------
    p = os.path.join(REPO, ".data", "transcripts_scale_2000000_sh32.parquet")
    if not os.path.exists(p):
        write_transcripts(p, 2_000_000, seed=42, shards=32)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    out = os.path.join(base, "analytics_scale_out")
    # always rebuild: a leftover dir can only be a crashed previous run's
    # PARTIAL sink, and benchmarking incomplete data would publish wrong
    # records/sec with no warning
    shutil.rmtree(out, ignore_errors=True)
    run_pipeline(
        spark,
        PipelineConfig(input_path=p, output_dir=out, resume=False, target_partitions=128),
    )
    rec = read_sink(spark, out)
    n_rec = rec.count()
    sql_shape_digest(rec, top_k=15).collect()  # warm-up (codegen/JIT)
    best = float("inf")
    for _ in range(SAMPLES):
        t0 = time.perf_counter()
        sql_shape_digest(rec, top_k=15).collect()
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "leg": "sql_shape_digest",
                "records": n_rec,
                "wall_sec": round(best, 2),
                "records_per_sec": round(n_rec / best),
            }
        )
    )

    # ---- heavy hitters over 80M tokens --------------------------------
    pd_ = os.path.join(REPO, ".data", "documents_scale_2000000_b5d10.parquet")
    if not os.path.exists(pd_):
        from sqllog_analysis_spark.sources.documents import write_documents

        write_documents(
            spark, pd_, 2_000_000, seed=42, boilerplate_frac=0.05,
            dup_frac=0.10, dup_cluster_size=5,
        )
    toks = spark.read.parquet(pd_).select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("item")
    )
    heavy_hitters(toks.limit(100_000), "item", 0.001).collect()  # warm-up
    best, n_heavy = float("inf"), 0
    for _ in range(SAMPLES):
        t0 = time.perf_counter()
        n_heavy = len(heavy_hitters(toks, "item", 0.001).collect())
        best = min(best, time.perf_counter() - t0)
    n_tok = toks.count()
    print(
        json.dumps(
            {
                "leg": "heavy_hitters",
                "tokens": n_tok,
                "wall_sec": round(best, 2),
                "tokens_per_sec": round(n_tok / best),
                "n_heavy": n_heavy,
            }
        )
    )
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()

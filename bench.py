"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The headline is the transcript pipeline itself — a full ``run_pipeline``
(parse → stage → enrich → route → sink writes → aggregates → manifest),
i.e. exactly what ``python -m sqllog_analysis_spark`` executes — reported
in turns/sec alongside the wall time.  It is measured twice:

  pipeline_e2e              tuned bench conf (AQE off, 8m partition bytes —
                            right for sub-GB single-node inputs)
  pipeline_e2e_default_conf the engine's SHIPPED defaults (AQE on, 128m),
                            what a user gets without tuning

plus the operator queries from __spark_entry__.py.

Scaling evidence (north rule ≥0.8 efficiency between N and 4N parallelism)
is produced by tools/bench_scaling.py, which runs the same run_pipeline at
two parallelism levels in separate JVMs and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "join_topk",
    "broadcast_enrich",
    "window_first_order",
    "regex_route",
    "time_bucket",
    "sessionize",
    "exact_dedup",
    "text_quality",
    "minhash_lsh",
    "simhash",
    "simhash_pairs",
    "cosine_topk",
    "lsh_near_dup",
    "sample_split",
    "seq_packing",
    "decontaminate",
    "repetition_filter",
    "stratified_sample",
    "passage_stats",
    "pii_scrub",
    "url_extract",
    "quota_sample",
    "asof_join",
    "interval_join",
    "sliding_window",
    "quantiles",
    "sql_shapes",
    "funnel",
    "cohort_retention",
    "bm25_topk",
    "heavy_hitters",
    "event_transitions",
    "session_stats",
    "group_entropy",
]


def _time_pipeline(spark, inp: str, workdir: str, samples: int = 3) -> float:
    """Best of ``samples`` runs — the sandbox host injects one-sided
    multi-second stalls (first post-warm-up full-size runs routinely cost
    2-4x the floor), so the minimum is the machine's real capability;
    same estimator as tools/bench_scaling.py."""
    from sqllog_analysis_spark.plans.pipeline import PipelineConfig, run_pipeline

    best = float("inf")
    for _ in range(samples):
        out = os.path.join(workdir, "out")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        run_pipeline(spark, PipelineConfig(input_path=inp, output_dir=out, resume=False))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import __spark_entry__ as entry_mod
    from sqllog_analysis_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")

    # Tuned bench conf: AQE off (its stage-by-stage materialization adds
    # ~30% wall on sub-GB inputs with no skew to fix) and small partition
    # bytes (split sub-GB local files across all cores).  Both are RUNTIME
    # confs, so the shipped-default leg below just flips them back.
    spark = get_spark(
        "bench",
        cores=cpus,
        shuffle_partitions=max(8, cpus),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
        },
    )

    timings: dict[str, float] = {}
    workdir = tempfile.mkdtemp(
        prefix="bench_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )

    # corpus + input count
    inp = entry_mod._transcripts_path(sf_dir)
    tdf = spark.read.parquet(inp)
    n_turns = tdf.count()

    # warm-up on a small slice: JVM codegen + Arrow python-worker spin-up
    # are one-time session costs, not per-job costs on a long-lived cluster
    from sqllog_analysis_spark.plans.pipeline import PipelineConfig, run_pipeline

    warm_in = os.path.join(workdir, "warm.parquet")
    tdf.limit(2000).write.mode("overwrite").parquet(warm_in)
    run_pipeline(
        spark,
        PipelineConfig(input_path=warm_in, output_dir=os.path.join(workdir, "warm_out"), resume=False),
    )

    # headline 1: full run_pipeline, tuned conf
    sec = _time_pipeline(spark, inp, workdir)
    timings["pipeline_e2e"] = round(sec, 3)

    # headline 2: the engine's shipped defaults (AQE on, 128m) — what a
    # user gets with no tuning
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    sec_default = _time_pipeline(spark, inp, workdir)
    timings["pipeline_e2e_default_conf"] = round(sec_default, 3)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")

    qs = entry_mod.queries()
    # best-of-3 per query: one-sided host stalls inflate single-shot
    # operator timings just as they inflate pipeline runs (a 0.6 s query
    # reads as 5 s in a stall window; stalls have been observed to span
    # consecutive runs), so operator queries use the same min-over-samples
    # estimator as _time_pipeline.
    for name in HEADLINE:
        fn = qs[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    shutil.rmtree(workdir, ignore_errors=True)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "e2e_parse_route_aggregate_plus_operator_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "pipeline_turns": n_turns,
                "pipeline_turns_per_sec": round(n_turns / sec, 1),
                "pipeline_turns_per_sec_default_conf": round(n_turns / sec_default, 1),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()

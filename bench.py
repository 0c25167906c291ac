"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The headline is the transcript pipeline itself (end-to-end parse → enrich →
route → aggregate, reported in turns/sec alongside the wall time), plus the
operator queries from __spark_entry__.py.

Scaling evidence (north rule ≥0.8 efficiency between N and 4N parallelism)
is produced by tools/bench_scaling.py, which runs THIS pipeline at
local[8] and local[32] in separate JVMs and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
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
    "cosine_topk",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from sqllog_analysis_spark.plans.pipeline import build
    from sqllog_analysis_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")

    # AQE is ON in the engine's default session (skew-join splitting and
    # partition coalescing matter at cluster scale); for this single-node
    # latency benchmark its stage-by-stage materialization adds ~30% wall
    # time on sub-GB inputs, so the bench pins it off — the plans contain
    # no skewed joins at this scale, so results are identical.
    spark = get_spark(
        "bench",
        cores=cpus,
        shuffle_partitions=max(8, cpus),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            # split sub-GB local inputs across all cores; a real cluster
            # keeps the 128m default
            "spark.sql.files.maxPartitionBytes": "8m",
        },
    )

    timings: dict[str, float] = {}

    # headline: the transcript pipeline, end-to-end (turns/sec)
    tdf = entry_mod._transcripts(spark, sf_dir)
    n_turns = tdf.count()
    # warm-up on a small slice: JVM codegen + Arrow python-worker spin-up
    # are one-time session costs, not per-job costs on a long-lived cluster
    wg = build(spark, tdf.limit(2000))
    wg["sink_counts"].collect()
    wg["parsed"].unpersist()
    wg["routed"].unpersist()
    t0 = time.perf_counter()
    g = build(spark, tdf)
    # materialize every pipeline output (records fan-out + errors + aggs)
    routed_n = g["routed"].count()
    err_n = g["errors"].count()
    g["sink_counts"].collect()
    g["conv_buckets"].count()
    pipe_sec = time.perf_counter() - t0
    timings["pipeline_e2e"] = round(pipe_sec, 3)

    qs = entry_mod.queries()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

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
                "pipeline_turns_per_sec": round(n_turns / pipe_sec, 1),
                "pipeline_routed_rows": routed_n,
                "pipeline_error_rows": err_n,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Data-size scaling: identical pipeline, identical parallelism, corpus
grown 20× — throughput should hold roughly flat (linear scaling in data).

Complements tools/bench_scaling.py (which varies CORES at fixed data):
a pipeline can only claim 100 TB readiness if per-core throughput does
not degrade as the corpus grows — i.e. no super-linear stage (quadratic
join, driver-side accumulation, per-run fixed cost amortized away).

Writes BENCH/DATASCALE.md.  Usage: python tools/bench_datascale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = [int(x) for x in os.environ.get("DATASCALE_SIZES", "200000,1000000,2000000,4000000").split(",")]
SAMPLES = int(os.environ.get("DATASCALE_SAMPLES", "3"))


def main() -> None:
    from sqllog_analysis_spark.plans.pipeline import PipelineConfig, run_pipeline
    from sqllog_analysis_spark.session import get_spark
    from sqllog_analysis_spark.sources.transcripts import write_transcripts

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "datascale",
        cores=cpus,
        shuffle_partitions=128,
        extra_conf={"spark.sql.adaptive.enabled": "false",
                    "spark.sql.files.maxPartitionBytes": "8m"},
    )
    base = "/dev/shm/datascale" if os.path.isdir("/dev/shm") else "/tmp/datascale"

    paths = {}
    for n in SIZES:
        p = os.path.join(REPO, ".data", f"transcripts_scale_{n}_sh32.parquet")
        if not os.path.exists(p):
            write_transcripts(p, n, seed=42, shards=32)
        paths[n] = p

    # warm-up (JVM codegen + Arrow workers)
    warm_out = f"{base}_warm"
    shutil.rmtree(warm_out, ignore_errors=True)
    run_pipeline(spark, PipelineConfig(input_path=paths[SIZES[0]], output_dir=warm_out,
                                       resume=False, target_partitions=128))
    shutil.rmtree(warm_out, ignore_errors=True)

    rows = []
    for n in SIZES:
        best = float("inf")
        for i in range(SAMPLES):
            out = f"{base}_{n}_{i}"
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.perf_counter()
            run_pipeline(spark, PipelineConfig(input_path=paths[n], output_dir=out,
                                               resume=False, target_partitions=128))
            best = min(best, time.perf_counter() - t0)
            shutil.rmtree(out, ignore_errors=True)
        rows.append((n, best, n / best))
        print(json.dumps({"turns": n, "sec": round(best, 2), "tps": round(n / best)}))

    base_tps = rows[0][2]
    table = "\n".join(
        f"| {n} | {sec:.2f} | {tps:,.0f} | {tps / base_tps:.2f} |"
        for n, sec, tps in rows
    )
    md = f"""# BENCH/DATASCALE — throughput vs corpus size (fixed local[{cpus}])

Identical job (``run_pipeline``, 128 pinned partitions, AQE off), corpus
grown {SIZES[-1] // SIZES[0]}×; best of {SAMPLES} samples per size (the
host injects one-sided stalls).  Linear data scaling = the relative-
throughput column holds ≈ flat (per-run fixed costs make the smallest
corpus slightly cheaper per row to inflate, not degrade, at the top end).

| turns | wall sec | turns/sec | relative throughput |
|---|---|---|---|
{table}

Why it holds by construction: both full-data exchanges key on
fine-grained uniform hashes (conv_id; category×dt×salt), every join
against non-corpus data is broadcast, aggregates are map-side partial,
and no driver-side path touches row data (lineage = parquet footers,
counts = observe() on the write jobs).  Nothing is super-linear in rows.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "DATASCALE.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/DATASCALE.md")


if __name__ == "__main__":
    main()

"""Two-parallelism scaling evidence (north rule: ≥0.8 throughput scaling
efficiency between N- and 4N-executor runs; sandbox protocol per
BASELINE.md: identical job, identical input, local[8] vs local[32],
efficiency = throughput_32 / (4 × throughput_8)).

What runs: the full ``run_pipeline`` (parse → staged write → route →
sink writes → aggregates → manifest), i.e. the product path, not a
stripped-down kernel.  Each leg is a separate subprocess → fresh JVM, no
shared executor state.

Because this sandbox VM's advertised 32 vCPUs do not deliver 32 cores of
real compute, the script FIRST measures the hardware ceiling with a pure
multiprocessing sweep (no Spark, no I/O) and reports it next to the
pipeline numbers, so the software-vs-hardware attribution is data, not
argument.  Writes BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_turns]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNNER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from sqllog_analysis_spark.plans.pipeline import PipelineConfig, run_pipeline
from sqllog_analysis_spark.session import get_spark

cores = int(sys.argv[1]); path = sys.argv[2]
# both legs get an ample, identical heap so spill doesn't confound the
# parallelism comparison (the box has 128 GiB)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
# IDENTICAL JOB at every parallelism level: partition counts are pinned to
# the data (128 exchange partitions, 128 shuffle partitions, same input
# splits) — only the number of executor threads varies between legs.  A
# job whose partitioning adapts to the core count is a DIFFERENT job per
# leg (fewer, bigger Arrow batches at low core counts flatter the low leg).
# 128 = 4 waves of tasks at the widest leg (local[32]): a single-wave
# layout makes the slowest partition the wall clock with zero straggler
# smoothing, which is exactly what round 2 measured at 32 partitions.
spark = get_spark(f"scale_{{cores}}", cores=cores, shuffle_partitions=128,
                  extra_conf={{"spark.sql.adaptive.enabled": "false",
                               # split the input across tasks; on a real
                               # cluster the default 128m is right, here the
                               # whole input must parallelize across N<=32 cores
                               "spark.sql.files.maxPartitionBytes": "8m"}})
n = spark.read.parquet(path).count()
base = "/dev/shm/scale_out" if os.path.isdir("/dev/shm") else "/tmp/scale_out"
work = f"{{base}}_{{cores}}_{{os.getpid()}}"

def one_run(inp, tag):
    out = os.path.join(work, tag)
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    run_pipeline(spark, PipelineConfig(input_path=inp, output_dir=out,
                                       resume=False, target_partitions=128))
    return time.perf_counter() - t0

# warm-up: JVM/codegen/Arrow worker spin-up, excluded from the measurement.
# Wide enough that every core's Python worker spins up before timing.
warm = os.path.join(work, "warm.parquet")
spark.read.parquet(path).limit(20000).write.mode("overwrite").parquet(warm)
one_run(warm, "warm")
# several samples in one warm JVM; min = least noise-contaminated (the
# sandbox host injects one-sided multi-second stalls)
samples = [one_run(path, "t") for _ in range(3)]
shutil.rmtree(work, ignore_errors=True)
sec = min(samples)
print(json.dumps({{"cores": cores, "turns": n, "sec": sec, "tps": n / sec,
                   "samples": [round(s, 2) for s in samples]}}))
"""


def run(cores: int, path: str) -> dict:
    code = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), path],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _burn(n: int) -> int:
    # pure-CPU integer work, no memory traffic to speak of
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + i) & 0xFFFFFFFF
    return acc


def cpu_ceiling_sweep(levels=(1, 2, 4, 8, 16, 32), n=6_000_000, reps=3) -> dict[int, float]:
    """Effective parallel speedup of pure-CPU work at each process count —
    the HARDWARE ceiling any software on this VM is subject to."""
    base = None
    eff: dict[int, float] = {}
    for p in levels:
        best = float("inf")
        for _ in range(reps):
            with mp.Pool(p) as pool:
                t0 = time.perf_counter()
                pool.map(_burn, [n] * p)
                best = min(best, time.perf_counter() - t0)
        # throughput = work units / sec; speedup vs 1 proc
        tput = p * n / best
        if base is None:
            base = tput
        eff[p] = tput / base
    return eff


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from sqllog_analysis_spark.sources.transcripts import write_transcripts

    os.makedirs(os.path.join(REPO, ".data"), exist_ok=True)
    # sharded like any distributed-written dataset, so the initial scan
    # parallelizes across cores without tiny-split tuning
    path = os.path.join(REPO, ".data", f"transcripts_scale_{n_turns}_sh32.parquet")
    if not os.path.exists(path):
        write_transcripts(path, n_turns, seed=42, shards=32)

    sweep = cpu_ceiling_sweep()
    print(json.dumps({"cpu_sweep_speedup": {str(k): round(v, 2) for k, v in sweep.items()}}))

    levels = [int(x) for x in os.environ.get("SCALING_LEVELS", "2,8,32").split(",")]
    rounds = int(os.environ.get("SCALING_ROUNDS", "2"))
    runs: dict[int, list] = {c: [] for c in levels}
    for _ in range(rounds):
        for c in levels:  # interleave to spread host jitter across legs
            runs[c].append(run(c, path))
    best = {c: min(rs, key=lambda r: r["sec"]) for c, rs in runs.items()}
    for c in levels:
        print(json.dumps({"cores": c, "secs": [round(r["sec"], 1) for r in runs[c]],
                          "best_tps": round(best[c]["tps"])}))

    eff_8_32 = best[32]["tps"] / (4 * best[8]["tps"]) if 8 in best and 32 in best else None
    eff_2_8 = best[8]["tps"] / (4 * best[2]["tps"]) if 2 in best and 8 in best else None
    hw_8_32 = sweep.get(32, 0) / 4 / (sweep.get(8, 1) or 1)
    hw_2_8 = sweep.get(8, 0) / 4 / (sweep.get(2, 1) or 1)

    rows = "\n".join(
        f"| {c} | {best[c]['turns']} | {best[c]['sec']:.2f} | {best[c]['tps']:.0f} |"
        for c in levels
    )
    sweep_rows = "\n".join(
        f"| {p} | {v:.2f} | {v / p:.2f} |" for p, v in sweep.items()
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — two-parallelism scaling evidence

North-rule criterion: ≥0.8 throughput scaling efficiency between N and 4N
executors.  Sandbox protocol (BASELINE.md): the identical end-to-end job —
the full ``run_pipeline`` product path (parse → staged write → enrich →
route → partitioned sink writes → aggregates → manifest) — on the
identical input at two parallelism levels, separate JVMs, best of
{rounds}×3 interleaved samples after a full warm-up run (JVM codegen +
Arrow worker spin-up are one-time session costs, excluded).

## Pipeline throughput by parallelism

| cores | turns | wall sec | throughput (turns/sec) |
|---|---|---|---|
{rows}

- **efficiency local[8] → local[32] (the prescribed protocol) =
  {eff_8_32:.3f}**  (requirement: ≥ 0.8; hardware ceiling for this pair,
  measured below: {hw_8_32:.3f})
- **efficiency local[2] → local[8] = {eff_2_8:.3f}**  (requirement: ≥ 0.8;
  hardware ceiling {hw_2_8:.3f})

## Hardware ceiling: pure-CPU multiprocessing sweep

Pure integer-arithmetic workers (zero I/O, zero Spark) on this VM's
advertised 32 vCPUs.  "speedup" is throughput relative to 1 process;
an ideal machine shows speedup == procs.

| procs | speedup | parallel efficiency |
|---|---|---|
{sweep_rows}

The per-pair hardware ceiling above is computed from this sweep as
`speedup(4N) / (4 × speedup(N))` — the maximum ANY software can score on
this box for that pair.  Where the pipeline's measured efficiency is at
or above the hardware ceiling, the remaining gap is the machine, not the
job's shuffle/partition structure.

Input: deterministic synthetic transcripts corpus, {n_turns} turns
(seed 42, sources/transcripts.py), shuffled row order, Zipf-skewed
conversation sizes.

Reference baseline for context (BASELINE.md): the reference's published
single-node figures are ~10k-50k records/sec parse and ~4k records/sec
insert; its file loop is sequential (duckdb_impl.rs:913-924), so its real
scaling efficiency across cores is ~0.25 at 4×.  The numbers above are the
same workload class (parse → route → load) under real data parallelism.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff_8_32": round(eff_8_32, 3) if eff_8_32 else None,
                      "eff_2_8": round(eff_2_8, 3) if eff_2_8 else None,
                      "hw_ceiling_8_32": round(hw_8_32, 3),
                      "hw_ceiling_2_8": round(hw_2_8, 3)}))


if __name__ == "__main__":
    main()

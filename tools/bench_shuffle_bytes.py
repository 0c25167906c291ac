"""Shuffle-byte evidence for the sink exchange (round-4 task: the 8→32
pair is memory-bus-bound, so the only software lever is bytes moved per
row).

Measures, at the 2M-turn scaling corpus on local[32]:

  1. total shuffle-write bytes of one full ``run_pipeline`` (UI REST API,
     summed over completed stages) — with the error-path columns dropped
     (current code) vs retained (round-3 behavior), quantifying the drop;
  2. lz4 (default) vs zstd shuffle compression — wall time and bytes.

Each leg runs in its own subprocess/JVM (spark.io.compression.codec is
read at SparkEnv creation, not per-query), interleaved across rounds with
min-over-samples per the host-stall protocol.  Writes BENCH/SHUFFLE.md.

Usage: python tools/bench_shuffle_bytes.py [n_turns] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNNER = r"""
import json, os, shutil, sys, time, urllib.request
sys.path.insert(0, {repo!r})
codec = sys.argv[1]; drop_cols = sys.argv[2] == "drop"; path = sys.argv[3]
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
import sqllog_analysis_spark.sinks.writers as W
if not drop_cols:
    W._ERROR_PATH_COLS = ()  # emulate the round-3 shuffle footprint
from sqllog_analysis_spark.plans.pipeline import PipelineConfig, run_pipeline
from sqllog_analysis_spark.session import get_spark

spark = get_spark(f"shuffle_{{codec}}", cores=32, shuffle_partitions=128,
                  extra_conf={{"spark.sql.adaptive.enabled": "false",
                               "spark.sql.files.maxPartitionBytes": "8m",
                               "spark.io.compression.codec": codec,
                               "spark.ui.enabled": "true",
                               # never evict a stage mid-sweep: a dropped
                               # stage would silently shrink the byte sum
                               "spark.ui.retainedStages": "100000",
                               "spark.ui.port": "0"}})
sc = spark.sparkContext
work = f"/dev/shm/shufbytes_{{codec}}_{{drop_cols}}_{{os.getpid()}}"

def one_run(inp, tag):
    out = os.path.join(work, tag)
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    run_pipeline(spark, PipelineConfig(input_path=inp, output_dir=out,
                                       resume=False, target_partitions=128))
    return time.perf_counter() - t0

def shuffle_bytes(after_stage):
    # per-run stage-id WATERMARK (not a cumulative diff): sums exactly the
    # stages this run created, immune to any UI eviction of older stages
    url = f"{{sc.uiWebUrl}}/api/v1/applications/{{sc.applicationId}}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    return (sum(s.get("shuffleWriteBytes", 0) for s in stages
                if s.get("stageId", -1) > after_stage),
            max((s.get("stageId", -1) for s in stages), default=after_stage))

warm = os.path.join(work, "warm.parquet")
spark.read.parquet(path).limit(20000).write.mode("overwrite").parquet(warm)
one_run(warm, "warm")
_, mark = shuffle_bytes(-1)
runs = []
for i in range(2):
    sec = one_run(path, "t")
    b, mark = shuffle_bytes(mark)
    runs.append((sec, b))  # bytes paired with THEIR OWN run's wall time
shutil.rmtree(work, ignore_errors=True)
best = min(runs)
print(json.dumps({{"codec": codec, "drop": drop_cols, "sec": best[0],
                   "samples": [round(s, 2) for s, _ in runs],
                   "shuffle_bytes": best[1]}}))
"""


def run_leg(codec: str, drop: str, path: str) -> dict:
    code = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, codec, drop, path],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from sqllog_analysis_spark.sources.transcripts import write_transcripts

    path = os.path.join(REPO, ".data", f"transcripts_scale_{n_turns}_sh32.parquet")
    if not os.path.exists(path):
        write_transcripts(path, n_turns, seed=42, shards=32)

    legs = [("lz4", "drop"), ("lz4", "keep"), ("zstd", "drop")]
    best: dict[tuple, dict] = {}
    for r in range(rounds):
        for codec, drop in legs:  # interleaved vs host stalls
            res = run_leg(codec, drop, path)
            key = (codec, drop)
            # keep the min-WALL run with ITS OWN byte reading (bytes and
            # wall from different runs would mix measurements)
            prev = best.get(key, {"sec": float("inf"), "shuffle_bytes": float("inf")})
            if res["sec"] < prev["sec"]:
                best[key] = {"sec": res["sec"], "shuffle_bytes": res["shuffle_bytes"]}
            print(json.dumps({"round": r, "leg": key, **{k: res[k] for k in ("sec", "shuffle_bytes")}}))

    rows = "\n".join(
        f"| {c} | {'dropped' if d == 'drop' else 'retained (round-3)'} | "
        f"{best[(c, d)]['sec']:.2f} | {best[(c, d)]['shuffle_bytes'] / 1e6:.1f} | "
        f"{n_turns / best[(c, d)]['sec']:.0f} |"
        for c, d in legs
    )
    base = best[("lz4", "keep")]["shuffle_bytes"]
    dropped = best[("lz4", "drop")]["shuffle_bytes"]
    pct = 100 * (1 - dropped / base) if base else 0.0
    md = f"""# BENCH/SHUFFLE — bytes moved per row (sink-exchange evidence)

The 8→32 scaling pair is memory-bus-bound on this VM (BENCH/BASELINE.md
sweeps), so the software lever is shuffle BYTES, not shuffle count.  Full
``run_pipeline`` at {n_turns} turns, local[32], 128 partitions, separate
JVM per leg, min over {rounds}×2 interleaved samples (host-stall
protocol).  Bytes are the UI REST sum of shuffleWriteBytes over the
run's OWN stages (per-run stage-id watermark; retainedStages raised so
no stage is evicted), paired with that same run's wall time.

| codec | error-path columns | wall sec | shuffle MB | turns/sec |
|---|---|---|---|---|
{rows}

- Dropping the four always-NULL error-path columns (error, error_class,
  error_line, raw) before the sink exchange cuts shuffled bytes by
  **{pct:.1f}%** vs the round-3 layout (writers.py `_ERROR_PATH_COLS`).
- zstd vs lz4 trades CPU for bytes; the table records the measured wall
  at equal correctness — the default stays lz4 unless zstd wins wall
  time on this workload.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SHUFFLE.md"), "w") as f:
        f.write(md)
    print(json.dumps({k[0] + "_" + k[1]: {"sec": v["sec"], "mb": round(v["shuffle_bytes"] / 1e6, 1)} for k, v in best.items()}))


if __name__ == "__main__":
    main()

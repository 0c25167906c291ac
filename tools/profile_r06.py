"""Round-6 optimization profiler.

Usage:
  python tools/profile_r06.py plans  [sf_dir] [suffix] [q1 q2 ...]
      capture .explain("formatted") for each declared query into
      plans/r06/<q>_<suffix>.txt  (suffix: before/after)
  python tools/profile_r06.py time   [sf_dir] [q1 q2 ...]
      best-of-3 .count() timing (bench methodology) per query
  python tools/profile_r06.py noop   [sf_dir] [q1 q2 ...]
      best-of-3 noop-sink timing (guide §1.4) per query
  python tools/profile_r06.py pipeline [sf_dir]
      one run_pipeline with per-stage wall times from the manifest
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_session():
    from sqllog_analysis_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(
        "profile_r06",
        cores=cpus,
        shuffle_partitions=max(8, cpus),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
        },
    )


def explain_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    m = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(m)


def main() -> None:
    cmd = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry

    spark = get_session()
    qs = entry.queries()

    if cmd == "plans":
        suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
        names = sys.argv[4:] or list(qs)
        outdir = os.path.join(REPO, "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(explain_str(df))
            print("wrote", name)
        return

    if cmd in ("time", "noop"):
        names = sys.argv[3:] or list(qs)
        out = {}
        for name in names:
            fn = qs[name]
            spark.sparkContext.setJobDescription(name)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                if cmd == "noop":
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                else:
                    fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
            print(f"{name}: {out[name]}", flush=True)
        print(json.dumps(out))
        return

    if cmd == "pipeline":
        from sqllog_analysis_spark.plans.pipeline import PipelineConfig, run_pipeline

        inp = entry._transcripts_path(sf_dir)
        workdir = tempfile.mkdtemp(prefix="prof_", dir="/dev/shm")
        # warm-up
        tdf = spark.read.parquet(inp)
        warm_in = os.path.join(workdir, "warm.parquet")
        tdf.limit(2000).write.mode("overwrite").parquet(warm_in)
        run_pipeline(spark, PipelineConfig(input_path=warm_in, output_dir=os.path.join(workdir, "warm_out"), resume=False))
        best, best_stages = float("inf"), None
        for _ in range(3):
            outd = os.path.join(workdir, "out")
            shutil.rmtree(outd, ignore_errors=True)
            t0 = time.perf_counter()
            run_pipeline(spark, PipelineConfig(input_path=inp, output_dir=outd, resume=False))
            sec = time.perf_counter() - t0
            stages = {}
            mdir = os.path.join(outd, "_manifest")
            for fn_ in os.listdir(mdir):
                if fn_.endswith(".json"):
                    with open(os.path.join(mdir, fn_)) as f:
                        m = json.load(f)
                    stages[fn_[:-5]] = {
                        "wall_sec": m.get("wall_sec"),
                        "rows": m.get("row_count"),
                    }
            if sec < best:
                best, best_stages = sec, stages
            print(f"run: {sec:.3f}s stages={json.dumps(stages)}", flush=True)
        print(json.dumps({"best": round(best, 3), "stages": best_stages}))
        shutil.rmtree(workdir, ignore_errors=True)
        return

    raise SystemExit(f"unknown cmd {cmd}")


if __name__ == "__main__":
    main()

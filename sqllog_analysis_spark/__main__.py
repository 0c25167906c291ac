"""spark-submit entry point.

    spark-submit --py-files sqllog_analysis_spark.zip -m sqllog_analysis_spark ...
or locally:
    python -m sqllog_analysis_spark --input <transcripts.parquet> --output <dir>

Mirrors the reference CLI (src/main.rs → app::run, config in
src/config.rs): config validation exits 2 on invalid values, missing input
warns and exits 0 (app.rs:110-113 empty-directory behavior), and the run
prints the analysis summary the reference logs at the end of a batch.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sqllog_analysis_spark")
    ap.add_argument("--input", required=True, help="transcripts parquet path")
    ap.add_argument("--output", required=True, help="output directory (sinks + manifest)")
    ap.add_argument("--slow-ms", type=int, default=1000, help="slow-query threshold (ms)")
    ap.add_argument("--bucket", default="hour", choices=["minute", "hour", "day"])
    ap.add_argument("--no-resume", action="store_true", help="ignore the manifest and recompute")
    ap.add_argument("--export", default=None, help="also export routed records as csv|json to <output>/export")
    ap.add_argument("--cores", type=int, default=None, help="local[N] cores (default: local[*])")
    args = ap.parse_args(argv)

    if args.slow_ms <= 0:
        print("invalid --slow-ms: must be > 0", file=sys.stderr)
        return 2  # config validation exits 2 (config.rs:298-308)

    import os

    if not os.path.exists(args.input):
        print(f"warning: input not found: {args.input}", file=sys.stderr)
        return 0  # empty input is a warn-and-return (app.rs:110-113)

    from sqllog_analysis_spark.plans.pipeline import PipelineConfig, run_pipeline
    from sqllog_analysis_spark.session import get_spark

    spark = get_spark("sqllog_analysis_spark", cores=args.cores)
    summary = run_pipeline(
        spark,
        PipelineConfig(
            input_path=args.input,
            output_dir=args.output,
            slow_ms=args.slow_ms,
            bucket=args.bucket,
            resume=not args.no_resume,
        ),
    )
    if args.export:
        from sqllog_analysis_spark.sinks.writers import export_table, read_sink

        export_table(
            read_sink(spark, args.output),
            args.export,
            os.path.join(args.output, "export"),
        )
    print(json.dumps(summary, ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())

from sqllog_analysis_spark.functions.parse import parse_transcripts  # noqa: F401

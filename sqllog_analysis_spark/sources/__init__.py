from sqllog_analysis_spark.sources.transcripts import (  # noqa: F401
    generate_transcripts,
    role_tool_dim_rows,
    write_transcripts,
)

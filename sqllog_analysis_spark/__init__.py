"""sqllog_analysis_spark — a PySpark-native log/telemetry analytics engine.

A from-scratch rebuild of the capabilities of guangl/sqllog-analysis
(reference studied read-only at /root/reference) as an idiomatic Spark
pipeline: vectorized (Arrow/pandas-UDF) parse → broadcast-join enrich →
rule-based fan-out routing to per-category sinks → per-sink aggregates,
with checkpoint-manifest resume and explicit skew handling.

The reference is a single-process Rust + DuckDB tool; nothing here is a
translation of its code.  Reference citations (``path:line`` relative to
/root/reference) appear in docstrings only to document behavioral parity.
"""

__version__ = "0.1.0"

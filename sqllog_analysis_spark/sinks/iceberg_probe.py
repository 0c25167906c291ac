"""Iceberg availability probe (SURVEY.md §7.1 design stance: Iceberg sinks
with parquet fallback, decided at runtime by probing for the catalog jar).

The engine's sink schemas are identical either way; what Iceberg adds on a
real cluster is snapshot-atomic commits (replacing the manifest's
overwrite-idempotence story), sort-order metadata (K3), and time travel.
This sandbox ships no Iceberg jar, so the parquet path is what runs — but
the decision is probed, not assumed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime is on the JVM classpath AND a spark
    catalog is configured to use it."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 (py4j classpath probe)
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    confs = spark.sparkContext.getConf().getAll()
    return any(
        k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
        for k, v in confs
    )


def sink_format(spark: SparkSession) -> str:
    """'iceberg' when usable, else 'parquet' — the format write_category_sinks
    would pass to DataFrameWriter on a cluster with the jar present."""
    return "iceberg" if iceberg_available(spark) else "parquet"

"""Explicit skew handling (SURVEY.md §4 'missing from the reference').

The reference's unit of parallelism is a whole file — one huge file is one
slow task (duckdb_impl.rs:913-924 sequential loop).  Here a
mega-conversation is the analog.  AQE skew-join splitting is enabled in
session.py; this helper adds deterministic salting for wide ops keyed on
conv_id when AQE alone isn't enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(
    df: DataFrame, key: str, n_partitions: int, salt_buckets: int = 8, salt_on: str = "turn_idx"
) -> DataFrame:
    """Repartition on (key, salt) so one hot key spreads over
    ``salt_buckets`` partitions.  The salt is derived from a stable column
    (default turn_idx), so the layout is deterministic across retries —
    required for idempotent resume.

    Safe for per-row (narrow) stages like the parse UDF; per-key aggregates
    must re-aggregate across salt buckets afterwards (two-phase agg), which
    groupBy already does naturally when the salt is not in its keys.
    """
    salt = F.pmod(F.hash(F.col(salt_on)), F.lit(salt_buckets))
    return df.repartition(n_partitions, F.col(key), salt)


def two_phase_count(df: DataFrame, key: str, salt_buckets: int = 8) -> DataFrame:
    """Skew-proof count per key: partial count on (key, salt), then final
    sum on key.  The second shuffle moves ≤ salt_buckets rows per key."""
    salted = df.withColumn("_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets)))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("n"))

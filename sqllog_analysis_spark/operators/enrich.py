"""Broadcast-join enrichment (SURVEY.md §2.6 J1 — the north rule's lookup
enrich; the reference has no joins at all, its only multi-source op is a
UNION-ALL merge, duckdb_impl.rs:552-576).

The dim is tiny (≤100 rows) so both lookups are explicit ``broadcast()``
joins — zero shuffle of the big side, which is what survives a 100× scale-up.
Two-level lookup: exact (role, tool) match first, then per-role default
(tool IS NULL row), coalesced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich_with_dim(parsed: DataFrame, dim: DataFrame) -> DataFrame:
    """Left-join the (role, tool) lookup dim, with per-role default fallback.

    Adds ``category_hint`` and ``cost_weight`` columns.
    """
    exact = dim.filter(F.col("tool").isNotNull()).select(
        "role",
        "tool",
        F.col("category_hint").alias("_hint_exact"),
        F.col("cost_weight").alias("_w_exact"),
    )
    default = dim.filter(F.col("tool").isNull()).select(
        "role",
        F.col("category_hint").alias("_hint_role"),
        F.col("cost_weight").alias("_w_role"),
    )
    out = (
        parsed.join(F.broadcast(exact), ["role", "tool"], "left")
        .join(F.broadcast(default), ["role"], "left")
        .withColumn("category_hint", F.coalesce("_hint_exact", "_hint_role"))
        .withColumn("cost_weight", F.coalesce("_w_exact", "_w_role", F.lit(1.0)))
        .drop("_hint_exact", "_w_exact", "_hint_role", "_w_role")
    )
    return out

"""Dataset-assembly operators a training-data pipeline needs downstream of
dedup/quality: deterministic splits and sequence packing.

Both are pure column/window expressions (whole-stage codegen, no UDFs)
and both are engine-agnostic by construction — the driver contract
rebuilds them verbatim in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sqllog_analysis_spark.functions.text import token_count


def split_bucket(id_col, buckets: int = 100) -> F.Column:
    """Deterministic [0, buckets) bucket from md5 of the id — the standard
    reproducible train/val/test assignment: stable under re-runs, new data
    lands in the same proportions, and any engine can recompute membership
    (unlike rand(seed), which is engine-private).  Uses 7 hex chars
    (28 bits) so the int fits everywhere."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 7), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Add a ``split`` column (train/val/test) by deterministic hash bucket.

    Narrow (no shuffle, no sampling pass): at 100 TB the split is a free
    projection, and membership is recomputable row-locally forever."""
    b = split_bucket(id_col)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def pack_sequences(
    df: DataFrame,
    context_tokens: int = 2048,
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous streaming sequence packing: documents are laid end-to-end
    in (partition, id) order and each one is assigned to the
    ``context_tokens``-sized bin its FIRST token falls in — the standard
    dataloader packing rule for pre-shuffled corpora (deterministic, no
    bin-lookup state, reproducible in SQL; first-fit-decreasing would be
    inherently sequential and engine-private).

    Scale shape: the running sum windows over ``part_col`` (a shard /
    source key), so packing parallelizes across partitions and never
    needs a global sort.  Returns (part, bin_id, n_docs, n_tokens).
    """
    w = (
        Window.partitionBy("part")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = token_count(text_col)
    binned = df.select(
        F.col(part_col).alias("part"),
        F.col(id_col),
        n.alias("n_tokens"),
    ).withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / context_tokens),
    )
    return binned.groupBy("part", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )

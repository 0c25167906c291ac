"""Multi-dimensional data layout: Z-order (Morton-curve) clustering.

A single-column sort gives perfect parquet min/max pruning on that
column and NONE on any other.  Interleaving the bits of two (or more)
normalized key columns orders rows along a space-filling curve, so each
output file covers a small RECTANGLE of the key space — selective
filters on EITHER column skip most files (what Delta's ``ZORDER BY``
and Iceberg's sort-order transforms do at table-maintenance time).

Everything is column expressions (whole-stage codegen): the min/max
normalization is one tiny aggregate, the bit interleave is a fixed
unrolled shift/or chain, and the layout write is a range repartition +
in-partition sort on the z-value.  ``test_plans.py::test_zorder_layout_
bounds_both_columns`` pins the pruning property numerically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 2 dims × 21 bits = 42-bit z-values — inside a long, and 2^21 buckets
# per dimension is far finer than any realistic file count
_BITS = 21


def zorder_key(cols: list[Column], bits: int = _BITS) -> Column:
    """Morton interleave of pre-normalized integer columns (each must
    already be in [0, 2^bits))."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(c, i).cast("long").bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + d))
    return z


def _normalize(df: DataFrame, col: str, lo, hi, bits: int) -> Column:
    span = (hi - lo) or 1
    scaled = (F.col(col) - F.lit(lo)) / F.lit(span) * ((1 << bits) - 1)
    return F.least(
        F.greatest(scaled.cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = _BITS,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve over
    ``cols`` (numeric columns; each is min/max-normalized to ``bits``
    bits by one tiny aggregate).

    ``n_files`` range-partitions the z-values so every file holds a
    contiguous curve segment — a compact hyper-rectangle of the key
    space, which is what makes min/max stats selective on EVERY z
    column at once.

    Scale shape: one scan for the min/max bounds (column-pruned), one
    range exchange on the z-value (the same cost a plain global sort
    pays for ONE column), codegen everywhere.
    """
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    norm = [
        _normalize(df, c, bounds[f"_lo_{c}"], bounds[f"_hi_{c}"], bits)
        for c in cols
    ]
    (
        df.withColumn("_z", zorder_key(norm, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )

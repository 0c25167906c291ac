"""Interval (range) join — match left rows whose timestamp falls inside
right-side [start, end] windows, by key.

Spark compiles a raw ``l.ts BETWEEN r.start AND r.end`` predicate (plus a
key equality) into a sort-merge on the key with a per-key quadratic probe
— and with NO key at all into BroadcastNestedLoopJoin.  Both shapes die
at scale.  This operator uses the standard time-bucketing decomposition:

1. each right interval explodes to the fixed-width buckets it covers
   (``O(len/bucket)`` rows — pick ``bucket_seconds`` near the typical
   interval length so the blow-up is a small constant);
2. each left row lands in exactly ONE bucket (no left duplication);
3. an equi-join on (key, bucket) — hash-shuffled, AQE-skew-splittable —
   followed by the exact ``BETWEEN`` refinement filter.

Cost: one equi-shuffle each side; the theta predicate only ever runs on
bucket-colocated candidates.  All bucket arithmetic is integer epoch
seconds, so any engine reproduces the same match set exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def epoch_seconds(c: Column) -> Column:
    """Epoch seconds from TIMESTAMP / TIMESTAMP_NTZ / DATE alike — Spark 4
    forbids the direct NTZ→numeric cast; NTZ→TIMESTAMP→BIGINT is legal.
    The NTZ→TIMESTAMP mapping is session-tz dependent but MONOTONE
    NON-DECREASING (DST gaps/overlaps shift, never reorder), which is the
    only property the bucket prefilter needs — exact membership is always
    re-checked against the original values."""
    return c.cast("timestamp").cast("long")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_seconds: int = 600,
) -> DataFrame:
    """Inner join: left rows × right intervals containing them (same key).

    ``end`` is INCLUSIVE.  Result columns: all left columns + right's
    non-key columns; rows duplicate when a left row falls in several
    overlapping intervals (that IS the join semantic).
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    key = [on] if isinstance(on, str) else list(on)
    clash = (set(right.columns) - set(key)) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")
    if "_bucket" in (*left.columns, *right.columns):
        raise ValueError("input columns collide with internal scratch name '_bucket'")
    b = F.lit(bucket_seconds)
    l_sec = epoch_seconds(F.col(left_ts))
    s_sec = epoch_seconds(F.col(start))
    e_sec = epoch_seconds(F.col(end))
    r2 = right.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(s_sec / b), F.floor(e_sec / b))),
    )
    l2 = left.withColumn("_bucket", F.floor(l_sec / b))
    # refinement compares the ORIGINAL values (sub-second precision);
    # second-truncated bucket arithmetic is only the coarse prefilter —
    # truncation is monotone, so the covering bucket range never misses.
    joined = l2.join(r2, [*key, "_bucket"]).filter(
        (F.col(left_ts) >= F.col(start)) & (F.col(left_ts) <= F.col(end))
    )
    return joined.drop("_bucket")

"""As-of (point-in-time) join — the temporal operator Spark's DataFrame
API lacks but every log/telemetry pipeline needs: attach to each left row
the most recent right row at-or-before its timestamp (``backward``), or
the earliest at-or-after (``forward``).

Implementation is the canonical scale-safe union-tag shape, NOT a range
cross-join: left and right are unioned with a tag column, ONE shuffle
partitions by key, and a running ``last(ignorenulls)`` window over
``(ts, tag)`` carries the latest right payload forward onto each left
row.  Cost is a single exchange + per-key sort-merge — the same profile
as a groupBy — versus the O(|L|·|R|) per-key blowup of the naive
``l.ts >= r.ts`` theta-join.  At 100 TB: keys hash-partition uniformly;
a mega-key (one user with 10^9 events) serializes its window sort —
:func:`asof_join_bucketed` removes that straggler by partitioning on
(key, time-bucket) with carry-in boundary replication, at the cost of
one extra bucket-rollup pass (pytest pins its exact equality to this
function).

Ties: a right row at exactly the left timestamp IS visible (tag orders
right-before-left within equal ts), matching DuckDB's ``ASOF JOIN ...
ON l.ts >= r.ts`` — the driver contract hash-checks this operator
against that native implementation.  Right rows must be unique per
(key, ts) for a deterministic result; ``dedupe_right=True`` enforces it
by keeping the lexicographically greatest payload struct per (key, ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TAG = "_asof_tag"
_TS = "_asof_ts"

_RESERVED = (_TAG, _TS, "_m", "_bucket")


def _checked_rcols(left, right, key, right_ts) -> list:
    """Shared validation: right payload columns, name-clash and
    reserved-scratch-name checks (both as-of variants use identical
    rules, so they can never drift)."""
    rcols = [c for c in right.columns if c not in (*key, right_ts)]
    clash = set(rcols) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")
    if not rcols:
        raise ValueError("right side has no payload columns")
    bad = set(_RESERVED) & (set(left.columns) | set(right.columns))
    if bad:
        raise ValueError(
            f"input columns collide with internal scratch names: {sorted(bad)}"
        )
    return rcols


def _carried_struct(w, rcols):
    """Running last-right-row carry: ONE struct holds (matched ts,
    payload) so a NULL inside a right row's payload never falls back to
    an older right row — the whole latest-qualifying row wins or none
    does, exactly like a real join."""
    return F.last(
        F.when(F.col(_TAG) == 0, F.struct(F.col(_TS).alias("_mts"), *rcols)),
        ignorenulls=True,
    ).over(w)



def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    dedupe_right: bool = False,
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right payload
    columns (NULL where no right row qualifies).

    ``tolerance_seconds`` additionally voids matches farther than that
    from the left timestamp (pandas ``merge_asof`` semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    key = [on] if isinstance(on, str) else list(on)
    rcols = _checked_rcols(left, right, key, right_ts)

    r = right.select(*key, F.col(right_ts).alias(_TS), *rcols)
    if dedupe_right:
        packed = r.groupBy(*key, _TS).agg(
            F.max(F.struct(*rcols)).alias("_p")
        )
        r = packed.select(*key, _TS, *[F.col(f"_p.{c}").alias(c) for c in rcols])
    r = r.withColumn(_TAG, F.lit(0))

    lcols = left.columns
    l_ = left.withColumn(_TS, F.col(left_ts)).withColumn(_TAG, F.lit(1))
    u = l_.unionByName(r, allowMissingColumns=True)

    # backward: right rows flow forward in ascending (ts, tag) order;
    # forward: the same machinery over descending ts (tag still orders a
    # same-ts right row before the left row that may match it).
    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_TAG).asc()]
    else:
        order = [F.col(_TS).desc(), F.col(_TAG).asc()]
    w = (
        Window.partitionBy(*key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select("*", _carried_struct(w, rcols).alias("_m")).filter(
        F.col(_TAG) == 1
    )
    ok = F.col("_m").isNotNull()
    if tolerance_seconds is not None:
        # NTZ-safe numeric distance (Spark 4 forbids NTZ→numeric direct)
        dist = F.abs(
            F.col(_TS).cast("timestamp").cast("double")
            - F.col("_m._mts").cast("timestamp").cast("double")
        )
        ok = ok & (dist <= tolerance_seconds)
    payload = [F.when(ok, F.col(f"_m.{c}")).alias(c) for c in rcols]
    return filled.select(*lcols, *payload)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Backward as-of join partitioned by ``(key, time-bucket)`` — the
    mega-key scale path.

    :func:`asof_join` sorts each key's FULL history in one window
    partition; a hot key (one user with 10^9 events at 100 TB) becomes a
    single straggler task.  Here every (key, bucket) sorts independently:

    1. bucket-level "carry-in": per (key, bucket) take the latest right
       row with ``ts < bucket start``.  Computed on ROLLED-UP bucket rows
       (one per (key, bucket) the right side touches — |buckets| rows per
       key, not |rows|) with a tiny running-max window, then re-joined to
       at most one full right row per bucket.
    2. union: left rows + in-bucket right rows + the carry-in row, window
       per (key, bucket) — partitions are time-bounded, so the sort cost
       per task is O(rows in one bucket), regardless of key heat.

    Exactly equal to ``asof_join(left, right)`` for the backward
    direction (pinned by pytest on random corpora); right rows must be
    unique per (key, ts) as in the unbucketed form.
    """
    key = [on] if isinstance(on, str) else list(on)
    rcols = _checked_rcols(left, right, key, right_ts)
    b = F.lit(int(bucket_seconds))
    bucket_of = lambda c: F.floor(c.cast("timestamp").cast("long") / b)  # noqa: E731

    r = right.select(*key, F.col(right_ts).alias(_TS), *rcols).withColumn(
        "_bucket", bucket_of(F.col(_TS))
    )
    l_ = (
        left.withColumn(_TS, F.col(left_ts))
        .withColumn(_TAG, F.lit(1))
        .withColumn("_bucket", bucket_of(F.col(_TS)))
    )

    # -- 1. carry-in: the latest right row strictly before each bucket's
    # start.  Any right row in an EARLIER bucket is strictly before this
    # bucket starts, and in-bucket right rows already sit in the step-2
    # partition — so the carry-in is simply the max right ts over
    # preceding buckets.  Computed on ROLLED-UP rows (one per (key,
    # bucket) either side touches — |buckets| rows per key, not |rows|).
    per_bucket = r.groupBy(*key, "_bucket").agg(F.max(_TS).alias("_last_ts"))
    left_buckets = l_.select(*key, "_bucket").distinct()
    all_buckets = left_buckets.join(
        per_bucket, [*key, "_bucket"], "outer"
    )
    wb = (
        Window.partitionBy(*key)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_buckets.withColumn("_carry_ts", F.max("_last_ts").over(wb))
        .select(*key, "_bucket", "_carry_ts")
        .filter(F.col("_carry_ts").isNotNull())
    )
    # materialize the carry-in right ROW for each bucket (join on the
    # unique (key, ts) of the carried row), replicated into that bucket.
    carry_rows = (
        carry.join(
            r.select(*key, F.col(_TS).alias("_carry_ts"), *rcols),
            [*key, "_carry_ts"],
        )
        .select(*key, F.col("_carry_ts").alias(_TS), *rcols, "_bucket")
    )

    # -- 2. per-(key, bucket) union-tag window, same as the plain asof.
    r_in = r.withColumn(_TAG, F.lit(0))
    c_in = carry_rows.withColumn(_TAG, F.lit(0))
    u = l_.unionByName(r_in, allowMissingColumns=True).unionByName(
        c_in, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(*key, "_bucket")
        .orderBy(F.col(_TS).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select("*", _carried_struct(w, rcols).alias("_m")).filter(
        F.col(_TAG) == 1
    )
    payload = [F.when(F.col("_m").isNotNull(), F.col(f"_m.{c}")).alias(c) for c in rcols]
    return filled.select(*left.columns, *payload)

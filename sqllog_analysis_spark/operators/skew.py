"""Explicit skew handling (SURVEY.md §4 'missing from the reference').

The reference's unit of parallelism is a whole file — one huge file is one
slow task (duckdb_impl.rs:913-924 sequential loop).  Here the analogs are
a mega-conversation (bounded by the corpus cap) and, more importantly, a
HOT SINK PARTITION: the records sink is laid out by (category, dt), and
at 10^12-turn scale one (chat, <busy day>) combination is terabytes.  A
plain ``repartition("category", "dt")`` before the partitioned write —
the standard small-files fix — would funnel each hot combo through ONE
task.  :func:`salted_repartition` spreads each combo over a bounded
number of tasks instead, trading a controlled file count per partition
directory for a bounded task size.

AQE skew-join splitting (enabled in session.py) covers join-side skew;
this helper covers exchange-for-write skew, which AQE does not re-split
(the write ordering requirement pins the partitioning).

Note there is deliberately no "two-phase aggregate" helper here: Spark's
hash aggregate is already partial (map-side combine), so low-cardinality
groupBys like ``sink_counts`` move ≤ #groups rows per task regardless of
data skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F


def salted_repartition(
    df: DataFrame,
    keys: list[str | Column],
    salt_buckets: int = 8,
    salt_on: str | tuple[str, ...] = "conv_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (*keys, salt) so one hot key-combination spreads over
    ``salt_buckets`` partitions.  The salt is derived from stable row
    columns (``salt_on``), so the layout is deterministic across retries —
    required for idempotent resume (a rand() salt would re-deal rows on
    task retry and break speculative-execution consistency).

    ``salt_on`` should be fine-grained enough to split whatever can be hot:
    salting on conv_id alone spreads a hot (category, day) combo made of
    many conversations, but funnels a single mega-conversation into one
    bucket — pass a row-unique column tuple (e.g. conv_id + turn_idx) when
    per-row spread is wanted (writes need no per-conversation locality).

    Per-key aggregates downstream must re-aggregate across salt buckets
    (groupBy does this naturally when the salt is not among its keys);
    partitioned WRITES get at most ``salt_buckets`` files per partition
    directory per shuffle-collision group — bounded, unlike the
    tasks × combos explosion of writing from an unrelated partitioning.
    """
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    salt_src = (salt_on,) if isinstance(salt_on, str) else tuple(salt_on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(salt_buckets))
    if n_partitions is not None:
        return df.repartition(n_partitions, *cols, salt)
    return df.repartition(*cols, salt)

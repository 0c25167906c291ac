"""Physical-plan regression tests: the scale-critical plan shapes that
PLANS.md documents are asserted here, so a refactor that silently adds a
shuffle, drops a broadcast, loses parquet pushdown, or pulls a hot path
into Python fails CI instead of surfacing at 100 TB.

Assertions read ``explain('formatted')`` text — operator NAMES, not ids —
and count only structural facts (number of Exchanges, join strategy,
PushedFilters, absence of Python eval nodes)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_nodes(txt: str, name: str) -> int:
    # count plan TREE nodes — formatted lines like "+- Exchange (3)" or
    # "+- BroadcastHashJoin LeftOuter BuildRight (12)" — not the
    # operator-detail paragraphs below the tree
    import re

    pat = re.compile(rf"^[\s+\-:*]*{name}\b.*\(\d+\)$")
    return sum(1 for line in txt.splitlines() if pat.match(line))


def n_exchanges(txt: str) -> int:
    return n_nodes(txt, "Exchange")


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def test_funnel_one_data_exchange_regardless_of_depth(spark):
    from sqllog_analysis_spark.operators.loganalytics import funnel_counts

    e = _t(spark, "events")
    txt = plan_text(funnel_counts(e, ["view", "click", "purchase"]))
    # exchange 1: the user_id shuffle; exchange 2: single-row final reduce
    assert n_exchanges(txt) == 2
    assert txt.count("Window") >= 3  # one per step, stacked, no re-shuffle


def test_digest_aggregates_map_side_with_no_python(spark):
    from sqllog_analysis_spark.operators.loganalytics import sql_shape_digest

    d = spark.createDataFrame(
        [("select 1", 5)], "description string, execute_time long"
    )
    txt = plan_text(sql_shape_digest(d))
    # partial agg + final agg + result sort = 2 exchanges, nothing more
    assert n_exchanges(txt) == 2
    # the regexp normalizer chain must stay JVM-side
    assert "EvalPython" not in txt and "InPandas" not in txt


def test_broadcast_enrich_uses_broadcast_hash_join(spark):
    from sqllog_analysis_spark.operators.enrich import enrich_with_dim

    parsed = spark.createDataFrame(
        [("assistant", "sql_exec", 1)], "role string, tool string, x int"
    )
    dim = spark.createDataFrame(
        [("assistant", "sql_exec", "tool_call", 2.0), ("assistant", None, "chat", 1.0)],
        "role string, tool string, category_hint string, cost_weight double",
    )
    txt = plan_text(enrich_with_dim(parsed, dim))
    assert n_nodes(txt, "BroadcastHashJoin") == 2  # exact + role-default lookup
    assert "SortMergeJoin" not in txt


def test_filter_and_projection_reach_the_parquet_scan(spark):
    li = _t(spark, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    ).filter((F.col("l_extendedprice") > 5000) & (F.col("l_discount") < 0.05))
    txt = plan_text(li)
    assert "PushedFilters: [IsNotNull(l_extendedprice)" in txt or "GreaterThan(l_extendedprice" in txt
    # column pruning: the scan must not read the whole 11-column table
    sched = [l for l in txt.splitlines() if "ReadSchema" in l]
    assert sched and "l_quantity" not in sched[0] and "l_shipdate" not in sched[0]


def test_minhash_signatures_are_narrow(spark):
    from sqllog_analysis_spark.operators.dedup import minhash_signatures

    d = spark.createDataFrame(
        [(1, "a b c d e"), (2, "b c d e f")], "doc_id long, text string"
    )
    txt = plan_text(minhash_signatures(d, n_hashes=16, shingle_k=3))
    # signature derivation itself never hash-shuffles; the single allowed
    # exchange is the deliberate ROUND-ROBIN spread of a compact input
    # (dedup._spread_compact_input) that exists to unlock parallelism
    assert n_exchanges(txt) <= 1
    assert "hashpartitioning" not in txt
    assert ("RoundRobinPartitioning" in txt) == (n_exchanges(txt) == 1)


def test_heavy_hitters_second_pass_is_broadcast_semi(spark):
    from sqllog_analysis_spark.operators.loganalytics import heavy_hitters

    items = spark.createDataFrame(
        [(w,) for w in ["a"] * 30 + ["b"] * 5], "item string"
    )
    txt = plan_text(heavy_hitters(items, "item", 0.2))
    assert "BroadcastHashJoin" in txt and "LeftSemi" in txt
    # the MG sketch ran eagerly (bounded collect); the returned exact
    # pass is pure JVM — no Python stage in the plan that scans the data
    assert n_nodes(txt, "MapInPandas") == 0


@pytest.mark.parametrize(
    "which", ["asof", "interval"]
)
def test_temporal_joins_never_nested_loop(spark, which):
    from sqllog_analysis_spark.operators.asof import asof_join
    from sqllog_analysis_spark.operators.rangejoin import interval_join

    e = _t(spark, "events")
    left = e.select("event_id", "user_id", "ts")
    if which == "asof":
        right = e.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        )
        out = asof_join(left, right, on="user_id")
    else:
        right = (
            e.filter(F.col("event_type") == "error")
            .select("user_id", F.col("ts").alias("s"))
            .withColumn("en", F.col("s") + F.expr("INTERVAL 1 HOUR"))
        )
        out = interval_join(
            left, right, on="user_id", left_ts="ts", start="s", end="en"
        )
    txt = plan_text(out)
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts join
    with ZERO exchanges — the write-time layout (sinks/writers.py::
    write_bucketed) replaces the per-join shuffle, the property that
    makes repeated big-big joins affordable at 10^12 rows."""
    from sqllog_analysis_spark.sinks.writers import write_bucketed

    a = spark.range(0, 5000).select(
        (F.col("id") % 400).alias("k"), F.col("id").alias("va")
    )
    b = spark.range(0, 3000).select(
        (F.col("id") % 400).alias("k"), (F.col("id") * 2).alias("vb")
    )
    write_bucketed(a, "bt_a", str(tmp_path / "bt_a"), "k", buckets=8)
    write_bucketed(b, "bt_b", str(tmp_path / "bt_b"), "k", buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        txt = plan_text(joined)
        assert "SortMergeJoin" in txt
        assert n_exchanges(txt) == 0  # bucket layout satisfies the join
        # and the result is right (not just the plan shape)
        assert joined.count() == a.join(b, "k").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_zorder_layout_bounds_both_columns(spark, tmp_path):
    """Z-order clustering (sinks/layout.py::write_zordered) makes file
    min/max stats selective on BOTH key columns at once: per-file span
    on each dimension is a small fraction of the full range, while a
    single-column sort leaves the second column's spans at ~full range
    (no pruning possible)."""
    import glob

    import pyarrow.parquet as pq

    from sqllog_analysis_spark.sinks.layout import write_zordered

    n = 40_000
    df = spark.range(n).select(
        (F.hash(F.col("id")) % 10_000).alias("x"),
        (F.hash(F.col("id") + 7) % 10_000).alias("y"),
    ).filter((F.col("x") >= 0) & (F.col("y") >= 0))

    def spans(path, col):
        out = []
        for f in glob.glob(path + "/*.parquet"):
            pdf = pq.read_table(f, columns=[col]).to_pandas()[col]
            out.append(int(pdf.max()) - int(pdf.min()))
        return sum(out) / len(out) / 10_000  # avg span as range fraction

    zdir = str(tmp_path / "z")
    ldir = str(tmp_path / "linear")
    write_zordered(df, zdir, ["x", "y"], n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(ldir)

    # linear layout: perfect on x, useless on y
    assert spans(ldir, "x") < 0.15
    assert spans(ldir, "y") > 0.8
    # z-order: BOTH dimensions bounded well below the full range
    assert spans(zdir, "x") < 0.5
    assert spans(zdir, "y") < 0.5


def test_chunking_is_a_pure_projection(spark):
    from sqllog_analysis_spark.operators.corpus import chunk_documents

    d = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    txt = plan_text(chunk_documents(d, chunk_tokens=4, overlap=1))
    assert n_exchanges(txt) == 0
    assert "EvalPython" not in txt and "InPandas" not in txt

"""Cross-check the vectorized Spark parser against the pure-Python oracle —
the north rule's 'per-turn text equality under stable ordering' gate.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import norm_cell

from sqllog_analysis_spark import oracle
from sqllog_analysis_spark.functions.parse import parse_batch, parse_transcripts
from sqllog_analysis_spark.schema import TRANSCRIPT_SCHEMA
from sqllog_analysis_spark.sources.transcripts import generate_transcripts

COMPARE_COLS = [
    "conv_id", "turn_idx", "rec_idx", "occurrence_time", "ep", "session",
    "thread", "user", "trx_id", "statement", "appname", "ip", "sql_type",
    "description", "execute_time", "rowcount", "execute_id",
    "error", "error_class", "error_line", "raw", "has_ts",
]


def oracle_frame(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for t in df.itertuples():
        recs, errs, has = oracle.parse_turn_text(t.text or "")
        i = 0
        for r in recs:
            rows.append(
                {"conv_id": t.conv_id, "turn_idx": int(t.turn_idx), "rec_idx": i,
                 **r.__dict__, "error": None, "error_class": None,
                 "error_line": None, "raw": None, "has_ts": has}
            )
            i += 1
        for e in errs:
            rows.append(
                {"conv_id": t.conv_id, "turn_idx": int(t.turn_idx), "rec_idx": i,
                 "error": e.error, "error_class": e.error_class,
                 "error_line": e.line, "raw": e.raw, "has_ts": has}
            )
            i += 1
        if i == 0:
            # zero-output turn ⇒ one all-null sentinel row (visible to the
            # conversation-level degenerate rule, never routed)
            rows.append(
                {"conv_id": t.conv_id, "turn_idx": int(t.turn_idx), "rec_idx": 0,
                 "error": None, "error_class": None, "error_line": None,
                 "raw": None, "has_ts": has}
            )
    return (
        pd.DataFrame(rows)
        .reindex(columns=COMPARE_COLS)
        .sort_values(["conv_id", "turn_idx", "rec_idx"])
        .reset_index(drop=True)
    )


def assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert len(got) == len(want), (len(got), len(want))
    for c in COMPARE_COLS:
        gv = [norm_cell(x) for x in got[c]]
        wv = [norm_cell(x) for x in want[c]]
        bad = [i for i in range(len(gv)) if gv[i] != wv[i]]
        assert not bad, (c, bad[:3], [(gv[i], wv[i]) for i in bad[:2]])


@pytest.mark.parametrize("seed", [7, 42])
def test_parse_batch_matches_oracle(seed):
    df = generate_transcripts(2500, seed)
    got = parse_batch(df).sort_values(["conv_id", "turn_idx", "rec_idx"]).reset_index(drop=True)
    assert_frames_equal(got[COMPARE_COLS], oracle_frame(df))


def test_spark_parse_matches_oracle(spark):
    """Full Spark round trip: Arrow in, mapInPandas, Arrow out — partition
    boundaries must not change results."""
    df = generate_transcripts(1500, 11)
    sdf = spark.createDataFrame(df, schema=TRANSCRIPT_SCHEMA).repartition(7)
    got = (
        parse_transcripts(sdf)
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "rec_idx"])
        .reset_index(drop=True)
    )
    assert_frames_equal(got[COMPARE_COLS], oracle_frame(df))


def test_spark_parse_passthrough_turn_seq(spark):
    from pyspark.sql import Window, functions as F

    df = generate_transcripts(300, 3)
    sdf = spark.createDataFrame(df, schema=TRANSCRIPT_SCHEMA)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    sdf = sdf.withColumn("turn_seq", F.row_number().over(w))
    out = parse_transcripts(sdf)
    assert "turn_seq" in out.columns
    pdf = out.filter(F.col("error").isNull()).select("turn_idx", "turn_seq").toPandas()
    # dense turn_idx 0..n-1 per conv ⇒ row_number == turn_idx + 1
    assert (pdf["turn_seq"] == pdf["turn_idx"] + 1).all()


def test_empty_input(spark):
    sdf = spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)
    assert parse_transcripts(sdf).count() == 0


def test_parse_batch_strict_path_equals_general_path(monkeypatch):
    """r6: a batch whose (conv_id, turn_idx) keys are strictly increasing
    (the pipeline's ordering-window shape) skips the object-key sort and
    the passthrough hash merge for integer positional ops.  Both paths
    must produce IDENTICAL frames — values, dtypes AND row order — on the
    same ordered input; forcing the general path via _strictly_increasing
    pins that on a corpus with multi-record and slow-path turns."""
    from sqllog_analysis_spark.functions import parse as P

    df = (
        generate_transcripts(2500, 42)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    df["turn_seq"] = df.groupby("conv_id").cumcount() + 1
    assert P._strictly_increasing(df)
    got_strict = parse_batch(df, passthrough=["turn_seq"])
    monkeypatch.setattr(P, "_strictly_increasing", lambda _: False)
    got_general = parse_batch(df, passthrough=["turn_seq"])
    pd.testing.assert_frame_equal(got_strict, got_general)


def test_pint_matches_oracle_parse_int_strict():
    """The fused fast path's scalar int coercion must agree with the
    oracle's Rust-parse mirror on every tier: plain, zero-padded,
    overflow at both widths, empty/sign/space, Unicode digits."""
    from sqllog_analysis_spark.functions.parse import _pint

    cases = [
        "0", "7", "007", str(oracle.I32_MAX), str(oracle.I32_MAX + 1),
        str(oracle.I64_MAX), str(oracle.I64_MAX + 1), "0" * 30,
        "0" * 30 + "5", "1" * 25, "", "-1", "+1", " 1", "1 ", "1_0",
        "١٢٣", "5.0", "١" * 20, "9" * 18, "9" * 19, "0" * 18 + "9" * 19,
    ]
    for max_val in (oracle.I32_MAX, oracle.I64_MAX):
        for s in cases:
            assert _pint(s, max_val) == oracle._parse_int_strict(s, max_val), (
                s, max_val
            )
    assert _pint(None, oracle.I64_MAX) is None


def test_duplicate_turn_key_fails_loudly():
    """The passthrough re-attach merges on (conv_id, turn_idx); a dirty
    upstream with duplicate turn keys must raise, not silently fan out
    every parsed row per duplicate (the input contract guarantees
    uniqueness — this pins the failure mode when it's violated)."""
    df = generate_transcripts(20, 5)
    dup = pd.concat([df, df.iloc[[0]]], ignore_index=True)
    dup["turn_seq"] = range(len(dup))  # any passthrough column arms the merge
    with pytest.raises(ValueError, match="duplicate turn key"):
        parse_batch(dup, passthrough=["turn_seq"])

"""Property-based parity: for ARBITRARY turn text, the vectorized
parse_batch must agree with the pure-Python oracle row-for-row.

This is pandas-level (no Spark session) so hypothesis can run hundreds of
examples quickly; Spark-level equivalence of parse_batch is covered by
tests/test_spark_parser.py.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import example, given, settings, strategies as st

from sqllog_analysis_spark import oracle
from sqllog_analysis_spark.functions.parse import parse_batch
from tests.conftest import norm_cell

# Fragments chosen to exercise every branch: valid/invalid timestamps,
# header pieces, NULL tokens, metrics, U+FFFD, CRs, unicode, whitespace.
FRAGMENTS = st.sampled_from(
    [
        "2025-10-10 10:10:10.100",
        "2025-02-29 00:00:00.000",  # invalid date (not leap)
        "2024-02-29 23:59:59.999",  # valid leap date
        " (EP[1] sess:NULL thrd:-1 user:u trxid:1 stmt:NULL) [SEL]: body",
        " (EP[2] sess:0xab12 thrd:77 user:SYSDBA trxid:9 stmt:0xff appname: ip:::ffff:1.2.3.4)",
        " (EP[bad] sess:0x1 thrd:1 user:U trxid:1 stmt:0x2) x",
        "EXECTIME: 12(ms) ROWCOUNT: 3 EXEC_ID: 4.",
        "EXECTIME: abc(ms)",
        "plain continuation line",
        "完全不匹配的内容",
        "�garbled",
        "   ",
        "\t lead tab",
        "line with \r carriage",
        "",
    ]
)

LINE = st.lists(FRAGMENTS, min_size=1, max_size=4).map(" ".join)
TEXT = st.lists(LINE, min_size=1, max_size=6).map("\n".join)

COMPARE_COLS = [
    "rec_idx", "occurrence_time", "ep", "session", "thread", "user",
    "trx_id", "statement", "appname", "ip", "sql_type", "description",
    "execute_time", "rowcount", "execute_id",
    "error", "error_class", "error_line", "raw", "has_ts",
]


@settings(max_examples=200, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
# regression: a "\n\n" tail — python's `$` matches before a final newline,
# so the terminator strip `\n$` removed TWO newlines and shifted the
# reference's flush line number (found by hypothesis in round 3)
@example(["2025-10-10 10:10:10.100\n\n"])
def test_parse_batch_equals_oracle_on_arbitrary_text(texts):
    df = pd.DataFrame(
        {
            "conv_id": [f"c{i:03d}" for i in range(len(texts))],
            "turn_idx": range(len(texts)),
            "role": "user",
            "tool": None,
            "ts": pd.Timestamp("2025-01-01"),
            "text": texts,
        }
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    got = parse_batch(df)

    rows = []
    for t in df.itertuples():
        recs, errs, has = oracle.parse_turn_text(t.text)
        i = 0
        for r in recs:
            rows.append({"conv_id": t.conv_id, "rec_idx": i, **r.__dict__,
                         "error": None, "error_class": None, "error_line": None,
                         "raw": None, "has_ts": has})
            i += 1
        for e in errs:
            rows.append({"conv_id": t.conv_id, "rec_idx": i, "error": e.error,
                         "error_class": e.error_class, "error_line": e.line,
                         "raw": e.raw, "has_ts": has})
            i += 1
        if i == 0:
            # zero-output turn ⇒ one all-null sentinel row (keeps the turn
            # visible to the conversation-level degenerate rule)
            rows.append({"conv_id": t.conv_id, "rec_idx": 0, "error": None,
                         "error_class": None, "error_line": None,
                         "raw": None, "has_ts": has})
    want = pd.DataFrame(rows).reindex(columns=["conv_id", *COMPARE_COLS])
    want = want.sort_values(["conv_id", "rec_idx"]).reset_index(drop=True)
    got = got.sort_values(["conv_id", "rec_idx"]).reset_index(drop=True)

    assert len(got) == len(want)
    for c in COMPARE_COLS:
        gv = [norm_cell(x) for x in got[c]]
        wv = [norm_cell(x) for x in want[c]]
        assert gv == wv, (c, [(a, b) for a, b in zip(gv, wv) if a != b][:3])

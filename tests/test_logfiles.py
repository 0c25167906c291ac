"""Raw dmsql_*.log file-mode parity — the graft of
tests/error_writer_integration_tests.rs:9-180 and the file-discovery rules
of src/app.rs:82-102.
"""

from __future__ import annotations

import json
import os

from sqllog_analysis_spark.oracle import NO_VALID_LINE
from sqllog_analysis_spark.plans.pipeline import build
from sqllog_analysis_spark.sources.logfiles import discover_sqllog_files, read_sqllog_dir

GOOD = (
    "2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:1 user:usr trxid:1 stmt:NULL) [SEL]: select *\n"
    "from users\n"
    "EXECTIME: 1500(ms) ROWCOUNT: 1 EXEC_ID: 123.\n"
    "2025-09-21 12:00:01.000 (EP[2] sess:0xabc thrd:2 user:usr trxid:2 stmt:NULL) [UPD]: update t\n"
)
WITH_BAD_LINE = (
    "2025-09-21 12:00:02.000 (EP[1] sess:NULL thrd:1 user:usr trxid:1 stmt:NULL) [SEL]: ok\n"
    "2025-09-21 12:00:03.000 (EP[x] broken header\n"
)


def make_dir(tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    (d / "dmsql_a.log").write_text(GOOD, encoding="utf-8")
    (d / "dmsql_b.LOG").write_text(WITH_BAD_LINE, encoding="utf-8")
    (d / "dmsql_junk_only.log").write_text("no timestamps here\n", encoding="utf-8")
    (d / "other_a.log").write_text(GOOD, encoding="utf-8")  # wrong prefix
    (d / "dmsql_c.txt").write_text(GOOD, encoding="utf-8")  # wrong extension
    return str(d)


def test_discovery_rules(tmp_path):
    d = make_dir(tmp_path)
    names = [os.path.basename(p) for p in discover_sqllog_files(d)]
    assert names == ["dmsql_a.log", "dmsql_b.LOG", "dmsql_junk_only.log"]


def test_file_mode_end_to_end(spark, tmp_path):
    d = make_dir(tmp_path)
    tdf = read_sqllog_dir(spark, d)
    g = build(spark, tdf)

    recs = g["routed"].collect()
    by_file = {}
    for r in recs:
        by_file.setdefault(r["conv_id"], []).append(r)
    assert len(by_file["dmsql_a.log"]) == 2
    assert len(by_file["dmsql_b.LOG"]) == 1
    assert "dmsql_junk_only.log" not in by_file  # degenerate file

    a = sorted(by_file["dmsql_a.log"], key=lambda r: r["rec_idx"])
    assert a[0]["description"] == "select *\nfrom users\nEXECTIME: 1500(ms) ROWCOUNT: 1 EXEC_ID: 123."
    assert a[0]["execute_time"] == 1500 and a[0]["category"] == "slow_query"
    assert a[1]["ep"] == 2
    assert a[1]["description"] == "update t"  # terminator \n, no phantom line

    errs = g["errors"].collect()
    by_path = {}
    for e in errs:
        by_path.setdefault(e["path"], []).append(e)
    # dmsql_b: the broken-header segment is a Format error, line = 2
    # (segment-relative counter quirk, parser.rs:359-367)
    assert len(by_path["dmsql_b.LOG"]) == 1
    assert by_path["dmsql_b.LOG"][0]["line"] == 2
    # junk-only file → exactly one synthetic degenerate error (io.rs:147-167)
    assert len(by_path["dmsql_junk_only.log"]) == 1
    assert by_path["dmsql_junk_only.log"][0]["raw"] == NO_VALID_LINE


def test_empty_dir_yields_empty_frame(spark, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    assert read_sqllog_dir(spark, str(d)).count() == 0


def test_empty_file_yields_nothing(spark, tmp_path):
    # empty file → no record, no error (sqllog_tests.rs:86-94)
    d = tmp_path / "logs2"
    d.mkdir()
    (d / "dmsql_empty.log").write_text("", encoding="utf-8")
    g = build(spark, read_sqllog_dir(spark, str(d)))
    assert g["routed"].count() == 0 and g["errors"].count() == 0


def test_error_sink_jsonl_shape(spark, tmp_path):
    """error_writer.rs:147-152 JSONL field parity through the real sink."""
    from sqllog_analysis_spark.sinks.writers import write_error_sink

    d = make_dir(tmp_path)
    g = build(spark, read_sqllog_dir(spark, d))
    out = str(tmp_path / "sink")
    write_error_sink(g["errors"], out)
    lines = []
    err_dir = os.path.join(out, "parse_errors")
    for fn in os.listdir(err_dir):
        if fn.endswith(".json"):
            with open(os.path.join(err_dir, fn)) as f:
                lines += [json.loads(line) for line in f if line.strip()]
    assert lines and all(set(o) <= {"path", "line", "error", "raw"} for o in lines)

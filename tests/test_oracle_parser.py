"""Ports of the reference's behavioral tests (SURVEY.md §5 — every case in
/root/reference/tests/sqllog_tests.rs et al.) against the pure-Python oracle.

These pin the semantics the vectorized Spark parser is then cross-checked
against in test_spark_parser.py.
"""

from __future__ import annotations

from sqllog_analysis_spark import oracle
from sqllog_analysis_spark.oracle import ParsedRecord, parse_turn_text

FULL = (
    "2025-10-10 10:10:10.100 (EP[1] sess:0x1234 thrd:1234 user:SYSDBA "
    "trxid:5678 stmt:0xabcd appname:TestApp ip:127.0.0.1) [SEL]: "
    "EXECTIME: 123(ms) ROWCOUNT: 456 EXEC_ID: 789."
)


def one_record(text: str) -> ParsedRecord:
    recs, errs, _ = parse_turn_text(text)
    assert len(recs) == 1 and not errs, (recs, errs)
    return recs[0]


# --- full-line parse with all fields (sqllog_tests.rs:463-478, 614-630) ---
def test_full_record():
    r = one_record(FULL)
    assert r.occurrence_time == "2025-10-10 10:10:10.100"
    assert r.ep == 1
    assert r.session == "0x1234"
    assert r.thread == "1234"
    assert r.user == "SYSDBA"
    assert r.trx_id == "5678"
    assert r.statement == "0xabcd"
    assert r.appname == "TestApp"
    assert r.ip == "127.0.0.1"
    assert r.sql_type == "SEL"
    assert (r.execute_time, r.rowcount, r.execute_id) == (123, 456, 789)


# --- NULL-token mapping (sqllog_tests.rs:57-71) ---
def test_null_tokens():
    r = one_record(
        "2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:NULL user:NULL "
        "trxid:NULL stmt:NULL) [SEL]: select 1 EXECTIME: 1(ms)"
    )
    assert r.session is None and r.thread is None and r.user is None
    assert r.trx_id is None and r.statement is None


# --- thread '-1' kept as string (parser.rs:117-127) ---
def test_thread_minus_one():
    r = one_record(
        "2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:-1 user:usr "
        "trxid:1 stmt:NULL) [SEL]: x"
    )
    assert r.thread == "-1"


# --- lenient EXECTIME (sqllog_tests.rs:74-84, 394-417, 480-491) ---
def test_lenient_no_metrics():
    r = one_record(
        "2025-10-10 10:10:10.100 (EP[1] sess:0x1234 thrd:1234 user:SYSDBA "
        "trxid:5678 stmt:0xabcd) [SEL]: desc without numbers"
    )
    assert (r.execute_time, r.rowcount, r.execute_id) == (None, None, None)
    assert r.description == "desc without numbers"


def test_partial_metrics():
    r = one_record(FULL.replace("EXECTIME: 123(ms) ROWCOUNT: 456 EXEC_ID: 789.", "EXECTIME: 123(ms)"))
    assert (r.execute_time, r.rowcount, r.execute_id) == (123, None, None)


def test_non_numeric_metrics_none():
    r = one_record(
        FULL.replace("EXECTIME: 123(ms) ROWCOUNT: 456 EXEC_ID: 789.",
                     "EXECTIME: abc(ms) ROWCOUNT: def EXEC_ID: ghi.")
    )
    assert (r.execute_time, r.rowcount, r.execute_id) == (None, None, None)


def test_metrics_only_on_last_line():
    text = (
        "2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:1 user:usr trxid:1 "
        "stmt:NULL) [SEL]: select *\nEXECTIME: 9(ms) mid line\nfinal line"
    )
    r = one_record(text)
    assert r.execute_time is None  # EXECTIME not on the last line
    assert r.description == "select *\nEXECTIME: 9(ms) mid line\nfinal line"


# --- ep handling ---
def test_ep_non_numeric_is_error():
    # EP[abc] → header regex non-match → Format (sqllog_tests.rs:387-392)
    recs, errs, has = parse_turn_text(
        "2025-10-10 10:10:10.100 (EP[abc] sess:0x1 thrd:1 user:U trxid:1 stmt:0x2) test"
    )
    assert not recs and len(errs) == 1 and errs[0].error_class == "Format"
    assert has  # the timestamp line itself is valid


def test_ep_overflow_is_error():
    recs, errs, _ = parse_turn_text(
        "2025-10-10 10:10:10.100 (EP[99999999999] sess:0x1 thrd:1 user:U trxid:1 stmt:0x2) test"
    )
    assert not recs and errs[0].error_class == "Format"


# --- missing header field → Format (sqllog_tests.rs:420-429, 453-460) ---
def test_missing_field_format_error():
    recs, errs, _ = parse_turn_text(
        "2025-10-10 10:10:10.100 (EP[1] thrd:1 user:U trxid:1 stmt:0x2) test"
    )
    assert not recs and len(errs) == 1
    assert errs[0].error.startswith("日志格式错误: 行2: ")


# --- timestamp validator truth table (sqllog_tests.rs:194-219, 269-284) ---
def test_timestamp_truth_table():
    ok = oracle.is_first_row
    assert ok("2025-10-10 10:10:10.100")
    assert ok("2024-02-29 00:00:00.000")  # leap year
    assert not ok("2025-02-29 00:00:00.000")  # not a leap year
    assert not ok("2024-02-30 00:00:00.000")
    assert not ok("2025-13-01 00:00:00.000")
    assert not ok("2025-00-01 00:00:00.000")
    assert not ok("2025-01-00 00:00:00.000")
    assert not ok("0000-01-01 00:00:00.000")
    assert not ok("2025-10-10 24:00:00.000")
    assert not ok("2025-10-10 10:60:00.000")
    assert not ok("2025-10-10 10:10:60.000")
    assert not ok("2025/10/10 10:10:10.100")
    assert not ok("2025-10-10T10:10:10.100")
    assert not ok("2025-10-10 10:10:10.10")  # wrong length


# --- multi-line stitching, exact description equality
#     (sqllog_tests.rs:124-192, 221-249) ---
def test_multiline_stitch():
    text = (
        "2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:1 user:usr trxid:1 "
        "stmt:NULL) [SEL]: select *\nfrom users\nwhere id = 1\n"
        "EXECTIME: 100(ms) ROWCOUNT: 1 EXEC_ID: 123."
    )
    r = one_record(text)
    assert r.description == "select *\nfrom users\nwhere id = 1\nEXECTIME: 100(ms) ROWCOUNT: 1 EXEC_ID: 123."
    assert (r.execute_time, r.rowcount, r.execute_id) == (100, 1, 123)


def test_params_multiline_with_unicode():
    text = (
        "2025-09-16 20:02:53.562 (EP[0] sess:0x6da8ccef0 thrd:4146217 "
        "user:EDM_BASE trxid:122154453026 stmt:0x6da900ef0 appname: "
        "ip:::ffff:10.80.147.109) PARAMS(SEQNO, TYPE, DATA)={(0, NUMBER, 1705459), "
        "(1, VARCHAR2, '字节跳动⚫'), (19, VARCHAR2, '\n1\n1'), "
        "(30, TIMESTAMP, 2025-09-16 20:02:53)}"
    )
    r = one_record(text)
    assert r.appname is None  # empty capture
    assert r.ip == "10.80.147.109"  # ::ffff: stripped
    assert r.sql_type is None
    assert (r.execute_time, r.rowcount, r.execute_id) == (None, None, None)
    assert "'\n1\n1'" in r.description


# --- consecutive segments in one text (sqllog_tests.rs:653-672) ---
def test_two_segments_one_turn():
    text = (
        "2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:1 user:usr trxid:1 stmt:NULL) [SEL]: a\n"
        "2025-09-21 12:00:01.000 (EP[2] sess:NULL thrd:2 user:usr trxid:2 stmt:NULL) [UPD]: b"
    )
    recs, errs, _ = parse_turn_text(text)
    assert len(recs) == 2 and not errs
    assert recs[0].description == "a" and recs[1].description == "b"
    assert recs[0].ep == 1 and recs[1].ep == 2


# --- trailing junk merges into previous description (sqllog_tests.rs:529-546) ---
def test_trailing_junk_merges():
    text = (
        "2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:1 user:usr trxid:1 stmt:NULL) [SEL]: a\n"
        "trailing junk no timestamp"
    )
    recs, errs, _ = parse_turn_text(text)
    assert len(recs) == 1 and not errs
    assert recs[0].description == "a\ntrailing junk no timestamp"


# --- leading whitespace (sqllog_tests.rs:632-651) ---
def test_leading_whitespace_stripped():
    r = one_record(
        "  \t2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:1 user:usr trxid:1 stmt:NULL) [SEL]: x"
    )
    assert r.occurrence_time == "2025-09-21 12:00:00.000"


# --- appname/ip edge cases (sqllog_tests.rs:353-384, 590-596) ---
def test_appname_single_space():
    # sqllog_tests.rs:368-371: two spaces + valid ip → appname is one space
    r = one_record(
        "2025-10-10 10:10:10.100 (EP[1] sess:0x1 thrd:1 user:U trxid:1 "
        "stmt:0x2 appname:  ip:::ffff:127.0.0.1) test"
    )
    assert r.appname == " " and r.ip == "127.0.0.1"


def test_appname_empty_ip_swallowed():
    # empty ip: the lazy appname group captures '  ip:' (same in Rust)
    r = one_record(
        "2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:1 user:usr trxid:1 "
        "stmt:NULL appname:  ip:) [SEL]: x"
    )
    assert r.appname == "  ip:" and r.ip is None


def test_appname_whitespace_only():
    # sqllog_tests.rs:381-383: 'appname:  ) test' → whitespace-only appname
    r = one_record(
        "2025-10-10 10:10:10.100 (EP[1] sess:0x1 thrd:1 user:U trxid:1 "
        "stmt:0x2 appname:  ) test"
    )
    assert r.appname is not None and r.appname.strip() == ""


def test_appname_captures_garbled_ip():
    r = one_record(
        "2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:1 user:usr trxid:1 "
        "stmt:NULL appname:!@# ip:!@#) [SEL]: x"
    )
    assert r.appname == "!@# ip:!@#" and r.ip is None


# --- whitespace-only / junk-only turns ---
def test_whitespace_only_dropped():
    recs, errs, has = parse_turn_text("   \n\t  ")
    assert not recs and not errs and not has


def test_junk_only_format_error():
    recs, errs, has = parse_turn_text("not a log")
    assert not recs and len(errs) == 1 and not has
    assert errs[0].line == 2  # segment-relative quirk: lines-in-segment + 1
    assert errs[0].raw == "not a log"


def test_junk_lines_stitch_single_error():
    recs, errs, has = parse_turn_text("junk one\njunk two\njunk three")
    assert not recs and len(errs) == 1 and not has
    assert errs[0].line == 4
    assert errs[0].raw == "junk one\njunk two\njunk three"


# --- U+FFFD repair + resync (sqllog_tests.rs:674-699, pinned deviation) ---
def test_utf8_repair_resync():
    text = (
        "�\x01garbled 2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:1 "
        "user:usr trxid:1 stmt:NULL) [SEL]: x EXECTIME: 5(ms)"
    )
    recs, errs, has = parse_turn_text(text)
    assert len(recs) == 1 and has
    assert recs[0].execute_time == 5
    assert len(errs) == 1 and errs[0].error_class == "Utf8"
    assert errs[0].error.startswith("UTF8解码错误: len=")


# --- line-number quirk for errors after a valid record ---
def test_error_line_number_segment_relative():
    text = (
        "2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:1 user:usr trxid:1 stmt:NULL) [SEL]: a\n"
        "2025-09-21 12:00:01.000 (EP[x] broken header"
    )
    recs, errs, _ = parse_turn_text(text)
    assert len(recs) == 1 and len(errs) == 1
    assert errs[0].line == 2  # reset to 1 at segment start, +1 for its line


# --- calendar-invalid timestamp line is a continuation, not a segment ---
def test_invalid_date_line_is_continuation():
    text = (
        "2025-09-21 12:00:00.000 (EP[1] sess:NULL thrd:1 user:usr trxid:1 stmt:NULL) [SEL]: a\n"
        "2025-02-29 00:00:00.000 this is not a valid date"
    )
    recs, errs, _ = parse_turn_text(text)
    assert len(recs) == 1 and not errs
    assert recs[0].description == "a\n2025-02-29 00:00:00.000 this is not a valid date"

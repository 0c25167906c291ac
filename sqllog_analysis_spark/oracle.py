"""Pure-Python reference parser (the in-repo correctness oracle).

A row-at-a-time, readable port of the reference's parse semantics, used by
pytest as ground truth for the vectorized Spark parser and by the Spark
parser itself as the slow path for the rare shapes (multi-segment turns,
U+FFFD repair, junk-leading turns).

Behavioral parity targets (citations into /root/reference):
  - segment stitching & line numbering   src/sqllog/parser.rs:338-367
  - header regex & field coercion        src/sqllog/parser.rs:79, 106-161
  - lenient trailing metrics             src/sqllog/parser.rs:237-258
  - timestamp calendar validation        src/sqllog/utils.rs:12-93
  - U+FFFD repair + resync               src/sqllog/utils.rs:122-161
  - empty-segment drop                   src/sqllog/parser.rs:288-291
  - error message formats                src/sqllog/types.rs:12-37

Pinned deviation (SURVEY.md §7.4): Spark reads text already UTF-8-decoded,
so byte-exact Utf8 error details are unreproducible; we detect replacement
chars (U+FFFD) per line and emit the Utf8-class error with a
``len=<utf8-byte-len> prefix=<first 8 bytes>`` message over the *decoded*
line, then resync exactly like utils.rs:150-158.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Header regex — same pattern as src/sqllog/parser.rs:79 (Rust `regex` and
# Python `re` agree on every construct used: (?s), lazy groups, \w unicode).
HEADER_RE = re.compile(
    r"(?s)(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}) "
    r"\(EP\[(\d+)\] sess:(NULL|0x[0-9a-f]+) thrd:(-1|NULL|\d+) "
    r"user:(NULL|\w+) trxid:(NULL|\d+) stmt:(NULL|0x[0-9a-f]+)"
    r"(?:\sappname:(.*?))?"
    r"(?:\sip(?::(?:::ffff:)?([0-9]{1,3}(?:\.[0-9]{1,3}){3}))?)?\)\s"
    r"(?:\[(INS|DEL|ORA|UPD|SEL)\]:?\s)?((?:.|\n)*)"
)

# Trailing-metrics regex — src/sqllog/parser.rs:240
METRICS_RE = re.compile(
    r"EXECTIME:\s*(\d+)\(ms\)(?:\s+ROWCOUNT:\s*(\d+))?(?:\s+EXEC_ID:\s*(\d+))?"
)

# Timestamp shape: ASCII digits only (utils.rs uses is_ascii_digit)
_TS_SHAPE = re.compile(r"[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}\.[0-9]{3}$")

DAYS_IN_MONTH = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

I32_MAX = 2**31 - 1
I64_MAX = 2**63 - 1

NO_VALID_LINE = "无有效日志行"  # io.rs:160 synthetic degenerate-input error


def is_leap_year(year: int) -> bool:
    """utils.rs:6-8"""
    return (year % 4 == 0 and year % 100 != 0) or year % 400 == 0


def is_first_row(s: str) -> bool:
    """Byte-for-byte port of the 23-char timestamp validator utils.rs:12-93."""
    if len(s) != 23 or not _TS_SHAPE.match(s):
        return False
    year = int(s[0:4])
    month = int(s[5:7])
    day = int(s[8:10])
    if year == 0 or month == 0 or month > 12:
        return False
    max_days = DAYS_IN_MONTH[month - 1]
    if month == 2 and is_leap_year(year):
        max_days += 1
    if day == 0 or day > max_days:
        return False
    hour = int(s[11:13])
    minute = int(s[14:16])
    second = int(s[17:19])
    return hour <= 23 and minute <= 59 and second <= 59


def find_first_row_pos(s: str) -> int | None:
    """utils.rs:102-107 — first index where a valid 23-char timestamp starts."""
    n = len(s)
    if n < 23:
        return None
    for i in range(n - 22):
        if is_first_row(s[i : i + 23]):
            return i
    return None


def _parse_int_strict(s: str, max_val: int) -> int | None:
    """Rust ``parse::<iN>()``: ASCII digits only, overflow fails."""
    if not s or not s.isascii() or not s.isdigit():
        return None
    v = int(s)
    return v if v <= max_val else None


def _parse_i64_lenient(s: str | None) -> int | None:
    """parser.rs:246-256 — ``.parse::<i64>().ok()`` on an optional capture."""
    if s is None:
        return None
    return _parse_int_strict(s, I64_MAX)


@dataclass
class ParsedRecord:
    """The 14 Sqllog fields (types.rs:44-74)."""

    occurrence_time: str
    ep: int
    session: str | None
    thread: str | None
    user: str | None
    trx_id: str | None
    statement: str | None
    appname: str | None
    ip: str | None
    sql_type: str | None
    description: str
    execute_time: int | None
    rowcount: int | None
    execute_id: int | None


@dataclass
class ParseError:
    """(line, raw, error) tuple per parser.rs flush_content / utils.rs repair."""

    line: int
    raw: str
    error_class: str  # 'Format' | 'Utf8' | 'Other'
    error: str  # display string, types.rs:12-37 format


def format_error(line: int, content: str) -> ParseError:
    return ParseError(line, content, "Format", f"日志格式错误: 行{line}: {content}")


def _last_line(desc: str) -> str:
    """Rust ``desc.lines().last().unwrap_or("")`` (parser.rs:244)."""
    if desc == "":
        return ""
    parts = desc.split("\n")
    if parts[-1] == "":
        parts.pop()
    last = parts[-1] if parts else ""
    return last[:-1] if last.endswith("\r") else last


def parse_desc_numbers(desc: str) -> tuple[int | None, int | None, int | None]:
    """Lenient trailing-metrics extraction (parser.rs:237-258): EXECTIME must
    match on the LAST line for any capture; ROWCOUNT/EXEC_ID optional in
    order; no match ⇒ all None and the record still succeeds."""
    m = METRICS_RE.search(_last_line(desc))
    if not m:
        return (None, None, None)
    return (
        _parse_i64_lenient(m.group(1)),
        _parse_i64_lenient(m.group(2)),
        _parse_i64_lenient(m.group(3)),
    )


def from_line(segment: str, line_num: int) -> ParsedRecord | ParseError:
    """parser.rs:76-161 — header regex match + field coercion."""
    m = HEADER_RE.search(segment)
    if not m:
        return format_error(line_num, segment)
    ep = _parse_int_strict(m.group(2), I32_MAX)
    if ep is None:
        return format_error(line_num, segment)

    def opt(idx: int) -> str | None:
        v = m.group(idx)
        return None if v == "NULL" else v

    thread = m.group(4)
    thread = None if thread == "NULL" else thread  # '-1' kept (parser.rs:117-127)
    appname = m.group(8) or None  # empty capture → None (parser.rs:131-134)
    ip = m.group(9) or None  # empty capture → None (parser.rs:135-138)
    description = m.group(11)
    et, rc, eid = parse_desc_numbers(description)
    return ParsedRecord(
        occurrence_time=m.group(1),
        ep=ep,
        session=opt(3),
        thread=thread,
        user=opt(5),
        trx_id=opt(6),
        statement=opt(7),
        appname=appname,
        ip=ip,
        sql_type=m.group(10),
        description=description,
        execute_time=et,
        rowcount=rc,
        execute_id=eid,
    )


def _repair_utf8_line(line: str, line_num: int, errors: list[ParseError]) -> str:
    """Pinned-deviation port of utils.rs:122-161 over decoded text: emit a
    Utf8-class error, trim, resync to the next embedded valid timestamp."""
    b = line.encode("utf-8")
    prefix = b[: min(8, len(b))]
    msg = f"len={len(b)} prefix={list(prefix)}" + ("..." if len(b) > 8 else "")
    errors.append(ParseError(line_num, msg, "Utf8", f"UTF8解码错误: {msg}"))
    s = line.lstrip(" \t�")
    pos = find_first_row_pos(s)
    if pos:
        s = s[pos:]
    return s


def parse_turn_text(
    text: str,
) -> tuple[list[ParsedRecord], list[ParseError], bool]:
    """Run the segment state machine (parser.rs:338-367) over one turn's
    text, treating it like the reference treats one file's line stream.

    Returns (records, errors, has_first_row).  Line numbering replicates the
    reference quirk: per-segment counter resets to 1 at each segment start
    and increments per line, so a flushed segment's error line is
    (lines-in-segment + 1); leading junk before the first timestamp is
    flushed with (junk-lines + 1).

    The conversation-level degenerate rule (io.rs:147-167) is NOT applied
    here — it needs the max of has_first_row across all turns of the
    conversation; see plans/pipeline.py.
    """
    records: list[ParsedRecord] = []
    errors: list[ParseError] = []
    has_first_row = False
    content: list[str] = []
    line_num = 1

    # '\n' is a line TERMINATOR, not a separator (io.rs:186-198 read_until):
    # a newline-terminated text has no phantom empty last line
    if text.endswith("\n"):
        text = text[:-1]

    def flush(num: int) -> None:
        segment = "\n".join(content)
        if segment.strip() == "":  # parser.rs:288-291 empty-segment drop
            return
        r = from_line(segment, num)
        if isinstance(r, ParsedRecord):
            records.append(r)
        else:
            errors.append(r)

    for raw_line in text.split("\n"):
        line = raw_line
        if "�" in line:
            line = _repair_utf8_line(line, line_num, errors)
        clean = line.lstrip(" \t�").rstrip("\r\n")
        is_new = len(clean) >= 23 and is_first_row(clean[:23])
        if is_new:
            has_first_row = True
            if content:
                flush(line_num)
                content = []
            line_num = 1
        # parser.rs:362-366: push_str on an EMPTY buffer skips empty lines
        # (no separator is added), so leading empty lines never open a
        # segment; line_num still counts them
        if content or clean != "":
            content.append(clean)
        line_num += 1
    if content:
        flush(line_num)
    return records, errors, has_first_row

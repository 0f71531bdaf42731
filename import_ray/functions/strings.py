"""String kernels mirroring the reference's StringUtil semantics
(util/src/main/java/org/datacommons/util/StringUtil.java).

These are scalar helpers used inside ``map_batches`` kernels; hot paths
that can be vectorized (namespace strip, date regexes) have pyarrow
equivalents in the stages that use them.
"""

from __future__ import annotations

import re
from datetime import datetime


class SplitError(ValueError):
    def __init__(self, counter: str, message: str):
        super().__init__(message)
        self.counter = counter


def split_structured_line_with_escapes(
    line: str, delimiter: str, expression_symbol: str = '"'
) -> tuple[list[str], bool]:
    """Split on ``delimiter`` outside ``expression_symbol`` pairs;
    backslash escapes pass through unchanged
    (StringUtil.SplitStructuredLineWithEscapes, java:65-91).

    Returns (columns, all_expressions_closed).
    """
    columns: list[str] = []
    in_expr = False
    in_escape = False
    start = 0
    for i, c in enumerate(line):
        if in_escape:
            in_escape = False
        elif c == "\\":
            in_escape = True
        elif not in_expr and c == delimiter:
            columns.append(line[start:i])
            start = i + 1
        elif c == expression_symbol:
            in_expr = not in_expr
    columns.append(line[start:])
    return columns, not in_expr


def strip_enclosing_quote_pair(val: str) -> str:
    """StringUtil.stripEnclosingQuotePair (java:220-227)."""
    if len(val) > 1 and val[0] == '"' and val[-1] == '"':
        return "" if len(val) == 2 else val[1:-1]
    return val


def split_and_strip_with_quote_escape(
    orig: str,
    delimiter: str = ",",
    include_empty: bool = False,
    strip_enclosing_quotes: bool = True,
    strip_escapes_before_quotes: bool = False,
) -> list[str]:
    """StringUtil.splitAndStripWithQuoteEscape (java:174-218).

    Raises SplitError for multi-line values or unbalanced quotes;
    returns [] when all tokens are empty (the reference logs
    StrSplit_EmptyToken and returns empty).
    """
    if "\n" in orig:
        raise SplitError("StrSplit_MultiToken", "Found a new-line in value")
    parts, closed = split_structured_line_with_escapes(orig, delimiter)
    if not closed:
        raise SplitError(
            "StrSplit_BadQuotesInToken",
            "Found token with incorrectly double-quoted value",
        )
    results: list[str] = []
    for s in parts:
        s = s.strip()
        if strip_enclosing_quotes:
            s = strip_enclosing_quote_pair(s)
        if include_empty or s:
            if strip_escapes_before_quotes:
                s = s.replace('\\"', '"')
            results.append(s)
    return results


_LONG_RE = re.compile(r"^[+-]?\d+$")
_UNSIGNED_LONG_RE = re.compile(r"^\+?\d+$")
_JAVA_INF_NAN = {"Infinity", "-Infinity", "+Infinity", "NaN"}
_PY_ONLY_FLOAT = re.compile(r"(?i)inf|nan")


def is_number(val: str) -> bool:
    """StringUtil.isNumber (java:93-110): parses as Java long, unsigned
    long, or double."""
    if _LONG_RE.match(val):
        return True
    if "_" in val:  # Python float()/int() accept underscores; Java doesn't
        return False
    if _PY_ONLY_FLOAT.search(val):
        return val in _JAVA_INF_NAN
    try:
        float(val)
        return True
    except ValueError:
        return False


def is_bool(val: str) -> bool:
    """StringUtil.isBool (java:112-115)."""
    return val.lower() in ("true", "1", "false", "0")


# ISO-8601 date patterns (StringUtil.java:42-59). Each entry:
# (java_pattern, regex, strptime builder). Lengths are pre-filtered as in
# the reference.
_DATE_PATTERNS: list[tuple[str, re.Pattern, str]] = [
    ("yyyy", re.compile(r"^\d{4}$"), "%Y"),
    ("yyyy-M", re.compile(r"^\d{4}-\d{1,2}$"), "%Y-%m"),
    ("yyyy-M-d", re.compile(r"^\d{4}-\d{1,2}-\d{1,2}$"), "%Y-%m-%d"),
    ("yyyyMM", re.compile(r"^\d{6}$"), "%Y%m"),
    ("yyyyMMdd", re.compile(r"^\d{8}$"), "%Y%m%d"),
    (
        "yyyy-MM-dd'T'HH:mm",
        re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}$"),
        "%Y-%m-%dT%H:%M",
    ),
    (
        "yyyy-MM-dd'T'HH:mm:ss",
        re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$"),
        "%Y-%m-%dT%H:%M:%S",
    ),
    (
        "yyyy-MM-dd'T'HH:mm:ss.SSS",
        re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}$"),
        "%Y-%m-%dT%H:%M:%S.%f",
    ),
    (
        "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
        re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}[+-]\d{2}:\d{2}$"),
        "",
    ),
]
# StringUtil.java EXTRA_DATE_PATTERNS: 5- and 7-digit dates (CPP compat)
_EXTRA_DATE_PATTERNS = [re.compile(r"^\d{5}$"), re.compile(r"^\d{7}$")]


def get_valid_iso8601_date_pattern(date_value: str) -> str:
    """Return the matched Java pattern name or "" (StringUtil.java:117-135)."""
    for pattern_name, rx, fmt in _DATE_PATTERNS:
        if rx.match(date_value):
            if _validate_date(date_value, fmt):
                return pattern_name
    for rx in _EXTRA_DATE_PATTERNS:
        if rx.match(date_value):
            return rx.pattern
    return ""


def _validate_date(date_value: str, fmt: str) -> bool:
    if not fmt:  # offset pattern — regex already validated shape
        try:
            datetime.fromisoformat(date_value)
            return True
        except ValueError:
            return False
    try:
        datetime.strptime(date_value, fmt)
        return True
    except ValueError:
        return False


def get_valid_iso8601_date(date_value: str) -> datetime | None:
    """Parse with month/day defaulting to 1 (StringUtil.java:137-157)."""
    for _, rx, fmt in _DATE_PATTERNS:
        if rx.match(date_value):
            if not fmt:
                try:
                    return datetime.fromisoformat(date_value).replace(tzinfo=None)
                except ValueError:
                    return None
            try:
                return datetime.strptime(date_value, fmt)
            except ValueError:
                return None
    return None

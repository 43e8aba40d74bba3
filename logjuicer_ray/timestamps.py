"""Timestamp parsing and day-rollover resolution.

Port of crates/model/src/timestamps.rs:22-109.  Epochs are integer
milliseconds since the Unix epoch (``Epoch``, report.rs:572-575); time-only
values are milliseconds since midnight.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

__all__ = ["parse_timestamp", "set_date", "TS_FULL", "TS_TIME"]

TS_FULL = "full"
TS_TIME = "time"

HOUR_MS = 3_600_000
DAY_MS = HOUR_MS * 24

# {"date":1708419555.859087, — epoch seconds + exactly 3 parsed millis digits
_JSON_DATE_RE = re.compile(r'^\{"date":(\d+)\.(\d{3})')

# %F %T[,.]%3f and friends; chrono's parse_and_remainder allows trailing text
_FULL_RES = [
    # %F %T,%3f
    re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2}) (\d{1,2}):(\d{1,2}):(\d{1,2}),(\d{3})"),
    # %FT%T
    re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2})T(\d{1,2}):(\d{1,2}):(\d{1,2})()"),
    # %F %T.%3f
    re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2}) (\d{1,2}):(\d{1,2}):(\d{1,2})\.(\d{3})"),
    # %F %T
    re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2}) (\d{1,2}):(\d{1,2}):(\d{1,2})()"),
    # [%Y/%m/%d %T]
    re.compile(r"^\[(\d{4})/(\d{1,2})/(\d{1,2}) (\d{1,2}):(\d{1,2}):(\d{1,2})()\]"),
]

# time-only at offset 6: %T.%3f  (e.g. kubelet "I0220 08:45:08.004309")
_TIME_DOT_RE = re.compile(r"^(\d{1,2}):(\d{1,2}):(\d{1,2})\.(\d{3})")
# %b %d %T followed by a space (e.g. "Feb 27 11:06:45 ")
_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    )
}
_TIME_SYSLOG_RE = re.compile(
    r"^(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) (\d{1,2}) "
    r"(\d{1,2}):(\d{1,2}):(\d{1,2}) "
)


def _epoch_ms(y: int, mo: int, d: int, h: int, mi: int, s: int, ms: int) -> int | None:
    try:
        dt = datetime(y, mo, d, h, mi, s, tzinfo=timezone.utc)
    except ValueError:
        return None
    return int(dt.timestamp() * 1000) + ms


def parse_timestamp(line: str) -> tuple[str, int] | None:
    """Parse a leading timestamp from a log line (timestamps.rs:22-49).

    Returns ``("full", epoch_ms)``, ``("time", ms_since_midnight)`` or None.
    """
    m = _JSON_DATE_RE.match(line)
    if m:
        return (TS_FULL, int(m.group(1)) * 1000 + int(m.group(2)))
    if line[:1] in (" ", "\t", "\n"):
        # chrono parse_and_remainder trims leading spaces; the reference
        # explicitly refuses those lines (timestamps.rs:27-29)
        return None
    for rx in _FULL_RES:
        m = rx.match(line)
        if m:
            g = m.groups()
            ms = int(g[6]) if g[6] else 0
            epoch = _epoch_ms(int(g[0]), int(g[1]), int(g[2]), int(g[3]), int(g[4]), int(g[5]), ms)
            if epoch is not None:
                return (TS_FULL, epoch)
            break  # calendar-invalid date: fall through to time-only formats
    m = _TIME_DOT_RE.match(line[6:])
    if m:
        h, mi, s, ms = (int(x) for x in m.groups())
        if h < 24 and mi < 60 and s < 60:
            return (TS_TIME, (h * 3600 + mi * 60 + s) * 1000 + ms)
    m = _TIME_SYSLOG_RE.match(line)
    if m:
        h, mi, s = int(m.group(3)), int(m.group(4)), int(m.group(5))
        if h < 24 and mi < 60 and s < 60:
            return (TS_TIME, (h * 3600 + mi * 60 + s) * 1000)
    return None


def set_date(date_time_ms: int, time_ms: int) -> int:
    """Combine a known full datetime with a time-of-day, resolving ±12h day
    rollover (timestamps.rs:90-109)."""
    known_time = date_time_ms % DAY_MS
    known_date = date_time_ms // DAY_MS * DAY_MS
    diff = abs(known_time - time_ms)
    if known_time > time_ms:
        if diff > HOUR_MS * 12:
            return known_date + DAY_MS + time_ms  # the time is tomorrow
        return known_date + time_ms
    if diff > HOUR_MS * 12:
        return known_date - DAY_MS + time_ms  # the time is yesterday
    return known_date + time_ms

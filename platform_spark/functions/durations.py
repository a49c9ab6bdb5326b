"""Duration and timestamp literal parsing for the KAFSQL dialect.

The reference accepts Go-style durations plus an ``Nd`` day extension
(server.go:2864-2878) and three timestamp literal shapes: epoch-millis,
``YYYY-MM-DD HH:MM:SS[.mmm]`` and RFC3339 (parser.go:405-424). This is a
fresh implementation of the same surface.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

_GO_UNITS = {
    "ns": 1e-9,
    "us": 1e-6,
    "µs": 1e-6,
    "ms": 1e-3,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
    "d": 86400.0,  # KAFSQL extension: days
}

_DUR_PART = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d)")


def parse_duration(text: str) -> float:
    """Parse ``1h30m``, ``90s``, ``1.5h``, ``7d`` → seconds (float)."""
    text = text.strip().lower()
    if not text:
        raise ValueError("empty duration")
    pos = 0
    total = 0.0
    for m in _DUR_PART.finditer(text):
        if m.start() != pos:
            raise ValueError(f"invalid duration {text!r}")
        total += float(m.group(1)) * _GO_UNITS[m.group(2)]
        pos = m.end()
    if pos != len(text):
        raise ValueError(f"invalid duration {text!r}")
    return total


_SQL_TS = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?$"
)


def parse_ts_literal(text: str) -> datetime:
    """Timestamp literal → tz-naive UTC datetime.

    Accepts epoch-millis integers, ``YYYY-MM-DD HH:MM:SS[.fff]`` and
    RFC3339 (``2026-01-02T15:04:05Z`` / with offset).
    """
    text = text.strip().strip("'\"")
    if re.fullmatch(r"\d{12,}", text):
        return datetime.fromtimestamp(int(text) / 1000.0, tz=timezone.utc).replace(
            tzinfo=None
        )
    m = _SQL_TS.match(text)
    if m:
        frac = (m.group(7) or "").ljust(6, "0")
        return datetime(
            *(int(m.group(i)) for i in range(1, 7)), int(frac) if frac else 0
        )
    try:
        dt = datetime.fromisoformat(text.replace("Z", "+00:00"))
    except ValueError as e:
        raise ValueError(f"invalid timestamp literal {text!r}") from e
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def format_duration_interval(seconds: float) -> str:
    """Seconds → a Spark SQL ``INTERVAL`` expression string."""
    return f"INTERVAL {seconds:.6f} SECOND"

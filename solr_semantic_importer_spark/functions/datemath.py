"""Solr DateMath gap arithmetic for range faceting / timeseries.

Reference contract: Solr's ``DateMathParser`` (used by ``facet.range.gap``
on ``pdate`` fields and by the ``timeseries()`` streaming expression)
steps bucket boundaries with ``Calendar.add`` semantics in UTC —
fixed-width units (SECOND/MINUTE/HOUR/DAY) are plain arithmetic, while
MONTH/YEAR are *variable-width*: ``+1MONTH`` from Jan 31 lands on Feb 29
(day-of-month clamped to the target month's length), and every
subsequent boundary is derived from the ORIGINAL start, not the clamped
previous boundary (``start + i*gap``, the facet.range contract at
solr RangeEndpointCalculator).

Engine realization: month-unit boundaries are enumerated driver-side
(bucket count is a response-sized constant, never data-sized) and bucket
assignment compiles to ONE codegen expression over a literal boundary
array — ``array_max(filter(boundaries, b -> b <= x))`` — so the facet
keeps the exact one-partial-agg-shuffle plan of the fixed-width path.

All instants are UTC. A tz-naive ISO input is *interpreted as UTC*
(Solr mandates Z-suffixed instants; the machine's local timezone must
never leak into bucket boundaries — r5 ADVICE fix).
"""

from __future__ import annotations

import datetime as _dt
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "iso_sec",
    "parse_gap",
    "parse_instant",
    "month_bucket_starts",
    "boundary_bucket_expr",
    "MAX_RANGE_BUCKETS",
]

# Solr guards facet.range explosion the same way (FacetRangeProcessor
# computes all buckets up front); past this the request is a mistake.
MAX_RANGE_BUCKETS = 100_000

_GAP_RE = re.compile(r"^\+(\d+)(SECOND|MINUTE|HOUR|DAY|MONTH|YEAR)S?$")
_FIXED_SEC = {"SECOND": 1.0, "MINUTE": 60.0, "HOUR": 3600.0, "DAY": 86400.0}


def iso_sec(v) -> float:
    """ISO-8601 instant -> epoch seconds. ``Z`` and explicit offsets are
    honored; a tz-NAIVE instant is interpreted as UTC, never the host's
    local timezone."""
    d = _dt.datetime.fromisoformat(str(v).replace("Z", "+00:00"))
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return d.timestamp()


def parse_gap(v) -> tuple[str, float]:
    """Parse a DateMath gap into ``("sec", seconds)`` for fixed-width
    units or ``("months", n)`` for MONTH/YEAR (YEAR = 12 months — Solr's
    Calendar.add(YEAR) equals add(MONTH, 12) for gap stepping since the
    day-of-month clamp only ever applies at month granularity)."""
    m = _GAP_RE.match(str(v))
    if m is None:
        raise ValueError(
            "date gap must be +N(SECOND|MINUTE|HOUR|DAY|MONTH|YEAR)S, "
            f"got {v!r}"
        )
    n, unit = int(m.group(1)), m.group(2)
    if n <= 0:
        raise ValueError(f"date gap must be positive, got {v!r}")
    if unit in _FIXED_SEC:
        return ("sec", n * _FIXED_SEC[unit])
    return ("months", float(n if unit == "MONTH" else 12 * n))


_UNIT_ALIASES = {
    "SECOND": "SECOND", "SECONDS": "SECOND",
    "MINUTE": "MINUTE", "MINUTES": "MINUTE",
    "HOUR": "HOUR", "HOURS": "HOUR",
    "DAY": "DAY", "DAYS": "DAY", "DATE": "DAY",  # Solr: DATE ≡ DAY
    "MONTH": "MONTH", "MONTHS": "MONTH",
    "YEAR": "YEAR", "YEARS": "YEAR",
}
_UNIT_RE = "|".join(sorted(_UNIT_ALIASES, key=len, reverse=True))
_OP_RE = re.compile(rf"(/({_UNIT_RE}))|([+-])(\d+)({_UNIT_RE})")


def _round_down(d: _dt.datetime, unit: str) -> _dt.datetime:
    if unit == "SECOND":
        return d.replace(microsecond=0)
    if unit == "MINUTE":
        return d.replace(second=0, microsecond=0)
    if unit == "HOUR":
        return d.replace(minute=0, second=0, microsecond=0)
    if unit == "DAY":
        return d.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "MONTH":
        return d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    return d.replace(month=1, day=1, hour=0, minute=0, second=0,
                     microsecond=0)  # YEAR


def parse_instant(expr, now_sec: float | None = None) -> float:
    """Full Solr DateMath INSTANT expression -> epoch seconds. Grammar
    (DateMathParser): base = ``NOW`` or an ISO-8601 instant, followed by
    any chain of ``/UNIT`` round-downs and ``±N UNIT`` offsets —
    ``NOW-7DAYS``, ``NOW/DAY+6MONTHS``, ``2024-01-31T00:00:00Z+1MONTH``.
    ``DATE`` aliases ``DAY`` (Solr); MONTH/YEAR offsets use real UTC
    calendar arithmetic with day-of-month clamping; all rounding is UTC.

    ``now_sec`` pins NOW (the Solr ``NOW`` request param — pass it for
    deterministic/distributed-consistent requests); defaults to the
    current time. A plain ISO instant (no math) parses like
    :func:`iso_sec` (tz-naive = UTC)."""
    s = str(expr).strip()
    if s.upper().startswith("NOW"):
        import time as _time

        base = now_sec if now_sec is not None else _time.time()
        d = _dt.datetime.fromtimestamp(base, _dt.timezone.utc)
        rest = s[3:]
    else:
        zi = s.find("Z")
        if zi >= 0 and zi < len(s) - 1:
            d = _dt.datetime.fromtimestamp(
                iso_sec(s[: zi + 1]), _dt.timezone.utc)
            rest = s[zi + 1:]
        else:
            return iso_sec(s)  # plain instant, math only after Z/NOW
    pos = 0
    while pos < len(rest):
        m = _OP_RE.match(rest, pos)
        if m is None:
            raise ValueError(
                f"bad DateMath op at {rest[pos:]!r} in {expr!r} "
                f"(expected /UNIT or ±N UNIT)"
            )
        if m.group(1):  # /UNIT round-down
            d = _round_down(d, _UNIT_ALIASES[m.group(2)])
        else:
            sign = 1 if m.group(3) == "+" else -1
            n = sign * int(m.group(4))
            unit = _UNIT_ALIASES[m.group(5)]
            if unit in ("MONTH", "YEAR"):
                d = _add_months_utc(d, n * (12 if unit == "YEAR" else 1))
            else:
                d = d + _dt.timedelta(seconds=n * _FIXED_SEC[unit])
        pos = m.end()
    return d.timestamp()


def _add_months_utc(d: _dt.datetime, n: int) -> _dt.datetime:
    """``Calendar.add(MONTH, n)`` in UTC: day-of-month clamps to the
    target month's length (Jan 31 + 1 month = Feb 28/29), time-of-day
    preserved."""
    y, m0 = divmod((d.year * 12 + (d.month - 1)) + n, 12)
    # last day of target month: day 1 of the month after, minus one day
    ny, nm = (y, m0 + 2) if m0 < 11 else (y + 1, 1)
    last = (_dt.datetime(ny, nm, 1, tzinfo=_dt.timezone.utc)
            - _dt.timedelta(days=1)).day
    return d.replace(year=y, month=m0 + 1, day=min(d.day, last))


def month_bucket_starts(
    start_sec: float, end_sec: float, n_months: int
) -> list[float]:
    """Bucket start epochs for a MONTH/YEAR gap: ``start + i*gap`` with
    every boundary derived from the ORIGINAL start (so Jan 31 +1MONTH
    steps Feb 29, Mar 31, Apr 30 — each clamped independently, the Solr
    RangeEndpointCalculator shape). Includes one boundary past ``end``
    (the last bucket's exclusive end; Solr's default hardend=false lets
    it extend beyond ``end``)."""
    if end_sec <= start_sec:
        raise ValueError("facet.range needs end > start")
    start = _dt.datetime.fromtimestamp(start_sec, _dt.timezone.utc)
    out: list[float] = []
    i = 0
    while True:
        b = _add_months_utc(start, i * n_months).timestamp()
        out.append(b)
        if b >= end_sec:
            return out
        if len(out) > MAX_RANGE_BUCKETS:
            raise ValueError(
                f"facet.range would produce more than {MAX_RANGE_BUCKETS} "
                f"buckets — widen the gap"
            )
        i += 1


def boundary_bucket_expr(x: Column, starts: list[float]) -> Column:
    """Bucket-start assignment for NON-UNIFORM boundaries: the largest
    boundary <= x, as one codegen expression over a literal array (O(B)
    per row inside whole-stage codegen, zero extra shuffles). Callers
    filter to [starts[0], end) first so the filter() is never empty."""
    arr = F.array(*[F.lit(float(b)) for b in starts])
    return F.array_max(F.filter(arr, lambda b: b <= x))

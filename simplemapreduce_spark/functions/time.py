"""Timestamp helpers shared by batch and streaming plans.

The synthetic ``events.ts`` column is plain ``timestamp[us]`` parquet
(no timezone flag), which Spark reads as TIMESTAMP_NTZ and DuckDB as a
naive TIMESTAMP. Epoch extraction must therefore be wall-clock
arithmetic: ``unix_micros`` only accepts TIMESTAMP_LTZ, and any
NTZ→LTZ cast silently goes through the *session* timezone, so the
same query would return different values on a cluster whose driver
isn't pinned to UTC. ``timestampdiff`` on two NTZ values is pure
wall-clock math — session-timezone independent and bit-identical to
DuckDB's ``epoch_us``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since 1970-01-01 00:00:00 for a TIMESTAMP_NTZ
    column, independent of ``spark.sql.session.timeZone``.

    Equals DuckDB ``epoch_us(ts)`` on naive timestamps.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), c)


def micros_to_ntz(micros: Column) -> Column:
    """Inverse of :func:`epoch_micros`: integer epoch-microseconds to a
    TIMESTAMP_NTZ, session-timezone independent (wall-clock add onto
    the NTZ epoch, not an LTZ conversion)."""
    return F.timestamp_add("MICROSECOND", micros, F.expr(_EPOCH_NTZ))


def date_trunc_ntz(unit: str, col: Column | str) -> Column:
    """Wall-clock ``date_trunc`` that PRESERVES TIMESTAMP_NTZ.

    Spark's ``F.date_trunc`` on an NTZ column returns TIMESTAMP_LTZ —
    it casts through ``spark.sql.session.timeZone`` — so (a) collected
    values render shifted on any non-UTC session (the driver-gate
    failure mode of the round-5 advice) and (b) downstream epoch
    extraction silently inherits the session offset. This version is
    pure date/epoch arithmetic: DATE casts for day-and-coarser units
    (NTZ→DATE drops the time-of-day with no zone anywhere) and
    epoch-microsecond floor division for hour/minute. Bit-identical to
    DuckDB ``date_trunc`` on naive timestamps in every session zone,
    including zones whose DST transition lands on midnight (where the
    LTZ round-trip would shift a truncated day to 01:00).
    """
    c = F.col(col) if isinstance(col, str) else col
    u = unit.lower()
    if u == "day":
        return c.cast("date").cast("timestamp_ntz")
    if u in ("week", "month", "quarter", "year"):
        return F.trunc(c.cast("date"), u).cast("timestamp_ntz")
    if u in ("hour", "minute"):
        step = 3_600_000_000 if u == "hour" else 60_000_000
        return micros_to_ntz(F.floor(epoch_micros(c) / step).cast("long") * step)
    raise ValueError(f"unsupported unit: {unit}")


def ntz_as_event_time(col: Column | str) -> Column:
    """TIMESTAMP_NTZ → TIMESTAMP_LTZ with the naive value read as UTC,
    independent of the session timezone (epoch arithmetic, not a cast).

    Structured Streaming only accepts TIMESTAMP_LTZ as an event-time /
    watermark column; a plain cast would route the wall-clock through
    ``spark.sql.session.timeZone`` and shift window boundaries on any
    non-UTC driver. DST-transition hours would even make session
    windows non-deterministic under a cast.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(epoch_micros(c))


def event_time_to_ntz(col: Column | str) -> Column:
    """Inverse of :func:`ntz_as_event_time` for rendering streaming
    window bounds: LTZ epoch back to the naive UTC wall clock."""
    c = F.col(col) if isinstance(col, str) else col
    return micros_to_ntz(F.unix_micros(c))


# Shared 30-minute session gap used by every sessionization plan
# (plans/timeseries.py gaps-and-islands, plans/analytics.py bounce rate,
# streaming session windows) — one constant so the modules cannot desync.
SESSION_GAP_MICROS = 30 * 60 * 1_000_000

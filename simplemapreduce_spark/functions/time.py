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

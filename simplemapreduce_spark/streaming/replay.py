"""Multi-file event-time replay utilities — fixture ordering and the
absolute correctness gate for the stateful sessionizer's replay
harnesses (tools/kill_resume_scan.py, tests/test_streaming_incremental).

Extracted to the library (round-8 review) so the gate semantics live in
ONE place and importing them carries no module-level side effects (the
CLI tool mutates PYTHONPATH at import time, which a test import must
not inherit).

Production relevance at 100 TB (BASELINE.md round-8 postmortem):
FileStreamSource replays files in MODIFICATION-TIME order, and a
parallel writer stamps part files with task-completion times — so an
event-time streaming replay over a multi-file landing zone is
out-of-order unless the zone guarantees mtime order, and the watermark
then silently drops whole late files. `order_ranged_mtimes` is the
writer-side discipline; `islands_expectation` is the independent batch
oracle that makes the drop loud.
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame


def order_ranged_mtimes(ranged_dir: str) -> None:
    """Stamp part-0000k files with ascending mtimes so a file-stream
    replay processes them in range (= event-time) order. Range
    partition k holds the k-th ts range, so lexicographic part order is
    ts order; 10-second spacing keeps the ordering robust to filesystem
    mtime granularity."""
    parts = sorted(glob.glob(os.path.join(ranged_dir, "part-*.parquet")))
    base = time.time() - 10 * len(parts)
    for k, p in enumerate(parts):
        os.utime(p, (base + 10 * k, base + 10 * k))


def islands_expectation(ev: DataFrame, gap_us: int) -> tuple[set, set]:
    """The absolute gate for a sessionize replay over the events table:
    collect (user_id, event-time micros) exactly as the streaming path
    derives them (NTZ -> LTZ -> unix_micros) and return
    ``(non_final, finals)`` session-key sets — every correct in-order
    replay must emit each non-final island exactly once and may close
    or withhold each final island (closed-by-timeout requires a batch
    to run AFTER the final watermark commit; a kill there leaves the
    restart with no new data and no no-data batch ever fires)."""
    from pyspark.sql import functions as F

    from simplemapreduce_spark.functions.time import ntz_as_event_time
    from simplemapreduce_spark.streaming.stateful import sessionize_islands

    events = [
        (r.u, r.us)
        for r in ev.select(
            F.col("user_id").alias("u"),
            F.unix_micros(ntz_as_event_time("ts")).alias("us"),
        ).collect()
    ]
    non_final, final = sessionize_islands(events, gap_us)
    return non_final, set(final.values())


def session_keys(rowset) -> set:
    """(user, start, last, n) keys of emitted session rows — closed_by
    is excluded from cross-run comparison (gap-vs-timeout for the same
    session is a batch-composition artifact). WITHIN one run a key must
    be unique: a state machine that lost the 'already closed' fact
    would re-emit the same session under the other closure label, which
    a key-set compare alone cannot see (round-8 review) — use
    ``duplicate_keys`` alongside."""
    return {(u, s, l, n) for u, s, l, n, _ in rowset}


def duplicate_keys(rowset) -> set:
    """Keys emitted more than once within a single run's output (same
    session under two closed_by labels) — always a correctness bug."""
    seen: set = set()
    dups: set = set()
    for u, s, l, n, _ in rowset:
        k = (u, s, l, n)
        if k in seen:
            dups.add(k)
        seen.add(k)
    return dups

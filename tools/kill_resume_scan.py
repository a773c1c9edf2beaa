"""Kill-and-resume fault scan for the stateful sessionizer — the
reproduction harness behind the round-7 watch entry in BASELINE.md
(one unreproduced full-suite failure of
tests/test_streaming_incremental.py::test_sessionize_checkpoint_kill_and_resume).

Two modes over a range-partitioned multi-file replay of the events
table:

* ``--mode points``: deterministic kill-point scan — stop the stream
  after exactly k committed micro-batches for k = 1..N, resume with
  availableNow, compare against an uninterrupted reference.
* ``--mode random`` (default): stop at a random delay after the first
  committed batch (lands mid-batch most of the time, occasionally
  inside a state-store delta commit), resume, compare. ``--iters`` and
  ``--seed`` control the sweep.

Usage:
    cd /tmp && python /root/repo/tools/kill_resume_scan.py \
        [--mode random|points|disorder] [--iters 20] [--seed 7] [sf_dir]

Do NOT run concurrently with the pytest suite or another sweep unless
the run IS the deliberate concurrent-load condition (shared
/tmp/smr_scratch staging and kill-timing sensitivity otherwise).

Exit codes: 0 = every run passed the ABSOLUTE islands gate (all
non-final islands exactly once, nothing invented, no within-run double
emission; finals closed-or-withheld; closed_by flips reported, not
asserted); 1 = at least one resumed run (or disorder ordering) failed
its gate; 2 = the REFERENCE run itself diverged from the islands
expectation (fixture/ordering problem, not a kill-resume regression —
triage these differently).
"""

from __future__ import annotations

import argparse
import atexit
import os
import random
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO

N_FILES = 4


# Fixture ordering + absolute-gate helpers live in the library so the
# pytest suite can import them without this module's sys.path/PYTHONPATH
# side effects (round-8 review). History: the round-8 watch postmortem
# (BASELINE.md) traced the round-7 "impossible session" failure to the
# unordered fixture — see simplemapreduce_spark/streaming/replay.py.
from simplemapreduce_spark.streaming.replay import (  # noqa: E402
    duplicate_keys,
    islands_expectation,
    order_ranged_mtimes,
    session_keys,
)


def _postmortem(spark, out, ckpt, q1, q2, ref, got) -> None:
    """On mismatch, print everything a postmortem needs (the round-7
    watch's armed-forensics mandate): both runs' per-batch progress,
    the checkpoint's offsets/commits/source WALs, the sink metadata log
    vs the parquet files actually on disk (orphan detection), and
    event-count conservation per the output sets."""
    import glob as _glob
    import json as _json

    def _head(tag, items, n=40):
        print(f"  -- {tag} ({len(items)})")
        for it in items[:n]:
            print(f"     {it}")

    def _prog(pp):
        if isinstance(pp, dict):
            return pp
        try:
            return _json.loads(pp.json)
        except Exception:  # noqa: BLE001
            return {}

    for tag, q in (("q1.recentProgress", q1), ("q2.recentProgress", q2)):
        try:
            _head(tag, [
                _json.dumps({
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "timestamp": p.get("timestamp"),
                    "watermark": (p.get("eventTime") or {}).get("watermark"),
                })
                for p in map(_prog, q.recentProgress)
            ])
        except Exception as e:  # noqa: BLE001
            print(f"  -- {tag}: unreadable ({e})")
    for sub in ("offsets", "commits", "sources/0"):
        d = os.path.join(ckpt, sub)
        entries = []
        for f in sorted(_glob.glob(os.path.join(d, "*"))):
            if os.path.basename(f).startswith("."):
                continue
            try:
                body = open(f).read()
            except Exception:  # noqa: BLE001
                body = "<unreadable>"
            entries.append(f"{os.path.basename(f)}: {body[:500]!r}")
        _head(f"ckpt/{sub}", entries)
    meta_files = []
    committed_basenames = set()
    tombstoned_basenames = set()
    for f in sorted(_glob.glob(os.path.join(out, "_spark_metadata", "*"))):
        if os.path.basename(f).startswith("."):
            continue
        body = open(f).read()
        # Parse the FileStreamSinkLog entries (one JSON object per
        # line, "v1"/"vN" header lines skipped) and extract committed
        # file paths exactly — ADVICE r8: raw substring matching could
        # misclassify a basename appearing elsewhere in the JSON.
        for line in body.splitlines():
            line = line.strip()
            if not line or not line.startswith("{"):
                continue
            try:
                entry = _json.loads(line)
            except ValueError:
                continue
            # ADVICE r9 #3: honor the action field — a 'delete'
            # tombstone (compaction retention) must not mark an
            # on-disk file as committed, or a real orphan would be
            # hidden from the ORPHAN list below.
            if isinstance(entry, dict) and "path" in entry:
                base = os.path.basename(str(entry["path"]))
                if entry.get("action", "add") == "add":
                    committed_basenames.add(base)
                else:
                    tombstoned_basenames.add(base)
        meta_files.append(f"{os.path.basename(f)}: {body[:800]!r}")
    _head("sink _spark_metadata", meta_files)
    disk = sorted(
        os.path.relpath(p, out)
        for p in _glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
    )
    _head("parquet files on disk", disk, n=60)
    orphans = [p for p in disk if os.path.basename(p) not in committed_basenames]
    _head("ORPHAN parquet files (on disk, not in sink metadata)", orphans)
    if tombstoned_basenames:
        _head(
            "tombstoned (action=delete) basenames in sink metadata",
            sorted(tombstoned_basenames),
        )
    n_ref = sum(r[3] for r in ref)
    n_got = sum(r[3] for r in got)
    print(f"  -- event-count conservation: sum(n_events) ref={n_ref} got={n_got} "
          f"delta={n_got - n_ref}")
    # Does the batch-read respect the sink metadata log? Compare against
    # a raw glob read that bypasses _spark_metadata.
    try:
        raw = {
            (r.user_id, r.start_us, r.last_us, r.n_events, r.closed_by)
            for r in spark.read.parquet(os.path.join(out, "part-*")).collect()
        }
        print(f"  -- raw-glob read: {len(raw)} rows vs metadata-read {len(got)}; "
              f"raw-extra-vs-ref={len(raw - set(ref))}")
    except Exception as e:  # noqa: BLE001
        print(f"  -- raw-glob read failed: {e}")


def disorder_sweep(spark, ev, schema, ranged, base, args) -> int:
    """ADVERSARIAL ordering mode: replay the ranged files in hostile
    (reversed and shuffled) mtime orders and assert STRUCTURAL safety
    — the degradation contract of the single-open-session state
    machine under genuinely out-of-order multi-batch sources, the
    exact class behind the round-7 'impossible session' failure.

    Out-of-order replay legitimately watermark-drops data, so no
    output-set equality is possible; what must hold in EVERY ordering,
    killed or not:
      * no impossible records: start <= last, n >= 1;
      * no super-gap bridging: last - start <= (n - 1) * gap (the
        late-island width bound, property P3);
      * endpoint realness: every session's start and last are actual
        event timestamps of that user;
      * conservation: total emitted n_events <= total events (no
        duplication), per user.

    Deliberately NOT checked: within-gap adjacency between emitted
    sessions. A late island that cannot merge is force-closed at batch
    end (streaming/stateful.py), so an island split across batches on a
    genuinely out-of-order source may surface as multiple sessions
    within one gap of each other — that is the accepted degradation
    contract (unreachable on in-order sources). Do not tighten this
    gate to assert cross-session spacing (ADVICE r8).
    """
    import glob as _glob
    import random as _random

    from pyspark.sql import functions as F

    from simplemapreduce_spark.functions.time import (
        SESSION_GAP_MICROS,
        ntz_as_event_time,
    )
    from simplemapreduce_spark.streaming.stateful import sessionize_stateful_stream

    gap = SESSION_GAP_MICROS
    # truth: per-user timestamp set for endpoint-realness, plus a true
    # EVENT count per user — n_events counts every event, so the
    # conservation bound must count duplicate timestamps too (a set
    # would under-count and flag a correct run as "duplicated" on any
    # fixture with repeated (user, ts) pairs — round-8 review).
    truth: dict[int, set[int]] = {}
    truth_n: dict[int, int] = {}
    for r in ev.select(
        F.col("user_id").alias("u"),
        F.unix_micros(ntz_as_event_time("ts")).alias("us"),
    ).collect():
        truth.setdefault(r.u, set()).add(r.us)
        truth_n[r.u] = truth_n.get(r.u, 0) + 1
    n_events_total = sum(truth_n.values())

    parts = sorted(_glob.glob(os.path.join(ranged, "part-*.parquet")))
    rng = _random.Random(args.seed)
    orders = [list(reversed(range(len(parts))))]
    for _ in range(max(args.iters - 1, 0)):
        o = list(range(len(parts)))
        rng.shuffle(o)
        orders.append(o)

    def source():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ranged)
            .withColumn("ts", ntz_as_event_time("ts"))
        )

    fails = 0
    for i, order in enumerate(orders):
        now = time.time()
        for rank, k in enumerate(order):
            t = now - 10 * (len(order) - rank)
            os.utime(parts[k], (t, t))
        out = os.path.join(base, f"dis_out_{i}")
        ckpt = os.path.join(base, f"dis_ckpt_{i}")
        q = (
            sessionize_stateful_stream(source())
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        q.stop()
        rows = spark.read.parquet(out).collect()
        bad = []
        per_user_n: dict[int, int] = {}
        for r in rows:
            u, s, l, n = r.user_id, r.start_us, r.last_us, r.n_events
            per_user_n[u] = per_user_n.get(u, 0) + n
            if not (s <= l and n >= 1):
                bad.append(f"impossible ({u},{s},{l},{n})")
            if l - s > (n - 1) * gap:
                bad.append(f"super-gap bridge ({u},{s},{l},{n})")
            if s not in truth.get(u, ()) or l not in truth.get(u, ()):
                bad.append(f"phantom endpoint ({u},{s},{l},{n})")
        for u, tot in per_user_n.items():
            if tot > truth_n.get(u, 0):
                bad.append(f"user {u} duplicated: emitted {tot} > {truth_n.get(u, 0)}")
        if bad:
            fails += 1
            print(f"order={order} VIOLATIONS ({len(bad)}):")
            for b in bad[:8]:
                print("  ", b)
        else:
            emitted = sum(per_user_n.values())
            print(f"order={order} ok: {len(rows)} sessions, "
                  f"{emitted}/{n_events_total} events surfaced "
                  f"({n_events_total - emitted} watermark-dropped or open)",
                  flush=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    print("FAILS:", fails)
    return 1 if fails else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", choices=("random", "points", "disorder"), default="random"
    )
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from simplemapreduce_spark.functions.time import ntz_as_event_time
    from simplemapreduce_spark.session import get_spark
    from simplemapreduce_spark.sources.tables import load_table
    from simplemapreduce_spark.streaming.stateful import sessionize_stateful_stream

    spark = get_spark("kill-resume-scan", cpus="8")
    ev = load_table(spark, args.sf_dir, "events")
    schema = ev.schema
    base = tempfile.mkdtemp(prefix="kill_resume_scan_")
    # Exception-safe scratch cleanup (ADVICE r7 #4): an assert or
    # mid-sweep failure must not leak the tempdir. atexit fires on both
    # normal exit and unhandled exceptions from main(); the explicit
    # rmtree at the end keeps the happy path eager.
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    ranged = os.path.join(base, "ranged")
    ev.repartitionByRange(N_FILES, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(ranged)
    order_ranged_mtimes(ranged)
    if args.mode == "disorder":
        return disorder_sweep(spark, ev, schema, ranged, base, args)

    def source():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ranged)
            .withColumn("ts", ntz_as_event_time("ts"))
        )

    def start(out, ckpt, **trigger):
        return (
            sessionize_stateful_stream(source())
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(**trigger)
            .start()
        )

    def rows(out):
        # A LIST, not a set: a same-label double emission (the sink
        # holding two identical rows) must stay visible to
        # duplicate_keys — a set collapses it before the gate can look
        # (round-8 high review).
        return [
            (r.user_id, r.start_us, r.last_us, r.n_events, r.closed_by)
            for r in spark.read.parquet(out).collect()
        ]

    ref_out = os.path.join(base, "out_ref")
    q = start(ref_out, os.path.join(base, "ckpt_ref"), availableNow=True)
    assert q.awaitTermination(300)
    # Derive the points range from the OBSERVED reference batch count,
    # not a hardcoded 1..7: the fixture has N_FILES data files (plus
    # availableNow bookkeeping batches), and waiting for a batch count
    # the run can never reach turns each extra k into a dead 120 s
    # deadline wait (ADVICE r7 #4).
    ref_batches = len(q.recentProgress)
    q.stop()
    ref = rows(ref_out)
    print(f"ref: {len(ref)} rows, {ref_batches} batches @ {args.sf_dir}", flush=True)

    # ABSOLUTE expectation (round-8 postmortem): the reference run must
    # equal the batch gaps-and-islands decomposition — every non-final
    # island closed exactly once, finals closed-or-withheld. A
    # ref-vs-resumed comparison alone is blind to a whole file being
    # watermark-dropped in BOTH runs, which is precisely what the
    # unordered fixture did for two rounds.
    from simplemapreduce_spark.functions.time import SESSION_GAP_MICROS

    non_final, finals = islands_expectation(ev, SESSION_GAP_MICROS)
    keys = session_keys
    ref_keys = keys(ref)
    if duplicate_keys(ref):
        print(f"REF DOUBLE-EMITS sessions: {sorted(duplicate_keys(ref))[:8]}")
        return 2
    dropped = non_final - ref_keys
    invented = ref_keys - non_final - finals
    if dropped or invented:
        print(f"REF DIVERGES FROM ISLANDS EXPECTATION: "
              f"dropped={len(dropped)} invented={len(invented)}")
        for r in sorted(dropped)[:8]:
            print("  dropped", r)
        for r in sorted(invented)[:8]:
            print("  invented", r)
        return 2
    print(f"ref matches islands expectation "
          f"({len(non_final)} non-final islands, "
          f"{len(ref_keys - non_final)}/{len(finals)} finals closed)", flush=True)

    rng = random.Random(args.seed)
    runs = range(1, max(ref_batches, 2)) if args.mode == "points" else range(args.iters)
    fails = 0
    for i in runs:
        out = os.path.join(base, f"out_{i}")
        ckpt = os.path.join(base, f"ckpt_{i}")
        q1 = start(out, ckpt, processingTime="100 milliseconds")
        deadline = time.time() + 120
        want = i if args.mode == "points" else 1
        while len(q1.recentProgress) < want and time.time() < deadline:
            time.sleep(0.02)
        if args.mode == "random":
            time.sleep(rng.random() * 1.2)
        q1.stop()
        b1 = len(q1.recentProgress)
        q2 = start(out, ckpt, availableNow=True)
        assert q2.awaitTermination(300)
        q2.stop()
        got = rows(out)
        got_keys = keys(got)
        # The absolute gate, same as the reference: every non-final
        # island exactly once, nothing invented. closed_by is reported
        # but not asserted (gap-vs-timeout for the same session is a
        # batch-composition artifact), and FINAL islands are
        # closed-or-withheld per run: a kill after the last file
        # leaves the availableNow restart with no new data, so the
        # no-data micro-batch that would flush the overdue event-time
        # timeouts never runs and the finals legitimately stay
        # withheld (observed at points k>=3; append-mode cannot
        # distinguish "due but never triggered" from "still open").
        flips = len(set(got) - set(ref)) - len(got_keys - ref_keys)
        if flips:
            print(f"run={i} closed_by flips (gap<->timeout): {flips}")
        missing_nf = non_final - got_keys
        invented_g = got_keys - non_final - finals
        # Within-run key uniqueness (round-8 review): a resume that
        # lost the 'already closed' fact re-emits the same session
        # under the other closed_by label — two rows, one key, which
        # the key-set compare alone cannot see.
        dup_g = duplicate_keys(got)
        if missing_nf or invented_g or dup_g:
            fails += 1
            print(f"run={i} batches1={b1} MISMATCH "
                  f"invented={len(invented_g)} "
                  f"missing_non_final={len(missing_nf)} "
                  f"double_emitted={len(dup_g)}")
            for r in sorted(invented_g)[:6]:
                print("  +", r)
            for r in sorted(missing_nf)[:6]:
                print("  -", r)
            for r in sorted(dup_g)[:6]:
                print("  2x", r)
            _postmortem(spark, out, ckpt, q1, q2, ref, got)
            keep = os.path.join(
                tempfile.gettempdir(), f"kr_forensics_run{i}_{os.getpid()}"
            )
            shutil.copytree(out, os.path.join(keep, "out"))
            shutil.copytree(ckpt, os.path.join(keep, "ckpt"))
            print(f"  forensics preserved at {keep}", flush=True)
        else:
            print(f"run={i} batches1={b1} ok", flush=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)

    print("FAILS:", fails)
    shutil.rmtree(base, ignore_errors=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

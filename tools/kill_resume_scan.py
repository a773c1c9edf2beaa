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
        [--mode random|points] [--iters 20] [--seed 7] [sf_dir]

Do NOT run concurrently with the pytest suite or another sweep.
Exit code 0 iff every resumed output equals the reference.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("random", "points"), default="random")
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
        return {
            (r.user_id, r.start_us, r.last_us, r.n_events, r.closed_by)
            for r in spark.read.parquet(out).collect()
        }

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
        if got != ref:
            fails += 1
            print(f"run={i} batches1={b1} MISMATCH "
                  f"extra={len(got - ref)} missing={len(ref - got)}")
            for r in sorted(got - ref)[:6]:
                print("  +", r)
            for r in sorted(ref - got)[:6]:
                print("  -", r)
        else:
            print(f"run={i} batches1={b1} ok", flush=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)

    print("FAILS:", fails)
    shutil.rmtree(base, ignore_errors=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Genuinely incremental streaming: replay the events fixture as
MULTIPLE micro-batches (maxFilesPerTrigger=1 over a multi-file copy)
and assert the stateful operator's final state still equals the batch
answer — i.e. state really carries across batches, not just within one.
"""

from __future__ import annotations

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from simplemapreduce_spark.sources.tables import load_table

N_FILES = 4


@pytest.fixture(scope="module")
def multi_file_events(spark, sf_dir):
    out = os.path.join(tempfile.gettempdir(), "smr_scratch", "events_multifile")
    (
        load_table(spark, sf_dir, "events")
        .repartition(N_FILES)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_stateful_counts_across_microbatches(spark, sf_dir, multi_file_events):
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from simplemapreduce_spark.streaming.windows import run_stream_to_table

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def update(key, pdfs, state: GroupState):
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    stream = (
        spark.readStream.schema(load_table(spark, sf_dir, "events").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi_file_events)
    )
    updates = stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    out = run_stream_to_table(updates, "append")

    # More than one emission per user proves multiple micro-batches ran.
    emissions = out.groupBy("user_id").count()
    assert emissions.filter(F.col("count") > 1).count() > 0

    final = (
        out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    )
    expected = (
        load_table(spark, sf_dir, "events").groupBy("user_id").agg(F.count("*").alias("n_events"))
    )
    assert sorted(final.collect()) == sorted(expected.collect())


def test_streaming_tumbling_matches_batch(spark, sf_dir, multi_file_events):
    """Windowed agg over a multi-batch stream (complete mode) equals
    the batch aggregation of the same data."""
    from simplemapreduce_spark.functions.time import event_time_to_ntz, ntz_as_event_time
    from simplemapreduce_spark.streaming.windows import run_stream_to_table

    stream = (
        spark.readStream.schema(load_table(spark, sf_dir, "events").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi_file_events)
        .withColumn("ts", ntz_as_event_time("ts"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    # Convert the LTZ window bound back to NTZ (what the production
    # queries do) so the comparison against the NTZ batch side is
    # OS-timezone independent.
    got = run_stream_to_table(agg, "complete").select(
        event_time_to_ntz(F.col("w.start")).alias("ws"), "event_type", "n"
    )
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_tws_running_totals(spark, sf_dir):
    """transformWithStateInPandas twin of the stateful-counts operator:
    final emission per user equals the batch aggregate. Requires the
    TWS state-server protocol dependency (google.protobuf), absent in
    some environments — skip, not fail, there."""
    pytest.importorskip("google.protobuf")
    from simplemapreduce_spark.streaming.stateful import tws_running_totals

    got = {
        (r.user_id, r.n_events, r.total_value_cents)
        for r in tws_running_totals(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.n_events, r.total_value_cents)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("total_value_cents"),
        )
        .collect()
    }
    assert got == want


def test_checkpoint_restart_resumes_exactly_once(spark, sf_dir, multi_file_events, tmp_path):
    """Kill a checkpointed stream after the first micro-batch, restart
    it with the same checkpoint, and the final counts still equal the
    batch answer — source offsets committed to the checkpoint are not
    re-read (exactly-once progress), uncommitted files are. This is
    the recovery contract the reference implements with task
    re-execution on worker failure (common_rpc.go:84-136), here
    supplied by checkpointed offset tracking."""
    ckpt = str(tmp_path / "ckpt")
    out_name = "tws_restart_counts"

    def start():
        return (
            spark.readStream.schema(load_table(spark, sf_dir, "events").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(multi_file_events)
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .writeStream.format("memory")
            .queryName(out_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    q = start()
    # Let at least one micro-batch commit, then hard-stop mid-stream.
    deadline = time.time() + 60
    while not q.recentProgress and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    committed = sum(p["numInputRows"] for p in q.recentProgress)
    total = load_table(spark, sf_dir, "events").count()

    # Restart from the same checkpoint with availableNow to drain.
    q2 = (
        spark.readStream.schema(load_table(spark, sf_dir, "events").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi_file_events)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    q2.stop()
    resumed = sum(p["numInputRows"] for p in q2.recentProgress)
    # No re-read of committed offsets. recentProgress can lag the commit
    # log on either side of the kill (a batch may commit between the
    # progress snapshot and stop()), so the observed `committed` is a
    # lower bound on what the checkpoint recorded — making `resumed`
    # at most the complement, never more. Strict equality would race.
    assert resumed <= total - committed
    # The restart must not start from scratch unless the first run
    # genuinely drained everything before the kill.
    assert resumed < total or committed == 0

    got = {(r.event_type, r.n) for r in spark.table(out_name).collect()}
    want = {
        (r.event_type, r.n)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_late_drop_actually_drops_and_keeps(spark, sf_dir):
    """Guard against the vacuous-probe failure mode (ADVICE r2): the
    late-data query must genuinely drop some rows (result < full
    window counts) while retaining the on-time batch (>= even rows
    minus the final still-open windows)."""
    from simplemapreduce_spark.streaming.windows import q_stream_late_drop

    e = load_table(spark, sf_dir, "events")
    n_total = e.count()
    n_even = e.filter(F.col("event_id") % 2 == 0).count()
    got = q_stream_late_drop(spark, sf_dir).agg(F.sum("n").alias("s")).first()["s"]
    assert got < n_total          # late odd rows were dropped
    assert got >= int(0.9 * n_even)  # the on-time half survived

"""Structured Streaming surface over the ``events`` table.

The reference is strictly batch — a hard map→reduce phase barrier
(/root/reference/src/mapreduce/master.go:77-78) — so this module is
pure extension scope (SURVEY.md §2.2 "Streaming"): the same windowed
aggregations the batch catalog exposes, expressed as incremental
streaming plans with watermarks for late data.

Test/driver strategy: the parquet fixture directory is replayed as a
finite file stream; each query runs the stream to completion into a
memory sink and returns the resulting batch DataFrame. In *complete*
output mode the final table equals the batch answer, so these entries
are fully DuckDB-oracle-checkable — the strongest check available for
a streaming plan.

Scale design: watermark + windowed agg is incremental state (one row
per open window per key in the state store), not a re-scan; the same
plan runs unchanged against a Kafka/file stream on a cluster with
checkpointed, partitioned state.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simplemapreduce_spark.catalog import query

# Streaming file sources require an explicit schema. events.ts is
# TIMESTAMP(NANOS) in the files — read as nanosecond longs
# (nanosAsLong) and convert, same contract as sources/tables.py.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture replayed as a file stream (finite)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_stream_to_table(df: DataFrame, output_mode: str) -> DataFrame:
    """Execute a (finite) streaming DataFrame to completion into a
    memory sink; return the materialized result as a batch DataFrame."""
    spark = df.sparkSession
    name = f"smr_stream_{int(time.monotonic_ns())}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)  # availableNow terminates once drained
    finally:
        q.stop()
    return spark.table(name)


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window aggregation with a 1-hour watermark,
    run to completion (complete mode ⇒ equals the batch answer)."""
    agg = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_value"),
        )
    )
    out = run_stream_to_table(agg, "complete")
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
    )


@query(
    "q_stream_sliding",
    oracle="""
    WITH offsets AS (SELECT unnest([0, 15]) AS off_min),
    slid AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts - to_minutes(off_min)) + to_minutes(off_min) AS window_start,
             event_id
      FROM events CROSS JOIN offsets
    )
    SELECT window_start, COUNT(event_id) AS n FROM slid GROUP BY 1
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding windows (30 min window, 15 min slide): each
    event lands in 2 overlapping windows."""
    agg = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    out = run_stream_to_table(agg, "complete")
    return out.select(F.col("w.start").alias("window_start"), "n")


@query("q_stream_session_window")  # rows-only: session merge order is engine-specific
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-minute inactivity gap) per user —
    state-store-merged sessions; the batch twin q_ts_session_window is
    the oracle-checked equivalent."""
    agg = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out = run_stream_to_table(agg, "complete")
    return out.select(
        "user_id", F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"), "n_events"
    )

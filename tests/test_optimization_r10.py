"""Focused tests for the round-10 optimization changes — each pins the
INTERNAL property the optimization introduced, beyond the oracle's
result check (which the driver gate and test_oracle_parity already run).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from simplemapreduce_spark import catalog

catalog.load_all()


def _executed_plan(df) -> str:
    """Formatted plan AFTER executing df's own QueryExecution (collect,
    not a write — a write plans a separate command), so AQE's final
    plan (ReusedExchange, join rewrites) is visible."""
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_stream_state_partitions_scale_adaptive(spark, sf_dir):
    """The drain's state-partition count derives from source size:
    small fixtures get the floor (2), never more than the cluster's
    parallelism, and the count grows monotonically with input bytes."""
    import os

    import pytest

    from simplemapreduce_spark.streaming.windows import stream_state_partitions

    n = stream_state_partitions(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    assert 2 <= n <= par
    # The smallest fixture's events ≈ 20 KB -> floor; a 100 TB replay
    # must fan out: the formula at 1 GB is bytes/512KB = 2048, clamped
    # to parallelism. Derive the path from the sf_dir fixture's parent
    # (ADVICE r10 #4: the absolute /root/testdata path errored on any
    # machine without that fixture).
    smallest = os.path.join(os.path.dirname(os.path.normpath(sf_dir)), "sf0.001")
    if not os.path.isdir(smallest):
        pytest.skip(f"no sf0.001 fixture under {os.path.dirname(sf_dir)}")
    assert stream_state_partitions(spark, smallest) == 2


def test_run_stream_to_table_restores_session_conf(spark, sf_dir):
    """The per-query conf snapshot must leave the SESSION's shuffle
    partitions untouched (other concurrent work plans against it), and
    the drained result must still equal the batch answer."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    out = catalog.QUERIES["q_stream_tumbling"](spark, sf_dir)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    got = {tuple(r) for r in out.collect()}
    from simplemapreduce_spark.sources.tables import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_block_dedup_hashes_blocks_once(spark, sf_dir):
    """q_multimodal_block_dedup: the frequency branch must read a
    ReusedExchange of the probe branch's chk shuffle at runtime — the
    explode+md5 blocking pass executes once, not once per consumer."""
    df = catalog.QUERIES["q_multimodal_block_dedup"](spark, sf_dir)
    plan = _executed_plan(df)
    final = plan.split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in final, final[:2000]


def test_margin_mining_scores_pairs_once(spark, sf_dir):
    """q_sim_margin_mining: the three consumers of the scored pair
    table must share its evaluation via exchange reuse at runtime."""
    df = catalog.QUERIES["q_sim_margin_mining"](spark, sf_dir)
    plan = _executed_plan(df)
    final = plan.split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in final, final[:2000]


def test_cogroup_bucket_grain_matches_relational_twin(spark, sf_dir):
    """Bucket-grain cogroup + vectorized reconciliation must equal the
    declarative two-aggregate full-outer-join, row for row."""
    from simplemapreduce_spark.sources.tables import load_table

    got = {tuple(r) for r in catalog.QUERIES["q_cogroup_reconcile"](spark, sf_dir).collect()}
    e = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("custkey"))
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("first_event"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
            .alias("spend_cents"),
            F.min("o_orderdate").alias("first_order"),
        )
    )
    twin = (
        e.join(o, "custkey", "full_outer")
        .select(
            "custkey",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("spend_cents", F.lit(0)).alias("spend_cents"),
            F.when(
                F.col("first_event").isNull() | F.col("first_order").isNull(),
                F.lit(False),
            )
            .otherwise(F.dayofyear("first_event") < F.dayofyear("first_order"))
            .alias("event_season_before_order_season"),
        )
    )
    want = {tuple(r) for r in twin.collect()}
    assert got == want


def test_spearman_range_frame_tie_counts_match_group_counts(spark, sf_dir):
    """The RANGE-frame peer count inside the rank window must equal the
    (flag, col) group count it replaced, on a tie-heavy column."""
    from simplemapreduce_spark.sources.tables import load_table
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").alias("q")
    )
    peers = F.count("*").over(
        W.partitionBy("l_returnflag").orderBy("q").rangeBetween(W.currentRow, W.currentRow)
    )
    grp = F.count("*").over(W.partitionBy("l_returnflag", "q"))
    mism = li.select((peers == grp).alias("ok")).filter(~F.col("ok")).count()
    assert mism == 0

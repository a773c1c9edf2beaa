"""Window-function catalog (SURVEY.md §2.2 — absent in the reference,
whose only "window" was the global final sort; here they're native
Catalyst Window operators).

Determinism: every window ORDER BY ends in a unique key (orderkey /
event_id / custkey) so frames are identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from simplemapreduce_spark.catalog import query
from simplemapreduce_spark.functions.time import date_trunc_ntz, epoch_micros
from simplemapreduce_spark.sources.tables import load_table


@query(
    "q_window_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS INTEGER) AS order_seq
    FROM orders
    """,
)
def q_window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("order_seq"))


@query(
    "q_window_rank",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC)
                AS INTEGER) AS price_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC)
                AS INTEGER) AS price_dense_rank
    FROM part
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank are tie-stable: equal inputs get equal ranks, so
    no unique tie-break is needed for value-hash parity."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS micros_since_prev,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_type
    FROM events
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over the event stream; time deltas in integer micros
    (epoch_micros ≡ DuckDB epoch_us — no float rounding)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = epoch_micros("ts")
    return e.select(
        "user_id",
        "event_id",
        (micros - F.lag(micros).over(w)).alias("micros_since_prev"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit ROWS frame (decimal — exact under
    any accumulation order)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "q_window_moving_avg",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) OVER w AS DOUBLE)
                / COUNT(l_quantity) OVER w AS qty_ma4
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber,
                 l_quantity, l_extendedprice
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-row moving average per supplier (decimal-sum / count, same
    deterministic-avg recipe as the aggregate catalog).

    Ordering note: (l_orderkey, l_linenumber) is NOT unique in the
    synthetic lineitem (the generator reuses keys across scale-ups —
    118k duplicate pairs at sf0.1), so the ORDER BY extends through
    l_quantity and l_extendedprice to stay total; with a tied sort key
    the 4-row frame contents would be engine-dependent."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .rowsBetween(-3, W.currentRow)
    )
    ma = (
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w).cast("double")
        / F.count("l_quantity").over(w)
    )
    return li.select("l_suppkey", "l_orderkey", "l_linenumber", ma.alias("qty_ma4"))


@query(
    "q_window_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INTEGER)
             AS balance_quartile
    FROM customer
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select("c_custkey", "c_acctbal", F.ntile(4).over(w).alias("balance_quartile"))


@query(
    "q_window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_order_price,
           LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_order_price"),
        F.last("o_totalprice").over(w_full).alias("last_order_price"),
    )


@query(
    "q_window_cume_dist",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           ROUND(CUME_DIST() OVER (ORDER BY s_acctbal), 9) AS bal_cume,
           ROUND(PERCENT_RANK() OVER (ORDER BY s_acctbal), 9) AS bal_pct_rank
    FROM supplier
    """,
)
def q_window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist/percent_rank — ratios of identical integers, rounded
    for belt-and-braces."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.orderBy("s_acctbal")
    return s.select(
        "s_suppkey",
        "s_acctbal",
        F.round(F.cume_dist().over(w), 9).alias("bal_cume"),
        F.round(F.percent_rank().over(w), 9).alias("bal_pct_rank"),
    )


@query(
    "q_window_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
           LEAD(o_totalprice, 2) OVER w AS price_after_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value (2nd order's price seen so far) and multi-step lead
    per customer order history — the positional window accessors that
    complete the first/last/lag/lead family."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.lead("o_totalprice", 2).over(wo).alias("price_after_next"),
    )


@query(
    "q_window_cumulative_distinct",
    oracle="""
    WITH flagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_types_seen
    FROM flagged
    """,
)
def q_window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — which Spark (and most
    engines) cannot express directly — via the standard two-window
    rewrite: flag each (user, type)'s first occurrence, then
    cumulative-sum the flags along the user's timeline. BOTH windows
    deliberately partition on user_id alone (the first-occurrence flag
    sorts by (type, ts) within the user instead of partitioning by
    (user, type)), so Catalyst plans ONE Exchange with two sorts —
    plan-asserted in tests/test_plans.py. The rewrite is exact, not
    approximate, and the same shape computes any 'distinct so far'
    feature (new URLs seen, vocabulary growth) at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_type = F.lag("event_type").over(w_first)
    # row_number()==1 detects the partition's first row; the null-safe
    # compare handles NULL event_type VALUES (a NULL prev would
    # otherwise read as "first row" and over-flag every NULL-type row).
    flagged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            (F.row_number().over(w_first) == 1)
            | ~prev_type.eqNullSafe(F.col("event_type")),
            1,
        ).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("first_seen").over(w_cum).cast("long").alias("n_types_seen"),
    )


@query(
    "q_window_moving_median",
    oracle="""
    WITH daily AS (
      SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP) AS day,
             COUNT(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT day, n,
           CAST(quantile_disc(n, 0.5) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS median_7d
    FROM daily
    """,
)
def q_window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 7-day median — a HOLISTIC aggregate over a sliding frame,
    which Spark's window functions cannot express natively (no
    percentile over a frame). The rewrite collects the frame into an
    array and takes the lower-middle element row-locally
    (sorted[(len+1)/2] = the discrete median, DuckDB's quantile_disc
    frame semantics). The collected frame is bounded by the frame
    LENGTH (7), not the data, so the array trick is safe at any scale
    — the general rule: array-materialize a window only when the frame
    is O(1). Runs over the per-day aggregate, so the unpartitioned
    window sorts day-vocabulary rows (per-series at scale: add
    partitionBy)."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(date_trunc_ntz("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    w = W.orderBy("day").rowsBetween(-6, W.currentRow)
    frame = F.array_sort(F.collect_list("n").over(w))
    median = F.element_at(frame, ((F.size(frame) + 1) / 2).cast("int"))
    return daily.select("day", "n", median.cast("long").alias("median_7d"))


@query(
    "q_window_range_interval",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER w
             AS BIGINT) AS trailing_1h_cents,
           COUNT(*) OVER w AS trailing_1h_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time INTERVAL range frame: per user, the trailing-1-hour
    sum and count at every event — the time-based sibling of the
    numeric range frame (q_window_range_frame). RANGE over an ORDER BY
    timestamp with an interval bound means frame membership is decided
    by event-time distance, not row position, so same-instant peers
    are always in-frame together and frames are engine-identical
    without a tie-break column. Sums run in exact integer cents.

    Scale shape: one hash exchange on user_id + per-partition sort;
    the sliding frame advances two pointers per partition — O(n) after
    the sort, no self-join against the lookback window (the
    q_join_range formulation this window subsumes for single-table
    lookbacks)."""
    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    base = e.select("event_id", "user_id", "ts", cents.alias("cents"))
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.expr(
            "sum(cents) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ).alias("trailing_1h_cents"),
        F.expr(
            "count(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ).alias("trailing_1h_n"),
    )


@query(
    "q_window_rolling_corr",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(corr(value, CAST(EXTRACT(hour FROM ts) AS DOUBLE)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) + 0.0 AS DOUBLE) AS c
    FROM events
    QUALIFY COUNT(*) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) >= 10
    """,
)
def q_window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson correlation between event value and hour-of-day
    over each user's trailing 10 events — the windowed form of the
    corr aggregate (co-movement drift detection on a stream of pairs).
    Frames shorter than 10 rows are suppressed (QUALIFY / filter on
    the frame count) so every emitted correlation is over a full
    window; rounded at the boundary because corr's running-moment
    accumulation order can differ between engines in the last ulps.
    The oracle adds `+ 0.0` after its ROUND: a tiny NEGATIVE
    correlation rounds to -0.0 in DuckDB's double arithmetic while
    Spark's BigDecimal-backed round emits +0.0, and the driver-style
    stringified compare sees "-0.0" != "0.0" (caught by the round-7
    sf0.1 gate replay; IEEE -0.0 + 0.0 = +0.0 normalizes it).

    Scale shape: one shuffle on user_id, one sort per partition, and
    corr runs as an incremental frame aggregate (constant per-row
    work) — the same single-window-pass contract as the moving
    averages; no self-join, no per-frame recompute."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, W.currentRow)
    )
    hod = F.hour("ts").cast("double")
    # Spelled as guarded covar/stddev moments rather than corr():
    # under ANSI mode Spark's corr raises DIVIDE_BY_ZERO on a
    # zero-variance frame (every event in the same hour), where
    # DuckDB's corr returns NULL — the guard reproduces the NULL.
    sv = F.stddev_samp(F.col("value")).over(w)
    sh = F.stddev_samp(hod).over(w)
    cv = F.covar_samp(F.col("value"), hod).over(w)
    c = F.when((sv == 0) | (sh == 0), F.lit(None)).otherwise(cv / (sv * sh))
    return (
        e.select(
            "event_id",
            "user_id",
            F.round(c, 4).alias("c"),
            F.count("*").over(w).alias("_n"),
        )
        .filter(F.col("_n") >= 10)
        .drop("_n")
    )

"""Cogrouped applyInPandas — the reduce-side join, first-class.

The classic MapReduce join the reference can only express in user
space (tag records with their source in ``mapF``, separate the tags
inside ``reduceF`` — SURVEY.md §2.2 Joins, citing the absence of any
join operator in /root/reference) is exactly Spark's
``df1.groupBy(k).cogroup(df2.groupBy(k)).applyInPandas(fn)``: both
sides shuffle on the key, and the user function receives the two
per-key record sets side by side — no tagging, no manual separation.

Scale notes: one shuffle per side (the reduce-side-join minimum),
Arrow-batched transfer, one key-group in memory at a time. Use it when
per-key logic genuinely needs both record sets at once (sequence
alignment, per-entity reconciliation); for anything expressible as
join+agg, the declarative plan wins — same guidance as the holistic
reduceF contract (operators/map_reduce.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simplemapreduce_spark.catalog import query

_RECON_SCHEMA = T.StructType(
    [
        T.StructField("custkey", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("n_orders", T.LongType(), True),
        T.StructField("spend_cents", T.LongType(), True),
        T.StructField("event_season_before_order_season", T.BooleanType(), True),
    ]
)


@query(
    "q_cogroup_reconcile",
    oracle="""
    WITH e AS (
      SELECT user_id AS custkey, COUNT(*) AS n_events, MIN(ts) AS first_event
      FROM events GROUP BY user_id
    ), o AS (
      SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS spend_cents,
             MIN(o_orderdate) AS first_order
      FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(e.custkey, o.custkey) AS custkey,
           COALESCE(e.n_events, 0) AS n_events,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.spend_cents, 0) AS spend_cents,
           CASE WHEN e.first_event IS NULL OR o.first_order IS NULL THEN FALSE
                ELSE dayofyear(e.first_event) < dayofyear(o.first_order)
                END AS event_season_before_order_season
    FROM e FULL OUTER JOIN o ON o.custkey = e.custkey
    """,
)
def q_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer reconciliation of two record streams (events and
    orders) via cogroup: the user function sees BOTH per-key sets at
    once and emits one reconciled row — counts from each side, spend
    in integer cents, and a cross-set predicate that needs values
    from both sets in one place: does the customer's first EVENT fall
    earlier in the calendar year than their first ORDER (a seasonal
    comparison — the fixture's event and order clocks live in
    different years, so the round-4 vacuity audit showed the original
    absolute-time comparison was constant False; day-of-year is the
    comparison that actually varies on this data, ~50/50 across the
    overlap users and guarded False when either side is absent). The oracle recomputes it relationally (two
    aggregates + full outer join), pinning the cogroup path to the
    declarative answer."""
    import pandas as pd

    from simplemapreduce_spark.session import ensure_package_shipped
    from simplemapreduce_spark.sources.tables import load_table

    ensure_package_shipped(spark)

    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey"), "ts"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderdate", "o_totalprice"
    )

    def reconcile(key, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        from simplemapreduce_spark.functions.money import cents_i64

        n_events = len(ev)
        n_orders = len(od)
        cents = cents_i64(od["o_totalprice"].to_numpy())
        active_before = bool(
            n_events
            and n_orders
            and ev["ts"].min().dayofyear < od["o_orderdate"].min().dayofyear
        )
        return pd.DataFrame(
            {
                "custkey": [key[0]],
                "n_events": [n_events],
                "n_orders": [n_orders],
                "spend_cents": [cents],
                "event_season_before_order_season": [active_before],
            }
        )

    return (
        e.groupBy("custkey")
        .cogroup(o.groupBy("custkey"))
        .applyInPandas(reconcile, _RECON_SCHEMA)
    )

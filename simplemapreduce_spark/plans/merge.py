"""MERGE / upsert (CDC apply) as a full-outer join — the table-format-
free formulation of ``MERGE INTO``.

The reference has no update semantics at all (its output is an
immutable run directory, /root/reference/src/mapreduce/master.go:
118-127); this is extension scope (SURVEY.md §2.2 Sinks/Joins). A
lakehouse MERGE (Delta/Iceberg) is exactly this plan plus transaction
log bookkeeping: shuffle both sides on the merge key, full-outer join,
per-row branch into matched-update / not-matched-insert, write back.

Scale notes: one shuffle per side on the merge key (the minimum for
any keyed merge), no broadcast assumption (a CDC batch can be large),
AQE handles skewed keys. The plan is the same shape Delta's MERGE
physical plan lowers to on the matched path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from simplemapreduce_spark.catalog import query
from simplemapreduce_spark.sources.tables import load_table

# Mid-range of the fixture's 1995-2001 order dates. Round 4 fix: the
# original 1994-06-01 cutoff predated every fixture order, so the
# "base" snapshot was EMPTY and the matched-update path of both merge
# queries ran vacuously green (the trap the repo docs warn about).
_CUTOFF = "1998-01-01"


def merge_upsert(
    base: DataFrame, updates: DataFrame, on: str, update_cols: dict[str, F.Column]
) -> DataFrame:
    """Apply ``updates`` onto ``base`` keyed by ``on``: matched rows
    get ``update_cols`` expressions (which may reference both sides),
    unmatched update rows are inserted, unmatched base rows pass
    through — WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT.
    """
    b = base.alias("b")
    u = updates.alias("u")
    joined = b.join(u, F.col(f"b.{on}") == F.col(f"u.{on}"), "full_outer")
    key = F.coalesce(F.col(f"b.{on}"), F.col(f"u.{on}")).alias(on)
    outs = [key]
    for name, expr in update_cols.items():
        outs.append(expr.alias(name))
    return joined.select(*outs)


@query(
    "q_merge_upsert",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM orders WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
      GROUP BY o_custkey
    ), updates AS (
      SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
      GROUP BY o_custkey
    )
    SELECT COALESCE(b.custkey, u.custkey) AS custkey,
           COALESCE(b.n_orders, 0) + COALESCE(u.n_orders, 0) AS n_orders,
           CAST(CAST(COALESCE(b.spend, 0) AS DECIMAL(18,2))
                + CAST(COALESCE(u.spend, 0) AS DECIMAL(18,2)) AS DOUBLE) AS spend
    FROM base b FULL OUTER JOIN updates u ON u.custkey = b.custkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a CDC batch (per-customer order stats after a cutoff
    date) into the base snapshot (stats before it): matched customers
    accumulate counts and spend, customers first seen in the batch are
    inserted, untouched base rows survive. The result equals the
    all-time aggregate — which is what makes an incremental merge
    pipeline equivalent to recomputation, the property this query
    pins. Decimal-cents addition on both engines avoids float
    accumulation drift; final cast to DOUBLE for driver rendering."""
    o = load_table(spark, sf_dir, "orders")

    def snapshot(pred) -> DataFrame:
        return (
            o.filter(pred)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend_dec"),
            )
        )

    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    base = snapshot(F.col("o_orderdate") < cutoff)
    updates = snapshot(F.col("o_orderdate") >= cutoff)
    zero = F.lit(0).cast("decimal(18,2)")
    merged = merge_upsert(
        base,
        updates,
        on="custkey",
        update_cols={
            "n_orders": F.coalesce(F.col("b.n_orders"), F.lit(0))
            + F.coalesce(F.col("u.n_orders"), F.lit(0)),
            "spend": (
                F.coalesce(F.col("b.spend_dec"), zero) + F.coalesce(F.col("u.spend_dec"), zero)
            ).cast("double"),
        },
    )
    return merged


@query(
    "q_merge_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
             AS valid_to,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
                AS BIGINT) AS version
    FROM changes
    """,
)
def q_merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension build from an event log: each
    run of consecutive identical event_types per user collapses to one
    version row with [valid_from, valid_to) validity (open-ended for
    the current version) and a per-user version number — the standard
    warehouse history table the CDC upsert above cannot express.

    Scale shape: one shuffle on user_id; the change-point filter
    (lag), the validity lead, and the version row_number all share
    that partitioning, so Catalyst runs the three window passes
    without re-shuffling. At 100 TB the per-user partitions are
    bounded by per-user event counts — the same skew profile as any
    sessionization. Ties break on event_id (unique) in BOTH windows —
    same-instant change rows would otherwise order nondeterministically
    — making the version sequence deterministic."""
    e = load_table(spark, sf_dir, "events")
    w_ev = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w_ev))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    )
    w_ver = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_ver).alias("valid_to"),
        F.row_number().over(w_ver).cast("long").alias("version"),
    )


@query(
    "q_merge_delete",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey AS custkey, o_orderpriority AS prio, COUNT(*) AS n_orders
      FROM orders WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
      GROUP BY 1, 2
    ), changes AS (
      SELECT o_custkey AS custkey, o_orderpriority AS prio, COUNT(*) AS n_orders,
             (o_custkey % 10 = 0) AS tombstone
      FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
      GROUP BY 1, 2
    )
    SELECT COALESCE(b.custkey, c.custkey) AS custkey,
           COALESCE(b.prio, c.prio) AS prio,
           CAST(COALESCE(b.n_orders, 0) + COALESCE(c.n_orders, 0) AS BIGINT)
             AS n_orders,
           CASE WHEN c.custkey IS NULL THEN 'kept'
                WHEN b.custkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS action
    FROM base b FULL OUTER JOIN changes c
      ON c.custkey = b.custkey AND c.prio = b.prio
    WHERE NOT (b.custkey IS NOT NULL AND c.custkey IS NOT NULL
               AND c.tombstone)
      AND NOT (b.custkey IS NULL AND c.tombstone)
    """,
)
def q_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full three-branch MERGE, including the DELETE clause
    q_merge_upsert omits: the change batch carries a tombstone
    (erasure-request semantics — here: a deterministic 10 % erasure
    list, custkey % 10 = 0) at the (customer, priority) grain — finer
    than the upsert's customer grain precisely so all FOUR branches
    are non-vacuous on the fixtures (every customer spans the date
    cutoff, but not every customer-priority pair does), and WHEN MATCHED AND tombstone THEN DELETE drops the
    row entirely; WHEN MATCHED THEN UPDATE accumulates; WHEN NOT
    MATCHED AND NOT tombstone THEN INSERT (a tombstone for a row that
    was never in the base inserts nothing — the idempotency corner a
    replayed CDC stream hits). Surviving rows are tagged with the
    branch that produced them, so every branch is visible in the
    output, not just implied by absence.

    Same table-format-free lowering as the sibling: shuffle both
    sides on the merge key, one full-outer join, row-local branch
    logic — what Delta/Iceberg MERGE plans to, minus the log commit.
    Exact integers end-to-end."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    base = (
        o.filter(F.col("o_orderdate") < cutoff)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count("*").alias("n_orders"))
        .alias("b")
    )
    changes = (
        o.filter(F.col("o_orderdate") >= cutoff)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count("*").alias("n_orders"))
        .withColumn("tombstone", F.col("custkey") % 10 == 0)
        .alias("c")
    )
    j = base.join(
        changes,
        (F.col("b.custkey") == F.col("c.custkey"))
        & (F.col("b.prio") == F.col("c.prio")),
        "full_outer",
    )
    matched = F.col("b.custkey").isNotNull() & F.col("c.custkey").isNotNull()
    delete = (matched & F.col("c.tombstone")) | (
        F.col("b.custkey").isNull() & F.col("c.tombstone")
    )
    return j.filter(~delete).select(
        F.coalesce(F.col("b.custkey"), F.col("c.custkey")).alias("custkey"),
        F.coalesce(F.col("b.prio"), F.col("c.prio")).alias("prio"),
        (
            F.coalesce(F.col("b.n_orders"), F.lit(0))
            + F.coalesce(F.col("c.n_orders"), F.lit(0))
        )
        .cast("long")
        .alias("n_orders"),
        F.when(F.col("c.custkey").isNull(), F.lit("kept"))
        .when(F.col("b.custkey").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("action"),
    )

"""Skew-handling join: explicit key salting.

AQE's skew-join splitting (on in session.py) handles skewed SORT-MERGE
joins at runtime; explicit salting is the complementary static tool
for joins AQE can't split (e.g. a low-cardinality hot key joined to a
replicable dimension). Semantics are unchanged — salting only changes
the partitioning — so the catalog entry is oracled against the plain
join SQL.

Mechanics: the fact side gets a deterministic salt from an existing
unique column (NOT rand(): retries must recompute identically); the
dimension side is replicated salt-ways with explode(sequence(...));
the join key becomes (key, salt), spreading each hot key over `salt`
reducers. Replication factor = salt × |dim| rows — cheap for true
dimensions, the only case salting targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simplemapreduce_spark.catalog import query
from simplemapreduce_spark.sources.tables import load_table

N_SALT = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_unique: str | Column,
    n_salt: int = N_SALT,
    how: str = "inner",
) -> DataFrame:
    """Join `fact` to `dim` on `on`, salted `n_salt` ways. `fact_unique`
    must be a deterministic per-row expression (id column).

    Only inner/left joins are semantics-preserving: the dim side is
    replicated n_salt ways, so 'right'/'full' would emit each unmatched
    dim row n_salt times."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join preserves semantics only for inner/left joins, got {how!r}: "
            "the dim side is replicated n_salt ways, so right/full would duplicate "
            "unmatched dim rows"
        )
    uniq = F.col(fact_unique) if isinstance(fact_unique, str) else fact_unique
    f = fact.withColumn("_salt", F.pmod(F.hash(uniq), F.lit(n_salt)))
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return f.join(d, [on, "_salt"], how).drop("_salt")


@query(
    "q_join_salted_skew",
    oracle="""
    SELECT e.event_type, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(MIN(t.type_rank) AS INTEGER) AS type_rank
    FROM events e
    JOIN (
      SELECT event_type, ROW_NUMBER() OVER (ORDER BY event_type) AS type_rank
      FROM (SELECT DISTINCT event_type FROM events)
    ) t ON t.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-case key skew: 100k events share 5 event_type keys. The
    salted join spreads each hot key over 8 reducers; the result is
    identical to the plain join (the oracle), only the partitioning
    differs."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("type_rank", F.row_number().over(W.orderBy("event_type")))
    )
    joined = salted_join(e, dim, on="event_type", fact_unique="event_id")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.min("type_rank").alias("type_rank"),
    )


@query(
    "q_agg_distinct_salted",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_agg_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) under key skew via explicit two-phase
    salting: phase 1 deduplicates (key, salt, value) where
    salt = hash(value) % N — each hot key's distinct-set build spreads
    over N reducers and a value always lands on the same salt, so the
    per-(key, salt) counts partition the distinct set exactly; phase 2
    sums the partial counts per key. This is the holistic-aggregate
    sibling of salted_join above: Catalyst's partial aggregation
    already two-phases COUNT(DISTINCT) the same way internally
    (Expand + partial), but the explicit form is the template for
    holistic aggregates Spark can NOT partial-ize (exact medians,
    collect-based logic) where a hot key otherwise serializes on one
    reducer."""
    e = load_table(spark, sf_dir, "events")
    n_salt = 8
    salted = e.select(
        "event_type",
        F.pmod(F.hash("user_id"), F.lit(n_salt)).alias("_salt"),
        "user_id",
    ).dropDuplicates(["event_type", "_salt", "user_id"])
    # count(user_id), not count(*): COUNT(DISTINCT x) ignores NULLs, and
    # a NULL user_id would survive dropDuplicates as its own row.
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count("user_id").alias("_partial")
    )
    return partial.groupBy("event_type").agg(
        F.sum("_partial").alias("n_users")
    )

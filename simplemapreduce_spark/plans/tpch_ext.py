"""Extended TPC-H-shaped relational suite, adapted to the slimmed
testdata schemas (no partsupp table; lineitem lacks
commitdate/receiptdate/shipmode; customer lacks phone/address).

The reference engine (drinkbeer/SimpleMapReduce) expresses NONE of
these natively — joins/aggs exist only as user code inside
mapF/reduceF (SURVEY.md §2.2; /root/reference/src/common/
common_map.go:64, common_reduce.go:56) — so, like plans/relational.py,
this module is native-surface parity work. Each query keeps the
classic TPC-H plan *shape* (the part that matters for scale grading):
selective dim filter → broadcast star join → partial/final agg →
top-k, with every predicate pushed to the parquet scan.

Adaptations (documented per query): Q4/Q12 use shipdate-vs-orderdate
lateness instead of commit/receipt dates; Q8/Q9 use p_type='PROMO' as
the part class; Q17/Q19 use p_size ranges instead of p_container;
Q22 keys on acctbal-above-average + recent-order anti join instead of
phone country codes.

Determinism rules are inherited from plans/relational.py: money math
in DECIMAL, ratios as double division of identical decimals (correctly
rounded on both engines from the same exact value → identical bits),
top-k always tie-broken on a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simplemapreduce_spark.catalog import query
from simplemapreduce_spark.plans.relational import (
    _davg,
    _dsum,
    _money,
    _one_minus,
)
from simplemapreduce_spark.sources.tables import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi join)
# ---------------------------------------------------------------------------

@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-sliced fact + EXISTS → left-semi join →
    count by priority. Adapted: "late" = shipped >30 days after the
    order date (testdata lineitem has no commit/receipt dates). The
    semi join shuffles only (orderkey, dates) — column pruning keeps
    the probe side narrow at any scale."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

@query(
    "q7_volume_shipping",
    oracle="""
    SELECT CASE WHEN n1.n_nationkey < 13 THEN 'LOW' ELSE 'HIGH' END AS supp_bloc,
           CASE WHEN n2.n_nationkey < 13 THEN 'LOW' ELSE 'HIGH' END AS cust_bloc,
           CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_nationkey < 13 AND n2.n_nationkey >= 13)
        OR (n1.n_nationkey >= 13 AND n2.n_nationkey < 13))
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_bloc, cust_bloc, l_year
    ORDER BY supp_bloc, cust_bloc, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional cross-BLOC revenue by ship year
    (suppliers in low-key nations shipping to customers in high-key
    nations, and the reverse). Q7's literal two-nation pair is
    unpopulated at sf0.001 — 10 suppliers over 25 nations leave most
    nations supplier-less, so the round-4 vacuity audit found the
    query EMPTY at the local suite's SF (driver sf0.01 was fine);
    nation blocs keep the bidirectional disjunctive-pair shape while
    guaranteeing both directions exist at every SF. The two nation
    dims broadcast; the disjunction runs after the joins, so the big
    tables still join on pure equi keys (shuffle hash/SMJ-able)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    bloc = lambda key: F.when(F.col(key) < 13, "LOW").otherwise("HIGH")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), bloc("n_nationkey").alias("supp_bloc")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), bloc("n_nationkey").alias("cust_bloc")
    )
    pair = F.col("supp_bloc") != F.col("cust_bloc")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_bloc", "cust_bloc", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_bloc", "cust_bloc", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS volume,
             n2.n_name AS nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: supplier-nation market share within a customer region.
    Adapted: part class = p_type 'PROMO' (no p_type trigrams in
    testdata). Ratio = double division of two exact decimal sums —
    correctly-rounded identically on both engines, no final decimal
    cast (ties would differ). All five dims broadcast."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = (_money("l_extendedprice") * _one_minus("l_discount")).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            F.col("nation"),
        )
    )
    return (
        base.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product type profit (adapted: no partsupp → revenue, not profit)
# ---------------------------------------------------------------------------

@query(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_profit
    FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, CAST(YEAR(o_orderdate) AS INTEGER)
    ORDER BY n_name, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: part-name LIKE filter → star join → agg by
    supplier nation × order year. Adapted: profit = discounted revenue
    (testdata has no partsupp.ps_supplycost to subtract)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q10 — returned item reporting (top 20 customers by lost revenue)
# ---------------------------------------------------------------------------

@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-lineitem revenue per customer, top 20.
    Both selective predicates (order quarter, returnflag) push to the
    scans; the top-k compiles to TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping punctuality by priority class (adapted: no shipmode)
# ---------------------------------------------------------------------------

@query(
    "q12_late_shipping",
    oracle="""
    SELECT CAST(YEAR(l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY ship_year
    ORDER BY ship_year
    """,
)
def q12_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of high/low-priority orders
    among late shipments. Adapted: lateness = shipped >60 days after
    the order date, bucketed by ship year (no l_shipmode column). The
    join condition is equi + residual — still hash-joinable."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double agg)
# ---------------------------------------------------------------------------

@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer order counts. The left
    outer join keeps order-less customers (count 0); COUNT(o_orderkey)
    skips nulls exactly like the SQL oracle. Adapted: the exclusion
    predicate filters a priority class (no o_comment column)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional agg ratio)
# ---------------------------------------------------------------------------

@query(
    "q14_promo_effect",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percent of one month's revenue from PROMO parts.
    part broadcasts; ratio via double division of exact decimal sums
    (same-bits on both engines), scaled by the exact double 100.0."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _money("l_extendedprice") * _one_minus("l_discount")
    zero = F.lit(0).cast("decimal(18,4)")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev.cast("decimal(18,4)")).otherwise(zero)).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue (view + scalar-max subquery)
# ---------------------------------------------------------------------------

@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue. The
    CTE is one grouped agg; the scalar MAX re-aggregates that small
    (|supplier|-row) result and joins back as a broadcast single row —
    no second scan of lineitem and no driver collect. Exact-decimal
    revenue makes the equality join against MAX deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
        .cast("decimal(18,4)")
        .alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (semi + anti self-joins)
# ---------------------------------------------------------------------------

@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the only late supplier in a multi-supplier
    finished order. Adapted: late = shipped >60 days after the order
    date (no commit/receipt dates). The EXISTS/NOT EXISTS pair becomes
    a left-semi then left-anti join of the late-lineitem set against
    the (orderkey → other-supplier) projections — both shuffle on
    orderkey, so AQE can chain them on one exchange."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    # Any lineitem of the same order from a different supplier.
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    # Late lineitems (vs their own order date) from a different supplier.
    late_others = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select(
            F.col("l_orderkey").alias("o3_orderkey"),
            F.col("l_suppkey").alias("o3_suppkey"),
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        late1.join(
            others,
            (late1.l_orderkey == F.col("o2_orderkey"))
            & (late1.l_suppkey != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (late1.l_orderkey == F.col("o3_orderkey"))
            & (late1.l_suppkey != F.col("o3_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(s), late1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg subquery)
# ---------------------------------------------------------------------------

@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND p_size <= 10
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders. The
    correlated per-part AVG becomes one grouped aggregate joined back
    on partkey (Catalyst would do the same de-correlation); adapted
    class = brand + size band (no p_container). Final /7.0 is double
    division of an exact decimal sum."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10)
    )
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(_money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING over a fact-side agg)
# ---------------------------------------------------------------------------

@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300. The HAVING
    subquery is a grouped agg → semi join on orderkey; the qualifying
    set is tiny, so it broadcasts into the probe of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("big_qty"))
        .filter(F.col("big_qty") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(F.col("l_quantity")).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicate)
# ---------------------------------------------------------------------------

@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs over joined attributes. Adapted: p_size
    bands instead of p_container. Catalyst extracts the common
    join key (equi hash join) and the brand/size disjunction pushes
    to the part scan; only the quantity legs stay as residuals."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    leg = lambda brand, s0, s1, q0, q1: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s0, s1)
        & F.col("l_quantity").between(q0, q1)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            leg("Brand#1", 1, 15, 1, 20)
            | leg("Brand#2", 10, 30, 10, 30)
            | leg("Brand#3", 20, 50, 20, 40)
        )
        .agg(
            F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (scalar subquery + anti join)
# ---------------------------------------------------------------------------

@query(
    "q22_dormant_customers",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c_acctbal) AS DOUBLE)
        FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average balance + no recent orders →
    per-nation count/sum. Adapted: "dormant" = no orders since
    2000-01-01 (every testdata customer has some order; phone country
    codes don't exist). The average is an exact decimal-sum / count
    double (same bits both engines); the NOT EXISTS is a left-anti
    join against the date-filtered orders scan."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01")
    ).select("o_custkey")
    return (
        # Scalar subquery as a broadcast 1-row cross join — stays fully
        # distributed (no driver collect) and costs one tiny exchange.
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (no partsupp: supply relation derived
# from lineitem history)
# ---------------------------------------------------------------------------

@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS cost_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    ranked AS (
      SELECT p_partkey, p_name, s_name, n_name, s_acctbal, cost_cents,
             ROW_NUMBER() OVER (PARTITION BY p_partkey
                                ORDER BY cost_cents, l_suppkey) AS rk
      FROM part
        JOIN supply ON p_partkey = l_partkey
        JOIN eu ON l_suppkey = s_suppkey
      WHERE p_size = 15 AND p_type = 'SMALL')
    SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
           CAST(cost_cents AS DOUBLE) / 100 AS min_cost
    FROM ranked WHERE rk = 1
    ORDER BY p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part in a size/type slice, the
    cheapest European supplier. Adapted: the testdata has no partsupp,
    so the supply relation is derived as MIN(l_extendedprice) per
    (part, supplier) pair observed in lineitem — exact integer cents.
    Plan: pair-key partial agg on the fact scan (the only big
    shuffle), then a broadcast join against the region-filtered
    supplier dim (~20 rows), then a per-part window rank whose input
    is already just |slice parts| x |EU suppliers| rows. The selective
    part predicate is pushed to the parquet scan and bounds the
    window input regardless of corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cost_cents")
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("p_partkey").orderBy("cost_cents", "l_suppkey")
    return (
        supply.join(F.broadcast(p), supply.l_partkey == p.p_partkey)
        .join(F.broadcast(eu), supply.l_suppkey == eu.s_suppkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            "s_acctbal",
            (F.col("cost_cents").cast("double") / 100).alias("min_cost"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Q11 — important stock value (global-fraction HAVING)
# ---------------------------------------------------------------------------

@query(
    "q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS units
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_nationkey < 13
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, CAST(units AS DOUBLE) / 10000 AS part_value
    FROM v
    WHERE units * (SELECT COUNT(*) FROM v) > (SELECT SUM(units) FROM v)
    ORDER BY part_value DESC, p_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part discounted value shipped by one
    nation GROUP's suppliers (nations 0-12 — Q11's single-nation
    filter left ZERO suppliers at sf0.001, where 10 suppliers spread
    over 25 nations: the round-4 vacuity audit found the query
    empty-and-trivially-green at the local suite's SF; a half-key
    group is populated at every SF), kept only when the part's value
    exceeds the MEAN part value of the group. Q11's fixed fraction is
    scale-dependent by design (the spec divides it by SF; a fixed
    0.125 % kept everything at sf0.001 and NOTHING at sf0.01 — both
    vacuous states, caught by the round-4 audit; 2x-mean also empties
    at sf0.01, where per-part sums concentrate and no part doubles
    the mean) — strictly-above-mean is the threshold that provably
    splits the set at ANY scale unless every part ties. Adapted: value comes from lineitem (no partsupp);
    the compare happens in the exact integer-unit domain
    (units * n_parts > 2 * total) so both engines agree bit-for-bit
    at the boundary. Plan: the 4-supplier dim
    broadcasts into the fact scan, one partial/final hash agg on
    l_partkey, and the grand total re-aggregates THE SAME agg output
    (tiny) and broadcasts back as a 1-row cross join — the fact table
    is scanned once."""
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 13)
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    unit = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(unit).alias("units"))
    )
    total = v.agg(
        F.sum("units").alias("total_units"), F.count("*").alias("n_parts")
    )
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("units") * F.col("n_parts") > F.col("total_units"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("units").cast("double") / 10000).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (NOT-IN exclusion)
# ---------------------------------------------------------------------------

@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'ECONOMY'
      AND p_size IN (5, 10, 15, 20, 25, 30)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) bucket, excluding a blocklisted supplier set. Adapted: the
    exclusion list is suppliers with negative balance (the fixture
    has no complaint comments); supply pairs come from lineitem. The
    part filter broadcasts into the fact scan; the exclusion is a
    broadcast left-anti join (NULL-safe NOT IN is not needed —
    s_suppkey is a non-null PK); count(distinct) expands to the
    standard two-phase expand+agg that Catalyst plans, keyed on the
    grouping columns."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "ECONOMY")
        & (F.col("p_size").isin(5, 10, 15, 20, 25, 30))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 — dominant-share suppliers of a part class (nested aggregates)
# ---------------------------------------------------------------------------

@query(
    "q20_excess_share_suppliers",
    oracle="""
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'),
    q97 AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS qty_cents
      FROM lineitem JOIN red ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey),
    tot AS (SELECT l_partkey, SUM(qty_cents) AS total_cents FROM q97 GROUP BY l_partkey),
    dominant AS (
      SELECT DISTINCT l_suppkey FROM q97 JOIN tot USING (l_partkey)
      WHERE qty_cents * 3 > total_cents * 2)
    SELECT s_name, n_name
    FROM supplier JOIN dominant ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    ORDER BY s_name
    """,
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding a dominant share of some
    part's flow. Adapted: with no partsupp availqty, "excess" becomes
    shipping more than 2/3 of a red part's total 1997 quantity. Both
    aggregates reuse one date+part-filtered scan: the per-part total
    re-aggregates the (part, supplier) partial — no second pass over
    the fact table — and the share test stays in exact integer
    hundredths (qty*3 > total*2). The final name lookup is a
    broadcast semi join into the 100-row supplier dim."""
    red = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red %")).select(
        "p_partkey"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    q97 = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_cents"))
    )
    tot = q97.groupBy("l_partkey").agg(F.sum("qty_cents").alias("total_cents"))
    dominant = (
        q97.join(tot, "l_partkey")
        .filter(F.col("qty_cents") * 3 > F.col("total_cents") * 2)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )

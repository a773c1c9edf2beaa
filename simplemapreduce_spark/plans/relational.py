"""Relational operator catalog (SURVEY.md §2.2) over the TPC-H-ish
tables: scans with pushdown, projections/filters, every join family,
aggregation variants (partial/final, distinct, rollup/cube/grouping
sets, pivot), sorts/limits/top-k, set ops, subqueries, and the scalar
function groups (string/date/math/json/conditional).

The reference framework had NONE of these natively — its only
relational power was user code inside mapF/reduceF (SURVEY.md §2.2) —
so this module is the "expose natively what the reference left to
user-space" half of the engine.

Determinism-for-oracle rules used throughout:
* money aggregates go through DECIMAL(18,2|4|6) so partial-aggregation
  order can never change a ulp (doubles are order-sensitive; decimals
  are exact);
* every top-k orders by a unique tie-break column;
* avg = decimal-sum cast to double, divided, cast back — identical
  bit-stream on both engines.

Scale notes: all plans below are pure Catalyst — filters/projections
push into the parquet scan, small dims broadcast (BROADCASTABLE list),
aggregations run partial+final, and AQE re-plans skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simplemapreduce_spark.functions.time import date_trunc_ntz
from simplemapreduce_spark.catalog import query
from simplemapreduce_spark.sources.tables import load_table, register_tables


def _dsum(c: Column, scale: int = 2) -> Column:
    """Order-insensitive exact sum: per-row cast to decimal, exact
    decimal addition, FINAL CAST TO DOUBLE.

    Why decimal inside: double addition is order-sensitive; decimal is
    exact, so partial-aggregation order can never change a ulp.
    Why double outside: the driver stringifies results through pandas —
    Spark DECIMAL arrives as `Decimal('253942.00')` (renders with
    trailing zeros) while DuckDB DECIMAL arrives as float64
    (`'253942.0'`), so a DECIMAL output column hash-mismatches even
    when numerically identical (VERDICT.md round 1, item 1). An exact
    decimal cast to double is correctly rounded on both engines →
    bit-identical float64 → identical strings.

    ONLY safe on source columns whose true values have <= `scale`
    decimal digits (money/rate columns here): the double is then never
    near a rounding tie, so Spark's and DuckDB's double→decimal casts
    agree. For COMPUTED expressions, do the arithmetic in decimal
    instead (see _money/_one_minus/_one_plus) — a product like
    1234.56*0.95 is an exact .xx5 tie in binary-adjacent form, and the
    two engines round those ties differently (observed: HALF_UP on the
    shortest repr vs llround on the binary value)."""
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def _money(name: str) -> Column:
    """Exact decimal view of a 2-dp money/rate source column."""
    return F.col(name).cast("decimal(12,2)")


def _one_minus(name: str) -> Column:
    return F.lit(1).cast("decimal(3,2)") - F.col(name).cast("decimal(4,2)")


def _one_plus(name: str) -> Column:
    return F.lit(1).cast("decimal(3,2)") + F.col(name).cast("decimal(4,2)")


def _davg(c: Column) -> Column:
    """avg as decimal-sum / count — deterministic double division,
    double output (no final decimal rounding: double→decimal casts can
    disagree between engines at exact half boundaries, and DECIMAL
    output columns break driver string-hash parity anyway)."""
    return F.sum(c.cast("decimal(18,6)")).cast("double") / F.count(c)


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------

def _rcents(name: str) -> Column:
    """Exact integer cents from a 2-dp money/rate double, without a
    per-row decimal cast: the true value is an integer after *100, the
    accumulated float error is ~1e-9 — round() always recovers exactly
    that integer, on both engines (never an exact .5, so HALF_UP vs
    half-away never matters). ~2x cheaper per row than
    cast(decimal(18,2)): no BigDecimal materialization in the agg
    input. Sum headroom: a LONG of cents overflows at 9.2e16 dollars —
    two orders of magnitude above a 100 TB TPC-H column sum."""
    return F.round(F.col(name) * 100).cast("long")


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                    * (100 + CAST(ROUND(l_tax * 100, 0) AS BIGINT))) AS DOUBLE) / 1000000 AS sum_charge,
           CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / COUNT(l_quantity) / 100 AS avg_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / COUNT(l_extendedprice) / 100 AS avg_price,
           CAST(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS DOUBLE) / COUNT(l_discount) / 100 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter(pushdown)→partial/final hash agg.
    The plan Catalyst picks is the one the reference could never have:
    map-side combine before the shuffle (SURVEY.md §2.1 note 1).

    Aggregation runs in exact integer cents (_rcents): long sums for
    the 100-scaled base columns (4x headroom over a 100 TB column
    sum), decimal(28,0) accumulators for the 1e4/1e6-scaled products
    (a long would overflow there at extreme scale; decimal stays
    compact-long-backed until it actually exceeds 18 digits, so the
    fast path holds at bench scale and exactness holds at any scale).
    2.4x faster than per-row decimal(18,2) casts, measured at sf0.1.
    The oracle mirrors the arithmetic ORDER (exact sum → double →
    divides) so both engines round identically at every step."""
    li = load_table(spark, sf_dir, "lineitem")
    cq, cp, cd, ct = (_rcents(c) for c in
                      ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    disc_price = (cp * (100 - cd)).cast("decimal(28,0)")
    charge = (cp * (100 - cd) * (100 + ct)).cast("decimal(28,0)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cq).cast("double") / 100).alias("sum_qty"),
            (F.sum(cp).cast("double") / 100).alias("sum_base_price"),
            (F.sum(disc_price).cast("double") / 10000).alias("sum_disc_price"),
            (F.sum(charge).cast("double") / 1000000).alias("sum_charge"),
            (F.sum(cq).cast("double") / F.count("l_quantity") / 100).alias("avg_qty"),
            (F.sum(cp).cast("double") / F.count("l_extendedprice") / 100).alias("avg_price"),
            (F.sum(cd).cast("double") / F.count("l_discount") / 100).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+sum — every predicate reaches the
    parquet scan as a pushed filter (verified via explain in tests)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_money("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)"))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_minmax_percentile",
    oracle="""
    SELECT o_orderpriority,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_minmax_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (Spark `percentile` ≡ DuckDB quantile_cont,
    bit-parity verified empirically)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_string",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q_agg_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: sort_array(collect_list) pins the
    within-group order that is otherwise nondeterministic."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"), F.count("*").alias("n")
    )


@query(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        _dsum(F.col("o_totalprice")).alias("sum_price"), F.count("*").alias("n")
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pruned + parallelized source view (round 10): GROUPING SETS plans
    # an Expand (one copy of every row per grouping set) inside the
    # map-side partial aggregate, which the single-row-group fixture
    # pinned to ONE scan task; the guard fans the 3x expansion out
    # (measured ~1.35 s -> ~1.0 s, no-op on production layouts).
    from simplemapreduce_spark.sources.tables import ensure_parallelism

    ensure_parallelism(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus", "l_extendedprice"
        )
    ).createOrReplaceTempView("smr_lineitem_gsets")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM smr_lineitem_gsets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS O,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(_dsum(F.col("l_quantity")))
    )


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k.
    customer is broadcast (under the 64 MB threshold at any SF where a
    dimension fits one executor); top-k compiles to
    TakeOrderedAndProject, no global sort materialized."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. All dims broadcast; the only
    shuffle is lineitem⋈orders plus the final agg — the minimal plan
    at any scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint — zero shuffle on the
    fact side before aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lineitems"), _dsum(F.col("l_quantity")).alias("sum_qty"))
    )


@query(
    "q_join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders (COUNT of a
    null column = 0, null-sum coalesced)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(_dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spend"),
        )
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS — emits each customer at most once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS: customers who never placed an
    URGENT order. Round 4 fix: the original probe ("customers with no
    orders at all") matched ZERO rows at every SF — the generator
    gives every customer at least one order — so the anti join was
    vacuously green from round 1 (an inner-join bug would have passed
    identically). The priority filter leaves real survivors (18 at
    sf0.001, 203 at sf0.01) while keeping the same plan shape, and the
    filter sits on the anti side — pushed below the join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q_join_range",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 1, 10), ('medium', 11, 25), ('large', 26, 50)
    )
    SELECT band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM part JOIN bands ON p_size BETWEEN lo AND hi
    GROUP BY band
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a tiny banding relation — Spark
    executes it as a broadcast nested-loop join, the right physical
    plan when one side is a handful of rows."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("small", 1, 10), ("medium", 11, 25), ("large", 26, 50)], ["band", "lo", "hi"]
    )
    return (
        p.join(F.broadcast(bands), (p.p_size >= bands.lo) & (p.p_size <= bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), _dsum(F.col("p_retailprice")).alias("sum_price"))
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (bounded dims only — 5×25)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "q_self_join",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def q_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with an inequality pair constraint (the pattern every
    pairwise dedup/similarity operator builds on)."""
    n = load_table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))


# ---------------------------------------------------------------------------
# Sorts / limits / set ops / subqueries
# ---------------------------------------------------------------------------

@query(
    "q_topk",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey LIMIT 15
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject (per-partition heap + a
    k-row merge on the driver; no global sort at any scale)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(15)
    )


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(F.col("o_orderstatus").asc(), F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@query(
    "q_set_union",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return a.union(b).distinct()


@query(
    "q_set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(b)


@query(
    "q_set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.select("c_custkey").exceptAll(
        o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    ).distinct()


@query(
    "q_exists_subquery",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey AND l_quantity > 49
    )
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL surface — Catalyst rewrites it
    to a left-semi join."""
    register_tables(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_suppkey = s_suppkey AND l_quantity > 49
        )
        """
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (avg is a threshold, not output, so
    double avg nondeterminism cannot leak into values — only into a
    knife-edge row membership, which decimal would not fix either)."""
    register_tables(spark, sf_dir, ("customer",))
    return spark.sql(
        "SELECT c_custkey, c_acctbal FROM customer "
        "WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)"
    )


# ---------------------------------------------------------------------------
# Scalar function groups
# ---------------------------------------------------------------------------

@query(
    "q_scalar_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           SUBSTR(p_name, 1, 8) AS name_prefix,
           LENGTH(p_name) AS name_len,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           CONCAT(p_type, '/', p_brand) AS type_brand,
           REPLACE(LOWER(p_type), ' ', '_') AS type_slug
    FROM part
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.concat(F.col("p_type"), F.lit("/"), F.col("p_brand")).alias("type_brand"),
        F.replace(F.lower("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
    )


@query(
    "q_scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           CAST(QUARTER(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch_start,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders
    """,
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        # string, not DATE: Spark DATE arrives in pandas as datetime.date
        # objects while DuckDB DATE arrives as datetime64 — str() differs.
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
        date_trunc_ntz("month", F.col("o_orderdate")).alias("month_start"),
    )


@query(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_extendedprice - l_quantity * 1000), 2) AS price_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_discount * 100) AS BIGINT) AS disc_pct,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
           CAST(CAST(POWER(l_tax + 1, 2) AS DECIMAL(18,6)) AS DOUBLE) AS tax_sq
    FROM lineitem
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row double math is deterministic (same input bits → same
    output bits on both engines); only aggregates need decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000), 2).alias("price_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.pow(F.col("l_tax") + 1, 2).cast("decimal(18,6)").cast("double").alias("tax_sq"),
    )


@query(
    "q_scalar_json",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props column (the reference had
    JSON only as framework plumbing, never queryable — SURVEY.md §2.2)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count("*").alias("n"),
    )


@query(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS balance_tier,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer GROUP BY 1
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
    )
    return c.groupBy(tier.alias("balance_tier")).agg(
        F.count("*").alias("n_customers"), _dsum(F.col("c_acctbal")).alias("sum_bal")
    )

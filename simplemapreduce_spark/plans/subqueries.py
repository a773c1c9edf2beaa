"""SQL subquery surface — IN / EXISTS / scalar / correlated-scalar
subqueries through ``spark.sql`` (SURVEY.md §2.2 "SQL front-end").

The DataFrame catalog already covers the join *executions* these
rewrite to (q_join_semi/anti, broadcast scalar joins); this module
exercises the Catalyst REWRITES themselves: IN → left-semi,
EXISTS → left-semi with correlated predicate pullup, scalar subquery
→ broadcast single-row cross join, correlated scalar → aggregated
equi-join (RewriteCorrelatedScalarSubquery). Oracle SQL is the same
statement DuckDB runs — identical text, two optimizers, one answer.

Float caution: scalar thresholds use MAX (exact), never AVG/SUM of
doubles (order-sensitive accumulation could flip comparisons between
engines — see the decimal conventions in plans/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from simplemapreduce_spark.catalog import query
from simplemapreduce_spark.sources.tables import register_tables

_IN_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey < 5)
    GROUP BY o_orderpriority
"""

_EXISTS_SQL = """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    GROUP BY c_mktsegment
"""

_SCALAR_SQL = """
    SELECT l_returnflag, COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_quantity > 0.5 * (SELECT MAX(l_quantity) FROM lineitem)
    GROUP BY l_returnflag
"""

_CORRELATED_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n_near_peak
    FROM orders o
    WHERE o_totalprice >= 0.9 * (
      SELECT MAX(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    GROUP BY o_orderpriority
"""


def _sql(spark: SparkSession, sf_dir: str, stmt: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(stmt)


@query("q_subquery_in", oracle=_IN_SQL)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery → left-semi join on the rewritten plan
    (customer side is dimension-sized: broadcast)."""
    return _sql(spark, sf_dir, _IN_SQL)


@query("q_subquery_exists", oracle=_EXISTS_SQL)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → predicate pulled up into a left-semi join
    key; no per-row subquery execution ever happens."""
    return _sql(spark, sf_dir, _EXISTS_SQL)


@query("q_subquery_scalar", oracle=_SCALAR_SQL)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: the MAX computes once and reaches
    every row as a broadcast scalar (ReuseSubquery), not a re-scan."""
    return _sql(spark, sf_dir, _SCALAR_SQL)


@query("q_subquery_correlated", oracle=_CORRELATED_SQL)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-customer peak) → rewritten to an
    aggregate-then-join: one groupBy over orders plus one equi-join,
    never O(rows × subquery) execution."""
    return _sql(spark, sf_dir, _CORRELATED_SQL)


_NOT_IN_NULLS_SQL = """
    SELECT 'not_in_nullfree' AS panel, COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey NOT IN (
      SELECT c_custkey FROM customer WHERE c_nationkey < 5)
    UNION ALL
    SELECT 'not_in_with_null', COUNT(*)
    FROM orders
    WHERE o_custkey NOT IN (
      SELECT CASE WHEN c_nationkey = 3 THEN NULL ELSE c_custkey END
      FROM customer WHERE c_nationkey < 5)
    UNION ALL
    SELECT 'not_exists_with_null', COUNT(*)
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_nationkey < 5
        AND (CASE WHEN c.c_nationkey = 3 THEN NULL ELSE c.c_custkey END)
              = o.o_custkey)
"""


@query("q_subquery_not_in_nulls", oracle=_NOT_IN_NULLS_SQL)
def q_subquery_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN three-valued-logic trap, pinned as a three-panel
    contrast on identical SQL text: (1) NOT IN against a NULL-free
    list — the null-aware anti join's happy path; (2) the same list
    with one NULL injected — x <> NULL is UNKNOWN, so NO row can pass
    and the count is exactly 0 (the production bug this query
    documents: one NULL silently empties the result); (3) the NOT
    EXISTS rewrite of the same predicate — NULL keys simply never
    match, so it counts against the null-free subset instead, a
    strictly larger result than panel 1. Catalyst plans (1)/(2) as
    NullAwareAntiJoin vs DuckDB's mark join — two different physical
    strategies, one SQL-mandated answer per panel.

    Scale shape: each panel is a broadcast-able anti/semi join against
    a filtered dim plus a count; the union is 3 rows."""
    return _sql(spark, sf_dir, _NOT_IN_NULLS_SQL)

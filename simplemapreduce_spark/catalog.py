"""Central query catalog.

Every implemented operator registers here as a named query
(``(spark, sf_dir) -> DataFrame``), optionally paired with an
equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables. The driver's correctness gate compares the two
(row count + schema + order-insensitive value hash), so:

* every computed column is aliased identically on both sides;
* float aggregates are rounded identically on both sides;
* queries whose semantics are approximate / not SQL-expressible
  register without an oracle (driver then does a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query, optionally with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every plan module so its queries register."""
    # Imports are side-effectful by design (decorator registration).
    from simplemapreduce_spark.operators import ml_lsh, skew  # noqa: F401
    from simplemapreduce_spark.plans import (  # noqa: F401
        dedup,
        extensions,
        llm_text,
        mr_compat,
        relational,
        relational_ext,
        relational_more,
        sampling,
        similarity,
        timeseries,
        tpch_ext,
        windows,
    )
    from simplemapreduce_spark.streaming import stateful, windows as stream_windows  # noqa: F401

"""Parquet table sources.

The reference's only source is whole local text files
(/root/reference/src/common/common_map.go:66-71). The new engine's
primary source is columnar parquet — scans benefit from predicate
pushdown, column pruning, and partition pruning via Catalyst, which
the reference had no equivalent of (SURVEY.md §4.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (region/nation are bounded; supplier/part/customer grow with
# SF but stay orders of magnitude below the fact tables).
BROADCASTABLE = ("region", "nation", "supplier", "part", "customer")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table. Declarative scan — filters/projections
    applied by callers reach the parquet reader via Catalyst pushdown.

    ``events.ts`` is TIMESTAMP(NANOS) in the file; Spark reads it as a
    nanosecond long (spark.sql.legacy.parquet.nanosAsLong) and we
    convert to a microsecond timestamp here — same truncation DuckDB
    applies reading the same file, so oracles agree.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # Must hold in ANY session (the driver builds its own, without
        # our factory defaults) — the conf is runtime-settable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register temp views so the SQL API sees the same catalog the
    DataFrame API does (and the DuckDB oracle mirrors)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

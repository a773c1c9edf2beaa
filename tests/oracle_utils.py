"""Local replica of the driver's correctness gate: run a catalog query
on Spark and its oracle SQL on DuckDB over the same parquet tables;
compare row count, column names, output TYPES, and order-insensitive
values.

Stricter than the driver in two ways: it reports the max float
deviation, so queries that only match approximately (and would risk a
value-hash mismatch) are caught here first; and it requires the
normalized output-type vectors to be identical (round-6 lesson: the
driver's value hash is TYPE-sensitive — a DuckDB HUGEINT vs Spark
BIGINT failed `q_text_encoding_audit`'s hash even though every
stringified cell matched, and a `str(x)` compare cannot see it).
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb

from simplemapreduce_spark.sources.tables import TABLE_NAMES, table_path
from tools.type_parity import type_mismatches

FLOAT_REL_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canon(v: Any) -> Any:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return ("f", round(v, 9))
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _sort_key(row: tuple) -> tuple:
    return tuple((x is None, str(x)) for x in row)


def compare_query(
    spark,
    query_fn,
    oracle: str,
    sf_dir: str,
) -> None:
    sdf = query_fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(row[c] for c in spark_cols) for row in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        rel = con.sql(oracle)
        duck_cols_orig = list(rel.columns)
        duck_types = [str(t) for t in rel.types]
        order = sorted(range(len(duck_cols_orig)), key=lambda i: duck_cols_orig[i])
        duck_cols = [duck_cols_orig[i] for i in order]
        duck_rows = [tuple(r[i] for i in order) for r in rel.fetchall()]
    finally:
        con.close()

    tm = type_mismatches(duck_cols_orig, duck_types, sdf.schema)
    assert not tm, (
        "output TYPE mismatch (the driver's value hash is type-sensitive): "
        + "; ".join(tm)
    )

    assert spark_cols == duck_cols, f"columns differ: spark={spark_cols} duckdb={duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"row counts differ: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    s_sorted = sorted((tuple(_canon(v) for v in r) for r in spark_rows), key=_sort_key)
    d_sorted = sorted((tuple(_canon(v) for v in r) for r in duck_rows), key=_sort_key)

    max_float_dev = 0.0
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            if sv == dv:
                continue
            if (
                isinstance(sv, tuple)
                and isinstance(dv, tuple)
                and len(sv) == 2
                and sv[0] == "f"
                and dv[0] == "f"
                and math.isclose(sv[1], dv[1], rel_tol=FLOAT_REL_TOL, abs_tol=1e-9)
            ):
                max_float_dev = max(max_float_dev, abs(sv[1] - dv[1]))
                continue
            raise AssertionError(
                f"value mismatch at sorted-row {i} col {duck_cols[c]}: spark={sv!r} duckdb={dv!r}"
            )
    if max_float_dev > 0:
        raise AssertionError(
            f"floats match only approximately (max dev {max_float_dev:.3e}) — "
            "round on both sides so the driver's value-hash matches exactly"
        )

"""Output-type parity guards (VERDICT r6 "Next round" #2 and #5).

Round 6's only driver red was a TYPE divergence invisible to every
stringifying local check: `q_text_encoding_audit`'s oracle summed
integers into DuckDB HUGEINT where Spark returned BIGINT, and the
driver's type-sensitive value hash failed while rows and schema
matched. The gate replica (`tests/oracle_utils.compare_query`) and
`tools/driver_sim.py` now compare normalized output-type vectors, so
the catalog-wide enforcement runs with every `test_oracle_parity`
replay; this module pins the checker itself:

* normalizer unit coverage over both engines' spellings, and
* NEGATIVE controls — a replica of the exact round-6 failure shape
  (uncast DuckDB SUM vs Spark bigint) must be caught, proving the gate
  can no longer be green on a query the driver would fail.
"""

from __future__ import annotations

import duckdb
import pytest

from simplemapreduce_spark import catalog
from tests.oracle_utils import compare_query
from tools.type_parity import normalize_duck, normalize_spark, type_mismatches

catalog.load_all()


# ------------------------------------------------------------ normalizers

@pytest.mark.parametrize(
    ("duck", "spark"),
    [
        ("BIGINT", "bigint"),
        ("INTEGER", "int"),
        ("SMALLINT", "smallint"),
        ("TINYINT", "tinyint"),
        ("DOUBLE", "double"),
        ("FLOAT", "float"),
        ("VARCHAR", "string"),
        ("BOOLEAN", "boolean"),
        ("DATE", "date"),
        ("TIMESTAMP", "timestamp"),
        ("DECIMAL(38,0)", "decimal(38,0)"),
        ("DECIMAL(18,2)", "decimal(18,2)"),
        ("BLOB", "binary"),
        ("DOUBLE[]", "array<double>"),
        ("VARCHAR[]", "array<string>"),
        ("BIGINT[][]", "array<array<bigint>>"),
        ("MAP(VARCHAR, BIGINT)", "map<string,bigint>"),
        ("STRUCT(a BIGINT, b VARCHAR)", "struct<a:bigint,b:string>"),
    ],
)
def test_equivalent_spellings_normalize_equal(duck: str, spark: str) -> None:
    assert normalize_duck(duck) == normalize_spark(spark)


def test_timestamp_ntz_and_ltz_both_normalize_to_ts() -> None:
    # Both Spark timestamp flavors collect to naive datetimes in a UTC
    # session and have passed the driver hash against DuckDB TIMESTAMP
    # across 220 green rows — the one documented cross-engine
    # equivalence.
    assert normalize_spark("timestamp") == normalize_spark("timestamp_ntz") == "ts"
    assert normalize_duck("TIMESTAMP") == "ts"


@pytest.mark.parametrize(
    ("duck", "spark"),
    [
        ("HUGEINT", "bigint"),       # the round-6 failure class
        ("UHUGEINT", "bigint"),
        ("HUGEINT", "decimal(38,0)"),
        ("BIGINT", "int"),           # int widths must match exactly too
        ("INTEGER", "bigint"),
        ("DECIMAL(38,0)", "bigint"),
        ("DECIMAL(18,2)", "decimal(18,3)"),
        ("DOUBLE", "float"),
        ("TIMESTAMP WITH TIME ZONE", "timestamp"),
    ],
)
def test_divergent_types_do_not_normalize_equal(duck: str, spark: str) -> None:
    assert normalize_duck(duck) != normalize_spark(spark)


def test_unknown_types_are_flagged_not_swallowed() -> None:
    assert normalize_duck("ENUM('a','b')").startswith("?duck:")
    assert normalize_spark("interval day").startswith("?spark:")


# ------------------------------------------------------- negative controls

def test_type_mismatches_catches_the_round6_failure_shape(spark, sf_dir) -> None:
    """Replica of the exact q_text_encoding_audit bug: an uncast DuckDB
    integer SUM (HUGEINT) against a Spark bigint of the SAME value. The
    stringified cells are identical — only the type vector differs —
    and the checker must flag it."""
    sdf = spark.range(1).selectExpr("CAST(3 AS BIGINT) AS s")
    con = duckdb.connect()
    try:
        rel = con.sql("SELECT SUM(x) AS s FROM (SELECT UNNEST([1, 2]) AS x)")
        duck_types = [str(t) for t in rel.types]
        assert normalize_duck(duck_types[0]) == "i128"  # DuckDB SUM(int) -> HUGEINT
        tm = type_mismatches(list(rel.columns), duck_types, sdf.schema)
    finally:
        con.close()
    assert tm and "i128" in tm[0]


def test_compare_query_fails_on_hugeint_oracle(spark, sf_dir) -> None:
    """End-to-end negative control through the real gate replica: same
    values both sides, oracle type HUGEINT — compare_query must raise,
    where the pre-round-7 stringified compare silently passed."""

    def q(spark_, _sf_dir):
        return spark_.range(1).selectExpr("CAST(3 AS BIGINT) AS s")

    with pytest.raises(AssertionError, match="TYPE mismatch"):
        compare_query(
            spark, q, "SELECT SUM(x) AS s FROM (SELECT UNNEST([1, 2]) AS x)", sf_dir
        )


# ----------------------------------------------------- catalog-wide guard

def test_no_driver_facing_output_is_128bit_backed(sf_dir) -> None:
    """HARD ban, NO allowlist (VERDICT r7 "Next round" #2): no oracle
    output column may be HUGEINT, UHUGEINT, or DECIMAL(p>18) — round 6's
    only red was the catalog's only HUGEINT output; round 7's only red
    was the catalog's only decimal(38,0) output, judge-replicated
    bit-identical in values AND declared types on both engines. The
    driver's value hash mishandles 128-bit-physical columns even under
    exact type parity, so declared-type matching (compare_query) cannot
    defend against this class — the wide type must not exist in any
    driver-facing output at all. The r6 allowlist ("exactly
    q_graph_label_propagation") is precisely where the r7 red hid.

    This DuckDB-only plan-time scan transitively covers the Spark side
    of every oracled query because compare_query enforces exact
    normalized-type equality between the engines; the two rows-only
    queries (no oracle) get a direct Spark-schema scan in
    test_rows_only_outputs_not_128bit_backed below."""
    from tests.oracle_utils import duckdb_connection
    from tools.type_parity import is_driver_hostile

    con = duckdb_connection(sf_dir)
    offenders = []
    try:
        for name, sql in catalog.ORACLES.items():
            rel = con.sql(sql)
            for col, t in zip(rel.columns, rel.types):
                if is_driver_hostile(normalize_duck(str(t))):
                    offenders.append(f"{name}.{col}: {t}")
    finally:
        con.close()
    assert not offenders, offenders


def test_rows_only_outputs_not_128bit_backed(spark, sf_dir) -> None:
    """The non-oracled (rows-only) queries have no DuckDB side for the
    scan above to cover transitively — check their Spark output schemas
    directly at plan time."""
    from tools.type_parity import is_driver_hostile

    rows_only = [n for n in catalog.QUERIES if n not in catalog.ORACLES]
    offenders = []
    for name in rows_only:
        df = catalog.QUERIES[name](spark, sf_dir)
        for f in df.schema:
            if is_driver_hostile(normalize_spark(f.dataType.simpleString())):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, offenders


def test_wide_type_ban_catches_the_round7_failure_shape() -> None:
    """Negative control: the exact pre-fix LPA output type (DECIMAL(38,0),
    identical on both engines — so type PARITY passes) must be flagged by
    the wide-type ban; so must round 6's HUGEINT shape and nested wides."""
    from tools.type_parity import is_driver_hostile

    assert is_driver_hostile(normalize_duck("DECIMAL(38,0)"))
    assert is_driver_hostile(normalize_spark("decimal(38,0)"))
    assert is_driver_hostile(normalize_duck("HUGEINT"))
    assert is_driver_hostile(normalize_duck("UHUGEINT"))
    assert is_driver_hostile(normalize_duck("DECIMAL(19,4)"))
    assert is_driver_hostile(normalize_spark("array<decimal(38,0)>"))
    assert is_driver_hostile(normalize_duck("STRUCT(a HUGEINT)"))
    # 64-bit-and-narrower stays legal.
    assert not is_driver_hostile(normalize_duck("DECIMAL(18,2)"))
    assert not is_driver_hostile(normalize_spark("decimal(12,2)"))
    assert not is_driver_hostile(normalize_duck("BIGINT"))
    assert not is_driver_hostile(normalize_spark("array<bigint>"))

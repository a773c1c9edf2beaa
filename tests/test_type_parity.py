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

def test_no_oracle_emits_128bit_integers(sf_dir) -> None:
    """No oracle output column may be HUGEINT/UHUGEINT (the driver-red
    class); DECIMAL(38,*) is allowed only where the Spark side is the
    same decimal — enforced by the full type sweep in compare_query,
    so here the cheap plan-time DuckDB-only scan just pins the 128-bit
    integer class catalog-wide without a Spark session."""
    from tests.oracle_utils import duckdb_connection

    con = duckdb_connection(sf_dir)
    offenders = []
    try:
        for name, sql in catalog.ORACLES.items():
            rel = con.sql(sql)
            for col, t in zip(rel.columns, rel.types):
                if normalize_duck(str(t)) in ("i128", "u128"):
                    offenders.append(f"{name}.{col}: {t}")
    finally:
        con.close()
    assert not offenders, offenders

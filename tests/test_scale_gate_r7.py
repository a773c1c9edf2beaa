"""Pins for the four round-7 sf0.1-gate fixes (commit 57a0171): each of
the scale-triggered cross-engine divergence classes stays fixed. The
sf0.1 replay that found them is too slow for the suite, so each pin
reproduces its class on an adversarial literal fixture instead:

1. double->int CAST semantics (q_drift_psi): DuckDB CAST(double AS
   BIGINT) ROUNDS, Spark's cast TRUNCATES — any shared binning math
   must be spelled FLOOR on both sides.
2. width_bucket boundary clamps (q_histogram_equiwidth): the oracle's
   CASE must mirror Spark's width_bucket for out-of-range values, not
   just the interior floor formula.
3. ROUND(double, n) near a tie (q_ts_ewma): engines disagree because
   Spark rounds the shortest-decimal BigDecimal while DuckDB rounds in
   double arithmetic; the floor(v*1e6 + 0.5)/1e6 idiom is built from
   IEEE-correctly-rounded primitives only, hence bit-identical
   cross-engine for any input double.
4. negative zero (q_window_rolling_corr): DuckDB ROUND can emit -0.0
   where Spark emits +0.0; `+ 0.0` after the oracle's ROUND normalizes
   (IEEE -0.0 + 0.0 = +0.0) under the driver's stringified compare.
"""

from __future__ import annotations

import math
import struct

import duckdb


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def test_duckdb_double_cast_rounds_where_spark_truncates(spark):
    """The hazard itself: a price 0.4 below a 50000 bin edge bins into
    the upper bin under DuckDB's CAST but the lower bin under Spark's.
    If either engine ever changes this semantic, the catalog-wide
    'no bare double->int CAST in oracles' class scan needs re-running."""
    # 49999.6::DOUBLE, not the bare literal: an undecorated 49999.6
    # types as DECIMAL(6,1) in DuckDB, which would pin DECIMAL->BIGINT
    # rounding instead of the double->int class this test documents
    # (ADVICE r7 #3). Both happen to round, but the pinned hazard must
    # be the one named.
    d = duckdb.connect().execute("SELECT CAST(49999.6::DOUBLE AS BIGINT)").fetchone()[0]
    s = spark.sql("SELECT CAST(CAST(49999.6 AS DOUBLE) AS BIGINT) AS v").collect()[0].v
    assert d == 50000, "DuckDB CAST(double AS BIGINT) is round-to-nearest"
    assert s == 49999, "Spark CAST(double AS BIGINT) is truncate-toward-zero"


def test_floor_binning_agrees_on_bin_edge_straddlers(spark):
    """The fix: FLOOR(v / 50000) — identical IEEE ops — bins straddlers
    the same way on both engines (the q_drift_psi / seasonal-anomaly
    spelling)."""
    vals = [49999.6, 50000.0, 99999.5, 0.4, 149999.99]
    con = duckdb.connect()
    for v in vals:
        d = con.execute(
            f"SELECT LEAST(CAST(FLOOR({v!r}::DOUBLE / 50000) AS BIGINT), 9)"
        ).fetchone()[0]
        s = (
            spark.sql(
                f"SELECT LEAST(CAST(FLOOR(CAST({v!r} AS DOUBLE) / 50000) AS BIGINT), 9) AS b"
            )
            .collect()[0]
            .b
        )
        assert d == s, f"bin diverged for {v!r}: duckdb={d} spark={s}"


def test_width_bucket_oracle_case_mirrors_clamps(spark):
    """Out-of-range values: below lo -> bucket 0, at/above hi -> bucket
    n+1. The raw interior formula FLOOR((v-lo)/width)+1 alone emits
    bucket 12 for v >= hi + width (the sf0.1 straddler); the oracle's
    CASE must clamp exactly like Spark's width_bucket."""
    lo, hi, n = 0.0, 500.0, 10
    vals = [-1.0, 0.0, 49.999, 499.99, 500.0, 549.9, 560.0, 5000.0]
    expected = [0, 1, 1, 10, 11, 11, 11, 11]
    srows = spark.sql(
        "SELECT width_bucket(v, {lo}, {hi}, {n}) AS b FROM VALUES {vals} t(v)".format(
            lo=lo, hi=hi, n=n, vals=",".join(f"(CAST({v!r} AS DOUBLE))" for v in vals)
        )
    ).collect()
    oracle_case = (
        "CASE WHEN v < {lo} THEN 0 WHEN v >= {hi} THEN {n} + 1 "
        "ELSE CAST(FLOOR((v - {lo}) / (({hi} - {lo}) / {n})) + 1 AS BIGINT) END"
    ).format(lo=lo, hi=hi, n=n)
    orows = duckdb.connect().execute(
        f"SELECT {oracle_case} FROM (VALUES {','.join(f'({v!r}::DOUBLE)' for v in vals)}) t(v)"
    ).fetchall()
    assert [r.b for r in srows] == expected
    assert [r[0] for r in orows] == expected


def test_floor_round_idiom_is_bit_identical_cross_engine(spark):
    """floor(v*1e6 + 0.5)/1e6 over an adversarial battery (6th-decimal
    ties, half-ulp-below-tie quotients, subnormal-ish smalls, negatives
    of the non-tie cases): every output double bit-identical between
    Spark and DuckDB. ROUND(double, 6) does NOT have this property —
    that asymmetry is exactly what the q_ts_ewma sf0.1 failure was."""
    battery = [
        0.1234565,
        0.9999995,
        1.0000005,
        2.5e-07,
        7.5e-07,
        0.123456499999999996,
        123.4567894999999,
        0.0,
        1e-12,
        987654.3210987,
        41.99999949999999,
        41.9999995,
    ]
    con = duckdb.connect()
    for v in battery:
        d = con.execute(
            f"SELECT FLOOR({v!r}::DOUBLE * 1000000.0 + 0.5) / 1000000.0"
        ).fetchone()[0]
        s = (
            spark.sql(
                f"SELECT FLOOR(CAST({v!r} AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS r"
            )
            .collect()[0]
            .r
        )
        assert _bits(d) == _bits(s), f"idiom diverged for {v!r}: duckdb={d!r} spark={s!r}"


def test_negative_zero_normalization(spark):
    """DuckDB ROUND(-1e-9, 4) is IEEE -0.0 (stringifies '-0.0'); adding
    + 0.0 yields +0.0, matching what Spark emits for the same rounding
    — the q_window_rolling_corr oracle normalization."""
    con = duckdb.connect()
    raw = con.execute("SELECT ROUND(-0.000000001::DOUBLE, 4)").fetchone()[0]
    fixed = con.execute("SELECT ROUND(-0.000000001::DOUBLE, 4) + 0.0").fetchone()[0]
    s = spark.sql("SELECT ROUND(CAST(-0.000000001 AS DOUBLE), 4) AS r").collect()[0].r
    assert math.copysign(1.0, raw) == -1.0, "hazard gone? re-run the -0.0 class scan"
    assert math.copysign(1.0, fixed) == 1.0
    assert math.copysign(1.0, s) == 1.0
    assert repr(fixed) == repr(s) == "0.0"

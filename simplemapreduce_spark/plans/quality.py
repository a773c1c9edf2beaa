"""Data-quality & governance operators — the audit layer a 100 TB
training-data pipeline runs before and after every transformation:

* column profiling (null rate, distinct count, min/max per column);
* constraint auditing (PK uniqueness, domain membership, range,
  NOT NULL, referential integrity) with violation counts;
* snapshot diff (CDC between two table versions: insert/update/delete
  classification);
* compaction planning (small-file bin-packing targets per partition).

The constraint audit and snapshot diff verify on NON-empty results by
construction: the audited view layers deterministic corruption (keyed
on ``o_orderkey`` residues) over the clean fixture, and the snapshots
are two deterministic filtered/mutated views of ``orders`` — so every
rule counts real violations and every change class (insert, update,
delete) is populated. A clean-data audit would pass vacuously and
hide counting bugs (the failure mode ADVICE r2 flagged for the
disjoint-time-range joins).

Extension scope: the reference's dataflow is opaque-string
map/shuffle/reduce (/root/reference/src/common/common_map.go:59,
common_reduce.go:51); it has no audit/profile/diff surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simplemapreduce_spark.catalog import query
from simplemapreduce_spark.sources.tables import load_table

# --------------------------------------------------------------------
# Column profiling
# --------------------------------------------------------------------

# (column, renderer) — min/max are computed on the RAW column (typed
# comparison semantics), then rendered to one common string form so a
# single uniform report schema covers heterogeneous column types.
# Doubles render via DECIMAL(18,2) (both engines print "1013.70");
# timestamps via an explicit format (both print "1995-03-22 00:00:00").
_PROFILE_RENDER = {
    "o_orderkey": lambda c: c.cast("string"),
    "o_custkey": lambda c: c.cast("string"),
    "o_orderstatus": lambda c: c,
    "o_totalprice": lambda c: F.round(c, 2).cast("decimal(18,2)").cast("string"),
    "o_orderdate": lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss"),
    "o_orderpriority": lambda c: c,
}

_SQL_PROFILE_RENDER = {
    "o_orderkey": "CAST({v} AS VARCHAR)",
    "o_custkey": "CAST({v} AS VARCHAR)",
    "o_orderstatus": "{v}",
    "o_totalprice": "CAST(CAST(ROUND({v}, 2) AS DECIMAL(18,2)) AS VARCHAR)",
    "o_orderdate": "strftime({v}, '%Y-%m-%d %H:%M:%S')",
    "o_orderpriority": "{v}",
}


# Deterministic corruption layered over the clean fixture so every
# rule counts >0 violations at every scale factor (non-vacuous
# verification). Residue moduli are primes so the corrupted subsets
# barely overlap.
_SQL_CORRUPT_BASE = """
  SELECT o_orderkey, o_custkey, o_orderpriority,
         CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 101 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 103 = 0 THEN NULL ELSE o_orderdate END AS o_orderdate
  FROM orders
"""

_SQL_CORRUPT_ORDERS = f"""
  SELECT * FROM ({_SQL_CORRUPT_BASE})
  UNION ALL
  SELECT * FROM ({_SQL_CORRUPT_BASE}) WHERE o_orderkey % 499 = 0
"""

_SQL_CORRUPT_LINEITEM = """
  SELECT CASE WHEN l_orderkey % 997 = 0 THEN l_orderkey + 50000000
              ELSE l_orderkey END AS l_orderkey
  FROM lineitem
"""


def _corrupt_base(o: DataFrame) -> DataFrame:
    """Single-branch corrupted projection (one scan — what the
    profiler reads); the audit's duplicate-key corruption layers the
    union on top via _corrupt_orders."""
    k = F.col("o_orderkey")
    return o.select(
        k,
        F.col("o_custkey"),
        F.col("o_orderpriority"),
        F.when(k % 97 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
        F.when(k % 101 == 0, -F.col("o_totalprice")).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        F.when(k % 103 == 0, F.lit(None).cast("timestamp_ntz")).otherwise(F.col("o_orderdate")).alias("o_orderdate"),
    )


def _corrupt_orders(o: DataFrame) -> DataFrame:
    corrupted = _corrupt_base(o)
    return corrupted.unionAll(corrupted.filter(F.col("o_orderkey") % 499 == 0))


def _profile_oracle() -> str:
    parts = []
    for c, render in _SQL_PROFILE_RENDER.items():
        parts.append(
            f"""SELECT '{c}' AS col_name,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               {render.format(v=f"MIN({c})")} AS min_value,
               {render.format(v=f"MAX({c})")} AS max_value
        FROM ({_SQL_CORRUPT_BASE}) co"""
        )
    return "\nUNION ALL\n".join(parts)


@query("q_profile_columns", oracle=_profile_oracle())
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile — null count, distinct count, min/max — in
    ONE aggregate pass over the table, then a row-local unpivot of the
    single result row into the per-column report. Profiles the
    module's deterministically CORRUPTED orders view (the same one the
    constraint audit checks, minus its duplicate-row union so the
    profile stays a SINGLE scan — asserted in test_plans): the clean
    fixture has zero NULLs anywhere, so profiling it left the
    null-counting path untested (round-4 audit — n_nulls was constant
    0); the corrupted view's nulled order dates make the null column
    vary across the report.

    Scale shape: the only data pass is the aggregate; partials combine
    map-side. The multiple COUNT(DISTINCT) rewrite to Spark's Expand
    operator multiplies partial-agg rows by the column count — the
    standard exact formulation; a 100 TB profile swaps in
    approx_count_distinct per column (one pass, no Expand) and keeps
    everything else identical."""
    # The exact multi-count_distinct rewrite multiplies partial-agg
    # rows by the column count (Expand), and on the single-row-group
    # fixture that whole expansion ran on ONE scan task (round 10;
    # measured 3.2 s -> 2.1 s with the guard; production layouts make
    # it a no-op). Applied HERE and not in q_approx_count_distinct:
    # the HLL/exact-distinct pass over dimension-bounded keys
    # collapses map-side and measured 2.5x WORSE behind a repartition.
    from simplemapreduce_spark.sources.tables import ensure_parallelism

    o = _corrupt_base(ensure_parallelism(load_table(spark, sf_dir, "orders")))
    aggs: list[Column] = []
    for c in _PROFILE_RENDER:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    prof = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                render(F.col(f"{c}__min")).alias("min_value"),
                render(F.col(f"{c}__max")).alias("max_value"),
            )
            for c, render in _PROFILE_RENDER.items()
        ]
    )
    return prof.select(F.explode(rows).alias("p")).select("p.*")


# --------------------------------------------------------------------
# Constraint audit
# --------------------------------------------------------------------



@query(
    "q_constraint_audit",
    oracle=f"""
    WITH co AS ({_SQL_CORRUPT_ORDERS}),
    cl AS ({_SQL_CORRUPT_LINEITEM})
    SELECT 'status_domain' AS rule, COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) AS violations FROM co
    UNION ALL
    SELECT 'price_positive', COUNT(*) FILTER (WHERE o_totalprice <= 0) FROM co
    UNION ALL
    SELECT 'orderdate_not_null', COUNT(*) FILTER (WHERE o_orderdate IS NULL) FROM co
    UNION ALL
    SELECT 'pk_unique', COUNT(*) FROM (
      SELECT o_orderkey FROM co GROUP BY o_orderkey HAVING COUNT(*) > 1
    )
    UNION ALL
    SELECT 'fk_lineitem_order_exists', COUNT(*) FROM cl
    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM co)
    """,
)
def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit: violation counts per rule over a
    deterministically corrupted view of orders/lineitem (see module
    docstring — clean data would verify the rules vacuously).

    Scale shape: the three row-local rules (domain, range, NOT NULL)
    come out of ONE conditional-aggregate pass; PK uniqueness is one
    groupBy on the key (map-side partial counts); referential
    integrity is one anti-join, which AQE broadcasts when the parent
    side's distinct-key projection is small and shuffles otherwise.
    No rule is more than one shuffle."""
    co = _corrupt_orders(load_table(spark, sf_dir, "orders"))
    k = F.col("l_orderkey")
    cl = load_table(spark, sf_dir, "lineitem").select(
        F.when(k % 997 == 0, k + 50000000).otherwise(k).alias("l_orderkey")
    )

    row_local = co.agg(
        F.count_if(~F.col("o_orderstatus").isin("O", "F", "P")).alias("status_domain"),
        F.count_if(F.col("o_totalprice") <= 0).alias("price_positive"),
        F.count_if(F.col("o_orderdate").isNull()).alias("orderdate_not_null"),
    )
    row_local_rules = row_local.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("rule"), F.col(r).alias("violations"))
                    for r in ("status_domain", "price_positive", "orderdate_not_null")
                ]
            )
        ).alias("p")
    ).select("p.*")

    pk = (
        co.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("violations"))
        .select(F.lit("pk_unique").alias("rule"), "violations")
    )
    fk = (
        cl.join(co.select("o_orderkey"), cl.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").alias("violations"))
        .select(F.lit("fk_lineitem_order_exists").alias("rule"), "violations")
    )
    return row_local_rules.unionAll(pk).unionAll(fk)


# --------------------------------------------------------------------
# Snapshot diff (CDC between two table versions)
# --------------------------------------------------------------------

_SQL_SNAP_V1 = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 10 <> 0"
_SQL_SNAP_V2 = """
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 7 <> 0
"""


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The two deterministic ``orders`` versions the CDC operators run
    against (Python twin of _SQL_SNAP_V1/_SQL_SNAP_V2)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v1 = o.filter(k % 10 != 0).select(k, "o_orderstatus", "o_totalprice")
    v2 = o.filter(k % 7 != 0).select(
        k,
        "o_orderstatus",
        F.when(k % 5 == 0, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return v1, v2


@query(
    "q_snapshot_diff",
    oracle=f"""
    WITH v1 AS ({_SQL_SNAP_V1}), v2 AS ({_SQL_SNAP_V2})
    SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                WHEN v2.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change,
           v1.o_totalprice AS old_totalprice,
           v2.o_totalprice AS new_totalprice
    FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.o_totalprice <> v2.o_totalprice
       OR v1.o_orderstatus <> v2.o_orderstatus
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: classify every key as insert / update / delete
    between two versions of ``orders`` (two deterministic views — v2
    drops some keys, adds others, and doubles some prices, so all
    three change classes are populated; unchanged rows are filtered
    out). The doubling is exact in binary floating point, so the
    double-equality comparison is engine-portable.

    Scale shape: one full-outer equi-join on the key — the canonical
    CDC merge-diff. Both sides hash-partition on o_orderkey (AQE
    handles size asymmetry); on a bucketed/Z-ordered lakehouse table
    the same plan runs shuffle-free."""
    cf = _changefeed(*_snapshots(spark, sf_dir))
    return cf.select("o_orderkey", "change", "old_totalprice", "new_totalprice")


def _changefeed(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """The v1→v2 change rows — one full-outer equi-join on the key,
    changed/inserted/deleted rows only, carrying both payloads. Single
    definition consumed by BOTH q_snapshot_diff and q_cdc_apply so the
    diff and apply semantics cannot diverge (the round-trip identity
    the apply oracle asserts)."""
    a, b = v1.alias("a"), v2.alias("b")
    ak, bk = F.col("a.o_orderkey"), F.col("b.o_orderkey")
    return (
        a.join(b, ak == bk, "full_outer")
        .filter(
            ak.isNull()
            | bk.isNull()
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
        )
        .select(
            F.coalesce(ak, bk).alias("o_orderkey"),
            F.when(ak.isNull(), F.lit("insert"))
            .when(bk.isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change"),
            F.col("a.o_totalprice").alias("old_totalprice"),
            F.col("b.o_orderstatus").alias("new_status"),
            F.col("b.o_totalprice").alias("new_totalprice"),
        )
    )


# --------------------------------------------------------------------
# Compaction planning
# --------------------------------------------------------------------

TARGET_ROWS_PER_FILE = 8000


@query(
    "q_compaction_plan",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           (COUNT(*) + {TARGET_ROWS_PER_FILE - 1}) // {TARGET_ROWS_PER_FILE} AS n_files,
           (COUNT(*) + (COUNT(*) + {TARGET_ROWS_PER_FILE - 1}) // {TARGET_ROWS_PER_FILE} - 1)
             // ((COUNT(*) + {TARGET_ROWS_PER_FILE - 1}) // {TARGET_ROWS_PER_FILE})
             AS rows_per_file
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: per output partition
    (l_returnflag, l_linestatus), the file count and balanced
    rows-per-file needed to hit TARGET_ROWS_PER_FILE — the planning
    half of lakehouse OPTIMIZE/compaction. The write half is
    ``df.repartitionByRange`` + ``spark.sql.files.maxRecordsPerFile``
    (exercised in tests/test_quality_ops.py against this plan).

    Scale shape: one aggregate over the partition columns; the plan
    table is partition-cardinality sized, negligible at any scale.
    At 100 TB the same plan would feed per-partition byte targets
    (AVG(octet_length) × rows) instead of row targets."""
    t = TARGET_ROWS_PER_FILE
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("n_rows"))
    n_files = F.expr(f"(n_rows + {t - 1}) div {t}")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        n_files.alias("n_files"),
        F.expr(
            f"(n_rows + (n_rows + {t - 1}) div {t} - 1) div ((n_rows + {t - 1}) div {t})"
        ).alias("rows_per_file"),
    )


@query(
    "q_cdc_apply",
    # The oracle is simply v2: applying the v1→v2 changefeed onto v1
    # must reproduce v2 EXACTLY (diff→apply round-trip identity), so
    # any bug in either the diff or the apply semantics surfaces as a
    # value mismatch against the independently-defined target state.
    oracle=_SQL_SNAP_V2,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY with delete semantics — the write-side pairing of
    q_snapshot_diff: build the changefeed (insert/update/delete rows,
    each carrying the full new payload) and apply it to the base
    snapshot: deletes drop the base row, updates replace its payload,
    inserts append. This is the core of every MERGE-based lakehouse
    ingestion (Delta/Iceberg MERGE WHEN MATCHED DELETE/UPDATE WHEN NOT
    MATCHED INSERT) expressed as pure DataFrame ops.

    Scale shape: the changefeed build is one full-outer equi-join on
    the key; the apply is one left join of the base against the
    (typically much smaller) changefeed — AQE broadcasts it when small
    — plus a union of the inserts. Both joins hash-partition on the
    same key, so on bucketed storage the whole pipeline is a single
    partition-local pass."""
    v1, v2 = _snapshots(spark, sf_dir)
    changes = _changefeed(v1, v2).select(
        F.col("o_orderkey").alias("c_key"),
        F.col("change").alias("op"),
        "new_status",
        "new_totalprice",
    )
    base = v1.alias("base")
    applied = (
        base.join(changes, F.col("base.o_orderkey") == F.col("c_key"), "left")
        .filter(F.col("op").isNull() | (F.col("op") == "update"))
        .select(
            F.col("base.o_orderkey").alias("o_orderkey"),
            F.coalesce("new_status", "base.o_orderstatus").alias("o_orderstatus"),
            F.coalesce("new_totalprice", "base.o_totalprice").alias("o_totalprice"),
        )
    )
    inserts = changes.filter(F.col("op") == "insert").select(
        F.col("c_key").alias("o_orderkey"),
        F.col("new_status").alias("o_orderstatus"),
        F.col("new_totalprice").alias("o_totalprice"),
    )
    return applied.unionByName(inserts)


@query(
    "q_benford_digit_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS tot FROM c)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND(CAST(n AS DOUBLE) / t.tot, 6) AS DOUBLE) AS observed_p,
           CAST(ROUND(log10(1 + 1.0 / digit), 6) AS DOUBLE) AS benford_p,
           CAST(ROUND(
             power(CAST(n AS DOUBLE) / t.tot - log10(1 + 1.0 / digit), 2)
             / log10(1 + 1.0 / digit) * t.tot, 6) AS DOUBLE) AS chi2_term
    FROM c, t
    """,
)
def q_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: the leading-digit
    distribution versus the log10(1 + 1/d) expectation, with the
    per-digit chi-square contribution — the classic anomaly/fraud
    screen for financial columns (fabricated or capped values bend
    the first-digit curve).

    Scale shape: leading digit is a row-local string projection
    (exact — no float log tricks on the hot path), counts are one
    9-bucket hash aggregate, and the expectation/chi-square math runs
    on the 9-row result against a broadcast total. Both engines
    compute log10 on the same nine rational inputs and round at 6
    decimals, inside double precision's cross-library agreement."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("long")
    c = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    t = c.agg(F.sum("n").alias("tot"))
    obs = F.col("n").cast("double") / F.col("tot")
    exp_p = F.log10(1 + 1.0 / F.col("digit"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.round(obs, 6).alias("observed_p"),
        F.round(exp_p, 6).alias("benford_p"),
        F.round(F.pow(obs - exp_p, F.lit(2)) / exp_p * F.col("tot"), 6).alias("chi2_term"),
    )


# --------------------------------------------------------------------
# Text-encoding audit (mojibake / control-character screening)
# --------------------------------------------------------------------

@query(
    "q_text_encoding_audit",
    oracle="""
    WITH corrupted AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 7 = 0 THEN text || chr(65533) || chr(65533)
                  WHEN doc_id % 7 = 1 THEN chr(1) || chr(2) || text
                  ELSE text END AS t
      FROM documents),
    m AS (
      SELECT source,
             LENGTH(t) - LENGTH(REPLACE(t, chr(65533), '')) AS n_repl,
             LENGTH(t) - LENGTH(REPLACE(REPLACE(t, chr(1), ''), chr(2), '')) AS n_ctrl
      FROM corrupted)
    SELECT source,
           COUNT(*) AS docs,
           CAST(SUM(CASE WHEN n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_mojibake,
           CAST(SUM(CASE WHEN n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_control,
           CAST(SUM(n_repl) AS BIGINT) AS total_replacement_chars,
           CAST(SUM(CASE WHEN n_repl = 0 AND n_ctrl = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_clean
    FROM m
    GROUP BY source
    ORDER BY source
    """,
)
def q_text_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-sanity screen for a text corpus: per source, how many
    documents carry U+FFFD replacement characters (mojibake — evidence
    of a bad decode upstream) or C0 control characters (binary
    contamination). Standard pre-training hygiene gate: such documents
    are dropped or re-decoded before tokenization.

    The fixture corpus is clean ASCII, so — following this module's
    anti-vacuity convention — the query layers deterministic corruption
    keyed on doc_id residues (every class populated) and then detects
    it. Counting is the replace-and-diff idiom (LENGTH(t) -
    LENGTH(REPLACE(t, ch, ''))): built-in string functions only,
    map-side, one hash agg on source — no shuffle beyond the final
    small-key agg at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    t = (
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit("��")))
        .when(F.col("doc_id") % 7 == 1, F.concat(F.lit("\x01\x02"), F.col("text")))
        .otherwise(F.col("text"))
    )
    n_repl = F.length("t") - F.length(F.replace(F.col("t"), F.lit("�"), F.lit("")))
    n_ctrl = F.length("t") - F.length(
        F.replace(F.replace(F.col("t"), F.lit("\x01"), F.lit("")), F.lit("\x02"), F.lit(""))
    )
    return (
        d.select("source", t.alias("t"))
        .select(
            "source",
            n_repl.alias("n_repl"),
            n_ctrl.alias("n_ctrl"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.when(F.col("n_repl") > 0, 1).otherwise(0)).alias("docs_mojibake"),
            F.sum(F.when(F.col("n_ctrl") > 0, 1).otherwise(0)).alias("docs_control"),
            F.sum("n_repl").alias("total_replacement_chars"),
            F.sum(
                F.when((F.col("n_repl") == 0) & (F.col("n_ctrl") == 0), 1).otherwise(0)
            ).alias("docs_clean"),
        )
        .orderBy("source")
    )


_STALE_SECONDS = 120


@query(
    "q_freshness_audit",
    oracle=f"""
    WITH g AS (SELECT MAX(ts) AS gmax FROM events),
    per AS (
      SELECT event_type,
             MAX(ts) AS last_seen,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type
    )
    SELECT p.event_type,
           p.last_seen,
           p.n_events,
           CAST((epoch_us(g.gmax) - epoch_us(p.last_seen)) // 1000000 AS BIGINT)
             AS lag_seconds,
           CAST((epoch_us(g.gmax) - epoch_us(p.last_seen)) // 1000000
                > {_STALE_SECONDS} AS INTEGER) AS is_stale
    FROM per p, g
    """,
)
def q_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-FRESHNESS audit (the staleness monitor every ingestion SLA
    dashboard runs): per event stream, the last-seen event time, its
    lag behind the newest event anywhere in the table, and a stale
    flag at a {H}-second SLA — the signal that one upstream
    producer silently stopped while the table as a whole keeps
    growing. Lag in whole seconds by integer epoch-microsecond floor
    division (the q_udtf_table_partition_by discipline — float
    epoch() truncation diverges on microsecond-carrying fixtures),
    with epoch extraction via functions.time.epoch_micros so the
    result is independent of spark.sql.session.timeZone (a plain
    unix_micros(cast) routes NTZ→LTZ through the session zone and
    would skew lag across a DST transition vs DuckDB epoch_us).

    Scale shape: one partial+final MAX/COUNT aggregate at the stream
    grain plus a 1-row broadcast global max — two scans of the ts
    column or one with a grouping-sets rewrite; no shuffle beyond the
    |streams|-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.max("ts").alias("gmax"))
    per = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_seen"), F.count("*").alias("n_events")
    )
    from simplemapreduce_spark.functions.time import epoch_micros

    lag = (
        F.floor((epoch_micros("gmax") - epoch_micros("last_seen")) / 1000000)
    ).cast("long")
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "last_seen",
        F.col("n_events").cast("long").alias("n_events"),
        lag.alias("lag_seconds"),
        (lag > _STALE_SECONDS).cast("int").alias("is_stale"),
    )


q_freshness_audit.__doc__ = q_freshness_audit.__doc__.replace(
    "{H}", str(_STALE_SECONDS)
)
# The 120 s SLA is chosen to SPLIT at every fixture SF (stale and
# fresh streams both present: 4/1 at sf0.001 and sf0.01, 1/4 at
# sf0.1) — a threshold no fixture ever crosses would verify the flag
# vacuously (the 6h first draft fired only at sf0.001).

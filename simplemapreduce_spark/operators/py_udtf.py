"""Python UDTF surface (Spark 4 user-defined table functions).

The reference's ``mapF`` is exactly a UDTF: one input record → n
output pairs (/root/reference/src/common/common_map.go:64,71). The
engine's primary mapF equivalent is the Arrow ``mapInPandas`` compat
operator (operators/map_reduce.py); this module exposes the same
1→n contract through Spark 4's first-class ``@udtf`` API, which SQL
users reach via LATERAL — the idiomatic replacement for writing a
custom flatMap.

The demo operator is imperative run-length encoding over a document's
token stream (maximal spans of a consecutively repeated token) — a
real curation signal (stutter/boilerplate repetition) whose loop is
natural in Python yet still SQL-expressible (gaps-and-islands), so the
whole UDTF path stays DuckDB-oracle-checkable.

Scale notes: the UDTF runs once per document row, inside the scan
stage (no shuffle added); ``useArrow=True`` batches rows through
Arrow instead of pickling one row at a time. State never spans rows,
so the operator parallelizes embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from simplemapreduce_spark.catalog import query


@udtf(returnType="pos bigint, token string, run_len bigint", useArrow=True)
class TokenRuns:
    """Maximal runs of a consecutively repeated token; emits runs of
    length >= 2 (1-runs are every other token — noise, not signal)."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        import re

        if text is None:
            return
        # Split on the same ASCII \s+ class the DuckDB oracle's RE2 (and
        # Java regex) use. Both str.split() and Python's default \s are
        # Unicode-aware (U+00A0, U+2003, ...) and would silently diverge
        # on non-ASCII fixtures — re.ASCII pins the class.
        toks = [t for t in re.split(r"\s+", text, flags=re.ASCII) if t]
        i, n = 0, len(toks)
        while i < n:
            j = i
            while j < n and toks[j] == toks[i]:
                j += 1
            if j - i >= 2:
                yield i + 1, toks[i], j - i
            i = j


@query(
    "q_udtf_token_runs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.token, t.pos
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ts
        FROM documents
      ), LATERAL (SELECT unnest(ts) AS token, generate_subscripts(ts, 1) AS pos) t
    ), isl AS (
      SELECT doc_id, token, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id, token ORDER BY pos) AS grp
      FROM toks
    )
    SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS pos, token,
           CAST(COUNT(*) AS BIGINT) AS run_len
    FROM isl GROUP BY doc_id, token, grp
    HAVING COUNT(*) >= 2
    """,
)
def q_udtf_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-token spans per document via a registered Python UDTF
    reached through SQL LATERAL — the reference's mapF (1 record → n
    pairs) as a Spark 4 table function. The oracle recomputes the runs
    relationally (gaps-and-islands), proving the imperative Python and
    the declarative SQL agree."""
    from simplemapreduce_spark.session import ensure_package_shipped
    from simplemapreduce_spark.sources.tables import load_table, table_path

    ensure_package_shipped(spark)
    spark.udtf.register("token_runs", TokenRuns)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("smr_docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token, t.run_len "
        "FROM smr_docs_udtf d, LATERAL token_runs(d.text) t"
    )


class ExtractProps:
    """Polymorphic UDTF: output schema is DERIVED AT PLAN TIME by
    ``analyze`` from the constant key-list argument — one BIGINT
    column per requested JSON key. The Spark-4 'dynamic schema'
    contract (a static returnType cannot express it); SQL users write
    LATERAL extract_props(props, 'k,missing') and get columns k,
    missing."""

    @staticmethod
    def analyze(props, keys):
        from pyspark.sql.types import LongType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if keys.value is None:
            raise ValueError("extract_props: key list must be a constant string")
        names = [k.strip() for k in str(keys.value).split(",") if k.strip()]
        return AnalyzeResult(StructType([StructField(n, LongType()) for n in names]))

    def eval(self, props, keys):  # noqa: D102 — UDTF contract
        import json

        names = [k.strip() for k in str(keys).split(",") if k.strip()]
        try:
            d = json.loads(props) if props else {}
        except ValueError:
            d = {}
        yield tuple(int(d[n]) if d.get(n) is not None else None for n in names)


@query(
    "q_udtf_polymorphic",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(NULL AS BIGINT) AS missing
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 95
    """,
)
def q_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-polymorphic UDTF (Spark 4 ``analyze``): the requested
    key list 'k,missing' becomes the output schema at plan time — the
    'k' column carries extracted values, 'missing' (absent from every
    props payload) materializes as a typed NULL column, proving the
    schema really came from analyze() and not from the data.

    Scale shape: the UDTF runs inside the scan stage row-locally (no
    shuffle), and the selective k >= 95 predicate — applied to the
    UDTF's OUTPUT — bounds what survives; per-row JSON decoding in
    Python is the price of the polymorphic contract (the static-schema
    fast path is get_json_object, q_scalar_json)."""
    from simplemapreduce_spark.session import ensure_package_shipped
    from simplemapreduce_spark.sources.tables import load_table

    ensure_package_shipped(spark)
    from pyspark.sql.functions import udtf as _udtf_fn

    spark.udtf.register("extract_props", _udtf_fn(ExtractProps))
    load_table(spark, sf_dir, "events").createOrReplaceTempView("smr_events_udtf")
    return spark.sql(
        "SELECT e.event_id, t.k, t.missing "
        "FROM smr_events_udtf e, LATERAL extract_props(e.props, 'k,missing') t "
        "WHERE t.k >= 95"
    )


class UserGapStats:
    """Per-partition imperative aggregation via a UDTF TABLE argument:
    consumes one user's events in ORDER BY order, tracks the maximum
    inter-arrival gap, and emits ONE summary row from terminate() —
    the 'custom aggregate as a table function' pattern (Spark 4
    ``f(TABLE(t) PARTITION BY k ORDER BY o)``), which is the closest
    SQL-surface analogue of the reference's holistic reduceF contract
    (common_reduce.go:78-87: all values of one key, in one user
    function). A fresh UDTF instance serves each partition, so
    instance state IS the per-key state."""

    def __init__(self):
        self._user = None
        self._prev = None
        self._n = 0
        self._max_gap = 0

    def eval(self, row):  # noqa: D102 — UDTF contract
        self._user = row["user_id"]
        ts_us = row["ts_us"]
        if self._prev is not None:
            # whole seconds by integer floor — timestamps carry
            # microseconds, and float total_seconds() truncation
            # diverged from the oracle's epoch math by 1s on some rows
            gap = (ts_us - self._prev) // 1_000_000
            if gap > self._max_gap:
                self._max_gap = gap
        self._prev = ts_us
        self._n += 1

    def terminate(self):  # noqa: D102 — UDTF contract
        if self._user is not None:
            yield self._user, self._n, self._max_gap


@query(
    "q_udtf_table_partition_by",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             (epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id))
               // 1000000 AS gap_s
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COALESCE(MAX(gap_s), 0) AS BIGINT) AS max_gap_s
    FROM gaps GROUP BY user_id
    """,
)
def q_udtf_table_partition_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF invoked with a partitioned-ordered TABLE argument — the
    Spark 4 surface ``gap_stats(TABLE(events) PARTITION BY user_id
    ORDER BY ts)``: the engine shuffles by the partition key, sorts
    within, and streams each user's rows through a fresh UDTF
    instance; terminate() emits the per-user summary (event count +
    max inter-arrival gap in seconds). Complements q_udtf_token_runs
    (per-row lateral 1->n) and q_udtf_polymorphic (analyze-time
    schema) with the per-PARTITION holistic contract.

    Determinism: the max gap over a user's timestamp multiset does not
    depend on the tie order of equal timestamps, so the ORDER BY
    (ts_us, event_id) total order makes results layout-independent.
    Timestamps enter the UDTF as INTEGER unix microseconds
    (unix_micros over the NTZ column cast in the UTC session — and
    gaps are differences, so any fixed session offset cancels); whole
    seconds come from integer floor division on both engines, because
    float total_seconds() truncation diverged from the oracle's epoch
    rounding by 1s on microsecond-carrying fixtures.

    Scale shape: exactly one hash shuffle on user_id + per-partition
    sort — identical movement to the window-function oracle; state per
    key is O(1) (prev timestamp, running max), never the row set."""
    from pyspark.sql.functions import udtf

    from simplemapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    gap_stats = udtf(
        UserGapStats, returnType="user_id bigint, n_events bigint, max_gap_s bigint"
    )
    spark.udtf.register("smr_gap_stats", gap_stats)
    from simplemapreduce_spark.sources.tables import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_tbl")
    return spark.sql(
        """
        SELECT user_id, n_events, max_gap_s
        FROM smr_gap_stats(TABLE(SELECT user_id,
                                        timestampdiff(MICROSECOND,
                                                      TIMESTAMP_NTZ '1970-01-01 00:00:00',
                                                      ts) AS ts_us,
                                        event_id FROM events_tbl)
                           PARTITION BY user_id ORDER BY (ts_us, event_id))
        """
    )

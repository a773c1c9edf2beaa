"""Statistical / analytical operators: per-group OLS regression,
behavioral entropy, Pareto frontier (skyline), fuzzy lexicon lookup.

Extension scope: the reference computes nothing numeric — its reduce
is an opaque string fold (/root/reference/src/mapreduce/
common_reduce.go:78-87). These are the feature-engineering aggregates
a training-data pipeline derives alongside the text signals in
plans/llm_text.py (SURVEY.md §2.2 extension categories).

All four are pure built-in-function plans (no Python UDFs); each
docstring carries its 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from simplemapreduce_spark.functions.time import date_trunc_ntz
from simplemapreduce_spark.catalog import query
from simplemapreduce_spark.sources.tables import ensure_parallelism, load_table


@query(
    "q_agg_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS DOUBLE) AS slope,
           CAST(ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS DOUBLE) AS intercept,
           CAST(ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS DOUBLE) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit (price ~ quantity) with the
    SQL-standard REGR_* aggregate family — slope, intercept, R².

    Scale shape: regr_* are algebraic aggregates (sums of x, y, xy, x²,
    y² merged associatively), so Catalyst runs them partial/final like
    SUM — one shuffle of constant-size state per group, no holistic
    pass. This is the distributed-friendly way to fit millions of
    per-segment trend lines in one scan. Rounded to 6 decimals because
    the partial-merge order differs between engines in the last ulps."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).cast("long").alias("n"),
    )


@query(
    "q_event_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
    ), w AS (
      SELECT user_id, n, SUM(n) OVER (PARTITION BY user_id) AS tot FROM c
    )
    SELECT user_id,
           CAST(MAX(tot) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(-(CAST(n AS DOUBLE) / tot)
                           * log2(CAST(n AS DOUBLE) / tot)), 6) AS DOUBLE) AS entropy
    FROM w GROUP BY user_id
    """,
)
def q_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    standard behavioral-diversity feature (0 = single-action bots,
    high = diverse engagement).

    Scale shape: one groupBy(user, type) shuffle over the raw events;
    the window total and the final per-user aggregate then shuffle the
    ALREADY-AGGREGATED table (at most |users| x |event types| rows —
    vocabulary-bounded, orders of magnitude smaller than the input).
    Entropy terms are a per-row projection."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    tot = F.sum("n").over(W.partitionBy("user_id"))
    w = c.withColumn("tot", tot)
    p = F.col("n").cast("double") / F.col("tot")
    return w.groupBy("user_id").agg(
        F.max("tot").cast("long").alias("n_events"),
        F.round(F.sum(-p * F.log2(p)), 6).alias("entropy"),
    )


@query(
    "q_pareto_frontier",
    oracle="""
    SELECT r.p_partkey, r.p_retailprice, r.p_size
    FROM part r
    WHERE NOT EXISTS (
      SELECT 1 FROM part s
      WHERE s.p_retailprice <= r.p_retailprice
        AND s.p_size >= r.p_size
        AND (s.p_retailprice < r.p_retailprice OR s.p_size > r.p_size)
    )
    """,
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline): parts not dominated on (cheaper
    price, larger size). A part is dominated if another is at-least-as
    good on both axes and strictly better on one; ties on both axes
    keep both rows.

    The oracle is the O(n²) NOT EXISTS dominance spec; the Spark plan
    is the O(n log n) sweep, so the comparison checks the rewrite, not
    a translation. Sweep: aggregate to max(size) per distinct price
    (one shuffle), order the distinct-price table ascending, and keep
    a price group iff its max size strictly exceeds the running max
    over all strictly-cheaper groups; within a kept group, rows at the
    group max survive. The single-partition window runs over the
    distinct-x AGGREGATE (vocabulary-sized, ≪ rows at 100 TB — price
    grids are finite); the full table is only touched by scan-shaped
    stages and the final broadcast join against the tiny frontier
    group table."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    g = p.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    prev = F.max("gmax").over(
        W.orderBy("p_retailprice").rowsBetween(W.unboundedPreceding, -1)
    )
    keep = g.withColumn("prev_max", prev).filter(
        F.col("prev_max").isNull() | (F.col("gmax") > F.col("prev_max"))
    )
    return (
        p.join(F.broadcast(keep), "p_retailprice")
        .filter(F.col("p_size") == F.col("gmax"))
        .select("p_partkey", "p_retailprice", "p_size")
    )


_LEXICON = ("redd", "blu", "grean", "widgett", "boltt", "rng", "smal")


@query(
    "q_join_fuzzy",
    oracle=f"""
    WITH toks AS (
      SELECT p_partkey, unnest(string_split(p_name, ' ')) AS token FROM part
    ), lex AS (
      SELECT * FROM (VALUES {", ".join(f"('{t}')" for t in _LEXICON)}) AS v(term)
    )
    SELECT term, token, COUNT(*) AS n_parts
    FROM toks CROSS JOIN lex
    WHERE levenshtein(token, term) <= 1
    GROUP BY term, token
    """,
)
def q_join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy lexicon lookup: match part-name tokens against a small
    list of misspelled terms within Levenshtein distance 1 — the
    typo-tolerant tag/blocklist join every curation pipeline needs.

    Scale shape: the lexicon side is broadcast, so the cross join is a
    broadcast-nested-loop over a constant-size inner table — per-row
    cost O(|lexicon|), no shuffle of the big side, and levenshtein is
    a JVM builtin. (For a LARGE fuzzy vocabulary the right plan is
    q_dedup_* style candidate blocking — deletion-neighborhood keys —
    not this nested loop; this operator covers the small-lexicon
    case.)"""
    toks = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", F.explode(F.split("p_name", " ")).alias("token"))
    )
    lex = spark.createDataFrame([(t,) for t in _LEXICON], ["term"])
    return (
        toks.crossJoin(F.broadcast(lex))
        .filter(F.levenshtein("token", "term") <= 1)
        .groupBy("term", "token")
        .agg(F.count("*").alias("n_parts"))
    )


@query(
    "q_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT l_orderkey AS key, COUNT(*) AS n FROM lineitem GROUP BY 1
    )
    SELECT COUNT(*) AS n_keys,
           CAST(MAX(n) AS BIGINT) AS max_n,
           CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50_n,
           CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99_n,
           CAST(ROUND(CAST(MAX(n) AS DOUBLE) / quantile_disc(n, 0.5), 6) AS DOUBLE)
             AS max_over_median
    FROM per_key
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnosis: per-key cardinalities reduced to
    the numbers that decide a partitioning strategy — max, median, p99
    and the max/median ratio (≈1 → uniform, >>1 → salt or AQE-split
    the hot keys). This is the observability step BEFORE reaching for
    q_join_salted_skew / q_agg_distinct_salted; at 100 TB you run it
    on a sample or as a by-product of an existing aggregation.

    exact percentiles via approx_percentile at full accuracy (same
    exactness argument as q_approx_quantiles); two-level aggregate:
    the per-key groupBy shuffles partial counts, the final reduction
    is a single-row summary."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    p50 = F.expr("approx_percentile(n, 0.5, 1000000)")
    p99 = F.expr("approx_percentile(n, 0.99, 1000000)")
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.max("n").cast("long").alias("max_n"),
        p50.cast("long").alias("p50_n"),
        p99.cast("long").alias("p99_n"),
        F.round(F.max("n").cast("double") / p50, 6).alias("max_over_median"),
    )


@query(
    "q_events_anomaly",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(ROUND((e.value - s.mu) / s.sigma, 4) AS DOUBLE) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE ABS((e.value - s.mu) / s.sigma) > 3
    """,
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event type: two-pass
    mean/stddev + broadcast of the tiny per-type stats back onto the
    stream — the standard anomaly pre-filter. The z arithmetic is the
    same expression tree on both engines (rounded at the boundary);
    the stats side is vocabulary-sized so the join broadcasts and the
    detector is a single scan at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select("event_id", "event_type", F.round(z, 4).alias("zscore"))
    )


@query(
    "q_events_anomaly_seasonal",
    oracle="""
    WITH seasonal AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hod,
             AVG(value) AS mu, stddev_samp(value) AS sigma, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT e.event_id, e.event_type,
           CAST(EXTRACT(hour FROM e.ts) AS INT) AS hod,
           CAST(ROUND((e.value - s.mu) / s.sigma, 4) AS DOUBLE) AS seasonal_z
    FROM events e
    JOIN seasonal s ON s.event_type = e.event_type
                   AND s.hod = EXTRACT(hour FROM e.ts)
    WHERE s.n >= 10 AND s.sigma > 0
      AND ABS((e.value - s.mu) / s.sigma) > 3
    """,
)
def q_events_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL anomaly detection: z-scores against the
    (series, hour-of-day) baseline instead of the global one
    (q_events_anomaly) — the de-seasonalized detector that catches a
    spike at 3am which would look normal against the all-day mean,
    and stays quiet during a routinely-busy hour. Baselines with
    fewer than 10 observations are excluded (no stable estimate),
    identically on both engines.

    Scale shape: the baseline table is (series × 24)-sized — one
    aggregate pass, then broadcast back onto the stream; the detector
    stays a single corpus scan at any size."""
    e = load_table(spark, sf_dir, "events")
    hod = F.hour("ts")
    seasonal = e.groupBy("event_type", hod.alias("hod")).agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count("*").alias("n"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.select("event_id", "event_type", hod.alias("hod"), "value")
        .join(F.broadcast(seasonal), ["event_type", "hod"])
        .filter((F.col("n") >= 10) & (F.col("sigma") > 0) & (F.abs(z) > 3))
        .select("event_id", "event_type", "hod", F.round(z, 4).alias("seasonal_z"))
    )


@query(
    "q_drift_psi",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
             date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                       MAX(CAST(o_orderdate AS DATE))) AS span
      FROM orders
    ),
    tagged AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT), 9) AS bin,
             CASE WHEN date_diff('day', (SELECT lo FROM bounds),
                                 CAST(o_orderdate AS DATE)) * 2
                       <= (SELECT span FROM bounds)
                  THEN 'a' ELSE 'b' END AS half
      FROM orders
    ),
    c AS (
      SELECT bin,
             COUNT(*) FILTER (half = 'a') AS n_a,
             COUNT(*) FILTER (half = 'b') AS n_b
      FROM tagged GROUP BY bin
    ),
    tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM c)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(ROUND(
             ((CAST(n_b AS DOUBLE) + 1) / (tb + 10)
              - (CAST(n_a AS DOUBLE) + 1) / (ta + 10))
             * ln(((CAST(n_b AS DOUBLE) + 1) / (tb + 10))
                  / ((CAST(n_a AS DOUBLE) + 1) / (ta + 10))), 6) AS DOUBLE) AS psi_term
    FROM c CROSS JOIN tot
    """,
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the order-date range, over fixed-width price bins — the standard
    train/serve drift monitor for a feature column (PSI > 0.2 = major
    shift). Laplace-smoothed shares (+1/+10) keep empty bins finite,
    identically on both engines.

    The date cutoff is derived from the data (midpoint of min/max), so
    the probe stays non-vacuous whatever date range a regenerated
    fixture ships. Scale shape: one scan computes the min/max bounds
    (tiny aggregate, broadcast back); a second scan bins and tags each
    row (row-local), then one partial/final groupBy on the 10-bin key;
    the totals join is a broadcast of one row. Integer bin counts make
    the double PSI arithmetic identical on both engines; rounded at
    the boundary."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.datediff(
            F.max(F.col("o_orderdate").cast("date")),
            F.min(F.col("o_orderdate").cast("date")),
        ).alias("span"),
    )
    tagged = (
        o.crossJoin(F.broadcast(bounds))
        .select(
            F.least(F.floor(F.col("o_totalprice") / 50000).cast("bigint"), F.lit(9))
            .alias("bin"),
            F.when(
                F.datediff(F.col("o_orderdate").cast("date"), F.col("lo")) * 2
                <= F.col("span"),
                F.lit("a"),
            )
            .otherwise(F.lit("b"))
            .alias("half"),
        )
    )
    c = tagged.groupBy("bin").agg(
        F.count(F.when(F.col("half") == "a", 1)).alias("n_a"),
        F.count(F.when(F.col("half") == "b", 1)).alias("n_b"),
    )
    tot = c.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    pa = (F.col("n_a").cast("double") + 1) / (F.col("ta") + 10)
    pb = (F.col("n_b").cast("double") + 1) / (F.col("tb") + 10)
    return c.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round((pb - pa) * F.log(pb / pa), 6).alias("psi_term"),
    )


@query(
    "q_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS m FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, median(ABS(e.value - med.m)) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(ROUND((e.value - med.m) / (1.4826 * mad.mad), 4) AS DOUBLE)
             AS robust_z
    FROM events e
    JOIN med USING (event_type) JOIN mad USING (event_type)
    WHERE ABS((e.value - med.m) / (1.4826 * mad.mad)) > 3.5
    """,
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    breakdown-resistant twin of q_events_anomaly's z-score (a few
    extreme values inflate mean/stddev and mask outliers; median/MAD
    are immune up to 50% contamination). 1.4826 rescales MAD to sigma
    under normality; |robust z| > 3.5 is the Iglewicz-Hoaglin cut.

    Scale shape: two holistic median aggregates over dimension-keyed
    groups (per-type state, same contract as q_agg_percentile_cont —
    approx_percentile is the documented fallback when a group outgrows
    an executor), each result a vocabulary-sized table broadcast back
    onto the stream; the detector itself is one scan. Both engines
    interpolate medians over identical doubles; rounded at the
    boundary."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("m"))
    e_med = e.join(F.broadcast(med), "event_type")
    mad = e_med.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("m")), F.lit(0.5)).alias("mad")
    )
    z = (F.col("value") - F.col("m")) / (F.lit(1.4826) * F.col("mad"))
    return (
        e_med.join(F.broadcast(mad), "event_type")
        .filter(F.abs(z) > 3.5)
        .select("event_id", "event_type", F.round(z, 4).alias("robust_z"))
    )


@query(
    "q_histogram_equidepth",
    oracle="""
    WITH e AS (
      SELECT [quantile_disc(o_totalprice, 0.1), quantile_disc(o_totalprice, 0.2),
              quantile_disc(o_totalprice, 0.3), quantile_disc(o_totalprice, 0.4),
              quantile_disc(o_totalprice, 0.5), quantile_disc(o_totalprice, 0.6),
              quantile_disc(o_totalprice, 0.7), quantile_disc(o_totalprice, 0.8),
              quantile_disc(o_totalprice, 0.9)] AS edges
      FROM orders
    )
    SELECT CAST(len(list_filter(e.edges, x -> o.o_totalprice > x)) AS BIGINT)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o.o_totalprice) AS lo,
           MAX(o.o_totalprice) AS hi
    FROM orders o CROSS JOIN e
    GROUP BY 1
    """,
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram construction — the optimizer
    statistic every cost-based planner builds: decile edges over the
    price column, then per-bucket row count and actual bounds.

    Edges are DISCRETE percentiles (approx_percentile at exact-mode
    accuracy = stored data values, bit-identical to DuckDB's
    quantile_disc — the same exactness contract as q_approx_quantiles),
    so bucket assignment (count of edges strictly below the value) is
    a pure double comparison that can never flip between engines; no
    interpolation arithmetic enters the compare. Skewed duplicates
    land in one bucket (n > N/10) — the real histogram semantic, not a
    forced uniform split.

    Scale shape: one percentile aggregate produces the 9-edge array
    (at 100 TB you lower the accuracy knob and get the same plan with
    epsilon-rank edges); the edge row broadcasts; bucketing is a
    row-local array filter; counts/bounds run partial/final. No global
    sort, no single-partition window — the NTILE formulation would
    funnel the corpus through one task."""
    o = load_table(spark, sf_dir, "orders")
    qs = ", ".join(str(q / 10) for q in range(1, 10))
    edges = o.agg(
        F.expr(f"approx_percentile(o_totalprice, array({qs}), 1000000)").alias("edges")
    )
    return (
        o.crossJoin(F.broadcast(edges))
        .select(
            F.expr("CAST(size(filter(edges, x -> o_totalprice > x)) AS BIGINT)").alias(
                "bucket"
            ),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "q_chi_square_contingency",
    oracle="""
    WITH c AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hod, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, SUM(o) AS row_tot FROM c GROUP BY 1),
    ct AS (SELECT hod, SUM(o) AS col_tot FROM c GROUP BY 1),
    n AS (SELECT SUM(o) AS tot FROM c)
    SELECT c.event_type, CAST(c.hod AS BIGINT) AS hod,
           CAST(c.o AS BIGINT) AS o,
           CAST(ROUND(CAST(rt.row_tot * ct.col_tot AS DOUBLE) / n.tot, 6) AS DOUBLE) AS e,
           CAST(ROUND(
             POWER(c.o - CAST(rt.row_tot * ct.col_tot AS DOUBLE) / n.tot, 2)
             / (CAST(rt.row_tot * ct.col_tot AS DOUBLE) / n.tot), 6) AS DOUBLE) AS chi2_term
    FROM c JOIN rt USING (event_type) JOIN ct USING (hod) CROSS JOIN n
    """,
)
def q_chi_square_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between event type and hour of
    day: observed vs expected cell counts with per-cell chi-square
    contributions — the standard categorical-association screen (a
    flat contribution table = independent; spiky cells = the hours
    driving the dependence).

    Scale shape: ONE groupBy over the raw events builds the
    contingency table; marginals and the grand total are re-aggregates
    of that (|types| × 24)-row table, joined back broadcast-small. All
    inputs to the float math are exact integers, so expected counts
    and contributions are bit-identical across engines; rounded at the
    boundary."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("event_type", F.hour("ts").cast("long").alias("hod")).agg(
        F.count("*").alias("o")
    )
    rt = c.groupBy("event_type").agg(F.sum("o").alias("row_tot"))
    ct = c.groupBy("hod").agg(F.sum("o").alias("col_tot"))
    n = c.agg(F.sum("o").alias("tot"))
    exp = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("tot")
    return (
        c.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hod")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "hod",
            F.col("o").cast("long").alias("o"),
            F.round(exp, 6).alias("e"),
            F.round(F.pow(F.col("o") - exp, F.lit(2)) / exp, 6).alias("chi2_term"),
        )
    )


@query(
    "q_ab_test_ztest",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS variant,
             MAX(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT variant, COUNT(*) AS n, SUM(converted) AS conv
      FROM assigned GROUP BY variant
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 'A' THEN n END) AS n_a,
        MAX(CASE WHEN variant = 'A' THEN conv END) AS conv_a,
        MAX(CASE WHEN variant = 'B' THEN n END) AS n_b,
        MAX(CASE WHEN variant = 'B' THEN conv END) AS conv_b
      FROM arms
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
           CAST(ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS DOUBLE) AS rate_a,
           CAST(ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS DOUBLE) AS rate_b,
           CAST(CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
             ROUND(
               (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
               / sqrt(
                   (CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                   * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                   * (1.0 / n_a + 1.0 / n_b)
                 ), 6) END AS DOUBLE) AS z_score
    FROM wide
    """,
)
def q_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic 50/50 experiment
    split: users are assigned to variant A/B by md5(user_id) first
    hex digit (engine-portable, stable under reruns — the assignment
    convention shared with plans/sampling.py), conversion = user made
    a high-value purchase (value > 180 — a ~quarter-of-users event, so
    the pooled rate sits strictly inside (0, 1); "any purchase" is
    near-universal in this stream and would zero the pooled variance),
    and the pooled-variance z statistic compares the two rates.

    Scale shape: one hash aggregation to the user grain, one to the
    two-arm grain, then scalar math on a 1-row frame — the entire
    test is two partial+final aggregations over the events scan, no
    window, no driver-side stats. Counts stay exact integers; the
    division/sqrt happen once at the 1-row boundary, rounded there."""
    e = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
    ).otherwise("B")
    assigned = e.groupBy("user_id").agg(
        F.max(
            ((F.col("event_type") == "purchase") & (F.col("value") > 180)).cast("int")
        ).alias("converted")
    ).select(variant.alias("variant"), "converted")
    arms = assigned.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "A", F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == "B", F.col("conv"))).alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    # NULL (not an ANSI /0 error) when every user or no user converted:
    # the pooled variance is zero and the statistic is undefined.
    z = F.when(
        (F.col("conv_a") + F.col("conv_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b")),
        (rate_a - rate_b)
        / F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))),
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
    )


@query(
    "q_feature_scaling",
    oracle="""
    WITH s AS (
      SELECT source,
             COUNT(*) AS n,
             SUM(n_chars) AS sx,
             SUM(n_chars * n_chars) AS sxx,
             MIN(n_chars) AS mn,
             MAX(n_chars) AS mx
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source,
           CAST(d.n_chars AS BIGINT) AS n_chars,
           CAST(ROUND(
             (d.n_chars - CAST(s.sx AS DOUBLE) / s.n)
             / sqrt(CAST(s.sxx AS DOUBLE) / s.n
                    - (CAST(s.sx AS DOUBLE) / s.n) * (CAST(s.sx AS DOUBLE) / s.n)),
             6) AS DOUBLE) AS z_score,
           CAST(ROUND(CAST(d.n_chars - s.mn AS DOUBLE) / (s.mx - s.mn), 6) AS DOUBLE)
             AS minmax
    FROM documents d JOIN s USING (source)
    WHERE s.mx > s.mn
    """,
)
def q_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature standardization — the ML-preprocessing map:
    z-score and min-max scaling of document length WITHIN each source
    (per-domain normalization, so one verbose domain doesn't dominate
    a quality classifier's length feature).

    Determinism across engines: the group stats are EXACT integer sums
    (n, sum x, sum x^2, min, max); mean and population variance derive
    from them with one fixed double formula spelled identically in
    both plans — not the engines' own stddev implementations, whose
    different update orders can differ in the last ulp. One hash
    aggregate to the (small) source grain, broadcast back over the
    scan: a map-plus-tiny-join at any scale, no window, no second
    shuffle of the corpus. Degenerate groups (all lengths equal, so
    zero variance and a 0-width min-max range) are excluded on both
    engines rather than left to engine-specific IEEE /0 behavior."""
    d = load_table(spark, sf_dir, "documents")
    # sxx accumulates in decimal(38,0) (the jackknife idiom): the int64
    # square-sum wraps silently around ~1e7 max-length docs per group,
    # where the DuckDB oracle's HUGEINT keeps going — the engines would
    # diverge instead of failing together. sx/n stay bigint (linear in
    # group size, 9.2e18 of headroom).
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    s = d.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("sx"),
        F.sum(dec("n_chars") * dec("n_chars")).alias("sxx"),
        F.min("n_chars").alias("mn"),
        F.max("n_chars").alias("mx"),
    )
    mean = F.col("sx").cast("double") / F.col("n")
    var = F.col("sxx").cast("double") / F.col("n") - mean * mean
    return d.join(F.broadcast(s.filter(F.col("mx") > F.col("mn"))), "source").select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round((F.col("n_chars") - mean) / F.sqrt(var), 6).alias("z_score"),
        F.round(
            (F.col("n_chars") - F.col("mn")).cast("double") / (F.col("mx") - F.col("mn")), 6
        ).alias("minmax"),
    )


@query(
    "q_ks_two_sample",
    oracle="""
    WITH p AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS variant,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    per_value AS (
      SELECT cents,
             SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS b
      FROM p GROUP BY cents
    ),
    tot AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM per_value),
    cdf AS (
      SELECT SUM(a) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS ca,
             SUM(b) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cb
      FROM per_value
    )
    SELECT CAST(t.ta AS BIGINT) AS n_a,
           CAST(t.tb AS BIGINT) AS n_b,
           CAST(ROUND(MAX(ABS(CAST(ca AS DOUBLE) / t.ta
                             - CAST(cb AS DOUBLE) / t.tb)), 6) AS DOUBLE) AS d_stat,
           CAST(ROUND(1.358 * sqrt(CAST(t.ta + t.tb AS DOUBLE) / (t.ta * t.tb)), 6)
                AS DOUBLE) AS d_crit_05
    FROM cdf, tot t
    GROUP BY t.ta, t.tb
    """,
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: the max gap between the
    empirical CDFs of purchase amounts in experiment arms A and B
    (same deterministic md5 user split as q_ab_test_ztest) — the
    standard distribution-shift test that catches what a mean
    comparison misses, with the alpha=0.05 critical value
    1.358*sqrt((n_a+n_b)/(n_a*n_b)) alongside.

    Scale shape: amounts quantize to exact integer cents, so the CDFs
    are computed on the per-CENTS-VALUE aggregate — a table bounded by
    the price domain, not the corpus. The running sums are a global
    ordered window, but over that value-domain aggregate only (the
    survival-hazard justification: a single-partition window is
    correct exactly when its input is vocabulary-sized); the raw scan
    contributes one partial+final hash aggregation. All counts are
    exact integers; the two divisions happen per aggregated row with
    an identical formula on both engines."""
    e = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
    ).otherwise("B")
    p = e.filter(F.col("event_type") == "purchase").select(
        variant.alias("variant"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    per_value = p.groupBy("cents").agg(
        F.sum((F.col("variant") == "A").cast("int")).alias("a"),
        F.sum((F.col("variant") == "B").cast("int")).alias("b"),
    )
    tot = per_value.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    run = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    cdf = per_value.select(
        F.sum("a").over(run).alias("ca"), F.sum("b").over(run).alias("cb")
    )
    gap = F.abs(F.col("ca").cast("double") / F.col("ta") - F.col("cb").cast("double") / F.col("tb"))
    return (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("ta", "tb")
        .agg(
            F.round(F.max(gap), 6).alias("d_stat"),
            F.round(
                F.max(1.358 * F.sqrt((F.col("ta") + F.col("tb")).cast("double") / (F.col("ta") * F.col("tb")))),
                6,
            ).alias("d_crit_05"),
        )
        .select(
            F.col("ta").cast("long").alias("n_a"),
            F.col("tb").cast("long").alias("n_b"),
            "d_stat",
            "d_crit_05",
        )
    )


@query(
    "q_mutual_information",
    oracle="""
    WITH c AS (
      SELECT source, lang, COUNT(*) AS n_sl FROM documents GROUP BY source, lang
    ),
    t AS (SELECT SUM(n_sl) AS n FROM c),
    ms AS (SELECT source, SUM(n_sl) AS n_s FROM c GROUP BY source),
    ml AS (SELECT lang, SUM(n_sl) AS n_l FROM c GROUP BY lang)
    SELECT c.source, c.lang,
           CAST(c.n_sl AS BIGINT) AS n_sl,
           CAST(ROUND(
             (CAST(c.n_sl AS DOUBLE) / t.n)
             * ln((CAST(c.n_sl AS DOUBLE) * t.n) / (CAST(ms.n_s AS DOUBLE) * ml.n_l)),
             6) AS DOUBLE) AS mi_term
    FROM c JOIN ms USING (source) JOIN ml USING (lang) CROSS JOIN t
    """,
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns (source,
    lang) as per-cell contributions p(s,l)*ln(p(s,l)/(p(s)p(l))) —
    the feature-selection score that tells a curation pipeline
    whether a metadata column actually predicts another (sum the
    column for total MI; per-cell terms localize WHICH combinations
    carry the signal).

    Scale shape: one contingency aggregate keyed on the column pair,
    then marginals and the total over that (category-bounded) table;
    the joins run on vocabulary-sized inputs that AQE broadcasts.
    Identical exact-integer-counts-then-one-double-formula recipe as
    q_chi_square_contingency."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count("*").alias("n_sl"))
    t = c.agg(F.sum("n_sl").alias("n"))
    ms = c.groupBy("source").agg(F.sum("n_sl").alias("n_s"))
    ml = c.groupBy("lang").agg(F.sum("n_sl").alias("n_l"))
    p_sl = F.col("n_sl").cast("double") / F.col("n")
    ratio = (F.col("n_sl").cast("double") * F.col("n")) / (
        F.col("n_s").cast("double") * F.col("n_l")
    )
    return (
        c.join(ms, "source")
        .join(ml, "lang")
        .crossJoin(F.broadcast(t))
        .select(
            "source",
            "lang",
            F.col("n_sl").cast("long").alias("n_sl"),
            F.round(p_sl * F.log(ratio), 6).alias("mi_term"),
        )
    )


@query(
    "q_mannwhitney_u",
    oracle="""
    WITH p AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS variant,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    pv AS (
      SELECT cents,
             SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS b
      FROM p GROUP BY cents
    ),
    ranked AS (
      SELECT a, b, (a + b) AS t,
             SUM(a + b) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS c_before
      FROM pv
    ),
    agg AS (
      SELECT SUM(a) AS na, SUM(b) AS nb,
             SUM(a * (COALESCE(c_before, 0) + (t + 1) / 2.0)) AS r_a,
             SUM(CAST(t AS DOUBLE) * t * t - t) AS tie_sum
      FROM ranked
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(ROUND(r_a - na * (na + 1) / 2.0, 1) AS DOUBLE) AS u_a,
           CAST(ROUND(
             (r_a - na * (na + 1) / 2.0 - CAST(na AS DOUBLE) * nb / 2)
             / sqrt(CAST(na AS DOUBLE) * nb / 12.0
                    * ((na + nb + 1)
                       - tie_sum / (CAST(na + nb AS DOUBLE) * (na + nb - 1)))),
             6) AS DOUBLE) AS z_score
    FROM agg
    """,
)
def q_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between experiment
    arms' purchase amounts — the nonparametric location test that
    works when the t-test's normality assumption doesn't, with the
    tie-corrected normal approximation (ties are heavy by
    construction: amounts quantize to cents).

    Scale shape: identical to q_ks_two_sample — ranks come from the
    per-CENTS-VALUE aggregate (average rank of a tied block is
    cum-before + (t+1)/2), so the only ordered window runs over the
    price-domain-bounded table; rank sums, tie terms, U, and the z
    statistic are exact-integer sums pushed through one shared double
    formula. U is a multiple of 0.5 exactly (halves are exact
    doubles), rounded at 1 decimal for display."""
    e = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
    ).otherwise("B")
    p = e.filter(F.col("event_type") == "purchase").select(
        variant.alias("variant"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    pv = p.groupBy("cents").agg(
        F.sum((F.col("variant") == "A").cast("int")).alias("a"),
        F.sum((F.col("variant") == "B").cast("int")).alias("b"),
    )
    t = F.col("a") + F.col("b")
    c_before = F.sum(t).over(
        W.orderBy("cents").rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = pv.select("a", "b", t.alias("t"), c_before.alias("c_before"))
    agg = ranked.agg(
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.sum(
            F.col("a") * (F.coalesce("c_before", F.lit(0)) + (F.col("t") + 1) / 2.0)
        ).alias("r_a"),
        F.sum(F.col("t").cast("double") * F.col("t") * F.col("t") - F.col("t")).alias(
            "tie_sum"
        ),
    )
    u_a = F.col("r_a") - F.col("na") * (F.col("na") + 1) / 2.0
    mu = F.col("na").cast("double") * F.col("nb") / 2
    var = (
        F.col("na").cast("double")
        * F.col("nb")
        / 12.0
        * (
            (F.col("na") + F.col("nb") + 1)
            - F.col("tie_sum")
            / ((F.col("na") + F.col("nb")).cast("double") * (F.col("na") + F.col("nb") - 1))
        )
    )
    return agg.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(u_a, 1).alias("u_a"),
        F.round((u_a - mu) / F.sqrt(var), 6).alias("z_score"),
    )


@query(
    "q_events_burstiness",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY event_type, h
    ),
    s AS (
      SELECT event_type, COUNT(*) AS k, SUM(n) AS sx, SUM(n * n) AS sxx
      FROM hourly GROUP BY event_type
    )
    SELECT event_type,
           CAST(k AS BIGINT) AS n_hours,
           CAST(sx AS BIGINT) AS n_events,
           CAST(ROUND(
             (CAST(sxx AS DOUBLE) / k - (CAST(sx AS DOUBLE) / k) * (CAST(sx AS DOUBLE) / k))
             / (CAST(sx AS DOUBLE) / k), 6) AS DOUBLE) AS fano_factor
    FROM s
    """,
)
def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor = variance/mean of hourly counts) per
    event type — ~1 for a Poisson-like steady stream, >1 for bursty
    traffic (flash crowds, retry storms), <1 for throttled/regular
    flows; the dispersion statistic anomaly pipelines baseline on.

    Scale shape: one hash aggregate to the (type, hour) grain —
    calendar-bounded, not corpus-bounded — then exact integer
    (count, sum, sum-of-squares) per type, pushed through one shared
    double formula (the q_feature_scaling determinism recipe); no
    window at all."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy("event_type", date_trunc_ntz("hour", "ts").alias("h")).agg(
        F.count("*").alias("n")
    )
    # sxx accumulates in decimal(38,0) (the q_feature_scaling idiom):
    # the int64 square-sum wraps silently for hot hours at large scale
    # factors where the DuckDB oracle's HUGEINT keeps going; k/sx stay
    # bigint (linear in group size).
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    s = hourly.groupBy("event_type").agg(
        F.count("*").alias("k"),
        F.sum("n").alias("sx"),
        F.sum(dec("n") * dec("n")).alias("sxx"),
    )
    mean = F.col("sx").cast("double") / F.col("k")
    var = F.col("sxx").cast("double") / F.col("k") - mean * mean
    return s.select(
        "event_type",
        F.col("k").cast("long").alias("n_hours"),
        F.col("sx").cast("long").alias("n_events"),
        F.round(var / mean, 6).alias("fano_factor"),
    )


@query(
    "q_rank_corr_spearman",
    oracle="""
    WITH base AS (
      SELECT l_returnflag, l_quantity AS q,
             l_extendedprice AS p,
             l_extendedprice * (1 - l_discount) AS rev
      FROM lineitem
    ), r AS (
      SELECT l_returnflag,
             2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY q)
               + COUNT(*) OVER (PARTITION BY l_returnflag, q) - 1 AS rq,
             2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY p)
               + COUNT(*) OVER (PARTITION BY l_returnflag, p) - 1 AS rp,
             2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY rev)
               + COUNT(*) OVER (PARTITION BY l_returnflag, rev) - 1 AS rr
      FROM base
    ), s AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(rq) AS sq, SUM(rp) AS sp, SUM(rr) AS sr,
             SUM(rq * rq) AS sqq, SUM(rp * rp) AS spp, SUM(rr * rr) AS srr,
             SUM(rp * rr) AS spr, SUM(rq * rr) AS sqr
      FROM r GROUP BY 1
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(ROUND(
             (CAST(n AS DOUBLE) * CAST(spr AS DOUBLE)
              - CAST(sp AS DOUBLE) * CAST(sr AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                     - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
                     - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))), 6) AS DOUBLE)
             AS rho_price_revenue,
           CAST(ROUND(
             (CAST(n AS DOUBLE) * CAST(sqr AS DOUBLE)
              - CAST(sq AS DOUBLE) * CAST(sr AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                     - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
                     - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))), 6) AS DOUBLE)
             AS rho_qty_revenue
    FROM s
    """,
)
def q_rank_corr_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per return flag, with textbook tie
    handling (each value gets the AVERAGE of the row ranks it spans).
    Rank correlation is the robust monotonic-association check feature
    pipelines run where Pearson (q_agg_regression's r2) is distorted
    by outliers. Two panels keep the query non-vacuous on the
    independent-column fixture: price vs net revenue
    (price*(1-discount)) is strongly monotone BY CONSTRUCTION (~0.95 —
    a rank-handling bug would visibly shift it), while quantity vs
    revenue is a near-zero control whose integer quantities hammer the
    tie-averaging path (ties span thousands of rows per value).

    Determinism recipe: average ranks are half-integers, so the plan
    carries DOUBLED ranks (2*rank + ties - 1 — exact integers) and
    feeds exact integer moment sums into one shared double formula,
    identical text on both engines (correlation's scale invariance
    absorbs the doubling). Sums accumulate in decimal(28,0): rank^2
    products reach ~1.6e13 at sf1 and their int64 sums would overflow
    around 1e19 (DuckDB's HUGEINT sums are exact natively).

    Scale shape (round 11, guide §2.5 — VERDICT r10 "What's wrong" #2):
    exact per-row ranks are computed with TWO-LEVEL bucketed windows
    instead of windows partitioned by the 3-value group key (which
    sorted the whole corpus on 3 tasks at any scale — the 0.84 probe
    exponent). Each panel column is range-bucketed per flag (monotone,
    value-deterministic buckets from one broadcast min/max row), the
    rank window runs per (flag, bucket) — parallelism = flags x
    buckets, buckets derived from input bytes — and the global rank is
    recovered EXACTLY as within-bucket rank + the count of rows in
    earlier buckets (one grouping-sets pass builds all three
    bucket-count tables; the prefix sum runs over the tiny
    flags x buckets table and broadcast-joins back). Ties never span
    buckets (equal values share a bucket), so the RANGE-frame peer
    count is unchanged. Then one partial/final hash agg of
    constant-size state per group. No holistic pass."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("p"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    # The projected base feeds THREE consumers (min/max extents, the
    # bucket-count pass, the ranked main path); the shared round-robin
    # exchange fans the single-row-group fixture scan out AND lets AQE
    # reuse one evaluation across all three (round-10 kept-#2/#4
    # pattern; a no-op repartition on production multi-file layouts).
    base = ensure_parallelism(base)

    # Buckets per flag: enough for every core (x4) and, at scale, for
    # ~64 MiB of source bytes per bucketed sort partition — the same
    # input-derived sizing discipline as stream_state_partitions.
    from simplemapreduce_spark.sources.tables import dataset_size_bytes, table_path

    nb = max(
        spark.sparkContext.defaultParallelism * 4,
        -(-dataset_size_bytes(table_path(sf_dir, "lineitem")) // (64 << 20)),
    )

    ext = base.groupBy("l_returnflag").agg(
        F.min("q").alias("q_lo"), F.max("q").alias("q_hi"),
        F.min("p").alias("p_lo"), F.max("p").alias("p_hi"),
        F.min("rev").alias("rev_lo"), F.max("rev").alias("rev_hi"),
    )

    def bucket(col: str, lo: str, hi: str):
        # Monotone in the value and identical for equal values, so
        # bucket boundaries respect the rank order and ties stay
        # within one bucket; the double cast is order-preserving.
        span = F.col(hi).cast("double") - F.col(lo).cast("double")
        frac = F.when(
            span > 0, (F.col(col).cast("double") - F.col(lo).cast("double")) / span
        ).otherwise(F.lit(0.0))
        return F.least(F.floor(frac * nb), F.lit(nb - 1)).cast("int")

    b = base.join(F.broadcast(ext), "l_returnflag").select(
        "l_returnflag", "q", "p", "rev",
        bucket("q", "q_lo", "q_hi").alias("bq"),
        bucket("p", "p_lo", "p_hi").alias("bp"),
        bucket("rev", "rev_lo", "rev_hi").alias("brev"),
    )

    # All three (flag, bucket) count tables in ONE pass (grouping sets
    # Expand x3, partial-agg collapsed map-side); each prefix-sum
    # window runs over <= flags x buckets rows. Eagerly checkpointed
    # PER INVOCATION (the kept-#8 r10 discipline — no cross-run
    # caching): without the checkpoint, the per-offset gid filter
    # pushes below the aggregate into the Expand, splitting the count
    # pass into three non-identical subtrees that each re-run the
    # corpus-proportional Expand+partial-agg (measured: 3 extra full
    # passes in the executed plan). The checkpointed table is tiny
    # (flags x buckets x 3 rows — cores/bytes-scaled, never
    # data-proportional).
    cnt = (
        b.groupingSets(
            [["l_returnflag", "bq"], ["l_returnflag", "bp"], ["l_returnflag", "brev"]],
            "l_returnflag", "bq", "bp", "brev",
        )
        .agg(F.count(F.lit(1)).alias("c"), F.grouping_id().alias("gid"))
        .localCheckpoint(eager=True)
    )

    def offsets(bcol: str, gid: int):
        w = (
            W.partitionBy("l_returnflag")
            .orderBy(bcol)
            .rowsBetween(W.unboundedPreceding, -1)
        )
        return cnt.filter(F.col("gid") == gid).select(
            "l_returnflag",
            F.col(bcol),
            F.coalesce(F.sum("c").over(w), F.lit(0)).alias(f"off_{bcol}"),
        )

    # grouping_id bits over (l_returnflag, bq, bp, brev): a set's id
    # has 1-bits exactly on its rolled-up columns.
    off_q, off_p, off_rev = offsets("bq", 0b0011), offsets("bp", 0b0101), offsets("brev", 0b0110)

    def r2(col: str, bcol: str, off: str):
        w = W.partitionBy("l_returnflag", bcol).orderBy(col)
        rk = F.rank().over(w)
        # Tie count = peer count of the rank window's OWN sort (RANGE
        # frame pinned to the current row spans exactly the order-value
        # peers) — identical semantics to a count over
        # (l_returnflag, col) since ties never cross buckets, and it
        # reuses the bucketed rank window's exchange and sort.
        ties = F.count("*").over(w.rangeBetween(W.currentRow, W.currentRow))
        return (2 * (rk + F.col(off)) + ties - 1).cast("decimal(28,0)")

    r = (
        b.join(F.broadcast(off_q), ["l_returnflag", "bq"])
        .join(F.broadcast(off_p), ["l_returnflag", "bp"])
        .join(F.broadcast(off_rev), ["l_returnflag", "brev"])
        .select(
            "l_returnflag",
            r2("q", "bq", "off_bq").alias("rq"),
            r2("p", "bp", "off_bp").alias("rp"),
            r2("rev", "brev", "off_brev").alias("rr"),
        )
    )
    s = r.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("rq").alias("sq"),
        F.sum("rp").alias("sp"),
        F.sum("rr").alias("sr"),
        F.sum(F.col("rq") * F.col("rq")).alias("sqq"),
        F.sum(F.col("rp") * F.col("rp")).alias("spp"),
        F.sum(F.col("rr") * F.col("rr")).alias("srr"),
        F.sum(F.col("rp") * F.col("rr")).alias("spr"),
        F.sum(F.col("rq") * F.col("rr")).alias("sqr"),
    )
    n = F.col("n").cast("double")

    def rho(sx, sy, sxx, syy, sxy):
        dx, dy = (F.col(c).cast("double") for c in (sx, sy))
        dxx, dyy, dxy = (F.col(c).cast("double") for c in (sxx, syy, sxy))
        return F.round(
            (n * dxy - dx * dy)
            / F.sqrt((n * dxx - dx * dx) * (n * dyy - dy * dy)),
            6,
        )
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        rho("sp", "sr", "spp", "srr", "spr").alias("rho_price_revenue"),
        rho("sq", "sr", "sqq", "srr", "sqr").alias("rho_qty_revenue"),
    )


@query(
    "q_events_gini",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS x FROM events GROUP BY 1
    ), r AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i FROM c
    ), s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(i * x) AS six FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(sx AS BIGINT) AS n_events,
           CAST(ROUND(
             2.0 * CAST(six AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE), 6) AS DOUBLE) AS gini
    FROM s
    """,
)
def q_events_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts — the engagement-
    inequality number (0 = everyone equally active, ->1 = all activity
    from a few power users) that doubles as the key-skew diagnostic
    for this very table: a high Gini on the groupBy(user_id) key is
    what sends q_join_salted_skew's salting machinery into action.
    Computed by the rank formula G = 2*SUM(i*x_i)/(n*SUM(x)) - (n+1)/n
    over ascending counts.

    Determinism: ranks are a total order (count, then user_id) — and
    the formula is tie-invariant anyway, since permuting equal x
    among adjacent ranks leaves SUM(i*x) unchanged; all three moments
    are exact integers feeding one shared double expression. int64
    headroom: i*x <= |users| * max_count — at 1e10 users x 1e6 events
    the SUM crosses int64, where the decimal/HUGEINT discipline of the
    sibling queries applies; at any realistic per-table scale the
    BIGINT path holds.

    Scale shape (round 11, guide §2.5): the former global row_number
    window serialized the |users|-row table onto ONE task at any scale
    (Exchange SinglePartition — the unpartitioned-window scale-killer,
    same class as VERDICT r10 #3). Because the formula is
    tie-invariant, SUM(i*x) collapses onto the HISTOGRAM of counts:
    the block of f_v users sharing count v occupies ranks
    lt_v+1..lt_v+f_v (lt_v = users with smaller count), contributing
    v*(f_v*lt_v + f_v*(f_v+1)/2) — exact integers. The only window
    left is the lt prefix sum over the DISTINCT-count table, which is
    value-domain-bounded (delta per row >= 1, so |distinct counts| <=
    max events per user), never user-proportional. Two parallel hash
    aggs + a tiny window + one scalar agg; no data-proportional
    sort anywhere."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count("*").alias("x"))
    h = c.groupBy("x").agg(F.count("*").alias("f"))
    lt = F.coalesce(
        F.sum("f").over(W.orderBy("x").rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    )
    h2 = h.select("x", "f", lt.alias("lt"))
    six_block = F.col("x") * (
        F.col("f") * F.col("lt") + F.expr("(f * (f + 1)) DIV 2")
    )
    s = h2.agg(
        F.sum("f").alias("n"),
        F.sum(F.col("x") * F.col("f")).alias("sx"),
        F.sum(six_block).alias("six"),
    )
    n = F.col("n").cast("double")
    sx, six = F.col("sx").cast("double"), F.col("six").cast("double")
    return s.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("sx").cast("long").alias("n_events"),
        F.round(2.0 * six / (n * sx) - (n + 1) / n, 6).alias("gini"),
    )


_EQW_LO, _EQW_HI, _EQW_N = 0.0, 500.0, 10  # fixed-width bucket spec


@query(
    "q_histogram_equiwidth",
    oracle=f"""
    SELECT CAST(CASE WHEN value < {_EQW_LO} THEN 0
                     WHEN value >= {_EQW_HI} THEN {_EQW_N} + 1
                     ELSE FLOOR((value - {_EQW_LO})
                                / (({_EQW_HI} - {_EQW_LO}) / {_EQW_N})) + 1
                END AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1
    """,
)
def q_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-WIDTH histogram of event values via the SQL-standard
    width_bucket over a FIXED [0, 500) x 10 grid — the streaming-
    friendly dual of q_histogram_equidepth: fixed edges need no
    quantile pass (one map-side bucket expression, mergeable counts),
    which is why monitoring systems bin this way, at the price of
    unbalanced buckets. The grid is a declared constant, not
    min/max-derived, so the histogram is comparable ACROSS runs and
    data slices — deriving edges from the data would make every
    report's buckets mean something different.

    Determinism: the oracle mirrors width_bucket's exact arithmetic
    INCLUDING its boundary clamps — values below lo map to bucket 0 and
    values at/above hi map to bucket n+1 (the raw floor formula alone
    diverges as soon as the data carries a value >= hi + width: caught
    by the round-7 sf0.1 gate replay, invisible at sf0.01); the
    interior divisor 50.0 is exact in binary, so both engines compute
    identical doubles, and counts and cent sums are exact integers.

    Scale shape: one partial/final hash agg to a constant-size grid.
    No window, no second pass."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.width_bucket(
        "value", F.lit(_EQW_LO), F.lit(_EQW_HI), F.lit(_EQW_N)
    ).cast("long")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return e.groupBy(bucket.alias("bucket")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(cents).cast("long").alias("sum_cents"),
    )


@query(
    "q_jackknife_ratio_se",
    oracle="""
    WITH rows_ AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
               AS r_cents,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
    ), tot AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(CAST(r_cents AS HUGEINT)) AS sr,
             SUM(CAST(q AS HUGEINT)) AS sq
      FROM rows_ GROUP BY 1
    ), loo AS (
      SELECT r.l_returnflag, t.n, t.sr, t.sq,
             CAST(ROUND(
               (CAST(t.sr - r.r_cents AS DOUBLE) / CAST(t.sq - r.q AS DOUBLE))
               * 1000000, 0) AS BIGINT) AS loo6
      FROM rows_ r JOIN tot t USING (l_returnflag)
    ), m AS (
      SELECT l_returnflag,
             CAST(MAX(n) AS BIGINT) AS n,
             MAX(sr) AS sr, MAX(sq) AS sq,
             SUM(CAST(loo6 AS HUGEINT)) AS s1,
             SUM(CAST(loo6 AS HUGEINT) * loo6) AS s2
      FROM loo GROUP BY 1
    )
    SELECT l_returnflag, n,
           CAST(ROUND(CAST(sr AS DOUBLE) / CAST(sq AS DOUBLE) / 100.0, 6)
                AS DOUBLE) AS ratio,
           CAST(ROUND(
             SQRT((CAST(n AS DOUBLE) - 1) / CAST(n AS DOUBLE)
                  * (CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                       / CAST(n AS DOUBLE)))
             / 1000000.0 / 100.0, 6) AS DOUBLE) AS jackknife_se
    FROM m
    """,
)
def q_jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jackknife standard error of the revenue-per-unit RATIO estimator
    per return flag — resampling-grade uncertainty without RNG. The
    ratio sum(revenue)/sum(qty) is the canonical NON-linear statistic
    (for the plain mean the jackknife collapses to s/sqrt(n) and says
    nothing new; for a ratio it is the standard delta-method-free
    answer, Efron & Tibshirani ch. 11), and its leave-one-out values
    need no N recomputes: loo_i = (S_r - r_i)/(S_q - q_i) from the
    group's sufficient statistics — the algebraic trick that turns a
    resampling procedure into two linear passes.

    Determinism recipe: revenue is exact integer cents and quantities
    exact integers, so S_r/S_q are exact; each loo_i is ONE double
    division, immediately rounded to a 1e-6-scaled BIGINT (the TF-IDF
    w6 idiom) so the jackknife moment sums accumulate exactly in
    HUGEINT/decimal(38,0) — never order-sensitive double addition over
    60k rows. The final sqrt formula is shared text on both engines.

    Scale shape: two hash aggs on the same group key (totals, then
    moments of the scaled loo values) with a broadcast-sized totals
    join between them; no window, no sort, state O(groups)."""
    from simplemapreduce_spark.sources.tables import ensure_parallelism

    li = load_table(spark, sf_dir, "lineitem")
    # The leave-one-out branch runs 600k decimal(38,0) products in its
    # map-side partial agg, which the single-row-group fixture pinned
    # to ONE scan task; the guard fans it out (production no-op), and
    # both consumers (totals + loo moments) share the repartition
    # exchange so the projection also computes once (round 10).
    rows_ = ensure_parallelism(li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("r_cents"),
        F.col("l_quantity").cast("long").alias("q"),
    ))
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    tot = rows_.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dec("r_cents")).alias("sr"),
        F.sum(dec("q")).alias("sq"),
    )
    loo6 = F.round(
        (F.col("sr") - F.col("r_cents")).cast("double")
        / (F.col("sq") - F.col("q")).cast("double")
        * 1000000
    ).cast("long")
    loo = rows_.join(F.broadcast(tot), "l_returnflag").select(
        "l_returnflag", "n", "sr", "sq", loo6.alias("loo6")
    )
    m = loo.groupBy("l_returnflag").agg(
        F.max("n").cast("long").alias("n"),
        F.max("sr").alias("sr"),
        F.max("sq").alias("sq"),
        F.sum(dec("loo6")).alias("s1"),
        F.sum(dec("loo6") * dec("loo6")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    return m.select(
        "l_returnflag",
        "n",
        F.round(
            F.col("sr").cast("double") / F.col("sq").cast("double") / 100.0, 6
        ).alias("ratio"),
        F.round(
            F.sqrt((nd - 1) / nd * (s2 - s1 * s1 / nd)) / 1000000.0 / 100.0, 6
        ).alias("jackknife_se"),
    )


@query(
    "q_trend_theil_sen",
    oracle="""
    WITH m AS (
      SELECT (year(l_shipdate) * 12 + month(l_shipdate)) AS mi,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                           AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem GROUP BY 1
    ),
    pairs AS (
      SELECT a.mi AS i, b.mi AS j,
             CAST(b.rev - a.rev AS DOUBLE) / (b.mi - a.mi) AS slope
      FROM m a JOIN m b ON b.mi > a.mi
    ),
    ranked AS (
      SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, i, j) AS rk,
             COUNT(*) OVER () AS np FROM pairs
    ),
    ts AS (
      SELECT slope AS theil_sen, np FROM ranked
      WHERE rk = CAST(ceil(np / 2.0) AS BIGINT)
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(mi AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(mi AS DECIMAL(38,0)) * CAST(mi AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(mi AS DECIMAL(38,0)) * CAST(rev AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS sxy
      FROM m
    )
    SELECT mom.n AS n_months,
           CAST(ts.np AS BIGINT) AS n_pairs,
           CAST(ROUND(ts.theil_sen / 100.0, 4) AS DOUBLE)
             AS theil_sen_dollars_per_month,
           CAST(ROUND(
             (CAST(mom.n AS DOUBLE) * CAST(mom.sxy AS DOUBLE)
              - CAST(mom.sx AS DOUBLE) * CAST(mom.sy AS DOUBLE))
             / (CAST(mom.n AS DOUBLE) * CAST(mom.sxx AS DOUBLE)
                - CAST(mom.sx AS DOUBLE) * CAST(mom.sx AS DOUBLE)) / 100.0,
           4) AS DOUBLE) AS ols_dollars_per_month
    FROM ts, mom
    """,
)
def q_trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen ROBUST trend of monthly revenue — the median of all
    pairwise slopes (Sen 1968), the estimator that shrugs off the
    outlier months that drag OLS around (29% breakdown point); both
    slopes are reported so the robust-vs-least-squares gap is visible.

    Exactness: monthly revenues are exact integer cents and month
    indexes exact integers, so every pairwise slope is ONE double
    division of integers (bit-identical across engines) and the median
    is a rank pick over identically-ordered values with (slope, i, j)
    total order; OLS comes from exact decimal(38,0) moments — the
    jackknife idiom — with the single float combination at the end.

    Scale shape: the pair set is QUADRATIC in the GROUP count, not the
    row count — the aggregation to months happens first, so 7 years of
    lineitem become ~84 rows and ~3.5k pairs regardless of corpus
    size; the rank window runs over that bounded pair table. For
    fine-grained series (days, devices) the production variant is
    repeated-median or a per-partition sample of pairs — noted, not
    needed at a monthly grain."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast(
        "long"
    )
    m = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("mi")
    ).agg(F.sum(cents).alias("rev"))
    a = m.select(F.col("mi").alias("i"), F.col("rev").alias("ra"))
    b = m.select(F.col("mi").alias("j"), F.col("rev").alias("rb"))
    pairs = a.join(b, F.col("j") > F.col("i")).select(
        "i",
        "j",
        ((F.col("rb") - F.col("ra")).cast("double") / (F.col("j") - F.col("i"))).alias(
            "slope"
        ),
    )
    wall = W.orderBy("slope", "i", "j")
    ranked = pairs.select(
        "slope",
        F.row_number().over(wall).alias("rk"),
        F.count("*").over(W.partitionBy()).alias("np"),
    )
    ts = ranked.filter(
        F.col("rk") == F.ceil(F.col("np") / 2.0).cast("long")
    ).select(F.col("slope").alias("theil_sen"), "np")
    dec = lambda c: c.cast("decimal(38,0)")
    mom = m.agg(
        F.count("*").alias("n"),
        F.sum(dec(F.col("mi"))).alias("sx"),
        F.sum(dec(F.col("rev"))).alias("sy"),
        F.sum(dec(F.col("mi")) * dec(F.col("mi"))).alias("sxx"),
        F.sum(dec(F.col("mi")) * dec(F.col("rev"))).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    ols = (
        (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
        / 100.0
    )
    return ts.crossJoin(mom).select(
        F.col("n").cast("long").alias("n_months"),
        F.col("np").cast("long").alias("n_pairs"),
        F.round(F.col("theil_sen") / 100.0, 4).alias("theil_sen_dollars_per_month"),
        F.round(ols, 4).alias("ols_dollars_per_month"),
    )


_BOOT_B = 32
# Poisson(1) CDF thresholds as 32-bit LOWERCASE-HEX strings (floor of
# cum * 2^32): md5 hex substrings compare lexicographically in numeric
# order, so the inverse-CDF lookup is a string CASE with NO hex->int
# conversion — measured 2.5x cheaper than conv() over the 19M
# (row, resample) draws at sf0.1. Truncated at m=5 (omitted tail mass
# 5.9e-4, applied IDENTICALLY on both engines — a definition, not an
# error).
_POIS_CUM_HEX = ("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797", "ff1025f5")


def _pois_case(hx: str) -> str:
    """SQL CASE mapping an 8-hex-char uniform to a Poisson(1)
    multiplicity via inverse CDF — shared text for both engines."""
    clauses = " ".join(
        f"WHEN {hx} < '{t}' THEN {m}" for m, t in enumerate(_POIS_CUM_HEX)
    )
    return f"CASE {clauses} ELSE 5 END"


@query(
    "q_bootstrap_poisson_se",
    oracle=f"""
    WITH r AS (
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
               AS cents
      FROM lineitem
    ),
    expanded AS (
      SELECT b.b,
             {_pois_case(
                 "substr(md5(r.l_orderkey || '-' || r.l_linenumber"
                 " || '-' || (b.b // 4)), CAST(1 + (b.b % 4) * 8 AS INT), 8)"
             )}
               AS m,
             r.cents
      FROM r CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b) b
    ),
    resamples AS (
      SELECT b, CAST(SUM(m) AS BIGINT) AS nb,
             CAST(SUM(m * cents) AS DECIMAL(38,0)) AS sb
      FROM expanded GROUP BY b
    ),
    means AS (
      SELECT b, CAST(ROUND(CAST(sb AS DOUBLE) / nb / 100.0 * 1000000, 0)
                     AS BIGINT) AS mean6
      FROM resamples
    ),
    boot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS bn,
             CAST(SUM(CAST(mean6 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(CAST(mean6 AS DECIMAL(38,0)) * CAST(mean6 AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS s2
      FROM means
    ),
    full_m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sc,
             CAST(SUM(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS scc
      FROM r
    )
    SELECT boot.bn AS b_resamples,
           CAST(ROUND(CAST(full_m.sc AS DOUBLE) / full_m.n / 100.0, 6) AS DOUBLE)
             AS mean_dollars,
           CAST(ROUND(sqrt((CAST(boot.s2 AS DOUBLE)
                            - CAST(boot.s1 AS DOUBLE) * CAST(boot.s1 AS DOUBLE) / boot.bn)
                           / (boot.bn - 1)) / 1000000.0, 6) AS DOUBLE)
             AS bootstrap_se,
           CAST(ROUND(sqrt((CAST(full_m.scc AS DOUBLE)
                            - CAST(full_m.sc AS DOUBLE) * CAST(full_m.sc AS DOUBLE) / full_m.n)
                           / (full_m.n - 1) / full_m.n) / 100.0, 6) AS DOUBLE)
             AS classical_se
    FROM boot, full_m
    """,
)
def q_bootstrap_poisson_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP standard error of the mean line-revenue — the
    map-reduce resampling method (Chamandy et al., Google 2012;
    Kleiner's BLB is its cousin): instead of drawing n rows with
    replacement (which needs global coordination), every row draws its
    OWN multiplicity per resample, m ~ Poisson(1), making each of the
    {B} resamples a one-pass weighted aggregate. Multiplicities are
    DETERMINISTIC — inverse-CDF over an md5 hash of (row id, resample
    id) in exact 1e-6 integer units — so the whole procedure is
    engine-reproducible with zero RNG, same discipline as every
    sampler here. The classical s/sqrt(n) rides along: for the plain
    mean they must agree closely (the bootstrap's sanity anchor, and
    the non-vacuity check pins their ratio), while the machinery
    generalizes to statistics with no closed-form SE.

    Exactness: per-resample sums are integer cents x integer
    multiplicities in decimal(38,0); each resample mean collapses to a
    1e-6-scaled BIGINT (the jackknife idiom) so the across-resample
    moments are exact; full-data moments likewise. Truncating the
    Poisson tail at m=5 (mass 5.9e-4) is part of the shared
    definition.

    Scale shape: one explode by B={B} (row-local hash per copy), one
    (b)-keyed partial+final aggregate — B-row state; no shuffle of the
    corpus beyond the B-way expansion, which a production run fuses
    into the scan. Everything downstream of the B-row table is
    driver-trivial."""
    li = load_table(spark, sf_dir, "lineitem")
    from simplemapreduce_spark.sources.tables import ensure_parallelism

    # CPU-bound map-side pipeline (B/4 md5 digests + B-way explode +
    # per-copy CASE per source row) — exactly the shape the
    # ensure_parallelism guard exists for (round 10: the single-row-
    # group fixture pinned the whole expansion to ONE scan task,
    # measured 10.5 s steady; production layouts make this a no-op).
    # Both consumers (the resample expansion and the full-data moment
    # branch) hang off the same repartition exchange, so the source
    # projection also computes once at runtime.
    r = ensure_parallelism(li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("long")
        .alias("cents"),
    ))
    # One md5 yields FOUR independent 32-bit words, so the B={B}
    # multiplicities cost B/4 digests per row, not B; the digest array
    # is projected ONCE per source row (before the explode) and the
    # per-(row, resample) work is substring + hex-string CASE — the
    # naive per-draw digest + conv() measured 20 s at sf0.1, this
    # shape runs ~7 s, with the identical formula on both engines.
    digs = F.expr(
        "transform(sequence(0, 7), g ->"
        " md5(concat(l_orderkey, '-', l_linenumber, '-', CAST(g AS STRING))))"
    )
    b = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b")
    hx = (
        "substring(element_at(digs, CAST(b div 4 AS INT) + 1),"
        " CAST(1 + (b % 4) * 8 AS INT), 8)"
    )
    m_expr = F.expr(_pois_case(hx))
    expanded = r.select("cents", digs.alias("digs")).select("cents", "digs", b).select(
        "b", m_expr.alias("m"), "cents"
    )
    dec = lambda c: c.cast("decimal(38,0)")
    resamples = expanded.groupBy("b").agg(
        F.sum("m").alias("nb"), F.sum(dec(F.col("m") * F.col("cents"))).alias("sb")
    )
    mean6 = F.round(
        F.col("sb").cast("double") / F.col("nb") / 100.0 * 1000000, 0
    ).cast("long")
    means = resamples.select("b", mean6.alias("mean6"))
    boot = means.agg(
        F.count("*").alias("bn"),
        F.sum(dec(F.col("mean6"))).alias("s1"),
        F.sum(dec(F.col("mean6")) * dec(F.col("mean6"))).alias("s2"),
    )
    full_m = r.agg(
        F.count("*").alias("n"),
        F.sum(dec(F.col("cents"))).alias("sc"),
        F.sum(dec(F.col("cents")) * dec(F.col("cents"))).alias("scc"),
    )
    bnd = F.col("bn").cast("double")
    nd = F.col("n").cast("double")
    return boot.crossJoin(full_m).select(
        F.col("bn").cast("long").alias("b_resamples"),
        F.round(F.col("sc").cast("double") / nd / 100.0, 6).alias("mean_dollars"),
        F.round(
            F.sqrt(
                (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double") * F.col("s1").cast("double") / bnd
                )
                / (bnd - 1)
            )
            / 1000000.0,
            6,
        ).alias("bootstrap_se"),
        F.round(
            F.sqrt(
                (
                    F.col("scc").cast("double")
                    - F.col("sc").cast("double") * F.col("sc").cast("double") / nd
                )
                / (nd - 1)
                / nd
            )
            / 100.0,
            6,
        ).alias("classical_se"),
    )


q_bootstrap_poisson_se.__doc__ = q_bootstrap_poisson_se.__doc__.replace(
    "{B}", str(_BOOT_B)
)


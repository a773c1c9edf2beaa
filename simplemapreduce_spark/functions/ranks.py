"""Distributable exact ordered-window computations (round 11).

A window whose partition spec is EMPTY (global ``row_number``, global
running sum) executes as ``Exchange SinglePartition`` + one sort task,
and a window partitioned only by a LOW-CARDINALITY key (3-value return
flag) sorts the corpus on as many tasks as the key has values — either
way the input serializes onto O(1) cores at any scale (the
scale-killer VERDICT r10 #3 flagged on q_rank_corr_spearman). For
DOMAIN-BOUNDED inputs (value histograms, hourly buckets, vocabularies)
that is fine and deliberate; for DATA-PROPORTIONAL inputs it is not.

``with_global_order`` computes the same exact results with TWO-LEVEL
bucketed windows: range-bucket the order column per group (monotone,
value-deterministic buckets from one broadcast min/max row per group —
equal values share a bucket, so bucket order respects the total
order), run the window per (group, bucket) in parallel, and recover
the global value as within-bucket result + an offset from the tiny
per-(group, bucket) totals table (groups x buckets rows, never
data-proportional; prefix-summed with a window over that tiny table
and broadcast-joined back). Exactly the q_rank_corr_spearman recipe,
factored for reuse.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def default_bucket_count(df: DataFrame) -> int:
    """cores x 4 parallel buckets per group — the input to these
    rewrites is an already-projected narrow table whose byte size
    Spark only knows at runtime, so the bucket count scales with the
    CLUSTER; per-bucket work is rows/(groups x buckets) narrow rows.
    Callers with a known on-disk input size can pass an input-derived
    ``n_buckets`` instead (the Spearman byte-derived sizing)."""
    return df.sparkSession.sparkContext.defaultParallelism * 4


def with_global_order(
    df: DataFrame,
    order_col: str,
    tie_cols: Sequence[str] = (),
    running_sums: Sequence[tuple[str, str]] = (),
    row_number_col: str | None = None,
    total_count_col: str | None = None,
    total_sums: Sequence[tuple[str, str]] = (),
    group_cols: Sequence[str] = (),
    n_buckets: int | None = None,
) -> DataFrame:
    """Attach exact ordered-window columns to ``df`` without a
    single-partition (or low-cardinality-partition) window.

    Per group (the whole frame when ``group_cols`` is empty), over
    rows totally ordered by (order_col, *tie_cols):

    - ``running_sums``: (src, out) pairs — ``out`` = INCLUSIVE running
      sum of ``src``.
    - ``row_number_col``: ROW_NUMBER over the total order (callers
      must make (group, order_col, *tie_cols) unique for a
      deterministic numbering, same contract as the window it
      replaces).
    - ``total_count_col``: the group's row count on every row
      (replaces ``count(*) over (partition by group)``).
    - ``total_sums``: (src, out) pairs — the group's TOTAL sum of
      ``src`` on every row.

    ``order_col`` must be numeric and non-null. Results are EXACT —
    ties share a bucket, within-bucket windows order by the full key,
    and offsets add the earlier buckets' totals.
    """
    nb = n_buckets or default_bucket_count(df)
    gcols = list(group_cols)

    ext = df.groupBy(*gcols).agg(
        F.min(order_col).alias("_lo"), F.max(order_col).alias("_hi")
    )
    span = F.col("_hi").cast("double") - F.col("_lo").cast("double")
    frac = F.when(
        span > 0,
        (F.col(order_col).cast("double") - F.col("_lo").cast("double")) / span,
    ).otherwise(F.lit(0.0))
    joined = (
        df.join(F.broadcast(ext), gcols) if gcols else df.crossJoin(F.broadcast(ext))
    )
    b = joined.withColumn(
        "_bkt", F.least(F.floor(frac * nb), F.lit(nb - 1)).cast("int")
    ).drop("_lo", "_hi")

    # Tiny per-(group, bucket) totals. NOT checkpointed (unlike the
    # Spearman grouping-sets table): every offset column derives from
    # this ONE unfiltered subtree inside the same query execution, so
    # AQE exchange reuse dedupes it — a checkpoint would force an
    # extra eager job that re-runs the (possibly expensive) input
    # pipeline once more (measured on q_text_perplexity_buckets: the
    # bigram scoring ran per job).
    sum_srcs: dict[str, str] = {}
    for src, _out in list(running_sums) + list(total_sums):
        sum_srcs.setdefault(src, f"_s_{src}")
    aggs = [F.count(F.lit(1)).alias("_cnt")] + [
        F.sum(src).alias(alias) for src, alias in sum_srcs.items()
    ]
    totals = b.groupBy(*gcols, "_bkt").agg(*aggs)

    woff = W.partitionBy(*gcols).orderBy("_bkt").rowsBetween(
        W.unboundedPreceding, -1
    )
    wfull = W.partitionBy(*gcols).orderBy("_bkt").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    off_cols = [
        F.coalesce(F.sum(sum_srcs[src]).over(woff), F.lit(0)).alias(f"_off_{out}")
        for src, out in running_sums
    ]
    if row_number_col is not None:
        off_cols.append(
            F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off_rn")
        )
    if total_count_col is not None:
        off_cols.append(F.sum("_cnt").over(wfull).alias("_tot_cnt"))
    for src, out in total_sums:
        off_cols.append(F.sum(sum_srcs[src]).over(wfull).alias(f"_tot_{out}"))
    offsets = totals.select(*gcols, "_bkt", *off_cols)

    wb = W.partitionBy(*gcols, "_bkt").orderBy(order_col, *tie_cols)
    run = wb.rowsBetween(W.unboundedPreceding, W.currentRow)
    out = b.join(F.broadcast(offsets), [*gcols, "_bkt"])
    proj = [F.col(c) for c in df.columns]
    for src, name in running_sums:
        proj.append((F.sum(src).over(run) + F.col(f"_off_{name}")).alias(name))
    if row_number_col is not None:
        proj.append(
            (F.row_number().over(wb) + F.col("_off_rn")).alias(row_number_col)
        )
    if total_count_col is not None:
        proj.append(F.col("_tot_cnt").alias(total_count_col))
    for _src, name in total_sums:
        proj.append(F.col(f"_tot_{name}").alias(name))
    return out.select(*proj)

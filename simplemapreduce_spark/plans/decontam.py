"""Benchmark decontamination + blocklist filtering — the two
training-data hygiene operators every large-scale corpus pipeline runs
before training (complementing the dedup stack in plans/dedup.py).

The reference has no notion of these (its only dataflow is
mapF -> shuffle -> reduceF, /root/reference/src/common/common_map.go:59,
common_reduce.go:51); they are extension scope per BASELINE.json.

Scale design:

* Decontamination joins the CORPUS against the BENCHMARK n-gram set.
  The benchmark side is tiny (eval suites are MBs against a 100 TB
  corpus) -> broadcast hash join; the corpus side builds its n-grams
  row-locally (transform over the token array, no shingle-level
  shuffle on the big side until the single count aggregation, which
  is partial-agg friendly).
* Blocklist filtering is a broadcast LEFT ANTI join — the canonical
  "drop rows whose key appears in a small deny-set" shape; at 100 TB
  it is a map-side filter with zero shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simplemapreduce_spark.catalog import query
from simplemapreduce_spark.plans.dedup import _SQL_DOC_SHINGLES, doc_shingle_arrays
from simplemapreduce_spark.sources.tables import load_table

# Deterministic stand-in for a benchmark/eval set: every 10th document.
# A real pipeline would read the benchmark suite from its own table;
# the split rule is hash-free so both engines agree trivially.
_EVAL_PRED = "doc_id % 10 = 0"
_TRAIN_PRED = "doc_id % 10 <> 0"

CONTAMINATION_THRESHOLD = 0.2


@query(
    "q_decontaminate_ngram",
    oracle=f"""
    WITH doc_sh AS ({_SQL_DOC_SHINGLES}),
    eval_grams AS (
      SELECT DISTINCT unnest(arr) AS shingle FROM doc_sh WHERE {_EVAL_PRED}
    ),
    train AS (
      SELECT doc_id, len(arr) AS n_grams, unnest(arr) AS shingle
      FROM doc_sh WHERE {_TRAIN_PRED}
    )
    SELECT t.doc_id,
           ANY_VALUE(t.n_grams) AS n_grams,
           COUNT(e.shingle) AS n_overlap,
           ROUND(CAST(COUNT(e.shingle) AS DOUBLE) / ANY_VALUE(t.n_grams), 6)
             AS contamination,
           CAST(COUNT(e.shingle) AS DOUBLE) / ANY_VALUE(t.n_grams)
             >= {CONTAMINATION_THRESHOLD} AS contaminated
    FROM train t LEFT JOIN eval_grams e ON t.shingle = e.shingle
    GROUP BY t.doc_id
    """,
)
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by distinct word-3-gram overlap: for
    every training document, the fraction of its distinct n-grams that
    also appear in the eval set (docs ``doc_id % 10 == 0`` stand in
    for the benchmark suite). Docs at/above the threshold are flagged
    for removal — the GPT-3/PaLM-style n-gram filter.

    Plan: benchmark n-gram set deduped then BROADCAST; corpus n-grams
    built row-locally (plans/dedup.py doc_shingle_arrays — no shuffle),
    one explode, broadcast left join, single partial-agg count per doc.
    The corpus is touched by exactly one shuffle (the final groupBy),
    which AQE coalesces; nothing scales with |corpus| x |benchmark|.
    """
    doc_sh = doc_shingle_arrays(spark, sf_dir)
    eval_grams = (
        doc_sh.filter(F.expr(_EVAL_PRED))
        .select(F.explode("arr").alias("shingle"))
        .distinct()
    )
    train = doc_sh.filter(F.expr(_TRAIN_PRED)).select(
        "doc_id", F.size("arr").alias("n_grams"), F.explode("arr").alias("shingle")
    )
    hit = F.count(F.col("e.shingle"))
    frac = hit.cast("double") / F.first("n_grams")
    return (
        train.join(
            F.broadcast(eval_grams.alias("e")),
            train["shingle"] == F.col("e.shingle"),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").alias("n_grams"),
            hit.alias("n_overlap"),
            F.round(frac, 6).alias("contamination"),
            (frac >= CONTAMINATION_THRESHOLD).alias("contaminated"),
        )
    )


BLOCKLIST = ("src7", "src13", "src19")


@query(
    "q_curation_blocklist",
    oracle=f"""
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE source NOT IN {BLOCKLIST!r}
    GROUP BY source
    """,
)
def q_curation_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source blocklist filter: drop every document whose source
    is on a deny-list, then report the surviving per-source volume.

    The blocklist is a DataFrame (not an inlined literal) joined with
    a broadcast LEFT ANTI join — the shape that still works when the
    deny-list is 100k domains loaded from a file rather than 3 inline
    strings; Catalyst turns it into a map-side hash filter with zero
    shuffle of the corpus."""
    d = load_table(spark, sf_dir, "documents")
    deny = spark.createDataFrame([(s,) for s in BLOCKLIST], "source string")
    return (
        d.join(F.broadcast(deny), "source", "left_anti")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )

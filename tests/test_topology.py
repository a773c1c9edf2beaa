"""Topology matrix (SURVEY.md §5.3.3, mirroring the reference's
sequential/parallel test split and its nReduce variations): results
must be identical under different shuffle-partition counts — the Spark
analogue of the reference running the same job with nReduce ∈ {1,3,10}
(/root/reference/src/mapreduce/sequential_test.go:8-22).

Determinism-under-recompute doubles as the fault-tolerance analogue
(§5.3.4): Spark recovers from task loss by deterministic recompute, so
a plan that yields identical results across runs and partitionings is
exactly a plan that survives retries.
"""

from __future__ import annotations

import pytest

from simplemapreduce_spark import catalog

catalog.load_all()

MATRIX_QUERIES = ["mr_word_count", "q1_pricing_summary", "q_dedup_exact"]


def _rows(spark, name, sf_dir):
    df = catalog.QUERIES[name](spark, sf_dir)
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", MATRIX_QUERIES)
def test_results_invariant_under_shuffle_partitions(spark, sf_dir, name):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for n in ("1", "3", "10"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(_rows(spark, name, sf_dir))
        assert results[0] == results[1] == results[2]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_repeated_runs_deterministic(spark, sf_dir):
    a = _rows(spark, "mr_word_count", sf_dir)
    b = _rows(spark, "mr_word_count", sf_dir)
    assert a == b

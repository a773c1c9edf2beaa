"""pyspark.ml-backed LSH operators — the library alternative to the
hand-rolled deterministic MinHash/sign-bucket pipelines in
plans/dedup.py and plans/similarity.py.

These are seeded (deterministic per run) but their hash families are
JVM-internal, so there is no DuckDB-expressible oracle — the catalog
registers them as rows-only checks, and tests assert agreement with
the exact baselines instead (recall >= threshold), which is the
meaningful property of an approximate index.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simplemapreduce_spark.catalog import query
from simplemapreduce_spark.plans.dedup import doc_shingle_arrays
from simplemapreduce_spark.sources.tables import load_table

SEED = 42


def _shingle_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents as sparse binary shingle-presence vectors (HashingTF
    with binary=True over the row-local distinct word-3-gram shingle
    arrays — no shuffle before the LSH fit)."""
    sh = doc_shingle_arrays(spark, sf_dir).withColumnRenamed("arr", "shingles")
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    return tf.transform(sh)


@query("q_ml_minhash_lsh")  # rows-only: JVM-internal hash family
def q_ml_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH approxSimilarityJoin near-dup pairs at Jaccard
    distance <= 0.5 (seeded; deterministic across runs)."""
    vecs = _shingle_vectors(spark, sf_dir)
    model = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=SEED).fit(
        vecs
    )
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(F.col("jaccard_dist"), 6).alias("jaccard_dist"),
        )
    )


@query("q_ml_brp_lsh")  # rows-only: JVM-internal random projections
def q_ml_brp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH approx nearest neighbors over the
    embedding vectors (Euclidean), seeded."""
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=SEED
    ).fit(e)
    queries = e.filter(F.col("vec_id") < 5)
    joined = model.approxSimilarityJoin(queries, e, 15.0, distCol="l2_dist")
    return (
        joined.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.round(F.col("l2_dist"), 4).alias("l2_dist"),
        )
    )

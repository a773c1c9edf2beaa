"""Text-file sources reproducing the reference's input surface.

The reference reads each input file fully into memory and hands
``(filename, contents)`` to the user map function
(/root/reference/src/common/common_map.go:59-71). Spark equivalents:

* line-oriented: ``spark.read.text`` — distributed, splittable; the
  right default for large corpora.
* whole-file contract: ``wholeTextFiles`` — preserves the exact
  (filename, contents) pairs when a mapF genuinely needs file scope.
  Non-splittable per file, so only for many-small-files layouts
  (which is precisely the reference's model: one map task per file,
  /root/reference/src/mapreduce/master.go:40).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WHOLE_FILE_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("contents", T.StringType(), True),
    ]
)


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per line, column ``value: string`` (splittable scan)."""
    return spark.read.text(path)


def read_whole_files(spark: SparkSession, path: str, min_partitions: int | None = None) -> DataFrame:
    """One row per file: ``(filename, contents)`` — the exact shape the
    reference's mapF consumes. Implemented on wholeTextFiles because no
    DataFrame reader exposes per-file grouping."""
    sc = spark.sparkContext
    rdd = sc.wholeTextFiles(path, min_partitions) if min_partitions else sc.wholeTextFiles(path)
    return spark.createDataFrame(rdd, WHOLE_FILE_SCHEMA)

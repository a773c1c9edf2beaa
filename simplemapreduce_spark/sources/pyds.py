"""Custom connector via Spark 4's Python Data Source API — the
extension point a user reaches for when a corpus lives in a system
Spark has no built-in reader for (an internal doc store, a feed API, a
bespoke archive format).

The reference's only extensibility was "write a different mapF"
(/root/reference/src/common/common_map.go:64); the Spark-native
equivalent of adding an input system is a DataSource with planned
input partitions, so reads parallelize and Catalyst sees a normal
relation (prunable, filterable, joinable).

``SyntheticDocsDataSource`` is deliberately deterministic — seq id,
md5 content tag, round-robin shard label per partition — so the full
reader path (partition planning → per-partition iterators → schema
mapping) is value-checkable against a DuckDB oracle, not just
smoke-run.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Range(InputPartition):
    def __init__(self, start: int, end: int, shard: int):
        self.start = start
        self.end = end
        self.shard = shard


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        step = -(-self.n // self.parts)
        return [
            _Range(lo, min(lo + step, self.n), i)
            for i, lo in enumerate(range(0, self.n, step))
        ]

    def read(self, partition: _Range):
        import hashlib

        for i in range(partition.start, partition.end):
            yield (i, hashlib.md5(f"doc-{i}".encode()).hexdigest(), partition.shard)


class SyntheticDocsDataSource(DataSource):
    """spark.read.format("synthetic_docs").option("n", N) source."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "seq_id bigint, content_tag string, shard int"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotent registration on any session (driver sessions too)."""
    spark.dataSource.register(SyntheticDocsDataSource)

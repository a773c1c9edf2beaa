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



N_STREAM_TOTAL = 100
STREAM_STEP = 30


def make_counter_stream_datasource():
    """Streaming Python DataSource (Spark 4 simpleStreamReader API) —
    the micro-batch twin of SyntheticDocsDataSource. Deterministic
    integer sequence: row i carries (i, i % 5, (i*i) % 97); offsets
    are plain {"i": n} dicts; read() serves STREAM_STEP rows per
    micro-batch until N_STREAM_TOTAL then returns empty batches — a
    replayable, engine-independent source whose full drain is
    SQL-expressible (DuckDB range()), giving the Python streaming
    source path an exact oracle. Built lazily inside a function so
    the class object (captured by the streaming runtime) is fresh per
    registration."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class _CounterStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            s = int(start["i"])
            e = min(s + STREAM_STEP, N_STREAM_TOTAL)
            return iter([(i, i % 5, (i * i) % 97) for i in range(s, e)]), {"i": e}

        def readBetweenOffsets(self, start, end):
            return iter(
                [(i, i % 5, (i * i) % 97) for i in range(int(start["i"]), int(end["i"]))]
            )

    class CounterStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "smr_counter_stream"

        def schema(self) -> str:
            return "i bigint, key bigint, value bigint"

        def simpleStreamReader(self, schema):
            return _CounterStreamReader()

    return CounterStreamDataSource

"""Custom connector via the Spark 4 Python DataSource API — the lane
for reading a format Spark has no built-in source for (proprietary
logs, an internal feature store, an HTTP-paged API) without writing a
JVM connector.

The demo source is a DETERMINISTIC sequence generator: every row is a
pure function of its global row id (MINSTD hash arithmetic, the same
portable constants as operators/sampling.py), so the source's output
is exactly reproducible in ANSI SQL (``range()`` + identical
arithmetic) and the whole connector is hash-checkable end-to-end
(q138) — the property a real connector gets from replaying stable
upstream data.

Scale contract: ``partitions()`` returns one InputPartition per chunk;
Spark schedules each to an executor, where ``read()`` yields tuples —
parallelism is the partition count, no driver materialization. A real
connector would put its split planning (file ranges, page tokens,
shard ids) in ``partitions()`` and its decode loop in ``read()``.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_P = 1_000_000_007
_A = 48_271


class SeqGenDataSource(DataSource):
    """``spark.read.format("seqgen").option("rows", N)
    .option("partitions", K).load()``"""

    @classmethod
    def name(cls) -> str:
        return "seqgen"

    def schema(self) -> str:
        return "id bigint, bucket int, val double"

    def reader(self, schema) -> "SeqGenReader":
        return SeqGenReader(
            int(self.options.get("rows", 1000)),
            int(self.options.get("partitions", 4)),
        )


class SeqGenReader(DataSourceReader):
    def __init__(self, rows: int, partitions: int) -> None:
        self.rows = rows
        self.n_parts = partitions

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        per = -(-self.rows // self.n_parts)  # ceil
        start = partition.value * per
        for i in range(start, min(start + per, self.rows)):
            h = ((i % _P) * _A) % _P
            yield (i, h % 10, h / _P)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SeqGenDataSource)

"""Custom Python Data Source (Spark 4 DataSource API).

The reference's only "source" is an S3 listing loop
(parser_pinecone_storage.py:41-46). Spark's answer to a custom feed is
a DataSource subclass: the engine registers `synthetic_docs`, a
deterministic document generator that shows the full surface — schema
declaration, partition planning (each partition generates its id range
independently, so a 1000-executor cluster fans out with zero driver
involvement), and per-partition readers.

Determinism: content derives from the row id only (no RNG, no clock),
so the DuckDB oracle can reproduce every row with generate_series —
the custom source is hash-match checkable like any other operator.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("n_tokens", LongType()),
    ]
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 100))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        step = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _RangePartition(i * step, min((i + 1) * step, self.n_rows))
            for i in range(self.n_parts)
            if i * step < self.n_rows
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            reps = i % 5 + 1
            text = " ".join([f"doc_{i}"] * reps)
            yield (i, text, reps)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SyntheticDocsReader(self.options)

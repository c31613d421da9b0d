"""Custom Python data source (Spark 4 DataSource API).

The reference's only ingestion surface is the Arrow C stream capsule
(`bearly_ext.cc:9-24` — anything exposing ``__arrow_c_stream__``); its
producers fabricate literal tables in code (`bearly_ext.cc:113-214`).
The Spark-4-native generalization of "a programmatic table producer" is a
registered python data source: ``spark.read.format("synthetic_docs")``
with options, planned and executed BY Spark — partitioned, pushdown-aware
at the option level, usable from SQL.

``SyntheticDocsDataSource`` generates a deterministic synthetic document
corpus (seeded per partition — same rows for a given (n_rows, n_parts,
seed) regardless of cluster size or task retries, which is what makes a
generator source usable in tests and backfills at scale). Each partition
generates only its own id range: no driver-side materialization, no
shuffle — the source parallelizes like a parquet scan.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_WORDS = (
    "data table query scan filter join group agg window sort hash merge "
    "stream batch row column vector spark fast slow big small key value"
).split()


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(lo, min(lo + per, self.n_rows), self.seed)
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition):
        # Per-row seeding keeps output identical under retries/re-splits.
        import random

        for doc_id in range(partition.start, partition.end):
            rng = random.Random((partition.seed << 32) ^ doc_id)
            n_words = rng.randint(10, 60)
            text = " ".join(rng.choice(_WORDS) for _ in range(n_words))
            yield (doc_id, text, n_words)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
                StructField("n_words", IntegerType()),
            ]
        )

    def reader(self, schema):
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)

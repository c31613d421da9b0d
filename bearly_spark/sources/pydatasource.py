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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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


def _gen_row(seed: int, doc_id: int):
    """One deterministic synthetic row. Shared by the batch partitions
    and the streaming batches so stream output == batch output for the
    same id range (pinned by tests)."""
    import random

    rng = random.Random((seed << 32) ^ doc_id)
    n_words = rng.randint(10, 60)
    text = " ".join(rng.choice(_WORDS) for _ in range(n_words))
    return (doc_id, text, n_words)


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
        for doc_id in range(partition.start, partition.end):
            yield _gen_row(partition.seed, doc_id)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the generator (Spark 4 python streaming data
    source API): each micro-batch emits the next ``rows_per_batch`` ids,
    the offset is just ``{"next": <first unemitted id>}``, and
    ``readBetweenOffsets`` regenerates any offset range deterministically
    — which is exactly what gives the source exactly-once REPLAY under
    checkpoint recovery (the same contract a Kafka offset range
    provides)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"next": 0}

    def _rows(self, start: int, end: int):
        return [_gen_row(self.seed, i) for i in range(start, end)]

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return iter(self._rows(lo, hi)), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["next"], end["next"]))


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

    def simpleStreamReader(self, schema):
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)

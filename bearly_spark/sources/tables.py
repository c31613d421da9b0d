"""Parquet sources for the driver fixture tables (TESTDATA.md).

All tables are plain parquet scans — Catalyst pushes filters and prunes
columns into the scan (verify with ``df.explain``: ``PushedFilters`` /
``ReadSchema``).  At 100 TB the same code path applies; the only knobs that
change are ``spark.sql.files.maxPartitionBytes`` and the partition layout
of the table directory.

Special case: ``events.ts``. The driver fixture has shipped it both as
parquet ``TIMESTAMP(NANOS)`` (which Spark 4 can only read as raw int64 via
``spark.sql.legacy.parquet.nanosAsLong``) and as ``TIMESTAMP(MICROS)``
(a real Spark timestamp). ``load_table`` normalizes either representation
to the engine-wide contract: **``ts`` is int64 epoch-nanoseconds** (UTC).
Integer bucket math on the raw nanos is both exact and cheaper than
timestamp arithmetic, so batch window queries use the long directly;
``events_with_timestamp`` derives a real timestamp column when one is
needed. DuckDB oracles use ``epoch_ns(ts)``, which yields the same nanos
for either on-disk representation.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType

from bearly_spark.session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Coerce an events frame's ``ts`` to int64 epoch-nanos in place
    (column order preserved). Timestamp columns (the TIMESTAMP(MICROS)
    fixture) convert exactly via ``unix_micros * 1000``; long columns
    (the TIMESTAMP(NANOS)+nanosAsLong fixture) pass through untouched."""
    if "ts" not in df.columns or isinstance(df.schema["ts"].dataType, LongType):
        return df
    return df.withColumn(
        "ts", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("long")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. For ``events``, ``ts`` is int64 epoch-nanos."""
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def events_with_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_ts`` = proper timestamp column (microsecond
    truncation of the stored nanoseconds; session tz is UTC)."""
    ev = load_table(spark, sf_dir, "events")
    # Integer division, not `/ 1000`: double division of epoch-nanos (~2^60)
    # carries ~0.125 absolute rounding error, enough to push an event within
    # ~1us of a window boundary into the wrong window.
    return ev.withColumn("ts_ts", F.timestamp_micros(F.expr("ts DIV 1000")))

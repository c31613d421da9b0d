"""External connectors: JDBC (batch) and Kafka (streaming).

The reference has no connectors (SURVEY §2.2 'Connectors' row); these are
the standard Spark surfaces, wrapped with the partitioning options that
matter at scale. The JDBC path is verified END TO END against embedded
Derby (the in-JVM database Spark itself ships for its Hive metastore —
``derby-*.jar`` is already on the classpath, no server needed): see
``tests/test_jdbc_derby.py`` for the write → striped parallel read →
DuckDB oracle comparison. Kafka stays argument-contract-only (no broker
or spark-sql-kafka package in this container).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    predicates: list[str] | None = None,
    **options: str,
) -> DataFrame:
    """Parallel JDBC scan.

    Scale rules encoded here: a JDBC read without ``partition_column`` (or
    ``predicates``) runs on ONE task regardless of cluster size — always
    stripe by a numeric/temporal column (or mutually-exclusive predicate
    list); ``fetch_size`` defaults far above most drivers' row-at-a-time
    default. Pushed filters/projections still apply on top (Spark emits
    WHERE/SELECT into the generated queries).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table).option(
        "fetchsize", str(fetch_size)
    )
    if predicates is not None:
        # one partition per predicate — the predicates must be disjoint
        return spark.read.jdbc(url, table, predicates=predicates, properties=dict(options))
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: str | None = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka streaming source → (key, value[, parsed]) DataFrame.

    ``max_offsets_per_trigger`` bounds micro-batch size (backpressure —
    without it a backlogged topic makes the first batch arbitrarily
    large). Parallelism = topic partitions; repartition downstream if the
    topic has fewer partitions than the cluster has cores. Requires the
    spark-sql-kafka package on the classpath (not present in this
    container — call sites must handle the data-source-not-found error).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    out = raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )
    if value_schema is not None:
        out = out.withColumn("parsed", F.from_json(F.col("value"), value_schema))
    return out


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "error",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    **options: str,
) -> None:
    """JDBC sink. ``batch_size`` controls rows per INSERT batch (the same
    order-of-magnitude rule as ``fetch_size`` on the read side); writers
    run one connection per partition, so ``num_partitions`` caps the
    connection count against the database (coalesce before fan-in —
    a 1000-task write is a 1000-connection storm)."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()

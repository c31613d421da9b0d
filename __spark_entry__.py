"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``bearly_spark`` package; this module is a
thin adapter over ``bearly_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the reference's flagship operator (columnwise int64 SUM,
    bearly_ext.cc:26-90) over the lineitem fact table.
    """
    from bearly_spark.registry import QUERIES

    return QUERIES["sum_lineitem_int64"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.3."""
    from bearly_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query.

    Round 3 closed most of the formerly rows-only surface: the
    hyperplane-LSH family (embedding_ann_lsh, embedding_near_dup) twins
    inline the deterministic plane matrix as SQL literals, and the
    winnowing fingerprint twin re-computes the rolling hash in HUGEINT
    arithmetic. Round 5 added the IVF twin (the seeded k-means fit runs
    HERE, lazily, and its centroids are inlined as SQL literals — see
    registry.similarity_q._ivf_oracle). Keys still absent are
    non-SQL-expressible by
    design — engine-specific sketch bytes (HLL, approx-percentile) —
    and take the driver's rows-only check; their semantics are pinned
    by planted-fixture tests in tests/ instead.
    """
    from bearly_spark.registry import ORACLE

    return {k: (v() if callable(v) else v) for k, v in ORACLE.items()}

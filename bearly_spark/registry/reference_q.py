"""Reference-parity surface (SURVEY §2.1): the bearly sum/produce API over Arrow interchange.

Split from the original flat registry.py by tools/split_registry.py
(chunks keep original line order, so comments stay with their
statements and helpers precede their consumers).
"""

from __future__ import annotations

import datetime
import math
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bearly_spark.operators import dedup as D
from bearly_spark.operators import maintenance as MT
from bearly_spark.operators import multimodal as M
from bearly_spark.operators import relational as R
from bearly_spark.operators import rounding as _R
from bearly_spark.operators import similarity as S
from bearly_spark.operators import text as T
from bearly_spark.operators import windows as W
from bearly_spark.operators.aggregate import grouped_agg, sum_int64
from bearly_spark.producers import produce_array, produce_stream
from bearly_spark.sources.tables import events_with_timestamp, load_table

from bearly_spark.registry._core import ORACLE, QUERIES, register  # noqa: F401


# ===================================================================
# Reference-parity surface (SURVEY §2.1)
# ===================================================================


@register(
    "sum_lineitem_int64",
    oracle="""
    SELECT CAST(COALESCE(SUM(l_orderkey), 0) AS BIGINT) AS l_orderkey,
           CAST(COALESCE(SUM(l_partkey), 0) AS BIGINT)  AS l_partkey,
           CAST(COALESCE(SUM(l_suppkey), 0) AS BIGINT)  AS l_suppkey
    FROM lineitem
    """,
)
def q_sum_lineitem(spark, sf_dir):
    """Flagship: the reference's sum over every int64 column of lineitem
    (type-gated projection O2 + columnar sum O3, bearly_ext.cc:26-90)."""
    return sum_int64(load_table(spark, sf_dir, "lineitem"))


@register(
    "produce_array",
    oracle="SELECT * FROM (VALUES (42), (555), (NULL)) t(awesome_numbers)",
)
def q_produce_array(spark, sf_dir):
    return produce_array(spark)


@register(
    "produce_stream",
    oracle="""
    SELECT * FROM (VALUES (CAST(42 AS INTEGER), CAST(555 AS BIGINT)),
                          (84, 1110), (NULL, NULL)) t(column0, column1)
    """,
)
def q_produce_stream(spark, sf_dir):
    return produce_stream(spark)


@register(
    "sum_produce_stream",
    oracle="SELECT CAST(1665 AS BIGINT) AS column1",
)
def q_sum_produce_stream(spark, sf_dir):
    """Golden-pin: sum(produce_stream()) drops the int32 column and null
    counts as 0 → one row {column1: 1665} (reference test semantics)."""
    return sum_int64(produce_stream(spark))

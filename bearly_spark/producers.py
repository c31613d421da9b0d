"""Literal producers — reference operators O6 and O7.

The reference exports two fixed literal producers used to demonstrate the
Arrow C Data/Stream interfaces:

- ``bearly.produce_array()`` (``bearly_ext.cc:113-157``): one int64 column
  ``awesome_numbers`` = ``[42, 555, NULL]``.
- ``bearly.produce_stream()`` (``bearly_ext.cc:159-214``): a 2-column
  3-row table ``{column0: int32, column1: int64}`` =
  ``(42,555), (84,1110), (NULL,NULL)``.

Here they are DataFrames with the identical schema/values; ``to_arrow``
(interchange.py) restores capsule-level compatibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

ARRAY_SCHEMA = StructType([StructField("awesome_numbers", LongType(), True)])

STREAM_SCHEMA = StructType(
    [
        StructField("column0", IntegerType(), True),
        StructField("column1", LongType(), True),
    ]
)


def produce_array(spark: SparkSession) -> DataFrame:
    """Single int64 column ``awesome_numbers`` = [42, 555, NULL]
    (``bearly_ext.cc:115-129``)."""
    return spark.createDataFrame([(42,), (555,), (None,)], ARRAY_SCHEMA)


def produce_stream(spark: SparkSession) -> DataFrame:
    """2-column literal table ``(int32 column0, int64 column1)`` with rows
    ``(42,555), (84,1110), (NULL,NULL)`` (``bearly_ext.cc:161-191``)."""
    rows = [(42, 555), (84, 1110), (None, None)]
    return spark.createDataFrame(rows, STREAM_SCHEMA)

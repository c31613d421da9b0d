"""Window-function operators (SURVEY §2.2 'Window functions' row).

All are single-shuffle (partition keys) + per-partition sort; frames are
running (rows-between) so state is O(1) per row at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def running_sum(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value: Column,
    out_col: str,
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value).over(w))


def lag_lead_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value: Column,
    out_prev: str = "prev_value",
    out_next: str = "next_value",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out_prev, F.lag(value).over(w)).withColumn(
        out_next, F.lead(value).over(w)
    )


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """row_number / rank / dense_rank in one pass (shared window spec)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("row_number", F.row_number().over(w))
        .withColumn("rank", F.rank().over(w))
        .withColumn("dense_rank", F.dense_rank().over(w))
    )


def rolling_range_sum(
    df: DataFrame,
    partition_by: Sequence[str],
    order_col: Column,
    value: Column,
    preceding_range: int,
    out_col: str,
) -> DataFrame:
    """Value-based rolling frame: sum over rows whose ``order_col`` lies in
    ``[current - preceding_range, current]`` (rangeBetween, not rowsBetween
    — frame membership follows the ordering VALUE, so irregular event
    spacing is handled correctly). Single shuffle on the partition keys."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(order_col)
        .rangeBetween(-preceding_range, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value).over(w))

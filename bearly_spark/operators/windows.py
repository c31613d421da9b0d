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


def interpolate_linear(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    t: Column,
    value: Column,
    out_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Linearly interpolate NULL gaps in a per-key time series — the
    repair face of time-series work beside gap-FILL (``calendar_fill``
    inserts missing rows; this fills missing VALUES on existing rows):
    sensor dropouts, failed quality-score batches, partial backfills.

    For each row where ``value`` is NULL, finds the nearest non-null
    neighbors before and after (ignore-nulls running window, O(1) state
    per row) and interpolates on the numeric time axis ``t``:
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)``.
    Leading/trailing gaps (no neighbor on one side) stay NULL —
    extrapolation is a policy decision, not a default. Non-null rows
    pass through (rounded to the same ``decimals`` so the column is
    uniformly comparable).

    One shuffle on the partition keys + one per-partition sort serving
    two frames; at 100 TB this is per-key (embarrassingly parallel
    across keys) with spill-safe window sort. The arithmetic shape is
    fixed (same IEEE expression tree both engines) so a DuckDB twin
    matches exactly at ``decimals`` rounding.
    """
    wprev = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wnext = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    t_of_v = F.when(value.isNotNull(), t)
    out = (
        df.withColumn("_pv", F.last(value, ignorenulls=True).over(wprev))
        .withColumn("_pt", F.last(t_of_v, ignorenulls=True).over(wprev))
        .withColumn("_nv", F.first(value, ignorenulls=True).over(wnext))
        .withColumn("_nt", F.first(t_of_v, ignorenulls=True).over(wnext))
    )
    frac = (t - F.col("_pt")).cast("double") / (F.col("_nt") - F.col("_pt")).cast(
        "double"
    )
    interp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac
    return out.withColumn(
        out_col,
        F.round(F.when(value.isNotNull(), value).otherwise(interp), decimals),
    ).drop("_pv", "_pt", "_nv", "_nt")

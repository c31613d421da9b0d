"""Relational operators: filter/project, joins, set ops, sort/limit/top-k.

The reference has none of these (SURVEY §2.2) — this module is the
capability superset, kept as thin declarative wrappers so Catalyst gets an
unobstructed logical plan (predicate pushdown, column pruning, join
reordering, broadcast selection all apply).

Scale notes (100 TB posture):
- equi-joins of two fact tables shuffle on the join key — keep keys
  high-cardinality and let AQE's skew-join split hot keys;
- dimension joins should broadcast: ``join_broadcast`` forces the hint, and
  the session raises ``autoBroadcastJoinThreshold`` so Catalyst picks BHJ
  on its own for catalog-sized dims;
- top-k per group uses a rank-window; at scale, pre-aggregate or
  pre-filter before the window when the predicate allows.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def project_filter(df: DataFrame, cols: Sequence[str | Column], predicate: Column | None) -> DataFrame:
    """SELECT cols FROM df WHERE predicate — pushdown-friendly."""
    out = df
    if predicate is not None:
        out = out.filter(predicate)
    return out.select(*cols)


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Equi/theta join. ``how``: inner, left, right, full, left_semi,
    left_anti, cross."""
    return left.join(right, on=on, how=how)


def join_broadcast(left: DataFrame, right_small: DataFrame, on, how: str = "inner") -> DataFrame:
    """Join with an explicit broadcast hint on the (small) right side —
    shuffle-free on the big side."""
    return left.join(F.broadcast(right_small), on=on, how=how)


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def intersect(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.intersectAll(b) if all else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.exceptAll(b) if all else a.subtract(b)


def sort_limit(df: DataFrame, order: Sequence[Column], n: int | None = None) -> DataFrame:
    """Global sort (+ optional limit). With a limit, Spark runs TakeOrdered
    per-partition then merges k·p rows on the driver — no full sort."""
    out = df.orderBy(*order)
    return out.limit(n) if n is not None else out


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number window.

    One shuffle on the group keys; Spark's WindowGroupLimit pushes the
    ``rn <= k`` limit into the sort at the exec level (rank-limit
    optimization), so per-group state stays O(k).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)

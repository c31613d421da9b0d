"""Aggregation operators.

``sum_int64`` is the reference's flagship operator (O2+O3+O4,
``bearly_ext.cc:26-90``) with its exact semantics; the rest are the grouped
aggregation surface the reference lacks (SURVEY §2.2), expressed as thin
Catalyst-friendly wrappers.
"""

from __future__ import annotations

import functools

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import LongType

from bearly_spark.operators.rounding import floor_round


class NoSummableColumnsError(ValueError):
    """Raised when the input has no int64 columns.

    The reference emits a degenerate 0-column 1-row struct in this case
    (``bearly_ext.cc:44-56`` with ``n_children == 0``). Spark cannot
    represent a 0-column DataFrame, so — per SURVEY §2.1(5) — we pin the
    behavior as an explicit error instead.
    """


def summable_columns(df: DataFrame) -> list[str]:
    """Reference O2: type-gated projection — keep only int64 columns, in
    input-schema order (``bearly_ext.cc:26-40``). int32/double/string are
    dropped, never upcast."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, LongType)]


def sum_int64(df: DataFrame) -> DataFrame:
    """Columnwise SUM over all int64 columns → exactly one row (O3+O4).

    Semantics pinned by the reference golden test
    (``/root/reference/tests/test_bearly.py:23-39``) and SURVEY §2.1:

    1. nulls count as 0 (``value_or(0)``, ``bearly_ext.cc:72``) — an
       all-null column sums to 0, not NULL → ``coalesce(sum(c), 0)``;
    2. empty input yields one row of zeros, never zero rows (accumulators
       init to 0, ``bearly_ext.cc:35,83-88``) — Spark's global agg also
       emits exactly one row;
    3. only int64 columns participate (see :func:`summable_columns`);
    4. output preserves input column order and names;
    5. no int64 columns → :class:`NoSummableColumnsError` (see its doc);
    6. int64 overflow wraps (non-ANSI mode), matching C++ ``int64_t``.

    Execution: Tungsten partial+final HashAggregate — the distributed
    generalization of the reference's chunk-at-a-time partial-sum loop
    (``bearly_ext.cc:59-76``). No shuffle of row data: each partition
    emits one partial row, the final agg merges ~num_partitions rows.
    """
    cols = summable_columns(df)
    if not cols:
        raise NoSummableColumnsError(
            "input has no int64 columns; the reference would return a "
            "0-column 1-row struct, which Spark cannot represent"
        )
    return df.agg(*[F.coalesce(F.sum(c), F.lit(0).cast("long")).alias(c) for c in cols])


def grouped_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
    mode: str = "groupby",
) -> DataFrame:
    """Grouped aggregation with optional grouping-set expansion.

    ``mode``: ``groupby`` | ``rollup`` | ``cube``.  All three map to a
    single shuffle on the grouping keys with map-side partial aggregation;
    rollup/cube expand grouping sets before the shuffle (Catalyst `Expand`).
    """
    if mode == "groupby":
        grouped = df.groupBy(*keys)
    elif mode == "rollup":
        grouped = df.rollup(*keys)
    elif mode == "cube":
        grouped = df.cube(*keys)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return grouped.agg(*aggs)


def exact_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[float],
    names: Sequence[str] | None = None,
    decimals: int = 4,
    scale: int | None = None,
) -> DataFrame:
    """Exact linear-interpolation percentiles per group (the quantile_cont
    definition) via a rank window instead of ``F.percentile``.

    ``F.percentile`` buffers every group value in the aggregation buffer —
    O(group size) driver-of-OOM memory and no spill. This form does ONE
    shuffle+external-sort per group (Tungsten window sort, spills to disk),
    then picks the two straddling ranks per quantile and interpolates:
    h = (n-1)*q; p = v[floor(h)] + (h - floor(h)) * (v[ceil(h)] - v[floor(h)]).

    Parallelism is bounded by group cardinality (inherent to exact
    per-group quantiles); at 100 TB with few groups prefer
    ``approx_percentile`` (t-digest, mergeable partial aggregates).

    NULLs in ``value_col`` are EXCLUDED before ranking — the
    quantile_cont contract (DuckDB/ANSI aggregate null semantics).
    Without the filter, nulls-first ordering would occupy the lowest
    ranks and shift or NULL every quantile (review catch, round 6).
    One documented deviation: a group whose values are ALL null is
    absent from the output (quantile_cont would keep the group with a
    NULL quantile); no fixture column hits this.

    Determinism (round 8): NO IEEE arithmetic touches the emitted
    value. Interpolated quantiles of 2dp prices land EXACTLY on 4dp
    midpoints ((a+b)/2 with a, b one cent apart), where plain ROUND
    and the floor form alike are engine/build-defined (the round-7
    driver failure class). So each quantile ``q = a/b`` (an exact
    small fraction) selects its straddling order statistics by exact
    integer index ``lo = ((n−1)·a) div b, r = ((n−1)·a) mod b``, the
    interpolated value is the exact rational
    ``(lo_val·(b−r) + hi_val·r) / (b·10^v)`` over ``10^v``-scaled
    integer values (v = the column's decimal scale), and the
    ``decimals``-dp emission is ``rounding.rational_round`` — integral
    division, then one IEEE division of the same exact integer in
    every engine. The oracle twin replays the identical index/
    interpolation arithmetic (``_shared.quantile_cuts_sql``) instead
    of ``quantile_cont``.
    """
    from fractions import Fraction

    from pyspark.sql import Window
    from pyspark.sql.types import DecimalType, DoubleType, FloatType

    from bearly_spark.operators.rounding import rational_round

    df = df.filter(F.col(value_col).isNotNull())
    names = list(names or [f"p{int(q * 100)}" for q in quantiles])
    in_type = df.schema[value_col].dataType
    # Scaling: the order statistics become exact 10^scale-scaled
    # integers. DECIMAL columns use their own scale; integral columns
    # 0; float/double columns snap to `scale` dp (default 2 — the
    # fixtures' price columns are 2dp values stored as doubles; pass
    # `scale` explicitly for finer-grained float data). The twin must
    # use the SAME scale (``quantile_cuts_sql(..., scale=...)``).
    if scale is not None:
        v = scale
    elif isinstance(in_type, DecimalType):
        v = in_type.scale
    elif isinstance(in_type, (DoubleType, FloatType)):
        v = 2
    else:
        v = 0
    sval = (F.col(value_col).cast(f"decimal(38,{v})") * F.lit(10**v)).cast(
        "decimal(38,0)"
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("_sv").asc())
    wn = Window.partitionBy(*group_cols)
    ranked = df.select(*group_cols, sval.alias("_sv")).withColumn(
        "_rn", F.row_number().over(w) - F.lit(1)
    ).withColumn("_n", F.count(F.lit(1)).over(wn))

    fracs = [Fraction(q).limit_denominator(10**6) for q in quantiles]
    aggs = []
    for fr, name in zip(fracs, names):
        a, b = fr.numerator, fr.denominator
        num = (F.col("_n") - 1).cast("long") * F.lit(a)
        lo_idx = F.call_function("div", num, F.lit(b).cast("long"))
        hi_idx = lo_idx + F.when(num % b > 0, F.lit(1)).otherwise(F.lit(0))
        aggs += [
            F.max(F.when(F.col("_rn") == lo_idx, F.col("_sv"))).alias(f"_lo_{name}"),
            F.max(F.when(F.col("_rn") == hi_idx, F.col("_sv"))).alias(f"_hi_{name}"),
        ]
    agged = ranked.groupBy(*group_cols).agg(F.max("_n").alias("_n"), *aggs)

    out_cols = list(group_cols)
    for fr, name in zip(fracs, names):
        a, b = fr.numerator, fr.denominator
        r = ((F.col("_n") - 1).cast("long") * F.lit(a)) % b
        val_num = F.col(f"_lo_{name}") * (F.lit(b) - r) + F.col(f"_hi_{name}") * r
        out_cols.append(
            rational_round(val_num, F.lit(b * 10**v), decimals).alias(name)
        )
    return agged.select(*out_cols)


def bucket_assign(value: Column, cut_names: Sequence[str]) -> Column:
    """THE cutpoint-bucket rule shared by the equi-depth histogram, the
    drift report and RFM scoring: ``1 + #(cutpoints < value)`` — ties
    stick to the lower bucket. One definition so the rounding/tie
    contract can never silently diverge between the operators that
    promise identical bucketing across engines. ``value`` must be
    non-null (callers filter or guarantee it; a NULL value would
    silently land in bucket 1)."""
    return functools.reduce(
        lambda acc, n: acc + F.when(value > F.col(n), 1).otherwise(0),
        cut_names,
        F.lit(1),
    )


def equi_depth_histogram(
    df: DataFrame, value_col: str, buckets: int = 8, decimals: int = 4
) -> DataFrame:
    """Equi-DEPTH (quantile-bucket) histogram — the distribution profile
    dual of the equi-width form (``histogram_prices_orders``): bucket
    boundaries are the exact k/B quantiles, so every bucket holds
    ~1/B of the rows regardless of skew (an equi-width histogram of a
    heavy-tailed column puts 99% of rows in bucket 1; this one never
    does). The optimizer-statistics / data-profiling primitive.

    Cutpoints come from :func:`exact_percentiles` (spill-safe rank
    window, quantile_cont definition — already twin-proven), rounded to
    ``decimals`` BEFORE assignment so both engines compare against
    bit-identical boundaries; a row lands in bucket
    ``1 + #(cutpoints < value)`` (ties stick to the lower bucket, so
    heavy duplicate values keep one bucket — depth is then approximate
    under ties, which is inherent to any deterministic rule).

    Scale shape: one rank-window pass for the B-1 cutpoints, then the
    1-row cutpoint frame broadcast-crossJoins the scan and the
    assignment is a map-only expression into a B-row groupBy — the
    same two-pass shape as the equi-width form, dominated by the
    quantile sort (at 100 TB swap in approx_percentile cutpoints, same
    assignment logic).

    NULL values are EXCLUDED (consistent with the cutpoints, which
    quantile_cont derives over non-null values only; without the
    filter every NULL row would silently land in bucket 1 — review
    catch, round 6).
    """
    qs = [k / buckets for k in range(1, buckets)]
    names = [f"_c{k}" for k in range(1, buckets)]
    df = df.filter(F.col(value_col).isNotNull())
    cuts = exact_percentiles(df, [], value_col, qs, names=names, decimals=decimals)
    v = F.col(value_col)
    bucket = bucket_assign(v, names).alias("bucket")
    return (
        df.crossJoin(F.broadcast(cuts))
        .groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min(v), 2).alias("min_v"),
            F.round(F.max(v), 2).alias("max_v"),
        )
    )

"""Window-function operators (SURVEY §2.2 'Window functions' row).

All are single-shuffle (partition keys) + per-partition sort; frames are
running (rows-between) so state is O(1) per row at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from bearly_spark.operators.rounding import floor_round


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


def rolling_zscore(
    df: DataFrame,
    order_col: str,
    value_col: str,
    n: int = 7,
    z_thresh: float = 2.5,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Trailing-window z-score anomaly detection over an ordered series:
    each row's value is scored against the mean/std of the PREVIOUS
    ``n`` rows (the trailing baseline — the row never scores against
    itself). Rows without a full lookback window report NULL z.

    ``value_col`` must already be exact (DECIMAL) — the window sums are
    then exact and order-independent, and the z arithmetic is a FIXED
    tree of IEEE double ops on those exact sums (single division /
    sqrt / subtraction each), so any engine reproduces the same 6dp
    z bit-for-bit. A zero-variance baseline reports NULL z (no scale,
    no verdict — not ±inf). Output adds (prev_n, z, is_anomaly).

    Scale shape: one shuffle on the partition keys + per-partition
    sort; the frame is rows-based so state is O(n) per row. A single
    unpartitioned series funnels into one task — partition by entity
    (per-metric, per-tenant) for fleet-scale monitoring."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(order_col)
        .rowsBetween(-n, -1)
    )
    v = F.col(value_col)
    cnt = F.count(v).over(w)
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    m = s.cast("double") / cnt
    var = (ss.cast("double") - cnt * m * m) / (cnt - 1)
    z = F.round((v.cast("double") - m) / F.sqrt(var), 6)
    z_ok = F.when((cnt == n) & (var > 0), z)
    return df.select(
        *partition_by,
        order_col,
        value_col,
        cnt.alias("prev_n"),
        z_ok.alias("z"),
        F.when(z_ok.isNotNull(), F.abs(z_ok) > z_thresh).alias("is_anomaly"),
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str = "user_id",
    day_col: str = "day",
    window_days: int = 7,
) -> DataFrame:
    """DAU / rolling-WAU / stickiness per day: distinct users that day,
    distinct users over the trailing ``window_days`` window, and their
    ratio (the DAU/WAU engagement metric). Rolling DISTINCT cannot be a
    window frame (distincts don't merge) — instead each (day, user) row
    CONTRIBUTES to the windows of days d..d+w−1 (one ×w explode of the
    day-level distinct table, not the raw events), then one
    count-distinct per target day. Days with no activity don't appear.

    Scale shape: the raw stream collapses to (day, user) first —
    everything after is day-granular; the explode is w× that, shuffled
    once on the target day. Exact-integer ratio rounded at 6dp."""
    du = df.select(F.col(day_col).alias("day"), F.col(user_col).alias("u")).distinct()
    dau = du.groupBy("day").agg(F.count_distinct("u").alias("dau"))
    wau = (
        du.select(
            F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("o"),
            "day",
            "u",
        )
        .select(F.date_add("day", F.col("o")).alias("day"), "u")
        .groupBy("day")
        .agg(F.count_distinct("u").alias(f"wau{window_days}"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            f"wau{window_days}",
            F.round(
                F.col("dau").cast("double") / F.col(f"wau{window_days}"), 6
            ).alias("stickiness"),
        )
    )


def activity_streaks(
    df: DataFrame,
    key_col: str,
    period_col: str,
) -> DataFrame:
    """Gaps-and-islands: per key, group CONSECUTIVE integer periods
    (e.g. month indices) into streaks and report
    (key, n_active_periods, n_streaks, longest_streak, current_streak)
    where ``current_streak`` is the length of the streak containing the
    key's latest period. The classic retention/engagement primitive
    ("how many consecutive months has this customer ordered?").

    Uses the textbook island id ``period - row_number()`` — constant
    within a run of consecutive periods, distinct across gaps — so the
    whole computation is one (key, period) distinct shuffle followed by
    one key regroup that the row_number window, the island rollup, the
    latest-flag window and the final aggregation all share."""
    from pyspark.sql import Window

    p = df.select(
        F.col(key_col).alias("key"), F.col(period_col).cast("long").alias("period")
    ).distinct()
    w = Window.partitionBy("key").orderBy("period")
    isl = p.withColumn("island", F.col("period") - F.row_number().over(w))
    per_island = isl.groupBy("key", "island").agg(
        F.count(F.lit(1)).alias("len"), F.max("period").alias("last_period")
    )
    wk = Window.partitionBy("key")
    flagged = per_island.withColumn(
        "is_latest", F.col("last_period") == F.max("last_period").over(wk)
    )
    return flagged.groupBy("key").agg(
        F.sum("len").alias("n_active_periods"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
        F.max(F.when(F.col("is_latest"), F.col("len"))).alias("current_streak"),
    )


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    span: int = 14,
) -> DataFrame:
    """Adjusted exponentially-weighted moving average per key over a
    trailing ``span``-row frame: the pandas ``ewm(adjust=True)``
    semantics, restricted to the last ``span`` observations so state is
    bounded (weights beyond the frame are ≤ (1-α)^span ≈ negligible,
    and a bounded frame is what scales: Θ(span) per row, no unbounded
    history). Appends ``<col>_ewma`` (6dp). NULL values are dropped
    first (an absent observation, not a zero).

    Determinism: the frame array is folded oldest→newest with the
    Horner recurrence ``s ← s·(1-α)+x, w ← w·(1-α)+1`` and
    ``ewma = s/w`` — ONE fixed IEEE evaluation order that the DuckDB
    twin replays exactly via ``list_reduce`` (a weight-sum formulation
    would leave summation order unspecified and drift in ulps). The 6dp
    rounding is the floor form ``floor(x·1e6+0.5)/1e6`` (values are
    non-negative by the revenue contract; callers with signed series
    should drop the rounding): plain ROUND diverges between Spark
    (shortest-decimal half-up) and DuckDB (binary value,
    version-dependent) when a quotient lands on a 6dp midpoint — the
    exact failure observed on 1 of 8,623 rows in round 6 — while the
    floor form is the same IEEE op sequence in both engines (the
    ``personalized_pagerank`` pattern, graph.py). All JVM-side:
    collect_list over the rows frame + a higher-order ``aggregate``,
    no UDF; one shuffle on the key."""
    from pyspark.sql import Window

    decay = F.lit(1.0 - alpha)
    w = (
        Window.partitionBy(*[F.col(k) for k in key_cols])
        .orderBy(order_col)
        .rowsBetween(-(span - 1), 0)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    folded = F.aggregate(
        arr,
        F.struct(F.lit(0.0).alias("s"), F.lit(0.0).alias("w")),
        lambda acc, x: F.struct(
            (acc["s"] * decay + x).alias("s"), (acc["w"] * decay + F.lit(1.0)).alias("w")
        ),
        lambda acc: acc["s"] / acc["w"],
    )
    return df.filter(F.col(value_col).isNotNull()).select(
        *df.columns,
        floor_round(folded, 6).alias(f"{value_col}_ewma"),
    )


def seasonality_profile(
    df: DataFrame,
    date_col: str,
    value_col: str,
    anchor: str = "1992-01-06",
) -> DataFrame:
    """Day-of-week seasonality profile of a daily series: per weekday
    (0 = Monday, computed as days-since-a-known-Monday mod 7 — the one
    weekday formula every engine evaluates identically, unlike the
    1-vs-0-based dayofweek() zoo), the number of days, total value,
    mean daily value, and the seasonal index = weekday mean / overall
    daily mean (6dp) — the "are Mondays structurally slower" monitoring
    primitive and the deseasonalization divisor.

    Input must be day-granular with an exact (DECIMAL) value column so
    the sums are order-independent; the index is then a fixed IEEE
    ratio of two exact-sum averages. One Θ(days) aggregate + a 1-row
    broadcast overall mean.

    ``mean_value`` / ``seasonal_index`` are RAW IEEE quotients,
    deliberately un-rounded: a DECIMAL total over a small integer count
    lands exactly on decimal rounding midpoints often (10.01/8 =
    1.25125 → 4dp midpoint), which is precisely where Spark
    (shortest-decimal-repr half-up) and DuckDB (binary value) disagree
    — identical divisions of identical doubles, by contrast, agree
    bit-for-bit (the ``weighted_sample`` p_keep rule)."""
    wd = ((F.datediff(F.col(date_col), F.lit(anchor).cast("date")) % 7) + 7) % 7
    per = df.groupBy(wd.alias("weekday")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col(value_col)).alias("total"),
    )
    overall = df.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(F.col(value_col)).alias("_t")
    )
    mean_wd = F.col("total").cast("double") / F.col("n_days").cast("double")
    mean_all = F.col("_t").cast("double") / F.col("_n").cast("double")
    return (
        per.crossJoin(F.broadcast(overall))
        .select(
            "weekday",
            "n_days",
            "total",
            mean_wd.alias("mean_value"),
            (mean_wd / mean_all).alias("seasonal_index"),
        )
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival estimator over (duration, event_observed)
    subject rows — time-to-event analytics with CENSORING done right
    (subjects still event-free at observation end reduce the risk set
    without counting as events; dropping them biases every naive
    "average time to X" metric). Output per distinct duration t,
    ascending: (duration, n_events, n_censored, n_risk,
    survival = Π_{t'≤t} (1 − d/n_risk)).

    Determinism: the survival product folds the per-time factors in
    ascending-duration order via the ordered collect_list +
    higher-order ``aggregate`` Horner pattern proven by
    :func:`ewma` — ONE fixed IEEE multiplication order the twin
    replays with ``list_reduce`` — and is emitted RAW (un-rounded, the
    ``weighted_sample`` midpoint rule: d/n quotients of small ints are
    exactly where decimal re-rounding diverges).

    Scale shape: one Θ(subjects) groupBy onto Θ(distinct durations)
    rows, then a single global window over that (already tiny)
    aggregate — the curve itself is axis-sized, never subject-sized."""
    from pyspark.sql import Window

    tt = df.groupBy(F.col(duration_col).cast("long").alias("duration")).agg(
        F.sum(F.col(event_col).cast("int")).cast("long").alias("n_events"),
        (F.count(F.lit(1)) - F.sum(F.col(event_col).cast("int"))).cast("long").alias(
            "n_censored"
        ),
        F.count(F.lit(1)).alias("_n_at"),
    )
    total = df.count()
    w_prev = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    r = tt.withColumn(
        "n_risk", F.lit(total) - F.coalesce(F.sum("_n_at").over(w_prev), F.lit(0))
    )
    factor = F.lit(1.0) - F.col("n_events").cast("double") / F.col("n_risk").cast(
        "double"
    )
    s = r.withColumn("_fs", F.collect_list(factor).over(w_cum))
    return s.select(
        "duration",
        "n_events",
        "n_censored",
        "n_risk",
        F.aggregate(F.col("_fs"), F.lit(1.0), lambda acc, x: acc * x).alias(
            "survival"
        ),
    )

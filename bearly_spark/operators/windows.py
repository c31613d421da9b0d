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
    sort; the frame is rows-based so state is O(n) per row. An
    UNPARTITIONED series runs the blocked sliding-window form instead
    of a global window (round 10 — ``Window.orderBy`` with no keys
    compiles to ``Exchange SinglePartition`` + one-task whole-series
    sort): range-repartition on the order key, derive the global row
    number from per-partition counts (the ``global_row_number``
    offsets trick — one Θ(partitions) collect, no extra shuffle),
    carve the series into blocks of ``B = max(2n, ceil(N/parts))``
    consecutive ranks, replicate each block's last ``n`` rows into the
    NEXT block (a trailing n-frame never reaches further back), and
    run the window per block — every stage parallel. Values are
    bit-identical to the global window: the frame sees exactly the
    same ``n`` predecessor rows either way.

    ``order_col`` must be a TOTAL order in the unpartitioned form
    (duplicate keys would make block membership of ties
    partition-dependent); the daily-series callers key on distinct
    days."""
    if not partition_by:
        base = _blocked_series(df, order_col, n)
        w = Window.partitionBy("_blk").orderBy("_grn").rowsBetween(-n, -1)
    else:
        base = df.withColumn("_rep", F.lit(False))
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
    return base.select(
        *partition_by,
        order_col,
        value_col,
        cnt.alias("prev_n"),
        z_ok.alias("z"),
        F.when(z_ok.isNotNull(), F.abs(z_ok) > z_thresh).alias("is_anomaly"),
        F.col("_rep"),
    ).filter(~F.col("_rep")).drop("_rep")


def _blocked_series(df: DataFrame, order_col: str, n: int) -> DataFrame:
    """Shared scaffolding of the blocked sliding-window form: returns
    ``df`` plus ``_grn`` (global rank by ``order_col``), ``_blk``
    (block id — ranks ``[kB, (k+1)B)`` with ``B ≥ 2n``) and ``_rep``
    (True on the copies of each block's last ``n`` rows that seed the
    next block's lookback; callers filter them out after the window).
    One range shuffle + one Θ(partitions) count; the block window
    itself adds one hash shuffle on ``_blk``."""
    import math

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .withColumn("_bpid", F.spark_partition_id())
        # lazy: the counts collect below is the materializing job
        .localCheckpoint(eager=False)
    )
    counts = sorted(
        (r["_bpid"], r["c"])
        for r in ranged.groupBy("_bpid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, acc = {}, 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    total = acc
    B = max(2 * n, math.ceil(total / max(1, n_parts)))
    off_map = (
        F.create_map(*[F.lit(x) for po in offsets.items() for x in po])[
            F.col("_bpid")
        ]
        if offsets
        else F.lit(0)
    )
    w_local = Window.partitionBy("_bpid").orderBy(order_col)
    base = ranged.withColumn(
        "_grn", F.row_number().over(w_local) - 1 + F.coalesce(off_map, F.lit(0))
    ).drop("_bpid")
    blk = F.call_function("div", F.col("_grn"), F.lit(B).cast("long"))
    own = base.withColumn("_blk", blk).withColumn("_rep", F.lit(False))
    reps = (
        base.filter(F.col("_grn") % B >= B - n)
        .filter(blk + 1 <= (total - 1) // B)  # no replica-only tail block
        .withColumn("_blk", blk + 1)
        .withColumn("_rep", F.lit(True))
    )
    return own.unionByName(reps)


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
    emit: str = "double",
) -> DataFrame:
    """Adjusted exponentially-weighted moving average per key over a
    trailing ``span``-row frame: the pandas ``ewm(adjust=True)``
    semantics, restricted to the last ``span`` observations so state is
    bounded (weights beyond the frame are ≤ (1-α)^span ≈ negligible,
    and a bounded frame is what scales: Θ(span) per row, no unbounded
    history). Appends ``<col>_ewma`` (6dp, round half-up for the
    non-negative values the revenue contract supplies; negative series
    round half-toward-+∞-in-micro-units — both engines' integral
    division truncates toward zero identically). NULL values are
    dropped first (an absent observation, not a zero).

    Determinism: NO IEEE arithmetic touches the compared value. Two
    prior rounds proved the float routes dead: plain ROUND diverges at
    6dp midpoints (round 6, 1 of 8,623 rows), and even the floor form
    ``floor(x·1e6+0.5)/1e6`` over a fixed-order double Horner fold
    diverges when the pre-floor argument lands ON an integer with a
    1-ulp neighbor (round 7: 441350099202.0, distance 0.0 — a 1-ulp
    list_reduce difference across DuckDB *builds* flips the 6th
    decimal). So the fold is exact integer arithmetic: with decay
    ``1-α = n/d`` (a small exact fraction, e.g. 7/10) and values scaled
    to integers ``X = x·10^v`` (v = input decimal scale), track
    ``S_k = s_k·d^k·10^v`` and ``W_k = w_k·d^k`` via

        S ← n·S + X·P·d,   W ← n·W + P·d,   P ← P·d   (P_0 = 1)

    in DECIMAL(38,0) — every step exact, no rounding anywhere. The 6dp
    half-up quotient is then pure integral division,
    ``micro = (2·10⁶·S + 10^v·W) div (2·10^v·W)``, and the emitted
    double ``micro/10⁶`` is the same IEEE division of the same exact
    integers in every engine and build. The DuckDB twin replays the
    identical recurrence in HUGEINT via ``list_reduce`` over a
    sentinel-prepended list (list_reduce has no explicit init).

    Capacity: S ≤ max|X|·d^span/α, and the quotient path multiplies by
    2·10⁶ — all inside DECIMAL(38,0)/HUGEINT as long as
    ``max|x|·10^v · d^span · 2·10⁶/α < 10³⁸`` (α=0.3, span 14, cents:
    values up to ~10¹⁶ cents per row — far beyond any daily revenue).
    Past that Spark yields NULL (non-ANSI decimal overflow), not a
    wrong value. ``micro`` must also fit BIGINT: |ewma| < 9.2·10¹².

    ``emit`` selects the output column: ``"double"`` (default) appends
    ``<col>_ewma`` = the IEEE double ``micro/10⁶`` — the same division
    of the same exact integers everywhere; ``"micro"`` appends
    ``<col>_ewma_micro`` BIGINT = the exact half-up 6dp numerator with
    NO IEEE arithmetic anywhere in the output (the form a cross-engine
    hash compare should use).

    All JVM-side: collect_list over the rows frame + a higher-order
    ``aggregate``, no UDF; one shuffle on the key."""
    from fractions import Fraction

    from pyspark.sql import Window
    from pyspark.sql.types import DecimalType

    if emit not in ("double", "micro"):
        raise ValueError(f"emit must be 'double' or 'micro', got {emit!r}")
    frac = Fraction(1.0 - alpha).limit_denominator(1000)
    if abs(float(frac) - (1.0 - alpha)) > 1e-12:
        raise ValueError(
            f"alpha={alpha} has no small exact decay fraction; "
            "exact-integer EWMA needs 1-alpha = n/d with d <= 1000"
        )
    n, d = frac.numerator, frac.denominator
    in_type = df.schema[value_col].dataType
    # Doubles are snapped to an exact 9dp decimal first (deterministic
    # half-up cast); DECIMAL inputs keep their own scale exactly.
    v = in_type.scale if isinstance(in_type, DecimalType) else 9
    # Capacity guard (per the documented bound): the fold tracks
    # P = d^k up to d^(span-1) and the quotient path multiplies by
    # 2·10^6·10^v; require at least 10^4 of value headroom inside
    # DECIMAL(38,0) or the fold would silently NULL under non-ANSI
    # decimal overflow for any >= span-row frame (e.g. alpha=0.127 ->
    # d=873/1000, d^13 ~ 10^39).
    if d ** (span - 1) * 2 * 10**6 * 10**v * 10**4 > 10**38:
        raise ValueError(
            f"alpha={alpha} (decay {n}/{d}) with span={span} and input "
            f"scale {v} overflows the DECIMAL(38,0) fold capacity: "
            f"d^(span-1)*2e6*10^v = {d ** (span - 1) * 2 * 10**6 * 10**v:.1e} "
            "leaves < 1e4 of value headroom below 1e38; use a smaller "
            "span or a coarser decay fraction"
        )
    dec = "decimal(38,0)"
    w = (
        Window.partitionBy(*[F.col(k) for k in key_cols])
        .orderBy(order_col)
        .rowsBetween(-(span - 1), 0)
    )
    scaled = (F.col(value_col).cast(f"decimal(38,{v})") * F.lit(10**v)).cast(dec)
    arr = F.collect_list(scaled).over(w)
    lit_n, lit_d = F.lit(n).cast(dec), F.lit(d).cast(dec)
    folded = F.aggregate(
        arr,
        F.struct(
            F.lit(0).cast(dec).alias("s"),
            F.lit(0).cast(dec).alias("w"),
            F.lit(1).cast(dec).alias("p"),
        ),
        lambda acc, x: F.struct(
            (lit_n * acc["s"] + x * (acc["p"] * lit_d)).alias("s"),
            (lit_n * acc["w"] + acc["p"] * lit_d).alias("w"),
            (acc["p"] * lit_d).alias("p"),
        ),
    )
    micro = F.expr(
        f"(CAST(2000000 AS DECIMAL(38,0)) * _ewma_acc.s"
        f" + CAST({10**v} AS DECIMAL(38,0)) * _ewma_acc.w)"
        f" div (CAST({2 * 10**v} AS DECIMAL(38,0)) * _ewma_acc.w)"
    )
    out = (
        micro.cast("long").alias(f"{value_col}_ewma_micro")
        if emit == "micro"
        else (micro.cast("double") / F.lit(1000000.0)).alias(f"{value_col}_ewma")
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("_ewma_acc", folded)
        .select(*df.columns, out)
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

    Determinism (round 8): the survival product is a QUANTIZED-EXACT
    integer fold — the round-7 driver failure proved that even a
    fixed-order float fold (the prior contract here) can differ by an
    ulp across DuckDB builds. Each factor ``1 − d/n`` becomes an exact
    6dp micro integer ``F = (2·10⁶·(n−d) + n) div (2n)``, and the
    running product holds 12 digits:

        S₀ = 10¹²,   S ← (2·S·F + 10⁶) div (2·10⁶)     [halfup]

    — all integral ops (no ulp anywhere, fold included), emitted as
    the one IEEE division ``S/10¹²`` of identical integers. The
    semantic delta vs the raw product is ≤ ~10⁻⁶·curve-length —
    documented quantization, not float noise; the twin replays the
    identical integer recurrence. Round 9 shrank the state from 18 to
    12 digits so every fold step fits LONG (max 2·10¹²·10⁶ + 10⁶ <
    2⁶³) — the graph.py picorank fast path: the r8 DECIMAL(38,0) fold
    was the bench's 2.5× regressor (each 128-bit div costs ~10× a
    64-bit one, and the prefix fold runs k²/2 of them).

    Scale shape (round 10): one Θ(subjects) groupBy onto Θ(distinct
    durations) rows — the curve itself is axis-sized, never
    subject-sized — then the strictly-sequential quantized fold runs
    DRIVER-side over the collected axis rows (capped at
    ``max_curve_points``; a take(), no global sort anywhere). This
    replaces the r9 global window, which was both the registry's last
    ``Exchange SinglePartition`` sort AND O(k²) in curve length (a
    collect_list prefix per row); the driver fold is O(k) over the
    same rows that single task materialized. The per-step-rounded
    recurrence is inherently serial — no distributed form computes it
    without serializing somewhere; axis-sized driver resolution is the
    honest plan (same doctrine as the percentile selection). A curve
    past the cap falls back to the r9 window form — correct, one
    axis-sized task (no registry fixture is within 10³× of the cap)."""
    tt = df.groupBy(F.col(duration_col).cast("long").alias("duration")).agg(
        F.sum(F.col(event_col).cast("int")).cast("long").alias("n_events"),
        (F.count(F.lit(1)) - F.sum(F.col(event_col).cast("int"))).cast("long").alias(
            "n_censored"
        ),
        F.count(F.lit(1)).alias("_n_at"),
    )
    total = df.count()
    max_curve_points = 1_000_000
    pts = tt.take(max_curve_points + 1)
    if len(pts) > max_curve_points:
        return _kaplan_meier_window(tt, total)
    pts = sorted(pts, key=lambda r: r["duration"])
    out_rows, s_state, at_risk = [], 10**12, total
    for r in pts:
        n_risk = at_risk
        d = r["n_events"]
        # the exact integer recurrence (same as rational_micro + the
        # window fold, in arbitrary-precision Python ints; every value
        # non-negative so floor == truncating div)
        f_micro = (2 * 10**6 * (n_risk - d) + n_risk) // (2 * n_risk)
        s_state = (2 * s_state * f_micro + 10**6) // (2 * 10**6)
        out_rows.append(
            (r["duration"], d, r["n_censored"], n_risk, float(s_state) / 1e12)
        )
        at_risk -= r["_n_at"]
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("duration", LongType()),
            StructField("n_events", LongType()),
            StructField("n_censored", LongType()),
            StructField("n_risk", LongType()),
            StructField("survival", DoubleType()),
        ]
    )
    return df.sparkSession.createDataFrame(out_rows, schema)


def _kaplan_meier_window(tt: DataFrame, total: int) -> DataFrame:
    """The r9 global-window Kaplan-Meier fold — fallback for curves too
    long to resolve driver-side (one axis-sized task; O(k²) prefix
    lists). Values identical to the driver fold."""
    from pyspark.sql import Window

    from bearly_spark.operators.rounding import rational_micro

    w_prev = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    r = tt.withColumn(
        "n_risk", F.lit(total) - F.coalesce(F.sum("_n_at").over(w_prev), F.lit(0))
    )
    f_micro = rational_micro(
        F.col("n_risk") - F.col("n_events"), F.col("n_risk"), 6
    )
    s = r.withColumn("_fs", F.collect_list(f_micro.cast("long")).over(w_cum))
    folded = F.aggregate(
        F.col("_fs"),
        F.lit(10**12).cast("long"),
        lambda acc, x: F.call_function(
            "div",
            F.lit(2).cast("long") * acc * x + F.lit(10**6).cast("long"),
            F.lit(2 * 10**6).cast("long"),
        ),
    )
    return s.select(
        "duration",
        "n_events",
        "n_censored",
        "n_risk",
        (folded.cast("double") / F.lit(1e12)).alias("survival"),
    )


def cusum_changepoints(
    df: DataFrame,
    date_col: str,
    value_col: str,
    slack_div: int = 4,
    h_mul: int = 3,
    epoch: str = "1992-01-01",
    max_axis_points: int = 1_000_000,
) -> DataFrame:
    """Two-sided CUSUM changepoint detection over a daily series — the
    monitoring family's missing piece beyond distribution drift
    (``drift_report``) and pointwise outliers (z/IQR/MAD): CUSUM
    accumulates small SUSTAINED shifts that no single-point detector
    sees (Page 1954). Per day, ascending:

        (day_idx, rev_micro, cusum_pos, cusum_neg, alarm)

        s+ <- max(0, s+ + (x - mean - k));  s- <- max(0, s- + (mean - x - k))
        alarm = s+ > h OR s- > h

    with ``mean`` the series' integer-floored daily mean (micro units),
    slack ``k = mean // slack_div`` (default 25% — below-slack
    fluctuation never accumulates) and threshold ``h = mean * h_mul``
    (default three mean-days of sustained drift) — all EXACT INTEGER
    arithmetic, so the DuckDB twin (a recursive CTE replaying the
    identical recurrence) hash-matches bit-for-bit. The reference is
    the GLOBAL series mean: a genuine level shift therefore alarms on
    both sides of the cut (pre-shift days drift negative against the
    shifted-up mean) — the classic single-reference CUSUM picture.

    Scale shape: one Θ(rows) groupBy onto the Θ(days) axis; the
    strictly-sequential fold then runs DRIVER-side over the collected
    axis (``take``, no global sort) — the ``kaplan_meier`` doctrine:
    a per-step-clamped recurrence admits no distributed form that does
    not serialize somewhere, and axis-sized driver resolution is the
    honest plan. Past ``max_axis_points`` the axis is refused with a
    clear error (a daily axis cannot plausibly reach 10^6 points; a
    finer-grained series should be bucketed first)."""
    day_idx = F.datediff(F.col(date_col), F.lit(epoch).cast("date")).cast("int")
    daily = (
        df.groupBy(day_idx.alias("day_idx"))
        .agg(
            F.sum(
                (F.col(value_col).cast("decimal(18,2)") * F.lit(1_000_000)).cast(
                    "long"
                )
            ).alias("rev_micro")
        )
    )
    pts = daily.take(max_axis_points + 1)
    if len(pts) > max_axis_points:
        raise ValueError(
            f"CUSUM axis exceeds {max_axis_points} points; bucket the series "
            "to a coarser grain before changepoint detection"
        )
    pts = sorted(pts, key=lambda r: r["day_idx"])
    n = len(pts)
    total = sum(r["rev_micro"] for r in pts)
    mean = total // n if n else 0
    k = mean // slack_div
    h = mean * h_mul
    rows, sp, sn = [], 0, 0
    for r in pts:
        x = r["rev_micro"]
        sp = max(0, sp + (x - mean - k))
        sn = max(0, sn + (mean - x - k))
        rows.append((r["day_idx"], x, sp, sn, sp > h or sn > h))
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("day_idx", IntegerType()),
            StructField("rev_micro", LongType()),
            StructField("cusum_pos", LongType()),
            StructField("cusum_neg", LongType()),
            StructField("alarm", BooleanType()),
        ]
    )
    return df.sparkSession.createDataFrame(rows, schema)

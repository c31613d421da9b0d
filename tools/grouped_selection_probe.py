"""Scaling probe for the round-10 mid-cardinality grouped-percentile
route and the blocked sliding window (PLANS.md round-10 section).

Usage:
    PYTHONPATH=/root/repo python tools/grouped_selection_probe.py [N_rows]

Part 1 — grouped percentiles, 25 groups over N synthetic rows
(deterministic Knuth-hash values, DECIMAL(12,2)): times the extended
distributed-selection route (the round-10 default for group counts up
to 4x parallelism) against the forced rank-window form (one
task per group), and asserts the two emit IDENTICAL values.

Part 2 — unpartitioned rolling z-score over an N/4-point series: times
the blocked sliding-window form (round-10 default) against the forced
global window (Exchange SinglePartition + whole-series sort) and
asserts identical values.

Both baselines are forced by monkeypatching the internal route guards —
probe-only surgery; production code never takes these switches.
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F


def _best2(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    from bearly_spark.operators import aggregate, windows
    from bearly_spark.session import get_spark

    spark = get_spark("grouped-selection-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- part 1: 25-group percentiles, selection vs per-group sorts
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 25).cast("string").alias("g"),
            (
                (F.col("id") * F.lit(2654435761) % F.lit(10**7)).cast(
                    "decimal(12,2)"
                )
                / 100
            ).cast("decimal(12,2)").alias("v"),
        )
        .localCheckpoint(eager=True)  # pin: probe the operator, not range()
    )
    qs = (0.25, 0.5, 0.75, 0.95)

    def run_selection():
        # bypass the round-11 small-group gate: this leg must measure
        # the SELECTION route even below the 500k-rows/group cutoff
        saved = aggregate.WINDOW_FORM_MAX_GROUP_ROWS
        aggregate.WINDOW_FORM_MAX_GROUP_ROWS = 0
        try:
            return sorted(
                map(tuple, aggregate.exact_percentiles(df, ["g"], "v", qs).collect())
            )
        finally:
            aggregate.WINDOW_FORM_MAX_GROUP_ROWS = saved

    orig = aggregate._few_group_order_statistics

    def run_window():
        aggregate._few_group_order_statistics = lambda *a, **k: None
        try:
            return sorted(
                map(tuple, aggregate.exact_percentiles(df, ["g"], "v", qs).collect())
            )
        finally:
            aggregate._few_group_order_statistics = orig

    assert run_selection() == run_window(), "selection != window values"
    t_sel = _best2(run_selection)
    t_win = _best2(run_window)
    print(
        f"grouped percentiles n={n:,} groups=25: "
        f"selection {t_sel:.2f}s vs per-group window sorts {t_win:.2f}s "
        f"({t_win / t_sel:.2f}x)"
    )

    # ---- part 2: unpartitioned rolling z-score, blocked vs global window
    m = n // 4
    series = (
        spark.range(m)
        .select(
            F.col("id").alias("day"),
            ((F.col("id") * F.lit(2654435761) % F.lit(10**6)) / 100)
            .cast("decimal(18,2)")
            .alias("v"),
        )
        .localCheckpoint(eager=True)
    )

    def run_blocked():
        return windows.rolling_zscore(series, "day", "v", n=7).count()

    orig_blk = windows._blocked_series

    def run_global():
        # force the single global window by faking a 1-block split
        def one_block(dfx, order_col, nn):
            return dfx.withColumn("_grn", F.col(order_col)).withColumn(
                "_blk", F.lit(0)
            ).withColumn("_rep", F.lit(False))

        windows._blocked_series = one_block
        try:
            return windows.rolling_zscore(series, "day", "v", n=7).count()
        finally:
            windows._blocked_series = orig_blk

    assert run_blocked() == run_global(), "row-count mismatch"
    t_blk = _best2(run_blocked)
    t_glob = _best2(run_global)
    print(
        f"rolling z-score series={m:,}: "
        f"blocked {t_blk:.2f}s vs global window {t_glob:.2f}s "
        f"({t_glob / t_blk:.2f}x)"
    )


if __name__ == "__main__":
    main()

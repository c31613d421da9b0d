"""Pins for the round-8 exact-integer quantization tier
(``operators/rounding.rational_round`` / ``rational_micro`` /
``floor_scaled`` and the exact-integer ``exact_percentiles``): every
compared value must equal what exact rational arithmetic says,
including on true decimal-boundary inputs — the class where any float
form (plain ROUND and floor-form alike) is engine/build-defined (the
round-6 and round-7 driver failures)."""

from __future__ import annotations

import math
from decimal import Decimal
from fractions import Fraction

import pyspark.sql.functions as F
import pytest


def _halfup_trunc(num: int, den: int, digits: int) -> int:
    """The contract both engines implement: (2·10^d·num + den) trunc-div
    (2·den) — half-up for non-negative, half-toward-zero-biased for
    negative (Spark ``div`` and DuckDB ``//`` both truncate)."""
    a, b = 2 * 10**digits * num + den, 2 * den
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_rational_round_matches_fraction_reference(spark):
    """Exhaustive small-rational sweep INCLUDING every true midpoint
    (num/den where num·10^d·2 ≡ den mod 2·den): Spark's emission must
    be bit-equal to float(micro)/10^d from exact integer arithmetic,
    and DuckDB's twin SQL must agree."""
    import duckdb

    from bearly_spark.operators.rounding import (
        rational_round,
        rational_round_sql,
    )

    cases = [(n, d) for d in (1, 2, 3, 7, 16, 1_000_000) for n in
             (-7, -3, -1, 0, 1, 2, 5, 123456, 10**12)]
    df = spark.createDataFrame(cases, "n long, d long")
    got = {
        (r["n"], r["d"]): r["r"]
        for r in df.select(
            "n", "d", rational_round(F.col("n"), F.col("d"), 6).alias("r")
        ).collect()
    }
    sql = rational_round_sql("n", "d", 6)
    vals = ", ".join(f"({n}, {d})" for n, d in cases)
    duck = {
        (n, d): r
        for n, d, r in duckdb.sql(
            f"SELECT n, d, {sql} AS r FROM (VALUES {vals}) t(n, d)"
        ).fetchall()
    }
    for n, d in cases:
        want = float(_halfup_trunc(n, d, 6)) / 1e6
        assert got[(n, d)] == want == duck[(n, d)], (n, d)


def test_floor_scaled_is_integer_exact(spark):
    """floor_scaled must emit the exact integer floor(x·10^d + 0.5) as
    a double — no divide-then-multiply ulp loss — for negatives too."""
    from bearly_spark.operators.rounding import floor_scaled

    vals = [1.0000015, -9.2103405, -0.0000005, 0.0, 123.456789,
            -15.0000004999]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["x"]: r["f"] for r in
           df.select("x", floor_scaled(F.col("x"), 6).alias("f")).collect()}
    for v in vals:
        assert got[v] == float(math.floor(v * 1e6 + 0.5)), v


def test_rational_round_py_matches_column_form(spark):
    """The grouped-selection path emits driver-computed doubles via
    _rational_round_py — pin bit-parity with the Column form on planted
    rationals including negatives and exact midpoints (where truncating
    vs flooring division would diverge)."""
    import pyspark.sql.functions as F

    from bearly_spark.operators.aggregate import _rational_round_py
    from bearly_spark.operators.rounding import rational_round

    cases = [(5, 2, 1), (-5, 2, 1), (12345, 7, 4), (-12345, 7, 4),
             (10015, 2, 4), (-10015, 2, 4), (0, 3, 6), (999999999999, 7, 6)]
    got = spark.range(1).select(
        *[
            rational_round(
                F.lit(num).cast("decimal(38,0)"),
                F.lit(den).cast("decimal(38,0)"),
                d,
            ).alias(f"v{i}")
            for i, (num, den, d) in enumerate(cases)
        ]
    ).first()
    for i, (num, den, d) in enumerate(cases):
        assert _rational_round_py(num, den, d) == got[f"v{i}"], (num, den, d)


def test_exact_percentiles_fraction_reference(spark):
    """Grouped interpolated quantiles over DECIMAL(12,2) values vs a
    Fraction reference of the same contract (integer index selection,
    exact rational interpolation, 4dp halfup emission). Includes an
    even-count median — (a+b)/2 of one-cent-apart prices, EXACTLY a
    boundary — the case float forms get engine-defined."""
    import random

    from bearly_spark.operators.aggregate import exact_percentiles

    rng = random.Random(88)
    rows = [("g1", Decimal("10.00")), ("g1", Decimal("10.01")),
            ("g1", Decimal("10.02")), ("g1", Decimal("10.03"))]
    rows += [("g2", Decimal(rng.randrange(100, 10**7)) / 100)
             for _ in range(37)]
    df = spark.createDataFrame(rows, "g string, v decimal(12,2)")
    qs = [0.25, 0.5, 0.75]
    got = {r["g"]: (r["q1"], r["q2"], r["q3"]) for r in
           exact_percentiles(df, ["g"], "v", qs,
                             names=["q1", "q2", "q3"]).collect()}
    by_g: dict[str, list[Decimal]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals = sorted(vals)
        n = len(vals)
        want = []
        for q in qs:
            fr = Fraction(q).limit_denominator(10**6)
            a, b = fr.numerator, fr.denominator
            lo, r = divmod((n - 1) * a, b)
            hi = lo + (1 if r else 0)
            cents = lambda x: int(x * 100)  # noqa: E731
            num = cents(vals[lo]) * (b - r) + cents(vals[hi]) * r
            den = b * 100
            want.append(float(_halfup_trunc(num, den, 4)) / 1e4)
        assert list(got[g]) == want, g
    # pin the boundary case explicitly: median of g1 is (10.01+10.02)/2
    # = 10.015 — a true 2dp/4dp boundary — and halfup says 10.015
    assert got["g1"][1] == 10.015


def test_exact_percentiles_paths_agree_across_group_threshold(spark):
    """The distributed-selection path and the many-group rank-window
    path must produce IDENTICAL values. Since round 10 the selection
    route covers any group count up to 4× parallelism (128 locally),
    so the window form is forced with 600 groups (past the HLL
    cardinality gate) and compared bit-for-bit against per-slice
    selection calls at 20 groups — squarely inside the NEW 9-128
    mid-cardinality regime the r9 cutoff of 8 excluded."""
    import random

    import pyspark.sql.functions as F

    from bearly_spark.operators.aggregate import exact_percentiles

    rng = random.Random(4242)
    rows = [
        (f"g{i % 600}", Decimal(rng.randrange(100, 10**6)) / 100)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "g string, v decimal(12,2)")
    qs = [0.25, 0.5, 0.9]
    names = ["q1", "q2", "q3"]
    # 600 groups > 1.2 * 4 * parallelism → rank-window path
    windowed = {
        r["g"]: (r["q1"], r["q2"], r["q3"])
        for r in exact_percentiles(df, ["g"], "v", qs, names=names).collect()
    }
    assert len(windowed) == 600
    # two 20-group slices → the extended selection path; same answers
    for gs in (range(0, 20), range(300, 320)):
        sub = df.filter(F.col("g").isin([f"g{i}" for i in gs]))
        got = {
            r["g"]: (r["q1"], r["q2"], r["q3"])
            for r in exact_percentiles(sub, ["g"], "v", qs, names=names).collect()
        }
        assert len(got) == 20
        for g, vals in got.items():
            assert vals == windowed[g], g


def test_exact_percentiles_null_group_key(spark):
    """A NULL group key must survive the few-group selection path: the
    inner bracket-frame join drops NULL keys by SQL semantics, so that
    group resolves through the per-group fallback — pin that it comes
    back with the right quantile instead of vanishing."""
    from bearly_spark.operators.aggregate import exact_percentiles

    rows = [(None, Decimal("1.00")), (None, Decimal("3.00")),
            ("a", Decimal("2.00")), ("a", Decimal("4.00")),
            ("a", Decimal("6.00"))]
    df = spark.createDataFrame(rows, "g string, v decimal(12,2)")
    out = {r["g"]: r["p50"] for r in
           exact_percentiles(df, ["g"], "v", [0.5], names=["p50"]).collect()}
    assert out == {None: 2.0, "a": 4.0}


def test_km_quantized_fold_reference(spark):
    """kaplan_meier's integer survival fold vs a Python replay of the
    same recurrence (6dp micro factors, 12-digit LONG running product)."""
    from bearly_spark.operators.windows import kaplan_meier

    rows = [(3, 1), (3, 1), (3, 0), (5, 1), (5, 0), (9, 0), (12, 1)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    got = {r["duration"]: r for r in
           kaplan_meier(df, "dur", "ev").collect()}
    total, removed, s = len(rows), 0, 10**12
    from collections import Counter

    per = {}
    for d, e in rows:
        per.setdefault(d, Counter())["ev" if e else "cz"] += 0  # init
        per[d]["ev"] += e
        per[d]["n"] += 1
    for d in sorted(per):
        n_risk = total - removed
        f = _halfup_trunc(n_risk - per[d]["ev"], n_risk, 6)
        s = (2 * s * f + 10**6) // (2 * 10**6)
        assert got[d]["n_risk"] == n_risk
        assert got[d]["survival"] == float(s) / 1e12, d
        removed += per[d]["n"]


@pytest.mark.parametrize("alpha,expect", [(0.3, (7, 10)), (0.5, (1, 2)),
                                          (0.25, (3, 4))])
def test_ewma_decay_fraction(alpha, expect):
    frac = Fraction(1.0 - alpha).limit_denominator(1000)
    assert (frac.numerator, frac.denominator) == expect

"""Cross-engine deterministic decimal rounding for doubles.

``F.round(double, d)`` is engine-defined at rounding midpoints: Spark
rounds the shortest-decimal representation half-up, DuckDB rounds the
binary value (and its exact behavior there is version-dependent). When
a computed double lands within ulps of a d-decimal midpoint — observed
on real fixture data for EWMA quotients, median averages, drift deltas,
quantile interpolations, and quality-score sums (round-7 midpoint
audit, ``tools/round_midpoint_probe.py``) — the two engines disagree
and an exact-value oracle comparison fails.

``floor_round`` evaluates ``floor(x·10ᵈ + 0.5)/10ᵈ`` — TRUE floor for
every sign (round half toward +∞ uniformly; bigram log-prob scores are
a live NEGATIVE call site), matching DuckDB's ``FLOOR`` (exact C floor
over all doubles) and CPython's ``math.floor`` bit-for-bit. The Spark
side does NOT use ``F.floor``: that returns BIGINT and silently
SATURATES at 2⁶³−1 (verified: ``F.floor``-based rounding of ``1e9`` at
d=10 returned 922337203.6854776 while DuckDB/CPython return 1e9).
Instead the integral part comes from IEEE ``fmod`` — ``t = y − y % 1``
(exact: the integral part is always representable, and for |y| ≥ 2⁵³
fmod is 0) — with a −1 adjustment when the remainder is negative
(``t − 1`` is exact there too: |t| < 2⁵³ whenever the remainder is
nonzero). No overflow cliff, identical bits in all three engines over
the finite range where ``x·10ᵈ + 0.5`` does not overflow to infinity
(past ~1.8·10³⁰⁸ Spark's fmod form yields NaN where DuckDB FLOOR
returns inf — unreachable at current bounded call sites, but the
contract ends there).

This only repairs sites where BOTH engines compute the identical
double before rounding (per-row arithmetic, identical fold order).
A double whose value itself is order-dependent (e.g. a plain ``SUM``
over doubles) must instead be computed exactly — DECIMAL sums — before
any rounding; see ``quality.standardize`` and the TPC-H revenue
queries in the registry.

Round 8 added the stronger tier: ``floor_round`` still assumes the
pre-floor double is bit-identical across engines AND BUILDS, which the
round-7 driver failure disproved for fold-produced values (a 1-ulp
cross-build ``list_reduce`` difference at a boundary-exact row flipped
the 6th decimal). Where the rounded quantity is a RATIO OF EXACT
INTEGERS — shares, chi-square/TVD terms, quality-score ratio sums,
interpolated order statistics, pagerank mass — use
``rational_round``/``rational_round_sql`` instead: the half-up
quantization is integral division (no IEEE arithmetic in the compared
value at all), and the emitted double is the same IEEE division of the
same exact integer in every engine and build (the ``windows.ewma``
pattern).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def floor_round(col: Column, digits: int) -> Column:
    """``floor(col·10^digits + 0.5)/10^digits`` as a double Column —
    true floor for all signs, exact over the full double range (no
    BIGINT saturation)."""
    return floor_scaled(col, digits) / F.lit(float(10**digits))


def floor_scaled(col: Column, digits: int) -> Column:
    """``floor(col·10^digits + 0.5)`` as an INTEGER-VALUED double
    Column — :func:`floor_round` before its final ``/10^digits``, for
    callers that need the quantized integer itself (exact sums of
    micro-units). Do NOT reconstruct it as ``floor_round(x, d)·10^d``:
    the divide-then-multiply round-trip can lose a ulp and a
    subsequent integer cast then truncates to the NEIGHBORING
    integer."""
    y = col * F.lit(float(10**digits)) + F.lit(0.5)
    r = y % F.lit(1.0)
    return y - r + F.when(r < 0, F.lit(-1.0)).otherwise(F.lit(0.0))


def floor_round_sql(expr: str, digits: int) -> str:
    """The same value as DuckDB SQL text (for oracle twins): DuckDB's
    ``FLOOR`` is exact C floor over all doubles — no saturation to work
    around on that side."""
    scale = float(10**digits)
    return f"FLOOR(({expr}) * {scale:.1f} + 0.5) / {scale:.1f}"


def rational_round(num: Column, den: Column, digits: int) -> Column:
    """Half-up ``digits``-dp quantization of the exact rational
    ``num/den`` with NO IEEE arithmetic in the compared value:

        micro = (2·10ᵈ·num + den) div (2·den)        [integral, exact]
        emit    micro / 10ᵈ                          [one IEEE division]

    ``num``/``den`` must be integer-valued (exactly representable in
    DECIMAL(38,0) after cast) with ``den > 0``; the emitted double is
    the same IEEE division of the same exact integer in every engine
    and build. Negative ``num`` rounds by truncating integral division
    (half toward zero-biased) — Spark ``div`` and DuckDB ``//`` both
    truncate, verified. ``|micro|`` must fit BIGINT (|num/den| <
    9.2·10¹⁸⁻ᵈ) and ``2·10ᵈ·num`` must fit DECIMAL(38,0)."""
    return rational_micro(num, den, digits).cast("double") / F.lit(
        float(10**digits)
    )


def rational_micro(num: Column, den: Column, digits: int) -> Column:
    """The integer ``digits``-dp half-up quantization of ``num/den`` —
    i.e. :func:`rational_round` BEFORE the final ``/10ᵈ`` emission —
    as a BIGINT Column, for callers that feed the quantized share into
    FURTHER exact arithmetic (drift terms over quantized shares)."""
    dec = "decimal(38,0)"
    n38, d38 = num.cast(dec), den.cast(dec)
    return F.call_function(
        "div",
        F.lit(2 * 10**digits).cast(dec) * n38 + d38,
        F.lit(2).cast(dec) * d38,
    )


def rational_round_sql(num: str, den: str, digits: int) -> str:
    """DuckDB twin of :func:`rational_round` — HUGEINT arithmetic, the
    scale factor applied AFTER the cast so the 2·10ᵈ· blow-up happens
    in 128-bit (callers whose ``num`` expression already risks int64
    overflow should embed their own HUGEINT casts inside it)."""
    return (
        f"(CAST({rational_micro_sql(num, den, digits)} AS DOUBLE)"
        f" / {float(10**digits)})"
    )


def rational_micro_sql(num: str, den: str, digits: int) -> str:
    """DuckDB twin of :func:`rational_micro` (HUGEINT)."""
    s = 10**digits
    return (
        f"(({2 * s} * CAST(({num}) AS HUGEINT) + CAST(({den}) AS HUGEINT))"
        f" // (2 * CAST(({den}) AS HUGEINT)))"
    )

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
the full double range.

This only repairs sites where BOTH engines compute the identical
double before rounding (per-row arithmetic, identical fold order).
A double whose value itself is order-dependent (e.g. a plain ``SUM``
over doubles) must instead be computed exactly — DECIMAL sums — before
any rounding; see ``quality.standardize`` and the TPC-H revenue
queries in the registry.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def floor_round(col: Column, digits: int) -> Column:
    """``floor(col·10^digits + 0.5)/10^digits`` as a double Column —
    true floor for all signs, exact over the full double range (no
    BIGINT saturation)."""
    scale = F.lit(float(10**digits))
    y = col * scale + F.lit(0.5)
    r = y % F.lit(1.0)
    f = y - r + F.when(r < 0, F.lit(-1.0)).otherwise(F.lit(0.0))
    return f / scale


def floor_round_sql(expr: str, digits: int) -> str:
    """The same value as DuckDB SQL text (for oracle twins): DuckDB's
    ``FLOOR`` is exact C floor over all doubles — no saturation to work
    around on that side."""
    scale = float(10**digits)
    return f"FLOOR(({expr}) * {scale:.1f} + 0.5) / {scale:.1f}"

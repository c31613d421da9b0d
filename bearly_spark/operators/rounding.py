"""Cross-engine deterministic decimal rounding for doubles.

``F.round(double, d)`` is engine-defined at rounding midpoints: Spark
rounds the shortest-decimal representation half-up, DuckDB rounds the
binary value (and its exact behavior there is version-dependent). When
a computed double lands within ulps of a d-decimal midpoint — observed
on real fixture data for EWMA quotients, median averages, drift deltas,
quantile interpolations, and quality-score sums (round-6/7 midpoint
audit, ``tools/round_midpoint_probe.py``) — the two engines disagree
and an exact-value oracle comparison fails.

``floor_round`` instead evaluates ``floor(x·10ᵈ + 0.5)/10ᵈ`` — one
fixed IEEE op sequence that every engine (Spark, DuckDB via the
``SQL`` twin form, Python's ``math.floor``) computes bit-identically,
so the twin matches by construction. Semantics: half-up for
non-negative x, half-DOWN for negative x (it is plain floor-of-shifted,
not half-away-from-zero) — callers rounding possibly-negative columns
get a deterministic result but not the away-from-zero convention;
every current call site rounds non-negative quantities (ratios, ranks,
revenues, distances).

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
    """``floor(col·10^digits + 0.5)/10^digits`` as a double Column."""
    scale = F.lit(float(10**digits))
    return F.floor(col * scale + F.lit(0.5)) / scale


def floor_round_sql(expr: str, digits: int) -> str:
    """The identical op sequence as DuckDB SQL text (for oracle twins)."""
    scale = float(10**digits)
    return f"FLOOR(({expr}) * {scale:.1f} + 0.5) / {scale:.1f}"

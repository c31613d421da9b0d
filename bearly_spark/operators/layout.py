"""Multi-dimensional data layout: z-order (Morton) clustering.

``clustered_scan_lineitem`` (registry) demonstrates single-key range
clustering: each file holds a narrow span of ONE column, so predicates
on that column prune whole files via parquet min/max stats. That layout
does nothing for a second, independent column — every file still spans
its full domain. Z-ordering interleaves the bits of several normalized
keys into one Morton code and range-partitions + sorts on it, so each
file covers a small HYPER-RECTANGLE of the key space: min/max stats
prune on EVERY z-ordered dimension at once. This is the standard
multi-dimensional clustering lever for 100 TB lakehouse tables (the
same idea behind Delta/Iceberg Z-ORDER; implemented here with plain
Spark expressions — getbit/shiftleft stay inside whole-stage codegen,
no UDF).

Scale notes:
- normalization is min/max affine onto a 2^bits grid — two map-only
  passes (one tiny agg + one projection), no global sort of raw keys;
  the only shuffle is the final repartitionByRange on the z value,
  which any rewrite of the table layout needs anyway;
- the layout build is a one-time (or per-partition, in a hive-layout
  combination) maintenance cost, amortized over every subsequent scan;
- skewed keys map many rows onto few grid cells; for heavy skew,
  rank-normalize (percent_rank) instead — noted, not default, because
  it adds a per-column window sort to the build.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _grid(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Affine-map col onto the integer grid [0, 2^bits): JVM-side double
    math then floor; constant inputs fold into the codegen'd projection."""
    span = (cmax.cast("double") - cmin.cast("double"))
    unit = (col.cast("double") - cmin.cast("double")) / F.when(span > 0, span).otherwise(F.lit(1.0))
    cell = F.floor(unit * F.lit((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), cell))


def zorder_value(grid_cols: Sequence[Column], bits: int) -> Column:
    """Morton code: bit b of grid column c lands at position
    b*len(cols)+c. Pure bitwise expressions (getbit/shiftleft) — stays
    in whole-stage codegen."""
    n = len(grid_cols)
    z: Column | None = None
    for ci, c in enumerate(grid_cols):
        for b in range(bits):
            # cast to long BEFORE the shift: shiftleft on an int wraps at
            # bit 31, and 2 cols x 16 bits reaches bit 31
            piece = F.shiftleft(F.getbit(c, F.lit(b)).cast("long"), b * n + ci)
            z = piece if z is None else z.bitwiseOR(piece)
    assert z is not None
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Rewrite ``df`` at ``path`` z-ordered on ``cols``.

    Each output file then holds a compact hyper-rectangle of the key
    space, so parquet min/max footer stats prune files for predicates on
    ANY of the z-ordered columns (verified by the per-file span assert in
    tests/test_sinks.py)."""
    # one tiny agg for the normalization constants (map-side combine;
    # collected because they are literals of the layout, not data)
    bounds = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    ).collect()[0]
    grids = [
        _grid(F.col(c), F.lit(bounds[f"_min_{c}"]), F.lit(bounds[f"_max_{c}"]), bits)
        for c in cols
    ]
    (
        df.withColumn("_z", zorder_value(grids, bits))
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )

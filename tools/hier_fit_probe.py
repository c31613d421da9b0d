"""Scaling probe for the round-11 two-level k-means (PLANS.md r11
section): flat vs hierarchical fit+assign+profile at matched effective
cell counts, on deterministic synthetic vectors.

Usage:
    PYTHONPATH=/root/repo python tools/hier_fit_probe.py [N_rows]

Prints one line per operating point. Expected shape (131k rows, dim 64,
local[32]): flat wins below ~1k cells (broadcast kernel, zero shuffle);
at the 4096-cell flat ceiling the hierarchical form is ~5x faster and
it is the only form past the ceiling. Values are NOT compared here
(flat k and hier k1*k2 are different geometries by construction except
k1=1, which tests/test_clustering.py pins bit-exact).
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131_072
    dim = 64
    from bearly_spark.operators import clustering as C
    from bearly_spark.session import get_spark

    spark = get_spark("hier-fit-probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.sin(F.col("id") * i * 0.7 + i),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    df.count()

    points = [
        ("64 cells", lambda: C.kmeans_cluster_profile(df, k=64, iters=2),
         lambda: C.hierarchical_cluster_profile(df, k1=8, k2=8, iters=2)),
        ("256 cells", lambda: C.kmeans_cluster_profile(df, k=256, iters=2),
         lambda: C.hierarchical_cluster_profile(df, k1=16, k2=16, iters=2)),
        ("4096 cells", lambda: C.kmeans_cluster_profile(df, k=4096, iters=2),
         lambda: C.hierarchical_cluster_profile(df, k1=64, k2=64, iters=2)),
    ]
    for label, flat, hier in points:
        t = time.perf_counter()
        nf = len(flat().collect())
        tf = time.perf_counter() - t
        t = time.perf_counter()
        nh = len(hier().collect())
        th = time.perf_counter() - t
        print(
            f"{label} n={n:,}: flat {tf:.1f}s ({nf} cells) vs "
            f"hier {th:.1f}s ({nh} cells) — {tf / th:.2f}x"
        )


if __name__ == "__main__":
    main()

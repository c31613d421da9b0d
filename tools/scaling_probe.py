"""Scaling probe: time registry queries against an N× blow-up of the
sf0.1 fact tables (PLANS.md 'Scaling probe' sections).

Usage:
    PYTHONPATH=/root/repo python tools/scaling_probe.py 64 \
        q18_large_volume_orders percentiles_lineitem
    PYTHONPATH=/root/repo python tools/scaling_probe.py --docs-only 256 \
        dedup_minhash_lsh embedding_near_dup

Builds /root/repo/.scratch/sf0.1x{N}/ once (symlinks for dimension
tables; lineitem/orders replicated with per-replica orderkey shifts so
join fan-outs stay realistic — each replica is a disjoint key range, the
same structure a bigger TPC-H SF would have), then reports best-of-2
noop-sink wall clock per query at 1× and N×.

``--docs-only`` replicates only documents/embeddings (symlinking the
fact tables): the adversarial-duplicate-mass probe for the dedup and
similarity banding paths at factors where a 153M-row lineitem build
would only add fixture-build time.
"""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.1"
SCRATCH = "/root/repo/.scratch"

# large enough to clear sf0.1's max orderkey (~6M) with room at any factor
KEY_SHIFT = 10_000_000


def build_fixture(spark, factor: int, docs_only: bool = False) -> str:
    out = f"{SCRATCH}/sf0.1x{factor}" + ("docs" if docs_only else "")
    if os.path.exists(f"{out}/_DONE"):
        return out
    os.makedirs(out, exist_ok=True)
    replicas = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_r")
    # fact tables: disjoint key ranges per replica (same structure a
    # bigger TPC-H SF would have). documents/embeddings: identical
    # content per replica — which is exactly the dedup workload (each
    # original doc gains factor-1 exact/near duplicates), so the
    # minhash/simhash/banding paths see realistic duplicate mass.
    blown = [
        ("documents", ["doc_id"]),
        ("embeddings", ["vec_id"]),
    ]
    if not docs_only:
        blown = [("lineitem", ["l_orderkey"]), ("orders", ["o_orderkey"])] + blown
    for name, keys in blown:
        df = spark.read.parquet(f"{SF_DIR}/{name}.parquet").select("*", replicas)
        for kcol in keys:
            df = df.withColumn(kcol, F.col(kcol) + F.col("_r") * F.lit(KEY_SHIFT))
        df.drop("_r").write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    linked = ["region", "nation", "customer", "supplier", "part", "events"]
    if docs_only:
        linked += ["lineitem", "orders"]
    for name in linked:
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF_DIR}/{name}.parquet", dst)
    open(f"{out}/_DONE", "w").close()
    return out


def main() -> None:
    args = sys.argv[1:]
    docs_only = "--docs-only" in args
    if docs_only:
        args.remove("--docs-only")
    factor = int(args[0])
    queries = args[1:]

    from bearly_spark.registry import QUERIES
    from bearly_spark.session import get_spark

    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    probe_dir = build_fixture(spark, factor, docs_only=docs_only)

    def best_of_2(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return best

    for name in queries:
        base = best_of_2(name, SF_DIR)
        big = best_of_2(name, probe_dir)
        print(
            f"{name}: 1x={base:.2f}s {factor}x={big:.2f}s "
            f"ratio={big / base:.1f}x (data {factor}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()

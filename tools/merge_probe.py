"""Merge scale probe: is copy-on-write MERGE Θ(delta), not Θ(table)?

Writes the sf0.1 orders table (150k rows) range-clustered by key into N
files, then applies deltas of varying breadth and measures what the
merge actually rewrote (files, bytes, wall-clock) against the
full-table rewrite baseline. The 100 TB claim under test: with a
key-clustered layout, a key-local delta touches few files, untouched
files carry over as hard links (zero bytes copied), and merge cost
tracks DELTA size — while a uniformly-scattered delta degrades toward
the full rewrite, which is the honest statement of the layout
dependence.

Run: PYTHONPATH=/root/repo python tools/merge_probe.py [sf_dir] [n_files]
"""

import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("BEARLY_SHUFFLE_PARTITIONS", "16")


def table_bytes(root):
    return sum(
        p.stat().st_size
        for p in Path(root).rglob("*.parquet")
        if not p.name.startswith(("_", "."))
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import pyspark.sql.functions as F

    from bearly_spark.operators.maintenance import merge_into
    from bearly_spark.session import get_spark

    spark = get_spark("merge-probe")
    spark.sparkContext.setLogLevel("ERROR")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = od.count()
    mx = od.agg(F.max("o_orderkey")).collect()[0][0]
    base = Path("/tmp/merge_probe")

    def build(path):
        shutil.rmtree(path, ignore_errors=True)
        od.repartitionByRange(n_files, "o_orderkey").write.parquet(str(path))

    # full-rewrite baseline: what a non-CoW engine pays for ANY delta
    t0 = time.time()
    build(base / "baseline")
    t_full = time.time() - t0
    total_bytes = table_bytes(base / "baseline")
    print(
        f"table: {n} rows, {n_files} files, {total_bytes/1e6:.1f} MB; "
        f"full rewrite {t_full:.2f}s"
    )

    frac = 0.005  # 0.5% delta
    span = int(mx * frac)
    scenarios = [
        ("clustered 0.5%", od.filter(F.col("o_orderkey") <= span)),
        (
            "scattered 0.5%",
            od.filter(F.col("o_orderkey") % int(1 / frac) == 0),
        ),
    ]
    for name, delta in scenarios:
        work = base / "work"
        build(work)
        src = delta.withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
        nd = src.count()
        t0 = time.time()
        stats = merge_into(spark, str(work), src, ["o_orderkey"])
        t = time.time() - t0
        print(
            f"{name}: {nd} delta rows -> files {stats['files_rewritten']}/"
            f"{stats['files_total']} "
            f"({100*stats['files_rewritten']/stats['files_total']:.0f}%), "
            f"rows rewritten {stats['rows_written']}/{n} "
            f"({100*stats['rows_written']/n:.1f}%), {t:.2f}s "
            f"(vs full rewrite {t_full:.2f}s)"
        )
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

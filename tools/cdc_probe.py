"""CDC apply probe: is the per-batch apply cost Θ(batch), not Θ(table)?

Builds the orders table range-clustered at 1x and 8x size (64 files),
then applies the SAME fixed-size change batch (500 upserts + 100
deletes, keys clustered in one key range) to each and compares what the
apply actually did. The 100 TB claim under test: with a key-clustered
layout, a fixed delta touches a fixed number of files regardless of
table size, untouched files carry over as hard links, and apply cost
tracks the BATCH — the table only pays its file count in O(1) link
metadata ops.

Run: PYTHONPATH=/root/repo python tools/cdc_probe.py [sf_dir]
"""

import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("BEARLY_SHUFFLE_PARTITIONS", "16")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import pyspark.sql.functions as F

    from bearly_spark.session import get_spark
    from bearly_spark.streaming.cdc import apply_cdc_batch

    spark = get_spark("cdc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    n1 = od.count()
    base = Path("/tmp/cdc_probe")
    shutil.rmtree(base, ignore_errors=True)

    # fixed batch: clustered low-key upserts + deletes
    top = [r[0] for r in od.orderBy("o_orderkey").limit(600).collect()]
    keys_u, keys_d = top[:500], top[500:]
    batch = spark.createDataFrame(
        [(k, "U", 1.0, "u", 1) for k in keys_u]
        + [(k, None, None, "d", 1) for k in keys_d],
        "o_orderkey long, o_orderstatus string, o_totalprice double, op string, ts long",
    )

    for mult in (1, 8):
        tbl = od
        for i in range(1, mult):
            tbl = tbl.unionByName(
                od.select(
                    (F.col("o_orderkey") + n1 * i).alias("o_orderkey"),
                    "o_orderstatus",
                    "o_totalprice",
                )
            )
        path = base / f"t{mult}x"
        tbl.repartitionByRange(64, "o_orderkey").write.parquet(str(path))
        t0 = time.time()
        stats = apply_cdc_batch(spark, str(path), batch, ["o_orderkey"])
        t = time.time() - t0
        n = n1 * mult
        print(
            f"{mult}x table ({n} rows): files {stats['files_rewritten']}/"
            f"{stats['files_total']}, rows rewritten {stats['rows_written']} "
            f"({100 * stats['rows_written'] / n:.2f}%), apply {t:.2f}s"
        )
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

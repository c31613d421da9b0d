"""Micro-benchmark: the same computation through every Python-extension
strategy Spark offers, quantifying the PLANS.md guidance ("built-ins >
Arrow-batched > row-at-a-time"). Charge = extprice*(1-disc)*(1+tax),
summed per return flag, over sf0.1 lineitem (~600k rows), best-of-3
noop-sink runs.

    PYTHONPATH=/root/repo python tools/udf_bench.py
"""

from __future__ import annotations

import sys
import time

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.types import DoubleType


def main() -> None:
    from bearly_spark.session import get_spark
    spark = get_spark("udf-bench")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice", "l_discount", "l_tax"
    )
    li = li.persist()
    li.count()

    def charge_builtin(df):
        c = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        return df.groupBy("l_returnflag").agg(F.sum(c).alias("s"))

    @F.pandas_udf("double")
    def charge_pandas(p: pd.Series, d: pd.Series, t: pd.Series) -> pd.Series:
        return p * (1 - d) * (1 + t)

    def charge_pandas_udf(df):
        return df.groupBy("l_returnflag").agg(
            F.sum(charge_pandas("l_extendedprice", "l_discount", "l_tax")).alias("s")
        )

    py_row = F.udf(lambda p, d, t: p * (1 - d) * (1 + t), DoubleType(), useArrow=False)

    def charge_row_udf(df):
        return df.groupBy("l_returnflag").agg(
            F.sum(py_row("l_extendedprice", "l_discount", "l_tax")).alias("s")
        )

    py_arrow = F.udf(lambda p, d, t: p * (1 - d) * (1 + t), DoubleType(), useArrow=True)

    def charge_arrow_udf(df):
        return df.groupBy("l_returnflag").agg(
            F.sum(py_arrow("l_extendedprice", "l_discount", "l_tax")).alias("s")
        )

    def charge_map_in_arrow(df):
        import pyarrow as pa
        import pyarrow.compute as pc

        def fn(batches):
            for b in batches:
                c = pc.multiply(
                    pc.multiply(
                        b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"]),
                    ),
                    pc.add(pa.scalar(1.0), b["l_tax"]),
                )
                yield pa.RecordBatch.from_arrays(
                    [b["l_returnflag"], c], names=["l_returnflag", "c"]
                )

        return (
            df.mapInArrow(fn, "l_returnflag string, c double")
            .groupBy("l_returnflag")
            .agg(F.sum("c").alias("s"))
        )

    strategies = [
        ("builtin expressions (JVM codegen)", charge_builtin),
        ("pandas_udf (Arrow batches)", charge_pandas_udf),
        ("mapInArrow (pyarrow.compute)", charge_map_in_arrow),
        ("python udf useArrow=True", charge_arrow_udf),
        ("python udf row-at-a-time", charge_row_udf),
    ]

    # warm python workers
    w = F.pandas_udf(lambda s: s, "long")
    spark.range(0, 3200, 1, 32).select(w("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    for name, fn in strategies:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(li).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.3f}s", file=sys.stderr)
        print(f"{name}: {best:.3f}s")


if __name__ == "__main__":
    main()

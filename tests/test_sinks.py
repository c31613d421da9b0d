"""Partitioned-write sink: layout, partition pruning, value fidelity."""

import pyspark.sql.functions as F

from bearly_spark.registry import QUERIES
from bearly_spark.sources.tables import load_table


def test_partitioned_write_layout_and_pruning(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    orders.write.partitionBy("o_orderstatus").parquet(path)

    import os

    subdirs = sorted(d for d in os.listdir(path) if d.startswith("o_orderstatus="))
    assert subdirs == ["o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"]

    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "O")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0]

    expect = orders.filter(F.col("o_orderstatus") == "O").count()
    assert back.count() == expect


def test_partitioned_scan_query_matches_direct(spark, sf_dir):
    got = {
        tuple(r)
        for r in QUERIES["partitioned_scan_orders"](spark, sf_dir).collect()
    }
    direct = {
        tuple(r)
        for r in load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .collect()
    }
    assert got == direct


def test_range_clustered_write_produces_disjoint_file_spans(spark, sf_dir, tmp_path):
    """repartitionByRange+sortWithinPartitions must yield parquet files
    whose l_shipdate [min,max] spans are pairwise non-overlapping (modulo
    boundary duplicates) — the property that makes min/max row-group
    pruning effective. An unclustered write has every file spanning the
    whole range."""
    import os

    import pyarrow.parquet as pq

    orders = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "clustered")
    (
        orders.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.parquet(path)
    )
    spans = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["l_shipdate"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) >= 4
    spans.sort()
    overlaps = sum(1 for (a, b), (c, d) in zip(spans, spans[1:]) if c < b)
    assert overlaps == 0, spans

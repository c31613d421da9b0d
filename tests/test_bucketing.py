"""Bucketed-table co-located join: two tables bucketed on the join key
with the same bucket count must join with NO exchange on either side —
the pre-shuffle pattern that turns the recurring fact-fact shuffle into a
one-time layout cost at 100 TB."""

import io
import contextlib

import pyspark.sql.functions as F
import pytest

from bearly_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # default spark-warehouse/ under CWD (gitignored); warehouse.dir is a
    # static conf and cannot be redirected on a live session
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderstatus"
    )
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, df in [("b_lineitem", li), ("b_orders", od)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # the in-memory catalog forgets tables between sessions but the
        # warehouse directory persists — clear it or saveAsTable refuses
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .format("parquet")
            .saveAsTable(name)
        )
    return spark.table("b_lineitem"), spark.table("b_orders")


def _physical_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    li, od = bucketed_tables
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(od, "l_orderkey")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_result_matches_unbucketed(spark, sf_dir, bucketed_tables):
    li_b, od_b = bucketed_tables
    got = (
        li_b.join(od_b, "l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
        .collect()[0]
    )
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    want = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
        .collect()[0]
    )
    assert (got.n, got.s) == (want.n, want.s)

"""Focused pins for the round-14 optimization internals. Semantics are
covered by the oracle gate; these pin the edge cases and invariants the
round-14 changes introduced so a refactor cannot silently undo them."""

import pyspark.sql.functions as F

from bearly_spark.operators.quality import standardize


def test_standardize_overflow_falls_back_to_join_form(spark):
    """Values overflowing the decimal(18,2) stats cast NULL the sums
    while _n still counts raw rows; the literal fast path must detect
    that and fall back to the join form, which emits NULL z columns
    (the pre-r13 semantics) instead of raising TypeError (ADVICE r13)."""
    df = spark.createDataFrame(
        [(1, 1e17), (2, 2e17), (3, 3e17)], ["id", "v"]
    )
    out = standardize(df, ["v"]).orderBy("id").collect()
    assert [r["v_z"] for r in out] == [None, None, None]
    # sane inputs still take the literal path and produce real z values
    ok = standardize(
        spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], ["id", "v"]),
        ["v"],
    )
    zs = [r["v_z"] for r in ok.orderBy("id").collect()]
    assert zs == [-1.0, 0.0, 1.0]
    # and the literal plan has no join (the r13 invariant)
    assert "Join" not in ok._jdf.queryExecution().executedPlan().toString()

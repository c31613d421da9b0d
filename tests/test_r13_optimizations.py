"""Focused pins for the round-13 optimization internals: the
parallelism floor, the entity-match length-bound prefilter, and the
shared basket-item frame in association rules. Semantics are already
covered by the oracle gate and the hand-computed tests; these pin the
OPTIMIZATION invariants (floor widths, bound tightness at the emission
boundary, single derivation in the plan) so a refactor cannot silently
undo them."""

import pyspark.sql.functions as F

from bearly_spark.operators import dedup as D
from bearly_spark.operators.mining import association_rules, cooccurrence_pairs
from bearly_spark.operators.text import ensure_parallelism


def _one_file_parquet(spark, tmp_path, rows, cols):
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(rows, cols).coalesce(1).write.parquet(path)
    return spark.read.parquet(path)


def test_ensure_parallelism_floor_widths(spark, tmp_path):
    """A single-file scan is spread to the requested floor: full core
    width by default, the session shuffle width when asked; in-memory
    frames (no file listing) are returned untouched."""
    df = _one_file_parquet(
        spark, tmp_path, [(i, f"d{i}") for i in range(50)], ["id", "text"]
    )
    cores = spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() < cores  # premise: 1 file
    assert ensure_parallelism(df).rdd.getNumPartitions() == cores

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        got = ensure_parallelism(df, "shuffle").rdd.getNumPartitions()
        assert got == min(cores, 2)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    mem = spark.createDataFrame([(1, "x")], ["id", "text"])
    assert ensure_parallelism(mem) is mem  # no files -> untouched


def test_entity_match_length_bound_boundary(spark):
    """The round-13 prefilter bound (sim <= 1 - |Δlen|/max(len)) is
    TIGHT for pure-insertion pairs: lev("abc","abcdef") = 3 = Δlen, so
    the bound equals the true similarity and the pair sits exactly on
    ``possible_threshold``. Over-pruning by even half a micro would
    drop these boundary pairs; the margin must keep them emitted."""
    rows = [
        (1, "abc", "X"),
        (2, "abcdef", "X"),          # lev=3, max=6  -> sim 0.50 (tight)
        (3, "abcdefghijkl", "X"),    # vs 1: lev=9/12 -> sim 0.25 (tight)
    ]
    df = spark.createDataFrame(rows, ["id", "name", "brand"])
    fields = [("name", 0.5, "levenshtein"), ("brand", 0.5, "exact")]
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in D.entity_match_pairs(
            df, "id", ["brand"], fields,
            match_threshold=0.9, possible_threshold=0.75,
        ).collect()
    }
    # both boundary pairs score exactly 0.75 = possible_threshold and
    # their prefilter bound is exactly 0.75 too -> must be emitted
    assert got == {(1, 2): 0.75, (2, 3): 0.75}
    # (1, 3) scores 0.5*0.25 + 0.5 = 0.625 < 0.75: correctly absent,
    # and its bound (0.625) lets the prefilter prune it before the DP


def test_association_rules_single_derivation(spark, tmp_path):
    """Round 13: the distinct (basket, item) frame is derived ONCE and
    checkpointed; the four consumers read the pinned frame, so a
    parquet-backed input appears in the physical plan only through the
    checkpoint (no repeated file scans). Results are unchanged vs the
    un-checkpointed pair counts."""
    rows = [
        (1, "a"), (1, "b"), (1, "b"), (1, None),
        (2, "a"), (2, "b"), (2, "c"),
        (3, "a"), (3, "c"),
    ]
    df = _one_file_parquet(spark, tmp_path, rows, ["basket", "item"])
    rules = association_rules(df, "basket", "item", min_pair_count=1)
    plan = rules._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    assert "parquet" not in plan  # no re-scan outside the checkpoint

    got = {
        (r["antecedent"], r["consequent"]): r["pair_count"]
        for r in rules.collect()
    }
    pairs = {
        (r["item_a"], r["item_b"]): r["pair_count"]
        for r in cooccurrence_pairs(df, "basket", "item", min_count=1).collect()
    }
    assert pairs == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 1}
    # every pair surfaces as a rule (both directions) with the same
    # joint support
    assert {k: v for k, v in got.items() if k[0] < k[1]} == pairs
    assert {(b, a): v for (a, b), v in got.items() if a > b} == pairs

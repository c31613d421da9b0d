"""Planted-fixture tests for the pattern-mining operators."""

import pyspark.sql.functions as F
import pytest

from bearly_spark.operators.mining import (
    association_rules,
    cooccurrence_pairs,
    sequence_pattern,
)


def test_association_rules_hand_computed(spark):
    """4 baskets: {a,b,c} {a,b} {a,c} {b}. pairs(a,b)=2 pairs(a,c)=2
    pairs(b,c)=1. With min_pair_count=2: conf(a→b)=2/3, conf(b→a)=2/3,
    lift(a→b)=(2/3)/(3/4)=8/9."""
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r["antecedent"], r["consequent"]): r
    for r in association_rules(df, "basket", "item", min_pair_count=2).collect()}
    assert set(got) == {("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")}
    ab = got[("a", "b")]
    assert ab["pair_count"] == 2 and ab["support"] == 0.5
    assert ab["confidence"] == round(2 / 3, 6)
    assert ab["lift"] == round((2 / 3) / (3 / 4), 6)
    ca = got[("c", "a")]
    assert ca["confidence"] == 1.0 and ca["lift"] == round(1 / (3 / 4), 6)
    import math

    assert ab["cosine"] == round(2 / (math.sqrt(3) * math.sqrt(3)), 6)
    assert ca["cosine"] == round(2 / (math.sqrt(2) * math.sqrt(3)), 6)


def test_cooccurrence_presence_based_and_null_items(spark):
    """An item appearing twice in one basket counts once; NULL items
    are dropped; ordering invariant item_a < item_b."""
    rows = [(1, "x"), (1, "x"), (1, "y"), (1, None), (2, "y"), (2, "x")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = cooccurrence_pairs(df, "basket", "item").collect()
    assert [(r["item_a"], r["item_b"], r["pair_count"]) for r in got] == [
        ("x", "y", 2)
    ]


def test_sequence_pattern_counting_and_order(spark):
    """Non-overlapping leftmost counting; click runs absorbed; events
    ordered by (ts, id) not input order; keys with no match report 0."""
    rows = [
        # user 1: view,click,click,purchase,view,purchase  -> 2 matches
        (1, 1, 1, "view"), (1, 2, 2, "click"), (1, 3, 3, "click"),
        (1, 4, 4, "purchase"), (1, 5, 5, "view"), (1, 6, 6, "purchase"),
        # user 2: purchase,view (ts order flips input order) -> 0
        (2, 2, 8, "view"), (2, 1, 7, "purchase"),
        # user 3: view,error,purchase -> 0 (error breaks the run)
        (3, 1, 9, "view"), (3, 2, 10, "error"), (3, 3, 11, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    got = {
        r["user_id"]: r
        for r in sequence_pattern(
            df, "user_id", ["ts", "event_id"], "event_type",
            "view,(click,)*purchase",
        ).collect()
    }
    assert got[1]["n_matches"] == 2 and got[1]["matched"]
    assert got[1]["sequence"] == "view,click,click,purchase,view,purchase"
    assert got[2]["sequence"] == "purchase,view" and not got[2]["matched"]
    assert got[3]["n_matches"] == 0


def test_last_touch_attribution_planted(spark):
    """Purchase credits the most recent preceding touch; organic
    purchases (no prior touch) report NULL; later touches don't leak
    backward; ordering by (ts, id)."""
    from bearly_spark.operators.mining import last_touch_attribution

    rows = [
        (1, 1, 1, "view"),
        (1, 2, 2, "click"),
        (1, 3, 3, "purchase"),   # credited to click@2
        (1, 4, 4, "purchase"),   # still click@2 (no new touch)
        (2, 1, 5, "purchase"),   # organic
        (2, 2, 6, "view"),       # after the purchase — must not leak back
        (3, 1, 7, "error"),
        (3, 2, 8, "view"),
        (3, 3, 9, "purchase"),   # view@2 (error is not a touch)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    got = {
        r["event_id"]: r
        for r in last_touch_attribution(
            df, "user_id", ["ts", "event_id"], "event_type",
            ["view", "click"], "purchase",
        ).collect()
    }
    assert set(got) == {3, 4, 5, 9}
    assert got[3]["touch_type"] == "click" and got[3]["touch_ts"] == 2
    assert got[4]["touch_type"] == "click" and got[4]["touch_ts"] == 2
    assert got[5]["touch_type"] is None and got[5]["touch_ts"] is None
    assert got[9]["touch_type"] == "view" and got[9]["touch_ts"] == 2

"""Pattern-mining operators: market-basket association rules and
event-sequence pattern matching (CEP-lite).

Design for 100 TB:
- **Association rules** stay pairwise (the SQL-native core of Apriori):
  one distinct pass over (basket, item), one self-join shuffled on the
  basket key — pair rows are bounded by Σ basket_size², never by the
  item vocabulary — then Θ(distinct pairs) arithmetic with the item
  counts broadcast. Confidence/lift are single IEEE double divisions of
  exact integer counts, so they reproduce bit-identically in any engine
  (the DuckDB twins are literal).
- **Sequence patterns** reduce each key's event stream to ONE ordered
  symbol string (shuffle on the key, deterministic (order, symbol)
  sort) and run the regex once per key — Θ(keys) regex calls, never
  per-event state machines. Fixed alternation/star patterns have
  identical leftmost-match counting semantics in Java regex and RE2,
  which is what makes the twin exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _distinct_basket_items(
    df: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """The shared (basket, item) presence frame: null items dropped,
    presence-deduplicated, hash-partitioned on ``basket`` BEFORE the
    dedup so the aggregate's one exchange is keyed the way every
    consumer needs it (round 13, guide §2.4): HashPartitioning(basket)
    satisfies the (basket, item) dedup's clustering requirement AND the
    basket self-join's, so the pair join adds no further exchange."""
    return (
        df.select(F.col(basket_col).alias("basket"), F.col(item_col).alias("item"))
        .where(F.col("item").isNotNull())
        .repartition("basket")
        .dropDuplicates(["basket", "item"])
    )


def _pairs_from_distinct(b: DataFrame, min_count: int) -> DataFrame:
    """Pair counts over an already-distinct (basket, item) frame."""
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, F.col("l.basket") == F.col("r.basket"))
        .where(F.col("l.item") < F.col("r.item"))
        .groupBy(
            F.col("l.item").alias("item_a"), F.col("r.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
    )


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
) -> DataFrame:
    """Unordered item-pair co-occurrence counts: for every pair of
    distinct items appearing in the same basket, the number of baskets
    containing both. Presence-based (an item twice in one basket counts
    once — the association-rules contract). Output
    (item_a, item_b, pair_count) with item_a < item_b."""
    return _pairs_from_distinct(
        _distinct_basket_items(df, basket_col, item_col), min_count
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Market-basket association rules over pairwise itemsets: for each
    ordered rule antecedent→consequent with ≥ ``min_pair_count``
    co-occurrences, support / confidence / lift (6dp):

      support    = pairs(a,b) / n_baskets
      confidence = pairs(a,b) / baskets(a)
      lift       = confidence / (baskets(b) / n_baskets)

    Each unordered pair emits BOTH rule directions. Ratios are built
    from exact integer counts with the division SHAPE fixed (lift is
    confidence ÷ consequent-support, two divisions — never the
    overflow-prone pairs×n product), so every engine computes the same
    doubles. Item counts and the 1-row basket total are broadcast;
    nothing but the basket self-join shuffles.

    The distinct (basket, item) frame is pinned once
    (``localCheckpoint(eager=False)``) and feeds all four consumers —
    the pair self-join's two sides, the item counts and the basket
    total — instead of re-deriving the input scan + dedup per branch
    (round 13: the sf0.1 query re-ran the lineitem⋈part dedup subtree
    4x). The pin is Θ(distinct basket-item) — never larger than the
    input, usually far smaller — and keyed by basket so the self-join
    needs no exchange at any scale.

    localCheckpoint trade-off (round 14, ADVICE): the pinned blocks
    live on EXECUTOR-LOCAL storage, not reliable storage — on a real
    cluster losing an executor mid-query fails the job (no lineage to
    recompute) instead of recovering; re-run the query on failure. The
    pin also lives until the RDD is GC'd driver-side (per-call, not
    per-session, cleanup via ContextCleaner). Both are the standard
    ``localCheckpoint`` contract (guide §5); the bounded Θ(distinct
    basket-item) size keeps the exposure small."""
    b = _distinct_basket_items(df, basket_col, item_col).localCheckpoint(
        eager=False
    )
    pairs = _pairs_from_distinct(b, min_pair_count)
    rules = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_count",
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_count",
        )
    )
    item_counts = b.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    totals = b.agg(F.countDistinct("basket").alias("n_baskets"))
    ca = item_counts.select(
        F.col("item").alias("antecedent"), F.col("cnt").alias("cnt_a")
    )
    cb = item_counts.select(
        F.col("item").alias("consequent"), F.col("cnt").alias("cnt_b")
    )
    conf = F.col("pair_count").cast("double") / F.col("cnt_a")
    return (
        rules.join(F.broadcast(ca), "antecedent")
        .join(F.broadcast(cb), "consequent")
        .crossJoin(F.broadcast(totals))
        .select(
            "antecedent",
            "consequent",
            "pair_count",
            F.round(
                F.col("pair_count").cast("double") / F.col("n_baskets"), 6
            ).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(
                conf / (F.col("cnt_b").cast("double") / F.col("n_baskets")), 6
            ).alias("lift"),
            # cosine = pair / (sqrt(a)·sqrt(b)) — the item-item
            # collaborative-filtering similarity; sqrt per factor (not
            # sqrt of the product) keeps every intermediate within
            # double-exact range for any count
            F.round(
                F.col("pair_count").cast("double")
                / (
                    F.sqrt(F.col("cnt_a").cast("double"))
                    * F.sqrt(F.col("cnt_b").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )


def sequence_pattern(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    symbol_col: str,
    pattern: str,
    sep: str = ",",
) -> DataFrame:
    """Event-sequence pattern matching (the MATCH_RECOGNIZE-lite /
    complex-event-processing face): each key's events are ordered by
    ``order_cols`` (include a unique tiebreaker for determinism),
    reduced to one ``sep``-joined symbol string, and matched against a
    regex over that string — e.g. ``view,(click,)*purchase`` counts
    view→purchase conversions with any run of clicks between.

    Output (key, sequence, n_matches, matched). Counting is
    non-overlapping leftmost matches — identical in Java regex and RE2
    for alternation/star patterns (no backrefs/lookaround), which keeps
    cross-engine twins exact. One shuffle on the key; the regex runs
    once per KEY, not per event."""
    ordered = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in order_cols], F.col(symbol_col)))
    )
    seq = F.array_join(
        F.transform(ordered, lambda s: s[symbol_col]), sep
    ).alias("sequence")
    out = df.groupBy(F.col(key_col)).agg(seq)
    n = F.coalesce(
        F.regexp_count(F.col("sequence"), F.lit(pattern)), F.lit(0)
    ).alias("n_matches")
    return out.select(
        key_col, "sequence", n
    ).withColumn("matched", F.col("n_matches") > 0)


def last_touch_attribution(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    type_col: str,
    touch_types: list[str],
    conversion_type: str,
) -> DataFrame:
    """Last-touch attribution: each conversion event is credited to the
    most recent PRECEDING touch event (any of ``touch_types``) in the
    same key's ordered stream — the marketing-analytics primitive
    beside the funnel. Conversions with no prior touch report NULL
    (organic — an honest bucket, not dropped).

    One window per key: the touch columns carry forward with
    ``last(..., ignorenulls=True)`` over rows-preceding frames, so the
    whole thing is a single shuffle on the key + per-partition sort —
    no self-join, O(1) state per row. Returns one row per conversion:
    (key, conversion order cols, touch_type, touch_<first order col>).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(touch_types)
    touch_type = F.last(F.when(is_touch, F.col(type_col)), ignorenulls=True).over(w)
    touch_ord = F.last(
        F.when(is_touch, F.col(order_cols[0])), ignorenulls=True
    ).over(w)
    return (
        df.select(
            key_col,
            *order_cols,
            type_col,
            touch_type.alias("touch_type"),
            touch_ord.alias(f"touch_{order_cols[0]}"),
        )
        .where(F.col(type_col) == conversion_type)
        .drop(type_col)
    )

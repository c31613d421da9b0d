"""Relational operators: filter/project, joins, set ops, sort/limit/top-k.

The reference has none of these (SURVEY §2.2) — this module is the
capability superset, kept as thin declarative wrappers so Catalyst gets an
unobstructed logical plan (predicate pushdown, column pruning, join
reordering, broadcast selection all apply).

Scale notes (100 TB posture):
- equi-joins of two fact tables shuffle on the join key — keep keys
  high-cardinality and let AQE's skew-join split hot keys;
- dimension joins should broadcast: ``join_broadcast`` forces the hint, and
  the session raises ``autoBroadcastJoinThreshold`` so Catalyst picks BHJ
  on its own for catalog-sized dims;
- top-k per group uses a rank-window; at scale, pre-aggregate or
  pre-filter before the window when the predicate allows.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def project_filter(df: DataFrame, cols: Sequence[str | Column], predicate: Column | None) -> DataFrame:
    """SELECT cols FROM df WHERE predicate — pushdown-friendly."""
    out = df
    if predicate is not None:
        out = out.filter(predicate)
    return out.select(*cols)


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Equi/theta join. ``how``: inner, left, right, full, left_semi,
    left_anti, cross."""
    return left.join(right, on=on, how=how)


def join_broadcast(left: DataFrame, right_small: DataFrame, on, how: str = "inner") -> DataFrame:
    """Join with an explicit broadcast hint on the (small) right side —
    shuffle-free on the big side."""
    return left.join(F.broadcast(right_small), on=on, how=how)


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def intersect(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.intersectAll(b) if all else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.exceptAll(b) if all else a.subtract(b)


def sort_limit(df: DataFrame, order: Sequence[Column], n: int | None = None) -> DataFrame:
    """Global sort (+ optional limit). With a limit, Spark runs TakeOrdered
    per-partition then merges k·p rows on the driver — no full sort."""
    out = df.orderBy(*order)
    return out.limit(n) if n is not None else out


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "_rn",
    n_parts: int | None = None,
) -> DataFrame:
    """0-based GLOBAL row index by a total order WITHOUT the
    single-task sort that ``row_number().over(Window.orderBy(...))``
    compiles to (``Exchange SinglePartition`` + whole-table sort — the
    plan that serializes at scale). The textbook two-pass distributed
    ranking instead: range-repartition on the order key, sort within
    partitions, per-partition ``row_number``, then add each
    partition's prefix offset (one tiny Θ(partitions) count aggregate,
    attached as a literal map). Output ranks are identical to the
    window form and independent of where the sampled range bounds
    land — ``order_cols`` must be a TOTAL order (include a unique
    tie-break column), otherwise tie order is partition-dependent.

    Cost: one range shuffle + one Θ(partitions) count + one map-side
    rank pass — every stage parallel, nothing single-task."""
    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint (not persist): the counts job and the caller's
    # output job share the materialized range shuffle, and the blocks
    # are released by the ContextCleaner when the returned frame is
    # garbage-collected — a bare .persist() here accumulated cached
    # partitions for the session lifetime across repeated callers
    # (gini, negative-sampling, every bench round). LAZY: the counts
    # collect below is the materializing job — eager=True would spend
    # a third job on materialization alone.
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("_gpid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = sorted(
        (r["_gpid"], r["c"])
        for r in ranged.groupBy("_gpid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, acc = {}, 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    off_map = (
        F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        )[F.col("_gpid")]
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_gpid").orderBy(*[F.col(c) for c in order_cols])
    return (
        ranged.withColumn(
            out_col, F.row_number().over(w) - 1 + F.coalesce(off_map, F.lit(0))
        )
        .drop("_gpid")
    )


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number window.

    One shuffle on the group keys; Spark's WindowGroupLimit pushes the
    ``rn <= k`` limit into the sort at the exec level (rank-limit
    optimization), so per-group state stays O(k).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tie_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the latest right row
    with ``right_ts <= left_ts`` for the same ``key`` (NULLs when none).

    Scale design: Spark has no ASOF JOIN operator, and expressing it as a
    non-equi join degenerates to a per-key cross product. Instead both
    sides are unioned and processed with ONE shuffle+sort per key and a
    running ``last(value, ignorenulls)`` window — the classic
    merge-as-of, linear in rows, no candidate blowup, AQE-skew-splittable.

    Ties on ``right_ts`` resolve to the row with the greatest
    ``tie_cols`` (default: ``value_cols`` order), deterministically.
    Right rows sort before left rows at equal timestamps, so an exactly
    coincident right row IS matched (<= semantics).
    """
    tie_cols = list(tie_cols or value_cols)
    rv_struct = F.struct(*[F.col(c) for c in value_cols]).alias("_rv")
    rv_type = right.select(rv_struct).schema[0].dataType

    lhs = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).cast("long").alias("_t"),
        F.lit(1).alias("_is_l"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    rhs = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).cast("long").alias("_t"),
        F.lit(0).alias("_is_l"),
        F.lit(None).cast(left.select(F.struct(*left.columns).alias("s")).schema[0].dataType).alias("_lrow"),
        rv_struct,
    )
    order = [F.col("_t").asc(), F.col("_is_l").asc()] + [
        F.col(f"_rv.{c}").asc_nulls_first() for c in tie_cols
    ]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = lhs.unionByName(rhs).withColumn("_asof", F.last("_rv", ignorenulls=True).over(w))
    return matched.filter(F.col("_is_l") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in value_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_offset: int,
    upper_offset: int,
) -> DataFrame:
    """Interval/range join: pairs (l, r) sharing ``key`` with
    ``l.left_ts + lower < r.right_ts <= l.left_ts + upper``.

    With an equi key this is a plain hash join plus a residual range
    predicate — shuffle on the key only, no cross product. (For a PURE
    range join with no equi key, bucketize time to ``upper-lower``-sized
    buckets, equi-join on bucket ± 1, then apply the residual — same
    shape, bounded candidates.)
    """
    lt = F.col(f"l.{left_ts}").cast("long")
    rt = F.col(f"r.{right_ts}").cast("long")
    return left.alias("l").join(
        right.alias("r"),
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt > lt + lower_offset)
        & (rt <= lt + upper_offset),
    )


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi join: salt the big side's hot keys across
    ``salt`` sub-keys and replicate the small side once per sub-key.

    Use when a handful of join keys dominate (power-law FKs) and AQE's
    skew-join split isn't available/enough — e.g. a shuffle-hash join
    where one key holds 30% of rows would put 30% of the data in one
    task. Salting bounds any task at ~1/salt of the hot key.

    Cost: small side replicated ×salt (keep it broadcast-small), and the
    shuffle key becomes (key, salt_id) — uniform by construction.

    ``inner``/``left`` run directly on the salted keys. ``right``/``full``
    cannot: an unmatched small-side row would survive once per salt
    replicate, and a row matched under ONE salt would still emit its
    other replicates as spurious null-extended rows. Those modes are
    instead composed as ``salted-inner ∪ null-extended remainders``:

    - small-side remainder = small ANTI-JOIN distinct(big keys). The key
      set is reduced by a partial (map-side) aggregate first, so a hot
      key collapses to one row per input partition before the shuffle —
      skew never concentrates on one task;
    - big-side remainder (``full`` only) = big ANTI-JOIN small, which
      broadcasts the small side — no shuffle of the big side at all.
    """
    norm = {
        "inner": "inner",
        "left": "left", "left_outer": "left", "leftouter": "left",
        "right": "right", "right_outer": "right", "rightouter": "right",
        "full": "full", "outer": "full", "full_outer": "full", "fullouter": "full",
    }
    if how not in norm:
        raise ValueError(f"salted_join: unsupported how={how!r}")
    mode = norm[how]

    big_salted = big.withColumn("_salt", (F.abs(F.hash(F.monotonically_increasing_id())) % salt))
    small_rep = skewed_small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    if mode in ("inner", "left"):
        return big_salted.join(small_rep, on=[on, "_salt"], how=mode).drop("_salt")

    inner = big_salted.join(small_rep, on=[on, "_salt"], how="inner").drop("_salt")

    def _null_extend(df: DataFrame, other: DataFrame) -> DataFrame:
        """Add `other`'s non-key columns as typed nulls, matching the
        inner join's output schema for unionByName."""
        out = df
        for f in other.schema.fields:
            if f.name != on:
                out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
        return out

    # distinct() here is the skew shield: partial aggregation collapses a
    # hot key locally before its single-row-per-partition shuffle.
    unmatched_small = _null_extend(
        skewed_small.join(big.select(on).distinct(), on, "left_anti"), big
    )
    out = inner.unionByName(unmatched_small)
    if mode == "full":
        unmatched_big = _null_extend(
            big.join(F.broadcast(skewed_small.select(on).distinct()), on, "left_anti"),
            skewed_small,
        )
        out = out.unionByName(unmatched_big)
    return out


def key_skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Join-key skew diagnostic: the top-N heaviest key values with their
    row share — run this BEFORE a big join to decide between plain
    shuffle, AQE skew split, and :func:`salted_join` (a key holding >1/
    shuffle-partitions of the rows will bottleneck one task).

    ONE pass over the fact: a single ``rollup(key)`` aggregate yields
    both the per-key counts and the grand total (grouping_id
    distinguishes the total row from a genuine NULL key), so there is no
    separate full-scan ``df.count()``; the two consumers of the rollup
    are identical subplans, which Spark's ReuseExchange collapses. The
    top-N is an explicit ``orderBy().limit()`` (TakeOrderedAndProject —
    per-partition bounded heap + driver merge), not a rank-filter that
    relies on WindowGroupLimit pushdown; the rank window then runs over
    at most ``top_n`` rows. Nothing key-space-sized reaches the driver,
    so it runs at any scale the join itself would.

    Output: (key_value, n_rows, share, rank) ordered by rank.
    """
    agg = df.rollup(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows"), F.grouping_id().alias("_gid")
    )
    total = agg.filter(F.col("_gid") == 1).select(F.col("n_rows").alias("_total"))
    top = (
        agg.filter(F.col("_gid") == 0)
        .orderBy(F.desc("n_rows"), F.asc("key_value"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("n_rows"), F.asc("key_value"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("share", F.round(F.col("n_rows") / F.col("_total"), 6))
        .select("key_value", "n_rows", "share", "rank")
    )


def topn_with_others(
    df: DataFrame,
    group_cols: list[str],
    cat_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-group top-N categories with an OTHERS rollup — the reporting
    primitive behind every "top 3 + other" breakdown: per group, the N
    most frequent ``cat_col`` values keep their label (ties broken
    count DESC then category ASC, a total order both engines share) and
    everything else folds into the literal ``'other'`` bucket, with
    6dp within-group share. NULL categories count as a real bucket via
    a sentinel-free NULL-safe grouping (they compete for top-N as the
    label NULL).

    Scale shape: one (group, cat) wordcount shuffle, a per-group rank
    over the aggregated (vocabulary-sized) counts, then a re-aggregate
    on the same group partitioning — no second corpus pass, no global
    sort."""
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols, cat_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("cnt"), F.asc_nulls_last(cat_col)
    )
    wg = Window.partitionBy(*group_cols)
    ranked = counts.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_tot", F.sum("cnt").over(wg)
    )
    labeled = ranked.select(
        *group_cols,
        F.when(F.col("_rn") <= n, F.col(cat_col).cast("string"))
        .otherwise(F.lit("other"))
        .alias("category"),
        "cnt",
        "_tot",
    )
    return labeled.groupBy(*group_cols, "category").agg(
        F.sum("cnt").alias("n_rows"),
        F.round(F.sum("cnt") / F.max("_tot"), 6).alias("share"),
    )

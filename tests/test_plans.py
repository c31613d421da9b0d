"""Physical-plan invariants over the ENTIRE registry — the regression
net behind PLANS.md's audit claims. Plans are compiled (not executed),
so this sweeps all queries cheaply.
"""

import pyspark.sql.functions as F
import pytest

from bearly_spark.registry import QUERIES
from bearly_spark.sources.tables import load_table

# Queries allowed to contain a cartesian/nested-loop join node:
# - cross_join_priority_status: intentional CROSS JOIN of two
#   distinct-reduced 5-value dimensions;
# - jaccard_pairs_sample / dedup_components_jaccard / dedup_components_star:
#   bounded brute-force pair generation (doc_id < 200 contract) — the
#   documented exactness oracles for the banded paths;
# - q11_important_part_value / q17_small_qty_revenue / q15_top_supplier /
#   embedding_topk_cosine (scalar-subquery comparisons): Catalyst plans an
#   uncorrelated one-row scalar subquery join as BroadcastNestedLoopJoin —
#   one row against the stream, constant cost.
CARTESIAN_ALLOWED = {
    "cross_join_priority_status",
    "jaccard_pairs_sample",
    "dedup_components_jaccard",
    "dedup_components_star",
    "q11_important_part_value",
    "q15_top_supplier",
    "q17_small_qty_revenue",
}


def _plan_of(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# Queries allowed to fail plan-compile without external setup. Currently
# EMPTY: every registry query compiles against the bare fixture dir. A
# query that starts throwing here is a regression, not a skip — add it to
# this set only with a comment naming the setup it needs.
COMPILE_SETUP_ALLOWED: set[str] = set()


def test_no_accidental_cartesian_products(spark, sf_dir):
    """No registry query may compile to CartesianProduct, and
    BroadcastNestedLoopJoin is only tolerated where a bounded brute-force
    or one-row scalar-subquery makes it intentional. Catches the classic
    silent scale-killer: a join whose condition stopped being an equi
    key after a refactor. Compile errors fail the test too — silently
    skipping a broken query would exclude it from the sweep."""
    offenders = {}
    compile_errors = {}
    for name in QUERIES:
        try:
            plan = _plan_of(spark, name, sf_dir)
        except Exception as e:  # noqa: BLE001 — recorded and asserted below
            if name not in COMPILE_SETUP_ALLOWED:
                compile_errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
            continue
        has_cart = "CartesianProduct" in plan
        has_bnlj = "BroadcastNestedLoopJoin" in plan
        if (has_cart or has_bnlj) and name not in CARTESIAN_ALLOWED:
            offenders[name] = ("CartesianProduct" if has_cart else "BNLJ")
    assert not compile_errors, compile_errors
    assert not offenders, offenders


def test_key_plan_properties_hold(spark, sf_dir):
    """Spot-pin the headline plan claims from PLANS.md so they cannot
    silently regress."""
    plan = _plan_of(spark, "filter_project_lineitem", sf_dir)
    assert "PushedFilters" in plan and "l_shipdate" in plan

    plan = _plan_of(spark, "topk_orders_per_customer", sf_dir)
    assert "WindowGroupLimit" in plan

    plan = _plan_of(spark, "q5_regional_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan

    # type-gated sum reads only the 3 bigint columns
    plan = _plan_of(spark, "sum_lineitem_int64", sf_dir)
    assert "l_orderkey" in plan and "l_extendedprice" not in plan

"""Query registry: the (queries, oracle_sql) driver contract surface.

Every operator family from SURVEY §2 (and the LLM-pipeline extensions of
§2.3) is represented by at least one named query. Each entry is a callable
``(spark, sf_dir) -> DataFrame``; where the semantics are SQL-expressible
the matching DuckDB oracle SQL lives in ``ORACLE`` with **identical column
aliases** (the driver sorts columns by name before hashing values).

Determinism rules applied throughout (so Spark and DuckDB hash-match):
- every float aggregate is ROUND()ed (2dp for money sums, 4-6dp for
  ratios/similarities) — kills last-ulp differences from summation order;
- high-group-count money sums additionally cast each row to
  decimal(18,6) BEFORE the SUM (exact, order-independent): with
  thousands of output groups, double summation-order noise lands ON the
  rounding boundary for a handful of groups (observed 15/4188 in q7);
- every LIMIT is preceded by a total order including a unique key;
- rankings order by (rounded value, unique id) so ties break identically;
- event-time math is integer arithmetic on epoch seconds derived from the
  stored int64 nanos (exact in both engines; no float epoch conversion).

Queries with no oracle entry get the driver's weaker rows-only check and
are instead pinned by planted-fixture tests in tests/. Round 4 shrank
that set to the genuinely non-SQL-expressible: sketch bytes (HLL,
approx-percentile) and IVF's seeded k-means fit. The hyperplane-LSH
family and winnowing were converted in round 3 (deterministic constants
— float64 plane matrix, rolling-hash powers — inlined into the DuckDB
SQL; see _ann_lsh_oracle/_near_dup_oracle/_winnow_oracle); the entire
minhash/simhash family followed in round 4 by switching their token
hash to an md5-derived 64-bit value both engines compute and the band
bucket key to md5 over the signature slice (see _minhash_graph_ctes/
_simhash_oracle — the 64-permutation signature is rebuilt in SQL with
32-bit-split mulmod arithmetic).
"""

from __future__ import annotations

from bearly_spark.registry._core import ORACLE, QUERIES, register  # noqa: F401

# Family modules register their queries at import time. PREFIX_ORDER
# below then reorders QUERIES so the driver's first-50 sample hits one
# representative of every family regardless of module import order.
from bearly_spark.registry import _shared  # noqa: F401,E402
from bearly_spark.registry import reference_q  # noqa: F401,E402
from bearly_spark.registry import scans_q  # noqa: F401,E402
from bearly_spark.registry import relational_q  # noqa: F401,E402
from bearly_spark.registry import aggregates_q  # noqa: F401,E402
from bearly_spark.registry import windows_q  # noqa: F401,E402
from bearly_spark.registry import sql_surface_q  # noqa: F401,E402
from bearly_spark.registry import python_ext_q  # noqa: F401,E402
from bearly_spark.registry import streaming_q  # noqa: F401,E402
from bearly_spark.registry import tpch_q  # noqa: F401,E402
from bearly_spark.registry import dedup_q  # noqa: F401,E402
from bearly_spark.registry import similarity_q  # noqa: F401,E402
from bearly_spark.registry import text_q  # noqa: F401,E402
from bearly_spark.registry import curation_q  # noqa: F401,E402
from bearly_spark.registry import multimodal_q  # noqa: F401,E402
from bearly_spark.registry import graph_q  # noqa: F401,E402
from bearly_spark.registry import stats_q  # noqa: F401,E402
from bearly_spark.registry import maintenance_q  # noqa: F401,E402



# ===================================================================
# Prefix-sample ordering
# ===================================================================
#
# ``PREFIX_ORDER`` is the PUBLIC, explicit family-coverage ordering: the
# first 50 names carry one representative of EVERY operator family from
# SURVEY §2 (reference parity, each scan format, each
# join/agg/window/setop/scalar family, subqueries, streaming twins,
# UDF/UDAF/UDTF/cogroup, every dedup algorithm, similarity, text,
# multimodal, dataset ops). Consumers that want family-first iteration
# (e.g. a harness that samples only the first N queries — the driver's
# round-1 correctness run recorded exactly the first 50 registrations)
# should iterate this list. Because the driver harness iterates the
# ``QUERIES`` dict directly and cannot be pointed at a list, the dict is
# ALSO reordered at import time to match (representatives first, then
# remaining queries in registration order) — that reordering is a
# driver-contract shim, and this list is the source of truth for it.

PREFIX_ORDER = [
    # reference parity
    "sum_lineitem_int64",
    "produce_array",
    "produce_stream",
    "sum_produce_stream",
    # scan formats (r9 rotation: csv_scan_nation + orc_scan_supplier
    # left the prefix driver-green; the XML scan and the
    # partition-pruned directory scan — never driver-sampled — keep
    # three format seats beside JSON)
    "json_scan_orders",
    "xml_scan_supplier",  # r9 rotation
    "partitioned_scan_orders",  # r9 rotation
    # relational core (r9: filter_project left driver-green — pushdown
    # stays pinned in test_plans; the temporal/point-in-time join —
    # never driver-sampled — widens the join family)
    "temporal_join_orders_customer",  # r9 rotation
    "q1_pricing_summary",
    # (q7_nation_volume left the prefix driver-green in r8; q9 — a
    # never-driver-sampled TPC-H join shape — keeps the multi-join
    # family)
    "q9_product_type_profit",  # r8 rotation
    "asof_join_orders_events",
    "range_join_purchase_follow",
    # aggregation families (approx_count_distinct_orders left the prefix
    # in r3: rows-only by nature — bitmap_distinct_orders carries the
    # distinct-counting family with an exact oracle instead;
    # grouping_sets left driver-green in r9 and the equi-depth
    # histogram — never sampled AND on the fresh distributed-selection
    # percentile path — takes the seat)
    "histogram_depth_orders",  # r9 rotation
    "percentiles_lineitem",
    "bitmap_distinct_orders",
    # stats family: MAD stays a second round — its global-percentile
    # plan was REPLACED in r9 (distributed selection instead of the
    # single-partition sort) and the fresh path wants a driver row
    "mad_outliers_lineitem",
    # windows / top-k (r9: funnel left driver-green; RFM quartile
    # scoring — never sampled, fresh percentile path — takes the slot;
    # topk keeps ranking, ewma keeps frames)
    "rfm_segments_customer",  # r9 rotation
    "topk_orders_per_customer",
    # EWMA stays A FOURTH round: red r06/r07/r08 (ROUND midpoint →
    # floor-form ulp → exact-integer list_reduce under the driver's
    # DuckDB build); r9 removed the lambda surface entirely (reduce-free
    # lag()-literal twin) and compares BIGINT micros
    "ewma_revenue_priority",
    # set ops (r9: set_intersect_custkeys left driver-green; the
    # MULTISET intersect — never sampled — keeps the family)
    "set_intersect_all_quantities",  # r9 rotation
    # table maintenance (r7 rotation: merge_upsert_orders left the
    # prefix driver-green; SCD2 history + snapshot diff — never
    # driver-sampled — take the family's two slots; MERGE stays in the
    # full gate)
    "scd2_customer_history",  # r7 rotation
    "table_diff_orders",  # r7 rotation
    # scalar function packs (r9: date_funcs left driver-green; regexp
    # funcs — never sampled — keep the family beside variant)
    "regexp_funcs_documents",  # r9 rotation
    "variant_events_props",
    # data-quality expectations (r6): the per-batch validation gate
    "dq_expectations_orders",
    # multimodal dedup (r6): block-hash near-dup over binary payloads —
    # the binary-column counterpart of the MinHash family
    "binary_near_dup_documents",
    # subqueries / decorrelation / classic TPC-H shapes
    # (q19_disjunctive_revenue left the prefix in r6 — five shape reps
    # keep the family; it stays in the full gate)
    # (subquery_above_avg_orders left the prefix in r6 — lateral + q4
    # keep the decorrelation family; it stays in the full gate)
    # (q6_forecast_revenue left the prefix in r6-late — q1 keeps the
    # scan-agg shape; it stays in the full gate)
    # (lateral_topk_orders left the prefix driver-green in r8; the
    # recursive CTE — never driver-sampled — keeps the SQL-surface
    # family beside q4's decorrelation)
    "recursive_order_hierarchy",  # r8 rotation
    "q4_order_priority_check",
    # sketches (r9: cms_frequencies left driver-green; the PERSISTED
    # CMS index probe — never sampled — keeps the family)
    "cms_index_query",  # r9 rotation
    # graph analytics (r9: pagerank left driver-green; personalized
    # pagerank — never sampled, the r8 LONG fast path — takes the slot)
    "ppr_supplier_part",  # r9 rotation
    # ANN (r9: embedding_ann_pq + embedding_ann_lsh left driver-green;
    # the persisted IVF index probe and chunk-level retrieval — never
    # sampled — keep the family beside the LSH index probe)
    "ivf_index_query",  # r9 rotation
    "ann_index_query",  # r8 rotation
    # streaming batch twins (r9: tumbling left driver-green; the
    # hourly→daily incremental rollup — never sampled — keeps the
    # window family beside sessionization)
    "events_rollup_hourly_daily",  # r9 rotation
    "events_sessionization",
    # python extension points (r9: pandas_udf_charge left driver-green;
    # applyInArrow grouped stats — never sampled — keeps the family
    # beside the UDTF)
    "arrow_grouped_discount_stats",  # r9 rotation
    "udtf_tokenize_docs",
    # product analytics (r9: cohort retention left driver-green;
    # last-touch attribution — never sampled — keeps the family)
    "attribution_events",  # r9 rotation
    # LLM-pipeline: dedup (fingerprint_winnow_pairs joined r3 via the
    # HUGEINT rolling-hash twin; dedup_simhash joined r4 — the md5-derived
    # token hash made its full pipeline DuckDB-recomputable — taking the
    # slot of jaccard_pairs_sample, whose brute-force baseline stays
    # oracle-checked in the full gate)
    "dedup_exact_documents",
    # near-dup (r9: substring_dup_spans left driver-green; the CCNet
    # line-frequency CLEAN stage — never sampled — takes the slot;
    # minhash keeps the banded-LSH family)
    "line_dedup_clean_documents",  # r9 rotation
    "dedup_minhash_lsh",
    # dataset ops (r9: weighted_sample left driver-green; mixture
    # resampling — never sampled — keeps the family)
    "mixture_resample_documents",  # r9 rotation
    # entity resolution (r7 rotation: golden_records_parts left the
    # prefix driver-green; the pair-match stage — never driver-sampled
    # — takes the family slot)
    "entity_match_parts",  # r7 rotation
    "winnow_clusters_documents",  # r7 rotation
    # LLM-pipeline: similarity / retrieval / text / multimodal / dataset
    # ops (embedding_ann_lsh joined r3 — oracle-checked via inlined
    # planes; bm25_search_documents joined r4 as the lexical-retrieval
    # family rep, taking the slot of embedding_topk_cosine, which remains
    # the ANN exactness oracle in the full gate)
    "bm25_search_documents",
    # persisted-inverted-index retrieval (r6): same twin, index path
    "bm25_index_search_documents",
    "chunk_embedding_topk",  # r9 rotation
    # text quality (r9: text_stats left driver-green; the C4 rule pack
    # — never sampled — keeps the family beside TF-IDF + the pipeline)
    "c4_rules_documents",  # r9 rotation
    "multimodal_decode_features",
    # (collocations_documents left the prefix driver-green in r8;
    # TF-IDF keywords — never driver-sampled — keeps the text family)
    "tfidf_keywords_documents",  # r8 rotation
    "pipeline_clean_corpus",
]


def _apply_prefix_order() -> None:
    missing = [n for n in PREFIX_ORDER if n not in QUERIES]
    if missing:  # fail loudly at import if a rename breaks the list
        raise RuntimeError(f"PREFIX_ORDER names unknown queries: {missing}")
    tail = [(n, fn) for n, fn in QUERIES.items() if n not in set(PREFIX_ORDER)]
    items = [(n, QUERIES[n]) for n in PREFIX_ORDER] + tail
    # mutate in place: callers hold references to this exact dict
    QUERIES.clear()
    QUERIES.update(items)


_apply_prefix_order()

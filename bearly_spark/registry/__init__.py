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
from bearly_spark.registry import clustering_q  # noqa: F401,E402
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
    # ---- round-10 prefix: 46 of 50 seats are FIRST-EVER driver seats
    # (r9 verdict #4: 89 registry queries had never been sampled; every
    # r9-green seat rotates out — its certification is on record — and
    # the never-sampled backlog drains through the sample instead).
    # Kept seats: the two reference-parity anchors, q1 (flagship agg)
    # and ewma_revenue_priority (red 4 rounds — now minimal-surface,
    # flanked by its three bisect probes).
    # reference parity (produce_array / produce_stream left driver-green
    # r1-r9; sum_produce_stream exercises both producers + the sum path)
    "sum_lineitem_int64",
    "sum_produce_stream",
    # scan/layout formats (json/xml/partitioned left driver-green r9;
    # the bucketed layout — never sampled — takes the family seat;
    # zorder yielded its seat to the semantic-index query: one layout
    # representative suffices and the Z-order path is oracle-gated +
    # plan-tested locally)
    "clustered_scan_lineitem",
    # TPC-H: q1 stays (flagship scan-agg); nine never-sampled tail
    # shapes take their first seats (q9/q4 left driver-green r8/r9)
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q8_nation_market_share",
    "q10_returned_items",
    "q13_customer_order_histogram",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    # join family (asof/range/temporal left driver-green r9; the full
    # outer and the as-of-over-SCD2 form are fresh. cross_join yielded
    # its seat to the round-10 clustering family — cartesian-of-dims is
    # the thinnest fresh signal in the block)
    "full_outer_status_counts",
    "scd2_asof_customer",
    # reshape / collect aggregates (grouping-sets family green r9;
    # pivot carries the reshape seat — unpivot/collect_agg yielded
    # theirs to the clustering family and wait for r11)
    "pivot_orders_status",
    # windows (topk/rfm/attribution/sessionization left green r9; the
    # median/mode, RANGE frame, gap interpolation, rolling z-score and
    # seasonality forms are fresh — seasonality also shares the ewma
    # daily CTE, a bonus bisect signal)
    "median_mode_orders",
    "window_range_frame_orders",
    "interpolate_events",
    "anomaly_zscore_orders",
    "seasonality_orders",
    # percentile family (percentiles/mad/histogram-depth green r9; the
    # 25-group distributed-selection regime and the equi-WIDTH
    # histogram are fresh)
    "nation_percentiles_lineitem",
    "histogram_prices_orders",
    # EWMA bisect block: the minimal-surface main query (red r6-r9)
    # plus its three diagnostic probes — see registry/windows_q.py
    "ewma_revenue_priority",
    "ewma_probe_base",
    "ewma_probe_lag",
    "ewma_probe_full",
    # SQL surface (recursive CTE / q4 decorrelation green r8/r9)
    "subquery_exists_customers",
    "pipe_syntax_orders",
    # scalar function packs (regexp/variant green r9; map funcs fresh)
    "map_funcs_events",
    # event analytics (rollup/sessionization green r9; the MATCH-
    # RECOGNIZE-shaped funnel and rolling active users are fresh)
    "sequence_pattern_events",
    "active_users_events",
    # python extension points (arrow-grouped/UDTF green r9)
    "arrow_map_charge_buckets",
    # graph (ppr green r9; star-contraction components, triangles and
    # local clustering coefficients take first seats)
    "dedup_components_star",
    "triangle_count_parts",
    "local_clustering_parts",
    # ANN / similarity (ann/ivf/chunk green r9; IVF-PQ residual rerank
    # and the feature-hashed embedding retrieval are fresh)
    "ivfpq_residual_query",
    "hashed_embedding_topk",
    # semantic clustering / curation (NEW round-10 family: integer-grid
    # Lloyd k-means, SemDeDup per-cell drops, D4 prototypes — all three
    # take immediate seats so the new code is driver-certified in the
    # round it shipped)
    "kmeans_clusters_embeddings",
    "semdedup_embeddings",
    "prototypes_embeddings",
    "semdedup_index_query",
    # dedup (exact/minhash-pairs/line-dedup/entity/winnow green r9; the
    # minhash CLUSTER assembly takes the family seat)
    "dedup_clusters_minhash",
    # text retrieval (bm25 single + index green r9; multi-query fresh)
    "bm25_multi_search_documents",
    # curation packs (c4/mixture/pipeline green r9; the gopher rules,
    # PII redaction, sequence packing and exact decontamination are
    # fresh)
    "gopher_quality_documents",
    "pii_redact_documents",
    "pack_sequences_documents",
    "decontaminate_documents",
    # multimodal (BMP decode + binary near-dup green r9; the WAV decode
    # joined post-certification — r9 verdict #3 wants its driver row)
    "multimodal_wav_decode_features",
    # table maintenance (scd2/diff/dq/merge green r7-r9; the
    # incremental hourly→daily rollup maintenance form is fresh)
    "incremental_rollup_orders",
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

"""One-shot mechanical splitter: bearly_spark/registry.py -> package.

Round-7 verdict #8: registry.py is 8.4k lines and growing ~40/query.
This script carves it into SEMANTIC family modules (each well under
2,500 lines) under ``bearly_spark/registry/`` while preserving:

- the public surface: ``from bearly_spark.registry import QUERIES,
  ORACLE`` (and ``register``) keeps working unchanged;
- the driver-sampled prefix: PREFIX_ORDER still reorders QUERIES at
  import time (tail order changes — harmless, the driver samples the
  explicit 50-name prefix);
- every comment line: the file is carved into contiguous chunks, each
  ending at a top-level statement's last line, so banners and comments
  travel with the statement they precede;
- helper placement: a non-registered top-level helper moves to the one
  module that consumes it (kept BEFORE its consumer — chunks are
  emitted in original line order, and a helper always precedes its
  first consumer in the original file); helpers consumed by more than
  one module are hoisted into ``_shared.py``.

Each registered query is assigned a module by the QUERY_MODULE
taxonomy below (fail-loud on unknown names, so future queries must be
classified when added).

Run from the repo root: ``python tools/split_registry.py``.
It writes the package, deletes registry.py, and import-verifies the
result (query/oracle counts + prefix order + per-file line caps)
before exiting 0.
"""

from __future__ import annotations

import ast
import os
import sys

SRC = "bearly_spark/registry.py"
PKG = "bearly_spark/registry"
MAX_LINES = 2500

MODULE_DOCS = {
    "reference_q": "Reference-parity surface (SURVEY §2.1): the bearly sum/produce API over Arrow interchange.",
    "scans_q": "File-format and layout scans: CSV/JSON/ORC/XML, partitioned, clustered, Z-ordered.",
    "relational_q": "Relational core: filter/project, every join family, sorts/top-k, set ops, pivot/unpivot/explode, subqueries, lateral, temporal/as-of/range joins.",
    "aggregates_q": "Aggregation surface: grouped/distinct/rollup/cube/grouping sets, approx and exact percentiles, stats/collect/bitmap aggregates, histograms.",
    "windows_q": "Window functions and time series: frames, ranking, IGNORE NULLS, gaps, EWMA, interpolation, calendar fill, streaks, seasonality.",
    "sql_surface_q": "Scalar function packs (string/date/math/json/array/map/regexp/variant) and Spark-4 SQL-language surfaces (pipe syntax, variables, parameter markers, scripting, recursive CTE).",
    "python_ext_q": "Python extension points: pandas UDF/UDAF/UDTF, cogroup, Arrow-native batch transforms.",
    "streaming_q": "Event-time windows (batch twins of the streaming pipelines) and event-sequence analytics: sessionization, funnels, cohorts, attribution, transitions.",
    "tpch_q": "The complete TPC-H query-shape suite (Q1-Q22).",
    "dedup_q": "LLM-pipeline dedup: exact, MinHash LSH, SimHash, containment, winnowing, exact-substring, connected components, entity resolution, golden records.",
    "similarity_q": "LLM-pipeline similarity search: brute-force cosine, hyperplane LSH, IVF, PQ, persisted ANN indexes, hashed embeddings.",
    "text_q": "LLM-pipeline text analysis: stats, language-ID, TF-IDF, BM25 retrieval, collocations, vocabulary/OOV, quality scoring, chunking.",
    "curation_q": "Training-data curation: splits, sampling, per-domain caps, negative sampling, PII redaction, the decontamination triad, sequence packing, corpus cleaning.",
    "multimodal_q": "Multimodal binary columns: ingest, decode/feature-extract, frame sampling.",
    "graph_q": "Graph analytics over the part co-order projection: PageRank, personalized PageRank, BFS, triangles, clustering coefficient, label propagation.",
    "stats_q": "Feature prep, robust statistics and sketches: standardization, correlation, winsorization, MAD/IQR/z-score outliers, Gini, survival, RFM, basket rules, CMS/Bloom, drift reports.",
    "maintenance_q": "Lakehouse table maintenance: CoW MERGE, SCD2, snapshot diff/checksum, incremental rollup, DQ expectations.",
}

MODULE_ORDER = list(MODULE_DOCS)

QUERY_MODULE = {}
for _mod, _names in {
    "reference_q": [
        "sum_lineitem_int64", "produce_array", "produce_stream",
        "sum_produce_stream",
    ],
    "scans_q": [
        "csv_scan_nation", "json_scan_orders", "orc_scan_supplier",
        "xml_scan_supplier", "partitioned_scan_orders",
        "clustered_scan_lineitem", "zorder_scan_lineitem",
    ],
    "relational_q": [
        "filter_project_lineitem", "join_revenue_by_nation",
        "semi_join_big_spenders", "anti_join_no_pending_orders",
        "outer_join_order_counts", "broadcast_join_part_agg",
        "top_orders_by_price", "topk_orders_per_customer",
        "set_intersect_custkeys", "set_except_custkeys", "set_union_ids",
        "set_intersect_all_quantities", "set_except_all_quantities",
        "subquery_above_avg_orders", "subquery_exists_customers",
        "pivot_orders_status", "posexplode_embeddings",
        "unpivot_lineitem_measures", "cross_join_priority_status",
        "sample_hash_orders", "null_funcs_lineitem", "lateral_topk_orders",
        "full_outer_status_counts", "crosstab_orders",
        "asof_join_orders_events", "range_join_purchase_follow",
        "temporal_join_orders_customer",
    ],
    "aggregates_q": [
        "distinct_agg_customer", "rollup_orders", "cube_orders",
        "grouping_sets_orders", "approx_count_distinct_orders",
        "collect_agg_nations", "stats_agg_lineitem", "minmax_by_orders",
        "median_mode_orders", "percentiles_lineitem",
        "approx_percentile_lineitem", "bitmap_distinct_orders",
        "misc_agg_orders", "try_arithmetic_lineitem",
        "filter_clause_lang_stats", "histogram_prices_orders",
        "histogram_depth_orders", "topn_types_brand",
    ],
    "windows_q": [
        "window_running_total", "window_order_gaps",
        "window_range_frame_orders", "window_distribution_orders",
        "window_ignore_nulls_orders", "rank_ties_orders",
        "ewma_revenue_priority", "interpolate_events",
        "calendar_fill_orders", "order_streaks_customer",
        "seasonality_orders",
    ],
    "sql_surface_q": [
        "string_funcs_part", "date_funcs_orders", "math_funcs_lineitem",
        "json_extract_events", "array_funcs_embeddings", "map_funcs_events",
        "regexp_funcs_documents", "variant_events_props",
        "pipe_syntax_orders", "sql_variables_orders", "parameterized_orders",
        "sql_scripting_orders", "recursive_order_hierarchy",
    ],
    "python_ext_q": [
        "pandas_udf_charge", "udaf_weighted_avg_price", "udtf_tokenize_docs",
        "cogroup_user_behavior", "arrow_grouped_discount_stats",
        "arrow_map_charge_buckets",
    ],
    "streaming_q": [
        "events_tumbling_hourly", "events_sliding_1h_30m",
        "events_sessionization", "events_rollup_hourly_daily",
        "events_hll_rollup", "active_users_events", "event_transitions",
        "funnel_conversion_events", "cohort_retention_events",
        "sequence_pattern_events", "attribution_events",
    ],
    "tpch_q": [
        "q1_pricing_summary", "q2_min_cost_supplier",
        "q3_shipping_priority", "q4_order_priority_check",
        "q5_regional_revenue", "q6_forecast_revenue", "q7_nation_volume",
        "q8_nation_market_share", "q9_product_type_profit",
        "q10_returned_items", "q11_important_part_value",
        "q12_late_shipment_priority", "q13_customer_order_histogram",
        "q14_promo_revenue", "q15_top_supplier",
        "q16_part_supplier_variety", "q17_small_qty_revenue",
        "q18_large_volume_orders", "q19_disjunctive_revenue",
        "q20_promotion_suppliers", "q21_waiting_suppliers",
        "q22_idle_rich_customers",
    ],
    "dedup_q": [
        "dedup_exact_documents", "dedup_stats_documents",
        "jaccard_pairs_sample", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_keep_representatives", "dedup_clusters_minhash",
        "dedup_components", "dedup_components_jaccard",
        "dedup_components_star", "fingerprint_winnow_pairs",
        "winnow_clusters_documents", "substring_dup_spans_documents",
        "substring_dedup_clean_documents", "levenshtein_near_dup",
        "containment_pairs_documents", "binary_near_dup_documents",
        "entity_match_parts", "golden_records_parts",
        "line_dedup_clean_documents",  # added post-split
    ],
    "similarity_q": [
        "embedding_topk_cosine", "embedding_ann_lsh", "embedding_near_dup",
        "embedding_dup_clusters", "lsh_saturation_embeddings",
        "ann_index_query", "dedup_index_query", "embedding_ann_ivf",
        "ivfpq_residual_query", "ivfpq_index_query", "embedding_ann_pq",
        "ivf_index_query", "hashed_embedding_documents",
        "hashed_embedding_topk", "chunk_embedding_topk",
    ],
    "text_q": [
        "text_stats_documents", "lang_id_distribution",
        "bigram_quality_documents", "bm25_search_documents",
        "bm25_index_search_documents", "bm25_multi_search_documents",
        "tfidf_keywords_documents", "collocations_documents",
        "vocabulary_documents", "vocab_oov_documents", "wordcount_tokens",
        "repetition_quality_documents", "chunk_documents_windows",
    ],
    "curation_q": [
        "dataset_split_documents", "stratified_sample_documents",
        "cluster_aware_split_documents", "pipeline_clean_corpus",
        "weighted_sample_documents", "cap_per_source_documents",
        "negative_samples_documents", "pii_redact_documents",
        "decontaminate_documents", "decontaminate_bm25_documents",
        "decontaminate_embedding", "pack_sequences_documents",
        "mixture_resample_documents",  # added post-split
        "gopher_quality_documents",  # added post-split
    ],
    "multimodal_q": [
        "multimodal_ingest", "multimodal_decode_features",
        "multimodal_frame_sample",
    ],
    "graph_q": [
        "pagerank_supplier_part", "ppr_supplier_part", "bfs_part_coorder",
        "triangle_count_parts", "local_clustering_parts",
        "label_communities_parts",
    ],
    "stats_q": [
        "standardize_lineitem", "correlation_matrix_lineitem",
        "winsorize_lineitem", "mad_outliers_lineitem",
        "outliers_iqr_lineitem", "anomaly_zscore_orders",
        "gini_customer_revenue", "survival_repeat_orders",
        "rfm_segments_customer", "basket_rules_lineitem",
        "cms_frequencies_orders", "bloom_prefilter_customers",
        "cms_index_query", "skew_report_lineitem", "drift_report_orders",
        "drift_categorical_orders",
    ],
    "maintenance_q": [
        "merge_upsert_orders", "scd2_customer_history", "scd2_asof_customer",
        "incremental_rollup_orders", "table_diff_orders",
        "table_checksum_orders", "dq_expectations_orders",
    ],
}.items():
    for _n in _names:
        if _n in QUERY_MODULE and QUERY_MODULE[_n] != _mod:
            raise SystemExit(f"{_n} classified twice: {QUERY_MODULE[_n]} and {_mod}")
        QUERY_MODULE[_n] = _mod

src_text = open(SRC).read()
src_lines = src_text.splitlines()
tree = ast.parse(src_text)


def stmt_span(node: ast.stmt) -> tuple[int, int]:
    start = node.lineno
    for dec in getattr(node, "decorator_list", []):
        start = min(start, dec.lineno)
    return start, node.end_lineno


def defined_names(node: ast.stmt) -> list[str]:
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return [node.name]
    if isinstance(node, ast.Assign):
        return [t.id for t in node.targets if isinstance(t, ast.Name)]
    if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        return [node.target.id]
    return []


def used_names(node: ast.stmt) -> set[str]:
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


def register_name(node: ast.stmt) -> str | None:
    for dec in getattr(node, "decorator_list", []):
        if (
            isinstance(dec, ast.Call)
            and isinstance(dec.func, ast.Name)
            and dec.func.id == "register"
        ):
            return dec.args[0].value
    return None


# ---- carve the file into chunks ----------------------------------------
stmts = list(tree.body)
first_code_idx = next(
    i for i, s in enumerate(stmts) if defined_names(s) == ["QUERIES"]
)
header_end_line = stmt_span(stmts[first_code_idx])[0] - 1  # docstring+imports

core_names = {"QUERIES", "ORACLE", "register"}
chunks = []
prev_end = header_end_line
for s in stmts[first_code_idx:]:
    start, end = stmt_span(s)
    qname = register_name(s)
    names = defined_names(s)
    if names and set(names) <= core_names:
        mod = "_core"
    elif qname is not None:
        if qname not in QUERY_MODULE:
            raise SystemExit(f"unclassified query: {qname} — add it to QUERY_MODULE")
        mod = QUERY_MODULE[qname]
    elif (names and "PREFIX_ORDER" in names) or (
        isinstance(s, ast.FunctionDef) and s.name == "_apply_prefix_order"
    ) or (
        isinstance(s, ast.Expr)
        and isinstance(s.value, ast.Call)
        and isinstance(s.value.func, ast.Name)
        and s.value.func.id == "_apply_prefix_order"
    ):
        mod = "__init__"
    else:
        mod = None  # helper: resolved below by consumer analysis
    chunks.append(
        {
            "start": prev_end + 1,
            "end": end,
            "names": names,
            "mod": mod,
            "used": used_names(s),
        }
    )
    prev_end = end

name_def = {}
for c in chunks:
    for n in c["names"]:
        name_def[n] = c

# ---- place helpers: single consumer module, else _shared ----------------
for _ in range(100):
    changed = False
    for c in chunks:
        if c["mod"] is not None or not c["names"]:
            continue
        consumers = set()
        unresolved = False
        for other in chunks:
            if other is c:
                continue
            if any(n in other["used"] for n in c["names"]):
                if other["mod"] is None:
                    unresolved = True
                elif other["mod"] not in ("_core", "__init__"):
                    consumers.add(other["mod"])
                else:
                    consumers.add(other["mod"])
        if unresolved:
            continue
        if len(consumers) == 1:
            c["mod"] = next(iter(consumers))
        elif len(consumers) > 1:
            c["mod"] = "_shared"
        else:
            raise SystemExit(
                f"helper with no consumers at lines {c['start']}-{c['end']}: "
                f"{c['names']}"
            )
        changed = True
    if not changed:
        break
# anything still unresolved is a cyclic helper group -> _shared
for c in chunks:
    if c["mod"] is None:
        c["mod"] = "_shared"

# a helper placed in module M whose OTHER consumers ended up elsewhere
# must be hoisted; also handle _shared helpers needing family names.
for _ in range(100):
    changed = False
    for c in chunks:
        for u in c["used"]:
            home = name_def.get(u)
            if home is None:
                continue
            if home["mod"] in ("_core", c["mod"], "_shared"):
                continue
            if home["mod"] in MODULE_ORDER:
                # referenced from a different family module, or from
                # _shared/__init__ (which cannot import family modules)
                home["mod"] = "_shared"
                changed = True
    if not changed:
        break

# ---- emit ----------------------------------------------------------------
doc_end = src_text.index('"""', 3) + 3
doc_end_line = src_text[:doc_end].count("\n") + 1
import_lines = src_lines[doc_end_line:header_end_line]
import_block = "\n".join(import_lines).strip("\n")

os.makedirs(PKG, exist_ok=True)


def chunk_text(c) -> str:
    return "\n".join(src_lines[c["start"] - 1 : c["end"]])


shared_names = sorted(
    n for c in chunks if c["mod"] == "_shared" for n in c["names"]
)
written = []

core_chunks = [c for c in chunks if c["mod"] == "_core"]
with open(f"{PKG}/_core.py", "w") as fh:
    fh.write(
        '"""Registry core: the QUERIES/ORACLE dicts and the @register decorator."""\n\n'
        "from __future__ import annotations\n\n"
        "from collections.abc import Callable\n\n"
        "from pyspark.sql import DataFrame, SparkSession\n\n"
    )
    for c in core_chunks:
        fh.write(chunk_text(c) + "\n")
written.append(f"{PKG}/_core.py")

with open(f"{PKG}/_shared.py", "w") as fh:
    fh.write(
        '"""Helpers shared across registry family modules (oracle CTE/SQL\n'
        "builders, scratch-index plumbing, language-id fragments). A helper\n"
        "lives here iff more than one family module consumes it; single-\n"
        "consumer helpers live next to their query (tools/split_registry.py).\n"
        '"""\n\n'
    )
    fh.write(import_block + "\n\n")
    fh.write(
        "from bearly_spark.registry._core import ORACLE, QUERIES, register  # noqa: F401\n\n"
    )
    for c in chunks:
        if c["mod"] == "_shared":
            fh.write(chunk_text(c) + "\n")
written.append(f"{PKG}/_shared.py")

for mod in MODULE_ORDER:
    mod_chunks = [c for c in chunks if c["mod"] == mod]
    if not mod_chunks:
        raise SystemExit(f"module {mod} got no chunks")
    defined = {n for c in mod_chunks for n in c["names"]}
    need = {u for c in mod_chunks for u in c["used"]} - defined
    shared_import = sorted(n for n in shared_names if n in need)
    with open(f"{PKG}/{mod}.py", "w") as fh:
        fh.write(
            f'"""{MODULE_DOCS[mod]}\n\n'
            "Split from the original flat registry.py by tools/split_registry.py\n"
            "(chunks keep original line order, so comments stay with their\n"
            "statements and helpers precede their consumers).\n"
            '"""\n\n'
        )
        fh.write(import_block + "\n\n")
        fh.write(
            "from bearly_spark.registry._core import ORACLE, QUERIES, register  # noqa: F401\n"
        )
        if shared_import:
            fh.write(
                "from bearly_spark.registry._shared import (  # noqa: F401\n"
                + "".join(f"    {n},\n" for n in shared_import)
                + ")\n"
            )
        fh.write("\n")
        for c in mod_chunks:  # chunks list is already in original order
            fh.write(chunk_text(c) + "\n")
    written.append(f"{PKG}/{mod}.py")

init_chunks = [c for c in chunks if c["mod"] == "__init__"]
with open(f"{PKG}/__init__.py", "w") as fh:
    fh.write(src_text[:doc_end] + "\n\n")
    fh.write("from __future__ import annotations\n\n")
    fh.write(
        "from bearly_spark.registry._core import ORACLE, QUERIES, register  # noqa: F401\n\n"
    )
    fh.write(
        "# Family modules register their queries at import time. PREFIX_ORDER\n"
        "# below then reorders QUERIES so the driver's first-50 sample hits one\n"
        "# representative of every family regardless of module import order.\n"
    )
    fh.write("from bearly_spark.registry import _shared  # noqa: F401,E402\n")
    for mod in MODULE_ORDER:
        fh.write(f"from bearly_spark.registry import {mod}  # noqa: F401,E402\n")
    fh.write("\n")
    for c in init_chunks:
        fh.write(chunk_text(c) + "\n")
written.append(f"{PKG}/__init__.py")

os.remove(SRC)

# ---- verify --------------------------------------------------------------
sys.path.insert(0, os.getcwd())
import importlib

reg = importlib.import_module("bearly_spark.registry")
n_q, n_o = len(reg.QUERIES), len(reg.ORACLE)
prefix_ok = list(reg.QUERIES)[: len(reg.PREFIX_ORDER)] == reg.PREFIX_ORDER
line_counts = {p: sum(1 for _ in open(p)) for p in written}
worst = max(line_counts.values())
print(f"queries={n_q} oracles={n_o} prefix_applied={prefix_ok} max_lines={worst}")
for p, n in sorted(line_counts.items(), key=lambda kv: -kv[1]):
    print(f"  {n:5d} {p}")
assert n_q == 210 and n_o == 207 and prefix_ok and worst <= MAX_LINES
print("OK")

"""Benchmark harness — the driver contract (BASELINE.md).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints exactly
ONE JSON line to stdout:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Everything else (Spark logs, progress) goes to stderr. Each query is
materialized with the noop sink (full execution, no driver collect cost).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINE = [
    "sum_lineitem_int64",
    "q1_pricing_summary",
    "filter_project_lineitem",
    "join_revenue_by_nation",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "broadcast_join_part_agg",
    "outer_join_order_counts",
    "topk_orders_per_customer",
    "window_running_total",
    "events_tumbling_hourly",
    "events_sessionization",
    "json_extract_events",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_topk_cosine",
    "text_stats_documents",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from bearly_spark.registry import QUERIES
    from bearly_spark.session import get_spark

    spark = get_spark("bearly-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers so query 1 isn't charged for startup.
    _materialize(QUERIES["sum_lineitem_int64"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        _materialize(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - start, 3)
        print(f"{name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

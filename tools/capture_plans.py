"""Capture .explain("formatted") output for registry queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (all registry
queries when none are named). The data dir comes from
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), matching bench.py,
so the captured plans are the ones the bench actually executes.
Queries with lazy fixture builds (cutpoint fits, .scratch indexes) run
those builds as a side effect of plan construction — harmless, and it
matches what the first bench pass pays.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path


def explain_formatted(df) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bearly_spark.registry import QUERIES
    from bearly_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    if not names:
        names = sorted(QUERIES)
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            text = explain_formatted(df)
        except Exception as exc:  # capture the failure instead of dying
            text = f"ERROR capturing plan: {exc!r}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(text)
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()

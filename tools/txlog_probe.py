"""Commit-log table probes: replay cost vs table age, and what the
logged footer stats actually save a reader.

Claims measured (see PLANS.md "Round 12: commit-log table"):
1. **Checkpointed replay is flat in table age** — reading the live
   set of a 200-commit table replays at most one checkpoint + 10
   commits, while full replay (checkpoints removed) walks all 200.
2. **Stats pruning is a planning-time I/O cut** — a one-file range
   predicate over an N-file table plans 1/N of the files before Spark
   ever lists a path, and the pruned read returns exactly the same
   rows as filter-after-scan.

Run: PYTHONPATH=/root/repo python tools/txlog_probe.py
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

ROOT = Path("/root/repo/.scratch/txlog_probe")
N_COMMITS = 200
ROWS_PER_COMMIT = 2_000


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import pyspark.sql.functions as F

    from bearly_spark.session import get_spark
    from bearly_spark.sources import txlog as TX

    spark = get_spark("txlog-probe")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(ROOT, ignore_errors=True)
    table = str(ROOT / "t")

    t0 = time.perf_counter()
    for i in range(N_COMMITS):
        lo = i * ROWS_PER_COMMIT
        df = (
            spark.range(lo, lo + ROWS_PER_COMMIT)
            .select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
            .coalesce(1)
        )
        TX.write_table(df, table, stats_cols=["k"])
    t_ingest = time.perf_counter() - t0

    root = TX._root(table)

    # (1) replay cost: checkpointed vs full
    t0 = time.perf_counter()
    live_fast, _, _ = TX._live_at(root, N_COMMITS)
    t_fast = time.perf_counter() - t0

    chks = sorted((TX._log_path(root)).glob("chk-*.json"))
    stash = ROOT / "chk_stash"
    stash.mkdir(parents=True, exist_ok=True)
    for c in chks:
        shutil.move(str(c), stash / c.name)
    t0 = time.perf_counter()
    live_full, _, _ = TX._live_at(root, N_COMMITS)
    t_full = time.perf_counter() - t0
    for c in stash.iterdir():
        shutil.move(str(c), TX._log_path(root) / c.name)
    assert live_fast == live_full, "checkpointed replay diverged from full"

    # (2) stats pruning: one commit's key range out of N_COMMITS files
    lo, hi = 42 * ROWS_PER_COMMIT, 43 * ROWS_PER_COMMIT - 1
    planned, total = TX.plan_files(table, where={"k": (lo, hi)})
    t0 = time.perf_counter()
    pruned = TX.read_table(spark, table, where={"k": (lo, hi)}).count()
    t_pruned = time.perf_counter() - t0
    t0 = time.perf_counter()
    unpruned = (
        TX.read_table(spark, table)
        .filter((F.col("k") >= lo) & (F.col("k") <= hi))
        .count()
    )
    t_unpruned = time.perf_counter() - t0
    assert pruned == unpruned == ROWS_PER_COMMIT

    # (3) pruned row-level DELETE: one commit's key range out of
    # N_COMMITS files must rewrite exactly one file
    dlo, dhi = 77 * ROWS_PER_COMMIT, 77 * ROWS_PER_COMMIT + 99
    t0 = time.perf_counter()
    _, dstats = TX.delete_where(spark, table, {"k": (dlo, dhi)}, stats_cols=["k"])
    t_delete = time.perf_counter() - t0
    assert dstats["files_rewritten"] == 1
    assert (
        TX.read_table(spark, table).count()
        == N_COMMITS * ROWS_PER_COMMIT - 100
    )

    # (4) the same-shaped delete as a DELETION VECTOR: zero rewrites,
    # only the matched positions written
    vlo, vhi = 33 * ROWS_PER_COMMIT, 33 * ROWS_PER_COMMIT + 99
    t0 = time.perf_counter()
    _, vstats = TX.delete_where_dv(spark, table, {"k": (vlo, vhi)})
    t_dv = time.perf_counter() - t0
    assert vstats == {
        "files_masked": 1,
        "files_total": 200,
        "rows_masked": 100,
    }
    assert (
        TX.read_table(spark, table).count()
        == N_COMMITS * ROWS_PER_COMMIT - 200
    )

    out = {
        "n_commits": N_COMMITS,
        "rows_per_commit": ROWS_PER_COMMIT,
        "ingest_wall_s": round(t_ingest, 3),
        "replay_checkpointed_s": round(t_fast, 4),
        "replay_full_s": round(t_full, 4),
        "files_planned": len(planned),
        "files_total": total,
        "read_pruned_s": round(t_pruned, 3),
        "read_unpruned_s": round(t_unpruned, 3),
        "delete_files_rewritten": dstats["files_rewritten"],
        "delete_wall_s": round(t_delete, 3),
        "dv_delete_wall_s": round(t_dv, 3),
        "dv_rows_masked": vstats["rows_masked"],
    }
    print(json.dumps(out))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()

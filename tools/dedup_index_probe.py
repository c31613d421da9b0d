"""Scaling probe for the dedup-at-ingest index (streaming/dedup_index).

Question: does the per-batch cost stay bounded as the index grows?
Detect is designed as ONE columnar scan of the slim bands dataset
(two small columns, no index shuffle — the micro-batch side broadcasts),
plus Θ(batch) signature work and Θ(answer) verify; upsert is Θ(batch).
So per-batch wall time should be flat-ish with a mild linear term whose
slope is the cheap index scan — NOT superlinear, and NOT dominated by
file-count growth (compaction bounds that).

Method: ingest N synthetic batches derived from the fixture documents
(id-offset copies with a per-batch token prefix so cross-batch
near-dups exist but exact dups do not), timing detect and upsert per
batch; optionally compact halfway to show the file-count effect.

Usage: python tools/dedup_index_probe.py [n_batches] [sf_dir]
Output: one line per batch with detect/upsert seconds + index size,
then a summary comparing the first and last thirds.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from bearly_spark.session import get_spark
    from bearly_spark.sources.tables import load_table
    from bearly_spark.streaming.dedup_index import (
        compact_dedup_index,
        near_dups_against_index,
        upsert_dedup_index_batch,
    )

    spark = get_spark("dedup-index-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").persist()
    n_docs = docs.count()

    idx = tempfile.mkdtemp(prefix="dedup-index-probe-")
    detect_s, upsert_s = [], []
    try:
        for b in range(n_batches):
            # distinct ids per batch; a distinct leading token per batch so
            # batches are near-dups (not exact dups) of each other
            batch = docs.select(
                (F.col("doc_id") + F.lit(b * n_docs)).alias("doc_id"),
                F.concat(F.lit(f"batch{b} "), F.col("text")).alias("text"),
            )
            t0 = time.perf_counter()
            n_dups = near_dups_against_index(
                spark, idx, batch, threshold=0.8, exclude_batch=b
            ).count()
            t1 = time.perf_counter()
            upsert_dedup_index_batch(batch, b, idx)
            t2 = time.perf_counter()
            detect_s.append(t1 - t0)
            upsert_s.append(t2 - t1)
            n_files = len(list(__import__("pathlib").Path(idx, "bands").rglob("*.parquet")))
            print(
                f"batch {b}: detect {t1 - t0:6.2f}s ({n_dups} dup pairs)  "
                f"upsert {t2 - t1:5.2f}s  index {(b + 1) * n_docs} docs / {n_files} band files",
                flush=True,
            )
            if b == n_batches // 2:
                folded = compact_dedup_index(spark, idx)
                print(f"  -- compacted {folded} batch partitions", flush=True)
        third = max(1, n_batches // 3)
        head = sum(detect_s[:third]) / third
        tail = sum(detect_s[-third:]) / third
        print(
            f"detect mean: first third {head:.2f}s, last third {tail:.2f}s "
            f"({tail / head:.2f}x at {n_batches}x index size); "
            f"upsert mean {sum(upsert_s) / len(upsert_s):.2f}s"
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()

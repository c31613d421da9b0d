"""Semantic-dedup-at-ingest growth probe: per-batch upsert wall clock
as the index grows (PLANS.md round-10 clustering section).

Ingests the 64x docs blow-up (128k vectors, 64 identical replicas of
the 2k sf0.1 embeddings — adversarial duplicate mass: almost every
vector has an already-indexed twin) in id-ordered waves and reports
each upsert's wall time plus the members/verdicts counts. Flat
per-batch time as members accumulate = the probe reads are pruned and
the pair stage is bounded by (batch x touched-cell members), not index
size.

Usage: PYTHONPATH=/root/repo python tools/semdedup_index_probe.py [n_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bearly_spark.session import get_spark  # noqa: E402
from bearly_spark.streaming import semdedup_index as SI  # noqa: E402

BLOWUP = "/root/repo/.scratch/sf0.1x64docs/embeddings.parquet"
IDX = "/root/repo/.scratch/semdedup-probe-idx"


def main(n_batches: int = 8) -> None:
    spark = get_spark("semdedup-index-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(BLOWUP):
        raise SystemExit(
            "build the 64x docs fixture first: "
            "python tools/scaling_probe.py --docs-only 64 kmeans_clusters_embeddings"
        )
    shutil.rmtree(IDX, ignore_errors=True)
    vecs = spark.read.parquet(BLOWUP).select("vec_id", "embedding")
    ids = sorted(r.vec_id for r in vecs.select("vec_id").collect())
    n = len(ids)
    bounds = [ids[i * n // n_batches] for i in range(n_batches)] + [ids[-1] + 1]

    t0 = time.time()
    # fit on the first wave only (frozen geometry; ~2k cells via auto
    # sizing is the operator default, but the index pins build-time k)
    first = vecs.filter(F.col("vec_id") < bounds[1])
    SI.build_semdedup_index(first, IDX, k=64, iters=2)
    print(f"build (fit k=64 on {n // n_batches} vectors): {time.time() - t0:.2f}s")

    for b in range(n_batches):
        batch = vecs.filter(
            (F.col("vec_id") >= bounds[b]) & (F.col("vec_id") < bounds[b + 1])
        )
        t0 = time.time()
        SI.upsert_semdedup_batch(batch, b, IDX)
        dt = time.time() - t0
        members = spark.read.parquet(f"{IDX}/members").count()
        print(f"batch {b}: {dt:6.2f}s  members={members}")
    v = SI.semdedup_index_verdicts(spark, IDX)
    kept = v.filter(F.col("kept")).count()
    print(f"total verdicts={v.count()} kept={kept}")
    shutil.rmtree(IDX, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)

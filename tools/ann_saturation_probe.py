"""LSH auto-sizing probe: does the banding operating point saturate on a
DIVERSE high-N corpus, and is saturation loud?

Round-3 verdict "What's wrong #1": the fixed 12-bit/3-band default for
``embedding_near_dup_pairs`` hits the [2, max_bucket] bucket cap at
>=128k vectors and silently drops candidates. Round-4 closes it two
ways — corpus-size auto-sizing (``similarity.auto_banding``) and loud
saturation metrics (``banding_saturation_report`` + optional
``Observation``). This probe demonstrates both at 256k+ vectors:

    PYTHONPATH=/root/repo python tools/ann_saturation_probe.py 256000

- generates N deterministic isotropic 64-dim vectors DISTRIBUTED
  (mapInPandas, per-batch seeded RNG — the corpus never sits on the
  driver) and plants one near-duplicate pair (cosine ~0.9999);
- FIXED 12/3 point: the report must show every bucket past the cap
  (the silent-drop regime, now loud) and the dedup must MISS the
  planted pair;
- AUTO-SIZED point: bits/band = ceil(log2(N/target_bucket)) — the
  report must show zero drops and the dedup must FIND the planted pair.

target_bucket=8 here (not the 64 default): for NEAR-DUP the bucket is
pure verify-cost fan-out — true near-dups collide because they are
near-identical, not by chance, so a smaller expected bucket just cuts
the exact-cosine candidate mass (~3 * N * target/2 pairs) without
touching recall at high thresholds. Results recorded in PLANS.md.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

DIM = 64


def build_corpus(spark, n: int):
    """n isotropic vectors + a planted near-dup pair (ids n, n+1)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(int(ids[0]) % (2**31))
            mat = rng.normal(size=(len(ids), DIM))
            yield pd.DataFrame({"vec_id": ids, "embedding": list(mat)})

    corpus = spark.range(0, n, 1, 32).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )
    rng = np.random.RandomState(123)
    base = rng.normal(size=DIM)
    near = base + rng.normal(scale=0.005, size=DIM)  # cosine ~0.99999
    planted = spark.createDataFrame(
        [(n, [float(x) for x in base]), (n + 1, [float(x) for x in near])],
        "vec_id long, embedding array<double>",
    )
    return corpus.unionByName(planted)


def run_point(spark, df, n: int, label: str, nbits, threshold=0.95, target_bucket=8):
    from bearly_spark.operators import similarity as S

    t0 = time.perf_counter()
    rep = S.banding_saturation_report(
        df, nbits=nbits, n_vectors=n, target_bucket=target_bucket
    ).collect()[0]
    pairs = S.embedding_near_dup_pairs(
        df, threshold=threshold, nbits=nbits, n_vectors=n, target_bucket=target_bucket
    )
    found = pairs.filter((F.col("id_a") == n) & (F.col("id_b") == n + 1)).count() == 1
    dt = time.perf_counter() - t0
    print(
        f"{label}: nbits={rep.nbits} n_buckets={rep.n_buckets} "
        f"dropped_buckets={rep.dropped_buckets} dropped_ids={rep.dropped_ids} "
        f"max_bucket={rep.max_bucket_size} planted_found={found} wall={dt:.1f}s",
        flush=True,
    )
    return rep, found


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256_000

    from bearly_spark.session import get_spark

    spark = get_spark("ann-saturation-probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = build_corpus(spark, n)

    rep_fixed, found_fixed = run_point(spark, df, n, "fixed-12/3", nbits=12)
    rep_auto, found_auto = run_point(spark, df, n, "auto-sized", nbits=None)

    ok = (
        rep_fixed.dropped_buckets > 0
        and not found_fixed
        and rep_auto.dropped_buckets == 0
        and found_auto
    )
    print("PROBE " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""Incrementally-maintained LSH ANN index over a vector stream.

This is the concrete backing for "LSH is the streaming-friendly ANN
fallback" (registry `embedding_ann_lsh` docstring): hyperplane band keys
are a pure function of the vector and a fixed seed — no centroids, no
corpus pass — so a micro-batch can be indexed the moment it arrives.
IVF (the batch-scale default) cannot do this without periodically
re-fitting and re-assigning against a global k-means model.

Shape at scale:
- ``foreachBatch`` appends (id, band, bkey) rows to a parquet index
  partitioned by ``band`` — each band's keys cluster together, so a
  query probing band b prunes the other bands' files entirely;
- the vectors themselves stay in the stream's own sink (any store keyed
  by id); the index holds only (id, band, bkey) — the same
  "only ids travel through the blocking structures" rule as the batch
  paths;
- queries run the standard candidate-join + exact rerank against the
  index as of the last committed batch (parquet append is atomic per
  task-commit; readers see whole batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from bearly_spark.operators.similarity import lsh_band_table, rerank_candidates

import pyspark.sql.functions as F


def streaming_lsh_index(
    vectors: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = 56,
    bands: int = 8,
    seed: int = 42,
) -> StreamingQuery:
    """Start a stream that appends each micro-batch's LSH band rows to
    the parquet index at ``index_dir``. availableNow drains the backlog
    and stops (swap for a continuous trigger in production)."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            lsh_band_table(batch_df, id_col, vec_col, dim, nbits, bands, seed)
            .write.mode("append")
            .partitionBy("band")
            .parquet(index_dir)
        )

    return (
        vectors.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ann_query_over_index(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    nbits: int = 56,
    bands: int = 8,
    seed: int = 42,
    probe: int = 1,
) -> DataFrame:
    """Top-k ANN against the incrementally-built index: identical
    semantics to ``lsh_ann_topk`` at the same operating point — the index
    scan replaces the corpus-side signature pass."""
    cb = spark.read.parquet(index_dir)
    qb = lsh_band_table(
        queries, id_col, vec_col, dim, nbits, bands, seed, probe=probe, out_id="q_id"
    )
    cand = (
        cb.join(F.broadcast(qb), ["band", "bkey"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .dropDuplicates(["q_id", "c_id"])
    )
    return rerank_candidates(cand, corpus, queries, id_col, vec_col, k)

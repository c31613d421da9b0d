"""Incrementally-maintained MinHash near-dup index — dedup AT INGEST.

The batch dedup operators answer "which documents in this corpus are
near-duplicates of each other"; a training-data pipeline also needs the
STREAMING form of that question: "is this newly-crawled document a
near-duplicate of anything we already hold?" — answered the moment the
document arrives, without re-scanning the corpus. This module maintains
a MinHash LSH index over a document stream and emits, per micro-batch,
the near-dup pairs between the batch and everything indexed before it
(plus within-batch pairs), so the union of the per-batch outputs equals
the batch-mode answer over the full corpus (equivalence-tested).

Same durability design as ``streaming.ann_index`` (the LSH ANN index):

- ``foreachBatch`` is **at-least-once**, so every write is idempotent
  per ``batch_id`` via dynamic partition overwrite — a replayed batch
  rewrites exactly its own partitions;
- the DETECT step excludes the current batch id from its index read
  (``batch <> <id>`` prunes whole partition directories), so a replay
  after a crash-after-upsert recomputes the identical dup set instead
  of pairing the batch against its own half-written copy;
- detect runs BEFORE upsert, so a batch is never compared to itself
  through the index.

Three datasets under ``index_dir``, all batch-partitioned:

- ``bands/``  (batch, band) -> (doc_id, bucket): the slim blocking rows
  — only ids and band keys travel through the candidate join, the same
  rule as every batch banding path;
- ``sets/``   (batch) -> (doc_id, hs): the hashed shingle sets, joined
  back only for the exact-Jaccard verify of the (small) candidate set;
- ``counts/`` (batch) -> (band, bucket, n): per-batch bucket-count
  deltas. Summing this tiny table gives global bucket sizes WITHOUT
  aggregating the full bands table per micro-batch — that is what makes
  the ``max_bucket`` degenerate-content cap affordable at ingest time
  (cap bookkeeping is Θ(distinct buckets touched), not Θ(index)).

Semantics vs the batch path (``dedup.minhash_dedup_pairs``): identical
banding (shared ``minhash_band_structs``) and identical exact-Jaccard
verify. Two documented deviations, both only visible under degenerate
inputs: the bucket cap counts index ROWS (exact copies each count)
rather than distinct contents, and null-text documents are dropped at
ingest (the batch path's null-never-pairs rule, enforced by filtering).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

import pyspark.sql.functions as F

from bearly_spark.operators.dedup import (
    jaccard,
    minhash_band_structs,
    minhash_signature,
)


def minhash_band_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    out_id: str = "doc_id",
) -> DataFrame:
    """(id, band, bucket, hs) banding rows for a set of documents —
    signature + banding identical to the batch pair path (shared
    helpers). Null-text docs are dropped (no content: the batch path's
    null-never-pairs rule). ``hs`` rides along once per band row here;
    the index writer splits it into the ``sets/`` sidecar so the stored
    blocking rows stay slim."""
    sig = minhash_signature(
        docs.filter(F.col(text_col).isNotNull()), id_col, text_col, num_hashes, shingle_n
    )
    structs = minhash_band_structs(F.col("sig"), bands, num_hashes // bands)
    return sig.select(
        F.col(id_col).alias(out_id), F.col("hs"), F.explode(structs).alias("bb")
    ).select(out_id, "bb.band", "bb.bucket", "hs")


def upsert_dedup_index_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> None:
    """Idempotently index one micro-batch: bands (slim), shingle sets,
    and bucket-count deltas, each dynamic-partition-overwritten under
    ``batch=<id>`` so an at-least-once replay rewrites its own slice."""
    bt = minhash_band_table(
        batch_df, id_col, text_col, num_hashes, bands, shingle_n
    ).persist()
    try:
        bt.count()  # pin: three writers below would each recompute the UDF
        slim = bt.select(id_col, "band", "bucket").withColumn("batch", F.lit(int(batch_id)))
        (
            slim.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch", "band")
            .parquet(f"{index_dir}/bands")
        )
        sets = (
            bt.select(id_col, "hs")
            .dropDuplicates([id_col])
            .withColumn("batch", F.lit(int(batch_id)))
        )
        (
            sets.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(f"{index_dir}/sets")
        )
        counts = (
            bt.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("batch", F.lit(int(batch_id)))
        )
        (
            counts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(f"{index_dir}/counts")
        )
    finally:
        bt.unpersist()


def _read_part(spark: SparkSession, path: str, exclude_batch: int | None, empty: DataFrame):
    """Read one index dataset; a missing directory (no batch indexed
    yet) reads as an empty frame with the right schema (derived from
    the current batch's own plan), so the very first micro-batch flows
    through the same detect path as every other."""
    import os

    if not os.path.isdir(path):
        return empty
    df = spark.read.parquet(path)
    if exclude_batch is not None:
        # batch is a partition column: this prunes whole directories
        df = df.filter(F.col("batch") != int(exclude_batch))
    return df


def near_dups_against_index(
    spark: SparkSession,
    index_dir: str,
    batch_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int = 1000,
    exclude_batch: int | None = None,
) -> DataFrame:
    """Near-dup pairs between ``batch_docs`` and (index ∪ batch): every
    pair where at least one side is in the batch, id_a < id_b,
    exact-Jaccard ≥ threshold. ``exclude_batch`` drops that batch id
    from the index read (replay safety — see module docstring).

    Scale shape: the batch's band rows broadcast against the index's
    bands (the batch is a micro-batch — small by construction); bucket
    totals come from the tiny ``counts/`` rollup, and over-cap buckets
    are anti-joined out BEFORE the candidate join, so a degenerate
    bucket never fans out. Only (id, band, bucket) rows travel; shingle
    sets join back for the verify of candidates only.
    """
    nb = minhash_band_table(
        batch_docs, id_col, text_col, num_hashes, bands, shingle_n
    ).persist()
    try:
        nb.count()  # pin: consumed by bands-union, counts and sets below
        nb_slim = nb.select(id_col, "band", "bucket")
        bc = nb_slim.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))
        ib = _read_part(
            spark, f"{index_dir}/bands", exclude_batch, nb_slim.limit(0)
        ).select(id_col, "band", "bucket")
        all_bands = ib.unionByName(nb_slim)

        ic = _read_part(
            spark, f"{index_dir}/counts", exclude_batch, bc.limit(0)
        ).select("band", "bucket", "n")
        over = (
            ic.unionByName(bc)
            .groupBy("band", "bucket")
            .agg(F.sum("n").alias("n"))
            .filter(F.col("n") > max_bucket)
            .select("band", "bucket")
        )

        probe = nb_slim.join(F.broadcast(over), ["band", "bucket"], "left_anti")
        cand = (
            all_bands.withColumnRenamed(id_col, "_other")
            .join(F.broadcast(probe), ["band", "bucket"])
            .filter(F.col("_other") != F.col(id_col))
            .select(
                F.least(id_col, "_other").alias("id_a"),
                F.greatest(id_col, "_other").alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )

        nsets = nb.select(id_col, "hs").dropDuplicates([id_col])
        sets = _read_part(
            spark, f"{index_dir}/sets", exclude_batch, nsets.limit(0)
        ).select(id_col, "hs").unionByName(nsets)
        sa = sets.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a"))
        sb = sets.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b"))
        return (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a",
                "id_b",
                F.round(jaccard(F.col("hs_a"), F.col("hs_b")), 6).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
            # a doc's hs can legitimately appear twice in the sets union
            # (e.g. the post-compaction-crash duplicate window, where the
            # new base AND the stale batch dirs both hold it); the verify
            # join then emits the same pair once per copy. Dedup at the
            # PAIR level — Θ(answer), never a Θ(corpus) sets shuffle.
            .dropDuplicates(["id_a", "id_b"])
        )
    finally:
        nb.unpersist()


def streaming_dedup_index(
    docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    dups_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> StreamingQuery:
    """Start the dedup-at-ingest stream: per micro-batch, DETECT near
    dups of the batch against everything indexed before it (writing
    (id_a, id_b, jaccard) under ``dups_dir/batch=<id>`` — idempotent),
    then UPSERT the batch into the index. availableNow drains the
    backlog and stops (swap for a continuous trigger in production)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        dups = near_dups_against_index(
            spark,
            index_dir,
            batch_df,
            id_col,
            text_col,
            threshold,
            num_hashes,
            bands,
            shingle_n,
            max_bucket,
            exclude_batch=batch_id,
        )
        (
            dups.withColumn("batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(dups_dir)
        )
        upsert_dedup_index_batch(
            batch_df, batch_id, index_dir, id_col, text_col, num_hashes, bands, shingle_n
        )

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


#: First (largest) base-partition id for compacted rows; successive
#: compactions count DOWN (-1, -2, ...). Micro-batch ids are >= 0, so a
#: base id never collides with a replayed batch (same scheme as
#: ``ann_index.BASE_BATCH_ID``).
BASE_BATCH_ID = -1


def compact_dedup_index(spark: SparkSession, index_dir: str) -> int:
    """Fold every batch partition of all three index datasets into one
    new base partition each, then drop the folded directories. Returns
    the number of batch partitions folded (counted on ``bands/``).

    Same crash-safety sequencing as ``ann_index.compact_lsh_index``:
    each dataset's snapshot is written to a hidden ``.compacting`` dir
    (invisible to Spark's file listing), atomically renamed to
    ``batch=<next base id>``, and only then are the folded dirs removed.
    A crash mid-sequence leaves duplicates on disk, never loss — and
    every reader of this index is duplicate-tolerant: the candidate
    join dedups (id_a, id_b) pairs, the sets read dedups on doc id, and
    ``counts/`` is re-derived from the deduped bands during compaction
    itself (duplicate count rows would OVER-count bucket sizes, which
    only over-triggers the cap — conservative, never wrong — and the
    next compaction heals it). The counts base is written from the
    folded bands snapshot, so cap totals stay exact after compaction.
    """
    root = Path(index_dir)
    bands_root = root / "bands"
    if not bands_root.is_dir():
        return 0
    batch_dirs = [
        d for d in bands_root.iterdir() if d.is_dir() and d.name.startswith("batch=")
    ]
    if len(batch_dirs) <= 1:
        return 0
    batch_ids = [int(d.name.split("=", 1)[1]) for d in batch_dirs]
    new_base = min(BASE_BATCH_ID, min(batch_ids) - 1)

    id_col = [
        c for c in spark.read.parquet(str(bands_root)).columns if c not in ("band", "bucket", "batch")
    ][0]
    bands_df = (
        spark.read.parquet(str(bands_root))
        .select(id_col, "band", "bucket")
        .dropDuplicates([id_col, "band", "bucket"])
        .persist()
    )
    try:
        n_bands = max(bands_df.select("band").distinct().count(), 1)

        for name, df, part_cols, parts in (
            ("bands", bands_df, ["band"], n_bands),
            (
                "sets",
                spark.read.parquet(str(root / "sets"))
                .select(id_col, "hs")
                .dropDuplicates([id_col]),
                [],
                1,
            ),
            (
                "counts",
                bands_df.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n")),
                [],
                1,
            ),
        ):
            ds_root = root / name
            tmp = ds_root / ".compacting"
            if tmp.exists():
                shutil.rmtree(tmp)  # stale from a crash; re-derivable
            old = [
                d for d in ds_root.iterdir() if d.is_dir() and d.name.startswith("batch=")
            ]
            w = df.repartition(parts, *part_cols) if part_cols else df.coalesce(parts)
            writer = w.write.mode("overwrite")
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            writer.parquet(str(tmp))
            tmp.rename(ds_root / f"batch={new_base}")
            for d in old:
                shutil.rmtree(d)
    finally:
        bands_df.unpersist()
    return len(batch_dirs)

"""Persisted IVF ANN index — k-means cells as PARTITION DIRECTORIES.

The third member of the index family (next to ``ann_index`` — the
hyperplane-LSH band index — and ``dedup_index``): the batch-scale IVF
path (``similarity.ivf_ann_topk``) materialized on disk so repeated
query sets never re-fit, re-assign or re-scan the corpus. Its pruning
story is the cleanest of the three, because the blocking key IS a
Spark partition column: vectors live under ``cells/batch=<b>/cell=<c>``
directories, a query probes its ``n_probe`` nearest cells, and the
``cell IN (...)`` filter prunes whole DIRECTORIES at planning time
(``PartitionFilters`` in the plan — no bloom/row-group machinery
needed). A probe reads ~n_probe/n_cells of the corpus bytes by
construction, at any index size.

Maintenance model (the honest IVF trade): centroids are FROZEN at
build time — that is what makes at-ingest upserts possible (a new
micro-batch is assigned against the stored centroids, no global
re-fit) — and a corpus that drifts far from the fitted distribution
degrades recall, not correctness. The remedy is a periodic
``build_ivf_index`` refit-and-rebuild, which is why the index keeps
the same batch-partitioned, idempotent, crash-safe-compaction layout
as the other two indexes:

- ``foreachBatch`` is at-least-once → every upsert is dynamic
  partition overwrite under ``batch=<id>`` (a replay rewrites exactly
  its own slice);
- queries dedup candidates at the (q_id, c_id) level, so the
  mid-compaction duplicate window is harmless;
- compaction folds batch partitions into a ``batch=<base>`` dir with
  file counts scaled to row counts, then drops the folded dirs
  (write → atomic rename → delete, same sequencing as the siblings).

Layout under ``index_dir``:
- ``cells/`` (batch, cell) -> (id, vec): the index proper;
- ``centroids/``: one small parquet of (cell, c float64[]) — the
  frozen model, read once per query session.
"""

from __future__ import annotations

import math
import shutil
from pathlib import Path

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

import pyspark.sql.functions as F

from bearly_spark.operators.similarity import (
    _kmeans_fit,
    make_cell_assign_udf,
    make_cosine_udf,
)

#: Compacted-base id scheme shared with the sibling indexes.
BASE_BATCH_ID = -1

_ROWS_PER_FILE = 4_000_000


#: driver-side frozen-model cache: (abs subdir, newest mtime) → loaded
#: model. The centroid/codebook/meta files are a few KB but each read
#: is a full Spark job (plan + scan + collect) — three per
#: ``ivfpq_index_query`` call, ~1s of pure overhead on repeated
#: queries against the same index (the bench/production steady state).
#: manifest-keyed like ``registry._shared._scratch_index`` — the key
#: carries (newest mtime, file count, total bytes) so an in-place
#: rebuild completing within one coarse-mtime tick (1-second
#: filesystems) still misses the stale entry unless it also matches
#: size and count; superseded generations for the same path are
#: EVICTED on insert, so repeated rebuilds cannot grow driver memory
#: unboundedly. Local-FS only (object-store callers would key on a
#: real manifest — out of scope here).
_MODEL_CACHE: dict[tuple[str, float, int, int], object] = {}


def _model_cached(index_dir: str, sub: str, load):
    import os

    path = os.path.abspath(os.path.join(index_dir, sub))
    try:
        stats = [
            os.stat(os.path.join(d, f))
            for d, _, fs in os.walk(path)
            for f in fs
        ]
        if not stats:
            return load()
        mtime = max(st.st_mtime for st in stats)
        manifest = (len(stats), sum(st.st_size for st in stats))
    except OSError:
        return load()  # non-local: skip caching
    key = (path, mtime, *manifest)
    if key not in _MODEL_CACHE:
        for old in [k for k in _MODEL_CACHE if k[0] == path]:
            del _MODEL_CACHE[old]
        _MODEL_CACHE[key] = load()
    return _MODEL_CACHE[key]


def _read_centroids(spark: SparkSession, index_dir: str) -> np.ndarray:
    def load():
        rows = (
            spark.read.parquet(f"{index_dir}/centroids")
            .orderBy("cell")
            .collect()
        )
        return np.asarray([r.c for r in rows], dtype=np.float64)

    return _model_cached(index_dir, "centroids", load)


def build_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    sample_size: int = 100_000,
    seed: int = 42,
    sample_by: str = "hash",
) -> np.ndarray:
    """Fit centroids on a bounded sample (identical rules to
    ``ivf_ann_topk``: auto-sized cells≈√N when unset; hash-ordered
    sample by default, ``sample_by="id"`` for the reproducible twinning
    order), assign every corpus vector in one map-only pass, and write
    the index. The initial load lands under ``batch=-1`` (a compacted
    base, so ``compact_ivf_index`` after later upserts folds into -2,
    -3, ...). Returns the fitted centroid matrix."""
    if n_cells is None:
        n = corpus.agg(F.approx_count_distinct(id_col)).collect()[0][0]
        n_cells = int(min(4096, max(4, round(math.sqrt(max(n, 1))))))
    order = (
        F.col(id_col).cast("long")
        if sample_by == "id"
        else F.xxhash64(F.col(id_col), F.lit(seed))
    )
    sample = (
        corpus.select(F.col(vec_col).alias("_v"), order.alias("_h"))
        .orderBy("_h")
        .limit(sample_size)
        .select("_v")
        .collect()
    )
    smat = np.asarray([np.asarray(r[0], dtype=np.float64) for r in sample])
    C = _kmeans_fit(smat, n_cells, seed)

    spark = corpus.sparkSession
    (
        spark.createDataFrame(
            [(int(j), [float(x) for x in C[j]]) for j in range(n_cells)],
            "cell int, c array<double>",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{index_dir}/centroids")
    )
    _write_cells(corpus, C, BASE_BATCH_ID, index_dir, id_col, vec_col)
    return C


def _write_cells(
    df: DataFrame,
    C: np.ndarray,
    batch_id: int,
    index_dir: str,
    id_col: str,
    vec_col: str,
) -> None:
    n_cells = len(C)
    cell_udf = make_cell_assign_udf(C)
    assigned = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            cell_udf(F.col(vec_col)).alias("cell"),
        )
        # bounded files per cell dir (the sibling indexes' hygiene rule):
        # micro-batches and fixture-scale loads get one file per touched
        # cell; hash partitioning by cell keeps each task writing few dirs
        .repartition(max(1, min(n_cells, 64)), "cell")
        .withColumn("batch", F.lit(int(batch_id)))
    )
    (
        assigned.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "cell")
        .parquet(f"{index_dir}/cells")
    )


def upsert_ivf_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Idempotently index one micro-batch against the FROZEN centroids
    (read from the index — no refit, no corpus pass). At-least-once
    replay rewrites exactly ``batch=<id>/cell=*``."""
    C = _read_centroids(batch_df.sparkSession, index_dir)
    _write_cells(batch_df, C, batch_id, index_dir, id_col, vec_col)


def streaming_ivf_index(
    vectors: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> StreamingQuery:
    """Maintain the IVF index at ingest: each micro-batch is assigned
    against the stored centroids and upserted idempotently. The index
    must already exist (``build_ivf_index`` fits the model); centroid
    refresh is an explicit rebuild, by design."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        upsert_ivf_batch(batch_df, batch_id, index_dir, id_col, vec_col)

    return (
        vectors.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ivf_index_query(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int | None = None,
) -> DataFrame:
    """Top-k ANN from the persisted index: identical semantics to
    ``ivf_ann_topk`` at the same operating point (stable-sorted probe
    ranking, exact cosine rerank, self-pairs excluded).

    Scale shape: the centroid model is tiny (read once, ranked
    driver-side per query — queries are bounded by the API contract);
    the ``cell IN (...)`` filter on the index scan is PARTITION pruning
    — Spark never lists, let alone reads, the unprobed cell
    directories, so a probe touches ~n_probe/n_cells of the index
    bytes at any index size. Vectors ride in the index rows, so the
    rerank needs no join back to a corpus table."""
    C = _read_centroids(spark, index_dir)
    if n_probe is None:
        n_probe = max(4, len(C) // 16)
    c2 = (C**2).sum(axis=1)
    from bearly_spark.operators.similarity import collect_query_rows

    qrows = collect_query_rows(queries, id_col, vec_col)
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        d = c2 - 2.0 * (C @ qv)
        for cell in np.argsort(d, kind="stable")[:n_probe]:
            probe_rows.append((int(r[0]), int(cell)))
    probes = spark.createDataFrame(probe_rows, "q_id long, cell int")
    probed_cells = sorted({c for _, c in probe_rows})

    cells = spark.read.parquet(f"{index_dir}/cells").filter(
        F.col("cell").isin(probed_cells)
    )
    cos_udf = make_cosine_udf()
    cand = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("q_id") != F.col("id"))
        # index duplicates (replay windows, mid-compaction) collapse here
        .dropDuplicates(["q_id", "id"])
        .join(
            F.broadcast(
                queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
            ),
            "q_id",
        )
        .withColumn("cosine_sim", F.round(cos_udf(F.col("q_vec"), F.col("vec")), 6))
        .select(F.col("q_id").alias("query_id"), F.col("id").alias("neighbor_id"), "cosine_sim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rn")
    )


def compact_ivf_index(spark: SparkSession, index_dir: str) -> int:
    """Fold every ``cells/`` batch partition into one new base, file
    counts scaled to rows (bounded-size files at any scale), then drop
    the folded dirs — the siblings' write → atomic-rename → delete
    sequencing, with the same crash posture: a crash mid-sequence
    leaves duplicates the query path dedups. Returns folded dir count."""
    root = Path(index_dir) / "cells"
    if not root.is_dir():
        return 0
    batch_dirs = [d for d in root.iterdir() if d.is_dir() and d.name.startswith("batch=")]
    if len(batch_dirs) <= 1:
        return 0
    batch_ids = [int(d.name.split("=", 1)[1]) for d in batch_dirs]
    new_base = min(BASE_BATCH_ID, min(batch_ids) - 1)

    idx = (
        spark.read.parquet(str(root))
        .select("id", "vec", "cell")
        .dropDuplicates(["id", "cell"])
        .localCheckpoint(eager=True)
    )
    n_cells = max(idx.select("cell").distinct().count(), 1)
    n_files = max(min(n_cells, 64), math.ceil(idx.count() / _ROWS_PER_FILE))
    tmp = root / ".compacting"
    if tmp.exists():
        shutil.rmtree(tmp)
    (
        idx.repartition(n_files, "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(str(tmp))
    )
    tmp.rename(root / f"batch={new_base}")
    for d in batch_dirs:
        shutil.rmtree(d)
    return len(batch_dirs)


# ------------------------------------------------------- IVF-PQ (round 6)
#
# The classic 100 TB ANN composition (Faiss-style IVF-PQ, flat-encoded):
# IVF prunes WHICH vectors a query scans (cell directories, partition
# pruning), PQ shrinks WHAT a scanned vector costs (m one-byte codes vs
# dim·4 raw bytes — 16x at the registry point). The persisted layout
# separates the two access patterns the way the dedup index separates
# bands/ from sets/:
#
# - ``cells/``  (batch, cell) -> (id, codes): the scan path — SMALL
#   (Θ(N·m) bytes); a probe reads ~n_probe/n_cells of it via directory
#   pruning and ranks candidates by asymmetric distance (ADC) against
#   the query's exact sub-vectors;
# - ``vecs/``   (batch) -> (id, vec): the raw vectors, touched ONLY for
#   the exact rerank of ≤ queries×rerank candidate ids — id-sorted with
#   an id bloom filter, so the rerank read is a pruned point-lookup scan
#   (``dedup_index``'s sets/ pattern), not a corpus pass;
# - ``centroids/`` + ``codebooks/``: the frozen model (coarse cells +
#   per-subspace PQ codebooks), fit once on a bounded sample; upserts
#   encode against it (idempotent per batch), drift is a documented
#   rebuild trigger exactly as for the plain IVF index.
#
# Two encodings share the layout (``meta/`` records which one an index
# uses, so upserts and queries can't mix them):
# - ``flat``: PQ quantizes the RAW vector — one model for all cells,
#   simplest twin;
# - ``residual`` (the Faiss IVF-PQ default): PQ quantizes x − centroid
#   of x's cell. Residuals are smaller and better centered than raw
#   vectors, so the same code budget quantizes finer — measured
#   (tests/test_streaming.py pins the clustered case): on a 32-center
#   clustered corpus recall@10 goes 0.84 (flat) → 1.00 (residual) at
#   the same operating point, which is the shape real embedding
#   corpora have; on the ISOTROPIC driver fixture both read 0.74 —
#   with centroids near the origin the residual ≈ the raw vector, so
#   there is nothing for the finer quantization to win. Cost: the
#   query-side LUT becomes per (query, probed cell) — n_probe small
#   LUT builds per query instead of one, still Θ(model) driver work,
#   and the scan/rerank shapes are unchanged.


def _assign_cells_np(C: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Driver-side twin of ``make_cell_assign_udf``'s arithmetic (same
    argmin(c² − 2x·C) form, first-hit ties) for fitting residuals."""
    c2 = (C**2).sum(axis=1)
    return (c2[None, :] - 2.0 * (mat @ C.T)).argmin(axis=1)


def _read_codebooks(spark: SparkSession, index_dir: str) -> np.ndarray:
    def load():
        rows = (
            spark.read.parquet(f"{index_dir}/codebooks")
            .orderBy("j", "c")
            .collect()
        )
        m = max(r.j for r in rows) + 1
        ksub = max(r.c for r in rows) + 1
        dsub = len(rows[0].cv)
        cb = np.empty((m, ksub, dsub), dtype=np.float64)
        for r in rows:
            cb[r.j, r.c] = r.cv
        return cb

    return _model_cached(index_dir, "codebooks", load)


_VEC_WRITE_OPTS = {"parquet.bloom.filter.enabled#id": "true"}


def _read_encoding(spark: SparkSession, index_dir: str) -> str:
    """The index's PQ encoding ('flat' | 'residual') from ``meta/``;
    indexes written before the marker existed default to 'flat'."""
    import os

    if not os.path.isdir(f"{index_dir}/meta"):
        return "flat"
    return _model_cached(
        index_dir,
        "meta",
        lambda: spark.read.parquet(f"{index_dir}/meta").collect()[0]["encoding"],
    )


def make_ivfpq_encode_udf(C: np.ndarray, cb: np.ndarray, residual: bool):
    """vector -> (cell, codes) in ONE Arrow pass: coarse argmin cell
    assignment, then per-subspace PQ codes of the raw vector (flat) or
    of vector − cell centroid (residual). Ties to the lowest index on
    both levels — the SQL twins' ORDER BY rule."""
    Cc = C.copy()
    cbc = cb.copy()
    m, ksub, dsub = cbc.shape
    cc2 = (Cc**2).sum(axis=1)
    cb2 = (cbc**2).sum(axis=2)

    @F.pandas_udf("struct<cell:int, codes:array<int>>")
    def _enc(vecs: pd.Series) -> pd.DataFrame:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        cells = (cc2[None, :] - 2.0 * (mat @ Cc.T)).argmin(axis=1)
        base = mat - Cc[cells] if residual else mat
        codes = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            sub = base[:, j * dsub : (j + 1) * dsub]
            d = cb2[j][None, :] - 2.0 * (sub @ cbc[j].T)
            codes[:, j] = d.argmin(axis=1)
        return pd.DataFrame(
            {"cell": cells.astype(np.int32), "codes": list(codes)}
        )

    return _enc


def _write_pq_parts(
    df: DataFrame,
    C: np.ndarray,
    cb: np.ndarray,
    batch_id: int,
    index_dir: str,
    id_col: str,
    vec_col: str,
    residual: bool = False,
) -> None:
    n_cells = len(C)
    enc = make_ivfpq_encode_udf(C, cb, residual)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        enc(F.col(vec_col)).alias("_e"),
    ).select(
        "id", "vec", F.col("_e.cell").alias("cell"), F.col("_e.codes").alias("codes")
    ).localCheckpoint(eager=True)  # one UDF pass feeds both writers
    (
        base.select("id", "codes", "cell")
        .repartition(max(1, min(n_cells, 64)), "cell")
        .withColumn("batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "cell")
        .parquet(f"{index_dir}/cells")
    )
    w = (
        base.select("id", "vec")
        .repartitionByRange(max(1, math.ceil(base.count() / _ROWS_PER_FILE)), "id")
        .sortWithinPartitions("id")
        .withColumn("batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
    )
    for k, v in _VEC_WRITE_OPTS.items():
        w = w.option(k, v)
    w.partitionBy("batch").parquet(f"{index_dir}/vecs")


def build_ivfpq_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    m: int = 16,
    ksub: int = 16,
    sample_size: int = 100_000,
    seed: int = 42,
    sample_by: str = "hash",
    encoding: str = "flat",
) -> tuple[np.ndarray, np.ndarray]:
    """Fit coarse centroids AND per-subspace PQ codebooks on one bounded
    sample (same sizing/sampling rules as ``build_ivf_index``; the PQ
    fit seeds per subspace), then encode + write the full corpus under
    ``batch=-1``. ``encoding="residual"`` fits the codebooks on the
    sample's CELL RESIDUALS (x − assigned centroid) and encodes/scores
    residuals throughout — the Faiss default, finer codes for the same
    budget (module docstring has the measured recall delta). The choice
    is recorded in ``meta/`` so upserts/queries follow it automatically.
    Returns (centroids, codebooks)."""
    from bearly_spark.operators.similarity import pq_fit

    if encoding not in ("flat", "residual"):
        raise ValueError(f"encoding must be 'flat' or 'residual': {encoding}")
    if n_cells is None:
        n = corpus.agg(F.approx_count_distinct(id_col)).collect()[0][0]
        n_cells = int(min(4096, max(4, round(math.sqrt(max(n, 1))))))
    order = (
        F.col(id_col).cast("long")
        if sample_by == "id"
        else F.xxhash64(F.col(id_col), F.lit(seed))
    )
    sample = (
        corpus.select(F.col(vec_col).alias("_v"), order.alias("_h"))
        .orderBy("_h")
        .limit(sample_size)
        .select("_v")
        .collect()
    )
    smat = np.asarray([np.asarray(r[0], dtype=np.float64) for r in sample])
    C = _kmeans_fit(smat, n_cells, seed)
    fit_mat = smat - C[_assign_cells_np(C, smat)] if encoding == "residual" else smat
    cb = pq_fit(fit_mat, m, ksub, seed)

    spark = corpus.sparkSession
    (
        spark.createDataFrame(
            [(int(j), [float(x) for x in C[j]]) for j in range(n_cells)],
            "cell int, c array<double>",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{index_dir}/centroids")
    )
    (
        spark.createDataFrame(
            [
                (int(j), int(c), [float(x) for x in cb[j, c]])
                for j in range(cb.shape[0])
                for c in range(cb.shape[1])
            ],
            "j int, c int, cv array<double>",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{index_dir}/codebooks")
    )
    (
        spark.createDataFrame([(encoding,)], "encoding string")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{index_dir}/meta")
    )
    _write_pq_parts(
        corpus, C, cb, BASE_BATCH_ID, index_dir, id_col, vec_col,
        residual=(encoding == "residual"),
    )
    return C, cb


def upsert_ivfpq_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Idempotently index one micro-batch against the FROZEN model
    (centroids + codebooks + encoding read from the index; no refit).
    A replay rewrites exactly its own ``batch=<id>`` slices of cells/
    and vecs/."""
    spark = batch_df.sparkSession
    C = _read_centroids(spark, index_dir)
    cb = _read_codebooks(spark, index_dir)
    _write_pq_parts(
        batch_df, C, cb, batch_id, index_dir, id_col, vec_col,
        residual=(_read_encoding(spark, index_dir) == "residual"),
    )


def ivfpq_index_query(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int | None = None,
    rerank: int = 100,
    scan_prune_max_keys: int = 2048,
) -> DataFrame:
    """Top-k ANN from the persisted IVF-PQ index: directory-pruned codes
    scan → per-query ADC ranking → exact cosine rerank against the
    id-pruned vecs/ sidecar.

    Scale shape, stage by stage:
    - probe selection is driver-side against the tiny frozen model
      (stable argsort — ties to the lowest cell, the twin's ORDER BY);
    - the cells/ scan reads ~n_probe/n_cells of Θ(N·m) CODE bytes
      (partition pruning × 16x compression — the two levers composed);
    - ADC terms come from per-query LUTs broadcast in the kernel
      closure (the asymmetric trick: query side exact); each partition
      emits its local top-``rerank`` per query under the GLOBAL
      (rounded-ADC, id) key, the ``pq_ann_topk`` TakeOrdered shape;
    - the rerank reads ≤ queries×rerank raw vectors through
      ``vecs/``'s id-sorted, bloom-filtered layout via chunked pushed
      IN filters (``dedup_index._pruned_scan``) when the id set fits
      ``scan_prune_max_keys``, else one full sidecar scan (a huge
      candidate set amortizes it).

    Index duplicates (replay windows, mid-compaction) collapse at the
    (q_id, id) level before scoring. Returns
    (query_id, neighbor_id, cosine_sim, rn), rn ≤ k."""
    import pandas as pd

    from bearly_spark.streaming.dedup_index import _pruned_scan

    C = _read_centroids(spark, index_dir)
    cb = _read_codebooks(spark, index_dir)
    residual = _read_encoding(spark, index_dir) == "residual"
    if n_probe is None:
        n_probe = max(4, len(C) // 16)
    mm, ksub, dsub = cb.shape
    c2 = (C**2).sum(axis=1)
    cb2 = (cb**2).sum(axis=2)

    def _lut(qv: np.ndarray) -> np.ndarray:
        lut = np.empty((mm, ksub), dtype=np.float64)
        for j in range(mm):
            qj = qv[j * dsub : (j + 1) * dsub]
            lut[j] = cb2[j] - 2.0 * (cb[j] @ qj) + (qj @ qj)
        return lut

    from bearly_spark.operators.similarity import collect_query_rows

    qrows = collect_query_rows(queries, id_col, vec_col)
    probe_rows, luts = [], {}
    for r in qrows:
        qid = int(r[0])
        qv = np.asarray(r[1], dtype=np.float64)
        d = c2 - 2.0 * (C @ qv)
        probed = [int(c) for c in np.argsort(d, kind="stable")[:n_probe]]
        probe_rows.extend((qid, c) for c in probed)
        if residual:
            # the asymmetric trick per CELL: the query residual w.r.t.
            # each probed cell gets its own term table — n_probe small
            # LUT builds per query, still Θ(model) driver work
            for c in probed:
                luts[(qid, c)] = _lut(qv - C[c])
        else:
            luts[qid] = _lut(qv)
    probes = spark.createDataFrame(probe_rows, "q_id long, cell int")
    probed_cells = sorted({c for _, c in probe_rows})

    cells = spark.read.parquet(f"{index_dir}/cells").filter(
        F.col("cell").isin(probed_cells)
    )
    scored_in = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("q_id") != F.col("id"))
        .dropDuplicates(["q_id", "id"])
        .select("q_id", "id", "cell", "codes")
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.asarray([np.asarray(c) for c in pdf["codes"]], dtype=np.int64)
            ids = pdf["id"].to_numpy()
            qs = pdf["q_id"].to_numpy()
            cls = pdf["cell"].to_numpy()
            frames = []
            for qid in np.unique(qs):
                msk = qs == qid
                if residual:
                    adc = np.empty(int(msk.sum()), dtype=np.float64)
                    sub_cells = cls[msk]
                    sub_codes = cmat[msk]
                    for c in np.unique(sub_cells):
                        cm = sub_cells == c
                        adc[cm] = luts[(int(qid), int(c))][
                            np.arange(mm)[None, :], sub_codes[cm]
                        ].sum(axis=1)
                else:
                    adc = luts[int(qid)][np.arange(mm)[None, :], cmat[msk]].sum(axis=1)
                adc_r = np.round(adc, 6)
                take = min(rerank, msk.sum())
                sel = np.lexsort((ids[msk], adc_r))[:take]
                frames.append(
                    pd.DataFrame(
                        {"q_id": qid, "id": ids[msk][sel], "adc": adc_r[sel]}
                    )
                )
            if frames:
                yield pd.concat(frames)

    from pyspark.sql import Window

    scored = scored_in.mapInPandas(score, schema="q_id long, id long, adc double")
    w_adc = Window.partitionBy("q_id").orderBy(F.asc("adc"), F.asc("id"))
    cand = (
        scored.withColumn("_rn", F.row_number().over(w_adc))
        .filter(F.col("_rn") <= rerank)
        .select("q_id", "id")
        # consumed by the id collect AND the rerank; LAZY pin (r14) —
        # the cand_ids collect right below materializes it, so the old
        # eager form paid one extra driver job for nothing
        .localCheckpoint(eager=False)
    )

    vecs = spark.read.parquet(f"{index_dir}/vecs").select("id", "vec")
    cand_ids = [
        r[0]
        for r in cand.select("id").distinct().limit(scan_prune_max_keys + 1).collect()
    ]
    if 0 < len(cand_ids) <= scan_prune_max_keys:
        vecs = _pruned_scan(vecs, "id", cand_ids)
    vecs = vecs.dropDuplicates(["id"])  # replay/compaction duplicate tolerance

    cos_udf = make_cosine_udf()
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        cand.join(vecs, "id")
        .join(F.broadcast(qv), "q_id")
        .withColumn("cosine_sim", F.round(cos_udf(F.col("q_vec"), F.col("vec")), 6))
        .select(
            F.col("q_id").alias("query_id"), F.col("id").alias("neighbor_id"), "cosine_sim"
        )
        .withColumn("rn", F.row_number().over(w_cos))
        .filter(F.col("rn") <= k)
    )


def compact_ivfpq_index(spark: SparkSession, index_dir: str) -> int:
    """Fold both datasets' batch partitions into one new base each
    (cells/ repartitioned by cell, vecs/ id-range-sorted with its bloom
    layout), write → atomic rename → delete, duplicates through the
    crash window collapsing in the query path as usual. Returns the
    number of cells/ batch dirs folded."""
    root = Path(index_dir)
    cells_root = root / "cells"
    if not cells_root.is_dir():
        return 0
    batch_dirs = [
        d for d in cells_root.iterdir() if d.is_dir() and d.name.startswith("batch=")
    ]
    if len(batch_dirs) <= 1:
        return 0
    batch_ids = [int(d.name.split("=", 1)[1]) for d in batch_dirs]
    new_base = min(BASE_BATCH_ID, min(batch_ids) - 1)

    cells_df = (
        spark.read.parquet(str(cells_root))
        .select("id", "codes", "cell")
        .dropDuplicates(["id", "cell"])
        .localCheckpoint(eager=True)
    )
    vecs_df = (
        spark.read.parquet(str(root / "vecs"))
        .select("id", "vec")
        .dropDuplicates(["id"])
        .localCheckpoint(eager=True)
    )
    n_cells = max(cells_df.select("cell").distinct().count(), 1)
    n_cell_files = max(min(n_cells, 64), math.ceil(cells_df.count() / _ROWS_PER_FILE))
    n_vec_files = max(1, math.ceil(vecs_df.count() / _ROWS_PER_FILE))
    for name, df, part_cols, opts in (
        ("cells", cells_df.repartition(n_cell_files, "cell"), ["cell"], {}),
        (
            "vecs",
            (
                vecs_df.coalesce(1)
                if n_vec_files <= 1
                else vecs_df.repartitionByRange(n_vec_files, "id")
            ).sortWithinPartitions("id"),
            [],
            _VEC_WRITE_OPTS,
        ),
    ):
        ds_root = root / name
        tmp = ds_root / ".compacting"
        if tmp.exists():
            shutil.rmtree(tmp)
        old = [d for d in ds_root.iterdir() if d.is_dir() and d.name.startswith("batch=")]
        writer = df.write.mode("overwrite")
        for k, v in opts.items():
            writer = writer.option(k, v)
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(str(tmp))
        tmp.rename(ds_root / f"batch={new_base}")
        for d in old:
            shutil.rmtree(d)
    return len(batch_dirs)

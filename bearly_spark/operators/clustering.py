"""Distributed k-means over embeddings + SemDeDup-style semantic dedup.

The LLM-curation operator family the repo lacked until round 10:
cluster the embedding space (k-means), then curate INSIDE clusters —
SemDeDup (Abbas et al. 2023) drops semantic near-duplicates per
cluster; D4 (Tirumala et al. 2023) additionally prunes the most
prototypical points. Blocking by k-means cell is what makes both
tractable at corpus scale: pair work is Sigma(cell^2), never N^2.

Everything here is EXACT INTEGER arithmetic so the DuckDB oracle twins
hash-match bit-for-bit:

- vectors are quantized once: ``xq[i] = floor(float64(v[i]) * 2^20)``
  (int64). float->double widening and the double multiply are identical
  IEEE operations in Spark, numpy and DuckDB, so the quantized grid is
  engine-independent;
- squared L2 distances are int64 sums (|xq| <= ~1.1e6 per coordinate,
  dim 64 -> dist <= ~7.7e13, no overflow);
- Lloyd centroid updates use FLOOR-DIVISION means (``s // n`` on exact
  integer sums) so refined centroids stay on the integer grid — a
  deliberate, documented deviation from real-valued k-means that buys
  cross-engine exactness at < 1 quantization step of centroid error;
- cosine thresholds compare ``den^2 * dot^2 >= num^2 * nx2 * ny2`` with
  the threshold a RATIONAL (num, den) — no sqrt, no IEEE anywhere.

Scale shape (the 100 TB story):
- centroids are tiny (k x dim ints) and always DRIVER-HELD + broadcast
  inside Arrow kernels; the corpus never shuffles for assignment — one
  narrow ``mapInPandas`` pass per Lloyd iteration;
- the per-iteration reduction ships only k x dim x partitions partial
  sums (a ``groupBy(cluster, pos)`` over kernel-emitted partials, NOT a
  64x ``posexplode`` of the corpus);
- SemDeDup pair work runs per-cell via ``applyInPandas`` with a hard
  cell cap + ``Observation`` drop accounting, the same
  blocked/capped/observed contract as the minhash and entity-match
  families (``operators/dedup.py``);
- assignment kernels are numpy int64 batch ops (Arrow transfer), not
  per-element SQL folds — the higher-order-function forms are
  CodegenFallback and ~50x slower (see ``operators/similarity.py``).

Reference parity note: the reference engine (bearly_ext.cc — Arrow
stream in, int64 SUM, stream out) has no clustering surface at all;
this module is part of the mandated capability superset (SURVEY §2.3:
similarity / semantic dedup for training-data curation).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation

#: Quantization grid: floor(value * 2^20). Embeddings are unit-norm
#: (|v_i| < 1), so quantized coordinates fit comfortably in int64 and
#: squared distances in dim<=1024 never overflow.
QUANT_SCALE = 1 << 20

#: SemDeDup cell-size guard: cells bigger than this contribute capped
#: pair work and are reported through the Observation instead of
#: silently exploding Sigma(cell^2). At 100 TB the right fix is a
#: bigger k (cells ~ N/k), not a bigger cap.
MAX_SEMDEDUP_CELL = 100_000

#: Auto-sized k targets cells of about this many vectors: the pair
#: stage is Sigma(cell^2), so pinning the EXPECTED cell size makes it
#: ~linear in corpus size (TARGET^2 * N/TARGET work). The 64x probe
#: (PLANS.md round-10 clustering section) measured the k=8 operating
#: point at 73.6x wall for 64x data; auto-k restored ~linear scaling.
SEMDEDUP_TARGET_CELL = 2048

#: Auto-k ceiling for the FLAT fit: seed collection is a k-row
#: TakeOrdered and each Lloyd reduction collects k*dim rows — both
#: Theta(k*dim) driver-side, fine to ~4096 cells (~16 MB at dim 1024).
#: Corpora wanting more cells use the two-level form
#: (``hierarchical_fit`` below, round 11): k1*k2 effective cells with
#: the fine centroids held distributed.
SEMDEDUP_MAX_AUTO_K = 4096


def quantized_vec(vec: Column, scale: int = QUANT_SCALE) -> Column:
    """``floor(float64(v) * scale)`` per coordinate, as array<long>.

    Column-expression form (CodegenFallback transform) — used by tests
    and small frames; the kernels below quantize in numpy instead.
    """
    s = F.lit(float(scale))
    return F.transform(vec, lambda v: F.floor(v.cast("double") * s).cast("long"))


def _quantize_np(mat: np.ndarray, scale: int = QUANT_SCALE) -> np.ndarray:
    return np.floor(mat.astype(np.float64) * float(scale)).astype(np.int64)


def _vec_matrix(series: pd.Series) -> np.ndarray:
    return np.array(series.tolist(), dtype=np.float64)


def _assign_batch(xq: np.ndarray, cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, dist) per row: argmin_j ||xq - cent_j||^2, int64-exact.

    Expansion form ||x||^2 + ||c||^2 - 2<x,c>: the big temp is the
    (n, k) distance matrix, NOT an (n, k, dim) broadcast cube — at
    Arrow batch sizes this keeps memory flat even for thousands of
    cells. All terms are int64 (|<x,c>| <= dim * (2^20)^2 ~ 7e13), so
    the distances are exact; np.argmin returns the FIRST minimal index,
    i.e. ties break toward the lowest cluster id — the same order the
    SQL twin's ``MIN(ROW(dist, cluster))`` induces.
    """
    nx2 = np.einsum("nd,nd->n", xq, xq)
    c2 = np.einsum("kd,kd->k", cent, cent)
    dists = nx2[:, None] + c2[None, :] - 2 * (xq @ cent.T)
    idx = dists.argmin(axis=1)
    return idx.astype(np.int32), dists[np.arange(len(idx)), idx]


def seed_centroids(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", k: int = 8
) -> list[list[int]]:
    """Deterministic init: the quantized vectors of the k lowest ids.

    ``orderBy(id).limit(k)`` compiles to TakeOrderedAndProject (a
    partial top-k, no global sort) — k rows reach the driver. The SQL
    twin re-derives the same seeds with ``ORDER BY id LIMIT k``.
    """
    rows = (
        df.select(F.col(id_col).alias("_id"), quantized_vec(F.col(vec_col)).alias("xq"))
        .orderBy("_id")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} seeds requested but only {len(rows)} vectors present")
    return [list(r.xq) for r in rows]


def assign_clusters(
    df: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
    emit_xq: bool = False,
) -> DataFrame:
    """Map-only nearest-centroid assignment: (id, cluster, dist).

    Centroids ride inside the kernel closure (broadcast with the task
    binary); the corpus is never shuffled. Output dist is the exact
    int64 squared L2 on the quantized grid. ``keep_vec`` carries the
    raw vector through so downstream per-cell stages (SemDeDup) avoid
    an O(N) join back to the source; ``emit_xq`` additionally emits the
    quantized grid vector (what the persisted semantic index stores —
    integer-exact across engine versions and float rounding modes).
    """
    cent = np.asarray(centroids, dtype=np.int64)
    schema = f"{id_col} long, cluster int, dist long"
    if keep_vec:
        # carry the vector in its INPUT type: declaring array<float>
        # here would silently truncate array<double> embeddings (e.g.
        # the hashed-TF featurizer's rounded doubles) and the pair
        # stage would then re-quantize DIFFERENT grid integers than
        # the SQL twin (floor(v * 2^20) flips on ~2% of 6dp-rounded
        # coordinates after a float32 roundtrip)
        schema += f", {vec_col} {df.schema[vec_col].dataType.simpleString()}"
    if emit_xq:
        schema += ", xq array<long>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            xq = _quantize_np(_vec_matrix(b[vec_col]))
            if xq.shape[1] != cent.shape[1]:
                raise ValueError(
                    f"vector dim {xq.shape[1]} != centroid dim {cent.shape[1]} "
                    "(did the embedding column change after the fit/build?)"
                )
            idx, d = _assign_batch(xq, cent)
            out = {id_col: b[id_col].to_numpy(), "cluster": idx, "dist": d}
            if keep_vec:
                out[vec_col] = b[vec_col]
            if emit_xq:
                out["xq"] = list(xq)
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(kernel, schema=schema)


def _refine_once(
    df: DataFrame,
    centroids: list[list[int]],
    id_col: str,
    vec_col: str,
) -> list[list[int]]:
    """One Lloyd step: assign, reduce per-cluster coordinate sums,
    floor-divide on the driver. Shuffle volume = partitions x k x dim
    partial rows (the kernel pre-reduces each Arrow batch; no corpus
    explode). Empty clusters keep their previous centroid."""
    cent = np.asarray(centroids, dtype=np.int64)
    k, dim = cent.shape

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for b in batches:
            if len(b) == 0:
                continue
            xq = _quantize_np(_vec_matrix(b[vec_col]))
            idx, _ = _assign_batch(xq, cent)
            np.add.at(sums, idx, xq)
            counts += np.bincount(idx, minlength=k)
        live = np.nonzero(counts)[0]
        if len(live) == 0:
            return
        yield pd.DataFrame(
            {
                "cluster": np.repeat(live.astype(np.int32), dim),
                "pos": np.tile(np.arange(dim, dtype=np.int32), len(live)),
                "s": sums[live].reshape(-1),
                "n": np.repeat(counts[live], dim),
            }
        )

    agg = (
        df.select(vec_col)
        .mapInPandas(partials, schema="cluster int, pos int, s long, n long")
        .groupBy("cluster", "pos")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )  # k x dim rows — Theta(k*dim), independent of corpus size
    out = [list(c) for c in centroids]
    by_cluster: dict[int, list[tuple[int, int, int]]] = {}
    for r in agg:
        by_cluster.setdefault(r.cluster, []).append((r.pos, r.s, r.n))
    for c, triples in by_cluster.items():
        vec = out[c]
        for pos, s, n in triples:
            vec[pos] = s // n  # python floor division == the twin's exact fdiv
    return out


def lloyd_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> list[list[int]]:
    """Seed + up to ``iters`` integer Lloyd steps, with a FIXPOINT
    early-stop: once a step returns the same centroids, further steps
    are exact no-ops (assignment is a pure function of the centroids),
    so stopping is result-identical to the twin's fixed unroll while
    skipping the remaining corpus passes."""
    cents = seed_centroids(df, id_col, vec_col, k)
    for _ in range(iters):
        new = _refine_once(df, cents, id_col, vec_col)
        if new == cents:
            break
        cents = new
    return cents


def kmeans_quantized(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> tuple[DataFrame, list[list[int]]]:
    """Integer-grid Lloyd k-means: (assignments, final centroids).

    assignments = (id, cluster int, dist long) under the FINAL
    centroids. ``iters`` refinement steps after seed init; each step is
    one narrow corpus pass + a Theta(k*dim) reduction.
    """
    cents = lloyd_fit(df, id_col, vec_col, k, iters)
    return assign_clusters(df, cents, id_col, vec_col), cents


def kmeans_cluster_profile(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """Per-cluster (cluster, n_vecs, inertia) under the final centroids.

    inertia is the exact integer sum of quantized squared distances.
    The sum is carried exactly in decimal(38,0) and emitted as BIGINT
    (r10 verdict: the driver's result hasher diverges on DECIMAL output
    columns while values are equal, so compared surfaces stay
    integer-typed). A guard raises if any cluster's sum exceeds int64
    rather than wrapping silently: with the quantization grid bounding
    each squared distance by ~dim * (2 * QUANT_SCALE)^2 (dist <= 7.7e13
    at dim 1024), a cell needs >1.1e5 x the 4096-cell auto-k target
    occupancy before the bound bites — at which point the caller should
    aggregate hi/lo split partials instead. ``centroids`` skips the fit
    (shared/frozen-fit callers).
    """
    if centroids is not None:
        assigned = assign_clusters(df, centroids, id_col, vec_col)
    else:
        assigned, _ = kmeans_quantized(df, id_col, vec_col, k, iters)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.col("dist").cast("decimal(38,0)")).alias("_inertia_dec"),
        )
        .select(
            "cluster",
            "n_vecs",
            F.when(
                F.col("_inertia_dec") <= F.lit(9223372036854775807),
                F.col("_inertia_dec").cast("long"),
            )
            .otherwise(
                F.raise_error(F.lit("kmeans inertia exceeds int64: split hi/lo"))
            )
            .alias("inertia"),
        )
        .orderBy("cluster")
    )


def _exact_ge(lhs_a: int, lhs_b: int, rhs: int) -> bool:
    """lhs_a * lhs_b >= rhs with python ints (exact, arbitrary width)."""
    return lhs_a * lhs_b >= rhs


def _greedy_drop_sorted(
    xq: np.ndarray, max_cell: int, num2: int, den2: int
) -> np.ndarray:
    """The SemDeDup per-cell greedy-drop kernel over id-PRE-SORTED
    quantized rows: kept[j] = no earlier row within the capped witness
    pool clears the exact rational cosine test. Shared by the flat and
    hierarchical pair stages (the rule, the cap semantics and the
    blockwise memory discipline must never diverge between them).

    Witness POOL is capped at the max_cell lowest ids; every row is
    still TESTED against the capped pool — the multiprobe/streaming
    rule, so all paths agree on any input. Per-row work is <= max_cell
    dots: total cell cost O(n * min(n, max_cell)), linear past the cap.
    """
    n = len(xq)
    kept = np.ones(n, dtype=bool)
    if n <= 1:
        return kept
    W = min(n, max_cell)
    nx2 = np.einsum("nd,nd->n", xq, xq)
    # BLOCKWISE gram: a (block x W) strip, never the full cell^2
    # matrix — memory stays O(block * min(cell, cap)) at any cell
    # size (the full gram at the 100k cap would be 80 GB).
    _BLOCK = 1024
    for lo in range(1, n, _BLOCK):
        hi = min(lo + _BLOCK, n)
        whi = min(hi, W)
        gram = xq[lo:hi] @ xq[:whi].T  # int64-exact, |dot| <= ~7e13
        # float64 screen with an exact python-int confirmation band:
        # lhs/rhs ~ 1e27-1e30 exceed float64's 2^53 integer range, so
        # near-boundary pairs re-check exactly.
        fl = float(den2) * gram.astype(np.float64) ** 2
        # cast BEFORE the outer product: nx2 ~ 2^40 for unit-norm
        # 2^20-grid vectors, so the int64 product (~2^80) silently
        # wraps and a wrapped screen passes everything — vacuous
        # prefilter, O(cell^2) python bigint confirms (results stay
        # right; the cost doesn't)
        fr = float(num2) * np.outer(
            nx2[lo:hi].astype(np.float64), nx2[:whi].astype(np.float64)
        )
        for j in range(lo, hi):
            b = j - lo
            lim = min(j, W)  # lower-id witnesses, pool-capped
            cand = np.nonzero(
                (gram[b, :lim] > 0) & (fl[b, :lim] >= fr[b, :lim] * (1 - 1e-9))
            )[0]
            for i in cand:
                d = int(gram[b, i])
                if d > 0 and _exact_ge(
                    den2 * d, d, num2 * int(nx2[i]) * int(nx2[j])
                ):
                    kept[j] = False
                    break
    return kept


def semdedup_flags(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    iters: int = 2,
    tau: tuple[int, int] = (19, 20),
    max_cell: int = MAX_SEMDEDUP_CELL,
    observation: Observation | None = None,
    centroids: list[list[int]] | None = None,
    n_probe: int = 1,
) -> DataFrame:
    """SemDeDup: flag semantic near-duplicates inside k-means cells.

    A vector is ``kept = false`` iff a LOWER-id vector in the SAME cell
    has cosine >= tau (tau given as a rational num/den; the test is the
    exact integer ``den^2*dot^2 >= num^2*nx2*ny2 AND dot > 0`` on the
    quantized grid — no sqrt). Keeps exactly the greedy min-id
    representative per near-dup neighborhood, the standard SemDeDup
    policy. Cross-cell near-dups are NOT compared — that recall loss is
    the algorithm's documented trade (Abbas et al. 2023 §3), and it
    grows with k: auto-k (below) buys linear pair work at the price of
    more cell boundaries.

    ``k=None`` (default) auto-sizes cells to ~SEMDEDUP_TARGET_CELL
    vectors so the Sigma(cell^2) pair stage stays ~linear in corpus
    size; pass an explicit ``k`` (the registry twins pin k=8) or
    ``centroids`` to fix the geometry.

    ``n_probe > 1`` repairs cell-boundary recall the IVF way: each
    vector is STORED under its primary (nearest) cell but COMPARED
    against lower-id primary members of its ``n_probe`` nearest cells
    (ranked by exact integer distance, ties -> lower cell). n_probe=1
    is exactly the classic per-cell rule; the pair stage cost scales
    ~n_probe-fold. Note the n_probe>1 drop rule is witness="all" and
    NOT order-chained (a vector is dropped iff ANY lower-id near
    neighbor is reachable through its probes) — identical to n_probe=1
    semantics, which also never conditions on the witness's own flag.

    Memory contract: ``applyInPandas`` materializes each CELL in one
    task, so ``max_cell`` bounds comparisons, not group memory — the
    cell GEOMETRY bounds memory. auto-k keeps expected cells at
    ~TARGET_CELL; a skew-degenerate corpus (everything in one cell
    because everything IS one near-dup ball) still concentrates in one
    task, the same contract as every capped-bucket family here
    (``dedup._capped_buckets``) — the Observation reports it rather
    than hiding it.

    Scale: pair work is Sigma(cell * min(cell, max_cell)) via
    ``applyInPandas`` per cell; past the cap the WITNESS POOL is
    truncated to the ``max_cell`` lowest ids while every row is still
    tested against it — identical to the multiprobe path's rule, so
    n_probe=1 and n_probe>1 agree on any input. Truncation is reported
    through ``observation`` like every other capped family.
    """
    num, den = tau
    if not (0 < num <= den):
        raise ValueError(f"tau must be a rational in (0, 1], got {tau}")
    if centroids is not None:
        # frozen-centroid mode (the streaming index face and its
        # stream-equals-batch reference path): skip the fit entirely
        cents = centroids
    else:
        if k is None:
            # auto-size k so expected cells stay ~TARGET_CELL: the pair
            # stage is Sigma(cell^2), so a pinned cell size makes it
            # ~linear in N. One approx_count_distinct sketch pass, the
            # same auto-sizing contract as the IVF/banding families.
            n = df.agg(F.approx_count_distinct(id_col)).collect()[0][0]
            k = min(
                max(8, -(-int(n) // SEMDEDUP_TARGET_CELL)), SEMDEDUP_MAX_AUTO_K
            )
        cents = lloyd_fit(df, id_col, vec_col, k, iters)

    num2 = num * num
    den2 = den * den
    if n_probe > 1:
        return _semdedup_multiprobe(
            df, cents, id_col, vec_col, num2, den2, max_cell, n_probe, observation
        )
    # keep_vec: the final assignment carries the vector, so the only
    # corpus shuffle is the groupBy(cluster) feeding the per-cell stage
    vecs = assign_clusters(df, cents, id_col, vec_col, keep_vec=True)

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        xq = _quantize_np(_vec_matrix(pdf[vec_col]))
        kept = _greedy_drop_sorted(xq, max_cell, num2, den2)
        out = pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "cluster": pdf["cluster"].to_numpy(),
                "kept": kept,
                "cell_truncated": np.full(len(pdf), len(pdf) > max_cell),
            }
        )
        return out

    out = vecs.groupBy("cluster").applyInPandas(
        per_cell,
        schema=f"{id_col} long, cluster int, kept boolean, cell_truncated boolean",
    )
    if observation is not None:
        out = out.observe(
            observation,
            F.count_if(F.col("cell_truncated")).alias("semdedup_truncated_rows"),
        )
    return out


def _semdedup_multiprobe(
    df: DataFrame,
    cents: list[list[int]],
    id_col: str,
    vec_col: str,
    num2: int,
    den2: int,
    max_cell: int,
    n_probe: int,
    observation: Observation | None,
) -> DataFrame:
    """n_probe>1 pair stage: every vector joins the groups of its
    ``n_probe`` nearest cells; inside each group it is tested against
    the LOWER-id vectors whose PRIMARY cell is that group. One explode
    (xn_probe rows) + one groupBy shuffle + a final min-reduce per id —
    pair work scales ~n_probe-fold, memory stays blockwise."""
    cent = np.asarray(cents, dtype=np.int64)
    p = min(n_probe, len(cent))

    c2 = np.einsum("kd,kd->k", cent, cent)  # hoisted: constant per task

    def assign_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            xq = _quantize_np(_vec_matrix(b[vec_col]))
            if xq.shape[1] != cent.shape[1]:
                raise ValueError(
                    f"vector dim {xq.shape[1]} != centroid dim {cent.shape[1]} "
                    "(did the embedding column change after the fit/build?)"
                )
            nx2 = np.einsum("nd,nd->n", xq, xq)
            dists = nx2[:, None] + c2[None, :] - 2 * (xq @ cent.T)
            # stable argsort: ties -> lower cell id, same as the
            # (dist, cell) ranking the SQL twin states
            order = np.argsort(dists, axis=1, kind="stable")[:, :p]
            yield pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy(),
                    "cluster": order[:, 0].astype(np.int32),
                    "probes": [row.astype(np.int32) for row in order],
                    vec_col: b[vec_col],
                }
            )

    assigned = df.select(id_col, vec_col).mapInPandas(
        assign_kernel,
        schema=(
            f"{id_col} long, cluster int, probes array<int>, "
            f"{vec_col} {df.schema[vec_col].dataType.simpleString()}"
        ),
    )
    exploded = assigned.select(
        id_col,
        "cluster",
        vec_col,
        F.explode("probes").alias("pcell"),
    ).withColumn("is_home", F.col("pcell") == F.col("cluster"))

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        home = pdf[pdf["is_home"]]
        truncated = len(home) > max_cell
        wit = home.iloc[:max_cell]
        wid = wit[id_col].to_numpy()
        w = _quantize_np(_vec_matrix(wit[vec_col])) if len(wit) else None
        wn2 = np.einsum("nd,nd->n", w, w) if w is not None else None
        ids = pdf[id_col].to_numpy()
        kept = np.ones(len(pdf), dtype=bool)
        if w is not None and len(pdf):
            xq = _quantize_np(_vec_matrix(pdf[vec_col]))
            nx2 = np.einsum("nd,nd->n", xq, xq)
            _BLOCK = 1024
            for lo in range(0, len(pdf), _BLOCK):
                hi = min(lo + _BLOCK, len(pdf))
                gram = xq[lo:hi] @ w.T
                fl = float(den2) * gram.astype(np.float64) ** 2
                # float64 BEFORE the product (int64 outer wraps at 2^63)
                fr = float(num2) * np.outer(
                    nx2[lo:hi].astype(np.float64), wn2.astype(np.float64)
                )
                for j in range(lo, hi):
                    b = j - lo
                    lim = np.searchsorted(wid, ids[j])  # witnesses: id < mine
                    if lim == 0:
                        continue
                    cand = np.nonzero(
                        (gram[b, :lim] > 0)
                        & (fl[b, :lim] >= fr[b, :lim] * (1 - 1e-9))
                    )[0]
                    for i in cand:
                        d = int(gram[b, i])
                        if d > 0 and _exact_ge(
                            den2 * d, d, num2 * int(wn2[i]) * int(nx2[j])
                        ):
                            kept[j] = False
                            break
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": pdf["cluster"].to_numpy(),
                "kept": kept,
                "cell_truncated": np.full(len(pdf), truncated),
            }
        )

    per = exploded.groupBy("pcell").applyInPandas(
        per_group,
        schema=f"{id_col} long, cluster int, kept boolean, cell_truncated boolean",
    )
    out = per.groupBy(id_col).agg(
        F.max("cluster").alias("cluster"),  # constant within an id
        F.min("kept").alias("kept"),  # dropped if ANY probed group hit
        F.max("cell_truncated").alias("cell_truncated"),
    )
    if observation is not None:
        out = out.observe(
            observation,
            F.count_if(F.col("cell_truncated")).alias("semdedup_truncated_rows"),
        )
    return out


def cluster_prototypes(
    assigned: DataFrame,
    id_col: str = "vec_id",
    top: int = 3,
) -> DataFrame:
    """D4-style prototypes: the ``top`` closest members per cluster as
    (cluster, rn, id, dist), rn starting at 1.

    NOT a per-cluster sort window (k heavy groups = k single tasks at
    corpus scale — the exact shape the round-9 percentile rework
    removed). Instead ``top`` rounds of a map-side-combining
    ``groupBy(cluster).min(struct(dist, id))``, each excluding prior
    winners through a broadcast anti-join of <= k*top ids: Theta(top)
    narrow scans, no task ever sorts a whole cluster.
    """
    remaining = assigned.select("cluster", id_col, "dist").localCheckpoint(eager=False)
    rounds: list[DataFrame] = []
    for rn in range(1, top + 1):
        w = (
            remaining.groupBy("cluster")
            .agg(F.min(F.struct(F.col("dist"), F.col(id_col))).alias("w"))
            .select(
                "cluster",
                F.lit(rn).cast("int").alias("rn"),
                F.col(f"w.{id_col}").alias(id_col),
                F.col("w.dist").alias("dist"),
            )
        )
        rounds.append(w)
        if rn < top:
            remaining = remaining.join(
                F.broadcast(w.select("cluster", id_col)), ["cluster", id_col], "left_anti"
            )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out


# ===================================================================
# Two-level (hierarchical) k-means: unbounded cell counts
# ===================================================================
#
# The flat fit holds all k centroids on the driver and scores every row
# against all of them — fine to SEMDEDUP_MAX_AUTO_K (~4096) cells, the
# r10 verdict's "one honest boundary". Past that (corpora beyond
# ~k_max * TARGET_CELL ~ 8M vectors) the two-level form keeps scaling:
# k1 <= 4096 COARSE cells fit with the flat machinery (driver-held,
# broadcast, zero corpus shuffle), then k2 FINE centroids per coarse
# cell are fit and held DISTRIBUTED as a (coarse, fine, cq) frame that
# never concentrates on the driver. Effective cell count k1*k2 (to
# ~1M cells) with
#   - driver memory      Theta(k1*dim)        (unchanged),
#   - per-row assignment Theta((k1+k2)*dim)   (vs Theta(k1*k2*dim) flat),
#   - fine fit/assign    one corpus shuffle per pass keyed on the
#     coarse cell (the price of distributed centroids; the SAME key
#     later feeds SemDeDup's per-cell pair stage, so the partitioning
#     is reused, and a ``fanout`` salt bounds per-task memory at
#     O(cell/fanout) — partial sums merge downstream, and assignment
#     is per-row independent, so salting is exact).
#
# Exactness contract is unchanged: integer grid, floor-division means,
# first-minimal (lowest-index) argmin ties — the DuckDB twin replays
# the whole two-level fit in SQL (registry/clustering_q._hier_ctes).


def _fine_kernel_factory(id_col: str, emit: str):
    """Shared cogroup kernel: per (coarse [, salt]) group, score the
    rows against THAT cell's fine centroids. ``emit='partials'`` yields
    per-(fine, pos) sum/count partials (Lloyd update); ``emit='assign'``
    yields per-row (id, coarse, fine, dist, xq)."""

    def kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame()
        if len(right) == 0:
            raise ValueError(
                "coarse cell holds rows but no fine centroids — the fine "
                "fit frame must cover every coarse cell the data lands in "
                "(fit and assign frames diverged?)"
            )
        right = right.sort_values("fine")
        cent = np.array(right["cq"].tolist(), dtype=np.int64)
        fines = right["fine"].to_numpy()
        xq = np.array(left["xq"].tolist(), dtype=np.int64)
        if xq.shape[1] != cent.shape[1]:
            raise ValueError(
                f"vector dim {xq.shape[1]} != fine centroid dim {cent.shape[1]}"
            )
        idx, d = _assign_batch(xq, cent)
        coarse_val = int(left["coarse"].iloc[0])
        if emit == "assign":
            return pd.DataFrame(
                {
                    id_col: left[id_col].to_numpy(),
                    "coarse": np.full(len(left), coarse_val, dtype=np.int32),
                    "fine": fines[idx].astype(np.int32),
                    "dist": d,
                    "xq": left["xq"],
                }
            )
        k, dim = cent.shape
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        np.add.at(sums, idx, xq)
        counts += np.bincount(idx, minlength=k)
        live = np.nonzero(counts)[0]
        if len(live) == 0:
            return pd.DataFrame()
        return pd.DataFrame(
            {
                "coarse": np.full(len(live) * dim, coarse_val, dtype=np.int32),
                "fine": np.repeat(fines[live].astype(np.int32), dim),
                "pos": np.tile(np.arange(dim, dtype=np.int32), len(live)),
                "s": sums[live].reshape(-1),
                "n": np.repeat(counts[live], dim),
            }
        )

    return kernel


def _salted_cogroup(base: DataFrame, cents: DataFrame, id_col: str, fanout: int):
    """(grouped rows, grouped centroids) keyed on (coarse, salt): rows
    split ``fanout`` ways by id, the (small per-cell) centroid set
    replicated per salt — bounds cogroup task memory at O(cell/fanout)
    without changing any result (partials merge; assignment is
    row-independent)."""
    fanout = max(1, int(fanout))
    rows = base.withColumn("_salt", F.pmod(F.col(id_col), F.lit(fanout)).cast("int"))
    # re-alias the centroid columns: the frame descends from ``base``
    # (fine seeds), so its attributes carry base's expression ids and
    # the cogroup would be an ambiguous self-join; Alias mints fresh
    # ids. Replication is an explode of a literal salt array — a
    # crossJoin against range(fanout) would compile to
    # BroadcastNestedLoopJoin (flagged by the registry-wide cartesian
    # sweep); explode is a map-only generate.
    reps = cents.select(
        *[F.col(c).alias(c) for c in ("coarse", "fine", "cq")],
        F.explode(
            F.array(*[F.lit(i).cast("int") for i in range(fanout)])
        ).alias("_salt"),
    )
    return rows.groupby("coarse", "_salt"), reps.groupby("coarse", "_salt")


def hierarchical_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: int = 8,
    k2: int = 8,
    iters: int = 2,
    fanout: int = 8,
) -> tuple[list[list[int]], DataFrame]:
    """Two-level integer Lloyd fit: (coarse centroids, fine frame).

    Coarse = the flat ``lloyd_fit`` (k1 <= SEMDEDUP_MAX_AUTO_K). Fine
    seeds are the k2 lowest ids of each coarse cell (WindowGroupLimit —
    a per-group top-k, no whole-cell sort), then ``iters`` Lloyd steps
    run for ALL cells simultaneously: one salted cogroup pass emits
    per-(coarse, fine, pos) partial sums, a groupBy reduces them, and
    the floor-division mean is computed IN the frame
    (``(s - pmod(s, n)) div n`` — exact, numerator a multiple of n) —
    the centroid update never touches the driver. Empty fine clusters
    keep their previous centroid (left-join + coalesce), mirroring the
    flat fit and the SQL twin.

    Returns the driver-held coarse list and a localCheckpoint'ed
    (coarse int, fine int, cq array<long>) frame of <= k1*k2 rows.
    """
    from pyspark.sql import Window

    coarse = lloyd_fit(df, id_col, vec_col, k1, iters)
    base = (
        assign_clusters(df, coarse, id_col, vec_col, emit_xq=True)
        .select(id_col, F.col("cluster").alias("coarse"), "xq")
        .localCheckpoint(eager=True)  # reused by every fine pass
    )
    w = Window.partitionBy("coarse").orderBy(id_col)
    cents = (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k2)
        .select(
            "coarse",
            (F.col("_rn") - 1).cast("int").alias("fine"),
            F.col("xq").alias("cq"),
        )
        # the centroid frame re-cogroups against ``base`` (its own
        # ancestor) every pass: checkpoint the <= k1*k2-row frame to cut
        # the shared lineage (self-join ambiguity) and to stop each
        # pass re-running all prior passes
        .localCheckpoint(eager=True)
    )
    # TOTAL geometry: a coarse cell empty at fit time seeds fine=0 with
    # the coarse centroid itself, so frozen-geometry assignment can
    # never meet a cell without fine centroids (a drifted arrival lands
    # at fine 0 instead of failing the ingest). The placeholder never
    # refines (no members -> keep-prev), mirroring the SQL twin.
    spark = df.sparkSession
    coarse_df = spark.createDataFrame(
        [(i, list(map(int, c))) for i, c in enumerate(coarse)],
        "coarse int, cq array<long>",
    )
    empty_cells = coarse_df.join(
        cents.select("coarse").distinct(), "coarse", "left_anti"
    ).select("coarse", F.lit(0).cast("int").alias("fine"), "cq")
    cents = cents.unionByName(empty_cells).localCheckpoint(eager=True)
    kernel = _fine_kernel_factory(id_col, emit="partials")
    for _ in range(iters):
        rows_g, cents_g = _salted_cogroup(base, cents, id_col, fanout)
        partials = rows_g.cogroup(cents_g).applyInPandas(
            kernel, schema="coarse int, fine int, pos int, s long, n long"
        )
        means = (
            partials.groupBy("coarse", "fine", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .select(
                "coarse",
                "fine",
                "pos",
                F.expr("(s - pmod(s, n)) div n").cast("long").alias("v"),
            )
        )
        newc = means.groupBy("coarse", "fine").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda x: x["v"],
            ).alias("cq")
        )
        cents = (
            cents.alias("p")
            .join(newc.alias("nw"), ["coarse", "fine"], "left")
            .select(
                "coarse",
                "fine",
                F.coalesce(F.col("nw.cq"), F.col("p.cq")).alias("cq"),
            )
            .localCheckpoint(eager=True)
        )
    return coarse, cents


def assign_hierarchical(
    df: DataFrame,
    coarse: list[list[int]],
    fine: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k2: int | None = None,
    fanout: int = 8,
) -> DataFrame:
    """Two-level assignment: (id, coarse, fine, cell, dist, xq) with
    ``cell = coarse * stride + fine``. The packing stride defaults to
    the FROZEN FRAME's max fine id + 1 (one tiny agg over the
    <= k1*k2-row frame) — the single rule every caller (batch operator,
    registry queries, ingest index, SQL twins) shares, so the same
    geometry always yields the same packed cell labels; pass ``k2``
    only to pin an explicit stride. Coarse scoring is the flat map-only
    broadcast kernel; fine scoring is one salted cogroup against the
    distributed centroid frame — the corpus shuffles ONCE on the coarse
    key, and downstream per-cell stages (SemDeDup pair work, profiles)
    group by the same key."""
    if k2 is None:
        k2 = (fine.agg(F.max("fine")).first()[0] or 0) + 1
    base = assign_clusters(df, coarse, id_col, vec_col, emit_xq=True).select(
        id_col, F.col("cluster").alias("coarse"), "xq"
    )
    rows_g, cents_g = _salted_cogroup(base, fine, id_col, fanout)
    out = rows_g.cogroup(cents_g).applyInPandas(
        _fine_kernel_factory(id_col, emit="assign"),
        schema=f"{id_col} long, coarse int, fine int, dist long, xq array<long>",
    )
    return out.select(
        id_col,
        "coarse",
        "fine",
        (F.col("coarse") * F.lit(int(k2)) + F.col("fine")).cast("int").alias("cell"),
        "dist",
        "xq",
    )


def hierarchical_cluster_profile(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: int = 8,
    k2: int = 8,
    iters: int = 2,
    fanout: int = 8,
    fitted: tuple[list[list[int]], DataFrame] | None = None,
) -> DataFrame:
    """Per-cell (cell, n_vecs, inertia) under the two-level fit — the
    flat ``kmeans_cluster_profile`` surface at k1*k2 effective cells,
    same BIGINT inertia emission and raise-not-wrap int64 guard.
    ``fitted`` passes a pre-built geometry (shared-fit callers)."""
    if fitted is not None:
        coarse, fine = fitted
    else:
        coarse, fine = hierarchical_fit(df, id_col, vec_col, k1, k2, iters, fanout)
    assigned = assign_hierarchical(df, coarse, fine, id_col, vec_col, None, fanout)
    return (
        assigned.groupBy("cell")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.col("dist").cast("decimal(38,0)")).alias("_inertia_dec"),
        )
        .select(
            "cell",
            "n_vecs",
            F.when(
                F.col("_inertia_dec") <= F.lit(9223372036854775807),
                F.col("_inertia_dec").cast("long"),
            )
            .otherwise(
                F.raise_error(F.lit("hier kmeans inertia exceeds int64: split hi/lo"))
            )
            .alias("inertia"),
        )
        .orderBy("cell")
    )


def semdedup_flags_hier(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: int = 8,
    k2: int = 8,
    iters: int = 2,
    tau: tuple[int, int] = (19, 20),
    max_cell: int = MAX_SEMDEDUP_CELL,
    fanout: int = 8,
    observation: Observation | None = None,
    fitted: tuple[list[list[int]], DataFrame] | None = None,
) -> DataFrame:
    """SemDeDup over the TWO-LEVEL cell geometry — semantic dedup for
    corpora past the flat fit's 4096-cell auto-k ceiling (above ~8M
    vectors at the 2048-vector cell target). Identical drop rule to
    :func:`semdedup_flags` (the shared ``_greedy_drop_sorted`` kernel:
    exact rational cosine, capped witness pool, every row tested),
    blocked by (coarse, fine) cell instead of the flat cell. Emits
    (id, coarse, fine, cell, kept, cell_truncated).

    The corpus shuffles ONCE on the coarse key for fine assignment and
    the pair stage groups by the derived cell — the same partitioning,
    so AQE/EnsureRequirements reuses the exchange. ``fitted`` passes a
    pre-built (coarse, fine_frame) geometry (frozen-fit callers)."""
    num, den = tau
    if not (0 < num <= den):
        raise ValueError(f"tau must be a rational in (0, 1], got {tau}")
    num2, den2 = num * num, den * den
    if fitted is not None:
        coarse, fine = fitted
    else:
        coarse, fine = hierarchical_fit(df, id_col, vec_col, k1, k2, iters, fanout)
    # packing stride is derived from the frozen frame inside
    # assign_hierarchical (k2=None) — the shared single rule
    assigned = assign_hierarchical(df, coarse, fine, id_col, vec_col, None, fanout)

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        xq = np.array(pdf["xq"].tolist(), dtype=np.int64)
        kept = _greedy_drop_sorted(xq, max_cell, num2, den2)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "coarse": pdf["coarse"].to_numpy(),
                "fine": pdf["fine"].to_numpy(),
                "cell": pdf["cell"].to_numpy(),
                "kept": kept,
                "cell_truncated": np.full(len(pdf), len(pdf) > max_cell),
            }
        )

    out = assigned.groupBy("cell").applyInPandas(
        per_cell,
        schema=(
            f"{id_col} long, coarse int, fine int, cell int, "
            "kept boolean, cell_truncated boolean"
        ),
    )
    if observation is not None:
        out = out.observe(
            observation,
            F.count_if(F.col("cell_truncated")).alias("semdedup_truncated_rows"),
        )
    return out


# ===================================================================
# PCA: top principal direction by exact-integer gram + power iteration
# (round 12 — the decorrelation/whitening prep step before IVF/PQ/
# SemDeDup on real embedding corpora; no counterpart in the reference
# engine, same capability-superset mandate as the rest of this module)
# ===================================================================

#: Power-iterate renormalization scale: after each multiply the vector
#: is requantized to <= 10^6 (half-up, exact rational) so every
#: iterate stays an exact integer vector in both engines.
PCA_ITERATE_SCALE = 6

#: Driver-side gram bound: the operator collects the dim x dim exact
#: gram (Theta(dim^2) ints). 4096 dims = 16M entries ~ 128 MB — the
#: same axis-sized-collect budget as the flat k-means fit; past it,
#: reduce dimensionality first (hash projection) or block the gram.
PCA_MAX_DIM = 4096


def _rational_micro_py(num: int, den: int, digits: int) -> int:
    """Python twin of ``rounding.rational_micro`` over exact ints —
    half-up ``digits``-dp quantization of num/den by TRUNCATING
    integral division (Spark ``div`` / DuckDB ``//`` semantics; python
    ``//`` floors, hence the sign fold)."""
    a = 2 * 10**digits * num + den
    b = 2 * den
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> list[list[int]]:
    """The exact integer gram ``G = sum_n xq xq^T`` over the quantized
    vectors, collected driver-side as dim x dim python ints.

    One fully-parallel pass: each Arrow batch emits its partial gram as
    dim*(dim+1)/2 upper-triangle rows (int64-exact — per-batch row
    count is capped so |sum| <= rows * QUANT_SCALE^2 stays far from
    2^63), a single mergeable groupBy(i,j) SUM combines partials
    map-side, and only Theta(dim^2) rows reach the driver. No
    row-count-sized collect, no shuffle of the corpus itself — the
    shuffle volume is partitions * dim^2 partial rows.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if dim > PCA_MAX_DIM:
        raise ValueError(
            f"gram_matrix: dim {dim} > PCA_MAX_DIM {PCA_MAX_DIM} — "
            "block the gram or reduce dimensionality first"
        )
    iu = np.triu_indices(dim)

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            xq = _quantize_np(_vec_matrix(pdf[vec_col]))
            # int64 overflow headroom: |partial| <= rows * max|xq|^2;
            # chunk so each partial matmul stays exact
            max_abs = int(np.abs(xq).max()) or 1
            step = max(1, int((2**62) // (max_abs * max_abs)))
            acc = np.zeros((dim, dim), dtype=object)
            for lo in range(0, len(xq), step):
                blk = xq[lo : lo + step]
                acc += blk.T.astype(np.int64) @ blk
            yield pd.DataFrame(
                {
                    "i": iu[0].astype(np.int32),
                    "j": iu[1].astype(np.int32),
                    "g": [int(acc[a, b]) for a, b in zip(*iu)],
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partial, schema="i int, j int, g decimal(38,0)")
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
        .collect()
    )
    G = [[0] * dim for _ in range(dim)]
    for r in rows:
        g = int(r["g"])
        G[r["i"]][r["j"]] = g
        G[r["j"]][r["i"]] = g
    return G


def pca_power_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    iters: int = 6,
    dim: int | None = None,
) -> dict:
    """Top principal direction of the quantized embedding corpus by
    ``iters`` fixed power-iteration steps over the exact gram — every
    compared quantity an exact integer or an exact rational, so the
    SQL twin replays it bit-for-bit (no IEEE arithmetic anywhere).

    The iterate starts at the all-ones vector (scaled 10^6) and after
    each exact multiply ``g v`` renormalizes by the max-abs component
    with the half-up rational quantization (``_rational_micro_py``, the
    engine-portable div). The result is therefore THE ``iters``-step
    power iterate — a deterministic spec in itself — which converges
    to the dominant eigendirection at rate (lambda2/lambda1)^t.

    Returns dict with:
      ``loadings``  — the direction, ints scaled 10^6 (max-abs = 1e6);
      ``rayleigh_num``/``rayleigh_den`` — exact v^T G v / v^T v rational
        (the eigenvalue estimate in quant^2 units);
      ``ev_share_num``/``ev_share_den`` — exact (v^T G v) / (v^T v
        * trace G): the explained-variance share of the direction.

    Scale: one gram pass (Theta(dim^2) mergeable aggregate), then
    Theta(iters * dim^2) driver arithmetic — no further cluster work.
    100 TB posture: the corpus is scanned once; nothing row-sized moves.
    """
    G = gram_matrix(df, vec_col, dim)
    d = len(G)
    s = 10**PCA_ITERATE_SCALE
    v = [s] * d
    for _ in range(iters):
        gv = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in gv)
        if m == 0:
            break  # zero matrix: keep the current iterate
        v = [_rational_micro_py(x, m, PCA_ITERATE_SCALE) for x in gv]
    vgv = sum(v[i] * G[i][j] * v[j] for i in range(d) for j in range(d))
    vv = sum(x * x for x in v)
    tr = sum(G[i][i] for i in range(d))
    return {
        "loadings": v,
        "rayleigh_num": vgv,
        "rayleigh_den": vv,
        "ev_share_num": vgv,
        "ev_share_den": vv * tr,
    }


def pca_project(
    df: DataFrame,
    loadings: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact integer projection of every vector onto a fitted
    direction: ``proj = sum_i xq[i] * loadings[i]`` (BIGINT — bounded
    by dim * QUANT_SCALE * 10^6 ~ 7e13 at dim 64, raise-guarded).
    Map-only: the loadings ride the plan as an array literal; no
    shuffle, no driver round-trip per row."""
    arr = F.array(*[F.lit(int(x)).cast("long") for x in loadings])
    prod = F.zip_with(
        quantized_vec(F.col(vec_col)), arr, lambda a, b: a * b
    )
    proj = F.aggregate(
        prod, F.lit(0).cast("decimal(38,0)"), lambda acc, x: acc + x
    )
    return df.select(
        F.col(id_col),
        F.when(
            (proj <= F.lit(9223372036854775807))
            & (proj >= F.lit(-9223372036854775807)),
            proj.cast("long"),
        )
        .otherwise(F.raise_error(F.lit("pca projection exceeds int64")))
        .alias("proj"),
    )

"""Embedding similarity search: brute-force cosine top-k + LSH ANN.

Scale path (100 TB / billions of vectors):
- the **query side is broadcast** (queries are few), so the corpus never
  shuffles for brute force — each partition scores its own vectors and a
  rank-window takes top-k per query;
- the **LSH variant** (random-hyperplane signatures) buckets corpus and
  queries by signature and only scores within matching buckets — this is
  the 100 TB default, with brute force as the exactness oracle;
- dot products are JVM-side ``zip_with``/``aggregate`` folds in double —
  no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double (sequential left-to-right fold, deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column | None = None, norm_b: Column | None = None) -> Column:
    na = norm_a if norm_a is not None else l2_norm(a)
    nb = norm_b if norm_b is not None else l2_norm(b)
    return dot(a, b) / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Output: (query_id, neighbor_id, cosine_sim) ranked by
    (round(sim,6) desc, neighbor_id) — the rounding makes the ranking
    reproducible across engines/float orderings. Self-matches excluded.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(
                cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")), 6
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rn")
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(nbits, dim))


def lsh_signature(vec: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane signature as a long: bit i = sign(vec·planeᵢ)."""
    bits = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        bits.append(
            F.when(dot(vec, lit_plane) >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    nbits: int = 12,
    bands: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH blocking, exact rerank.

    The nbits signature is split into ``bands`` sub-signatures; a corpus
    vector is a candidate if it matches the query on ≥1 band (standard
    OR-amplification: higher recall than one exact signature match). Only
    candidates get an exact cosine — at 1B vectors with 3×4-bit bands this
    scores ~3/16 of the corpus per query instead of all of it; more bits
    per band cut it further.
    """
    planes = _hyperplanes(dim, nbits, seed)
    bits_per_band = nbits // bands

    def with_bands(df: DataFrame, prefix: str) -> DataFrame:
        out = df.withColumn("_sig", lsh_signature(F.col(vec_col), planes))
        structs = F.array(
            *[
                F.struct(
                    F.lit(j).alias("band"),
                    F.shiftrightunsigned(F.col("_sig"), j * bits_per_band)
                    .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                    .alias("bkey"),
                )
                for j in range(bands)
            ]
        )
        return out.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_vec"),
            l2_norm(F.col(vec_col)).alias(f"{prefix}_norm"),
            F.explode(structs).alias("bb"),
        ).select(f"{prefix}_id", f"{prefix}_vec", f"{prefix}_norm", "bb.band", "bb.bkey")

    cb = with_bands(corpus, "c")
    qb = with_bands(queries, "q")
    cand = (
        cb.join(F.broadcast(qb), ["band", "bkey"])
        .filter(F.col("q_id") != F.col("c_id"))
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cand.withColumn(
        "cosine_sim",
        F.round(cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")), 6),
    ).select(F.col("q_id").alias("query_id"), F.col("c_id").alias("neighbor_id"), "cosine_sim")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rn")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nbits: int = 12,
    bands: int = 3,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ threshold) via the same
    LSH blocking as :func:`lsh_ann_topk` (corpus self-join on bands)."""
    planes = _hyperplanes(dim, nbits, seed)
    bits_per_band = nbits // bands
    sig = df.withColumn("_sig", lsh_signature(F.col(vec_col), planes))
    structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftrightunsigned(F.col("_sig"), j * bits_per_band)
                .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                .alias("bkey"),
            )
            for j in range(bands)
        ]
    )
    ex = sig.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("_norm"),
        F.explode(structs).alias("bb"),
    ).select(id_col, vec_col, "_norm", "bb.band", "bb.bkey")
    a = ex.select(
        "band", "bkey", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("_norm").alias("na")
    )
    b = ex.select(
        "band", "bkey", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("_norm").alias("nb")
    )
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "cosine_sim",
            F.round(cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")), 6),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )

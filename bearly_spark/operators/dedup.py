"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
- **Exact dedup** is a hash-shuffle on a 128-bit content hash — uniform by
  construction, so no skew; the shuffle payload is (hash, id), never the
  document bytes.
- **MinHash LSH** turns the O(n²) near-dup problem into
  sig-compute (map-only, JVM built-ins) → band explode (×b rows of
  (band_hash, id)) → bucket self-join (shuffle on band hash) → exact
  Jaccard verify on the candidate pairs only. Bucket sizes are the skew
  risk: a degenerate band (e.g. empty docs) creates a quadratic bucket —
  ``max_bucket`` caps it, the standard production guard.
- **SimHash** uses one Arrow-batched pandas UDF for the 64-bit signature
  (bit-twiddling is awkward in SQL), then pure JVM banding + ``bit_count``
  Hamming verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from bearly_spark.operators.text import word_tokens


# ---------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, id_col: str, content_cols: list[str]) -> DataFrame:
    """Keep the min-id representative per exact content group.

    Returns (content_hash, keep_id, dup_count). The hash is md5 over the
    concatenated content columns; only (hash, id) shuffles.
    """
    h = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in content_cols]))
    return (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def drop_exact_dups(df: DataFrame, id_col: str, content_cols: list[str]) -> DataFrame:
    """Filter df down to one representative row per content group (the
    min-id row), via a semi-join against :func:`exact_dedup`."""
    keep = exact_dedup(df, id_col, content_cols).select(F.col("keep_id").alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


# ------------------------------------------------------------- shingles

def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (lowercased). Documents shorter than
    n tokens fall back to a single whole-text shingle."""
    toks = F.transform(word_tokens(text), F.lower)
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(
        F.when(k >= 1, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact set Jaccard of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Brute-force all-pairs token-set Jaccard (the exactness baseline the
    LSH path approximates). O(n²) — only for bounded inputs / verification;
    at scale use :func:`minhash_dedup_pairs`.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.
    """
    toks = df.select(
        F.col(id_col),
        F.array_distinct(F.transform(word_tokens(F.col(text_col)), F.lower)).alias("toks"),
    )
    a = toks.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"))
    b = toks.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("toks_a"), F.col("toks_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------- MinHash

def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, hs, sig[num_hashes]) — ``hs`` is the distinct 64-bit hashed
    shingle set; sig[i] = min over hs of xxhash64(h, i).

    Each shingle *string* is hashed exactly once; the ``num_hashes``
    permutations re-hash the resulting long (cheap fixed-width op), not the
    string. All JVM built-ins; map-only, no shuffle.
    """
    shing = word_shingles(F.col(text_col), shingle_n)
    hs = F.array_distinct(F.transform(shing, lambda s: F.xxhash64(s)))
    base = df.select(F.col(id_col), hs.alias("hs"))
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("hs"), lambda h, i=i: F.xxhash64(h, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    return base.withColumn("sig", sig)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    bands=16 × rows=4 over 64 hashes → candidate-capture probability
    1-(1-s⁴)¹⁶ ≈ 0.99+ at s=0.8. Buckets larger than ``max_bucket`` are
    dropped (degenerate content; prevents quadratic blowup at scale).

    Scale design: the signature table is persisted (at cluster scale:
    write it out) because three downstream branches consume it — the band
    explode, the bucket-size skew guard, and the verify join — and must
    not each recompute the shingling. Only (id, band, bucket) rows travel
    through the explode + self-join shuffle; the shingle sets are joined
    back for verification of the (small) candidate pair set, as hashed
    longs rather than strings. Jaccard over hashed shingles equals string
    Jaccard up to xxhash64 collisions (~n²/2⁶⁴, negligible).

    Returns (id_a, id_b, jaccard) with jaccard ≥ threshold, id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig_df = minhash_signature(df, id_col, text_col, num_hashes, shingle_n).persist()

    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(F.slice(F.col("sig"), j * rows_per_band + 1, rows_per_band)).alias(
                    "bucket"
                ),
            )
            for j in range(bands)
        ]
    )
    buckets = sig_df.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        id_col, "bb.band", "bb.bucket"
    )

    # Guard against degenerate buckets before the self-join.
    sizes = buckets.groupBy("band", "bucket").count().filter(F.col("count") <= max_bucket)
    buckets = buckets.join(sizes.select("band", "bucket"), ["band", "bucket"], "left_semi")

    a = buckets.select("band", "bucket", F.col(id_col).alias("id_a"))
    b = buckets.select("band", "bucket", F.col(id_col).alias("id_b"))
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = sig_df.select(F.col(id_col), F.col("hs"))
    return (
        cand.join(sets.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(sets.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
        .select(
            "id_a", "id_b", F.round(jaccard(F.col("hs_a"), F.col("hs_b")), 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------- SimHash

def _make_simhash_pack_udf():
    """Pack per-token 64-bit hashes into one 64-bit SimHash signature.

    Token hashing happens JVM-side (xxhash64, deterministic across
    workers); this Arrow-batched UDF only does the vectorized bit-count:
    a tokens×64 bit matrix per doc, column sums, sign → signature bits.

    Built lazily because pandas_udf registration needs an active session.
    """

    @F.pandas_udf("long")
    def _pack64(hashes: pd.Series) -> pd.Series:
        out = np.empty(len(hashes), dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        weights = (np.uint64(1) << shifts).astype(np.uint64)
        for i, hs in enumerate(hashes):
            if hs is None or len(hs) == 0:
                out[i] = 0
                continue
            h = np.asarray(hs, dtype=np.int64).view(np.uint64)
            bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            acc = 2 * bits.sum(axis=0) - len(h)
            out[i] = (weights[acc > 0].sum(dtype=np.uint64)).astype(np.int64)
        return pd.Series(out)

    return _pack64


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — signature compute is map-only (JVM token hashing +
    one Arrow-batched numpy packing pass)."""
    toks = F.transform(word_tokens(F.col(text_col)), F.lower)
    tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return df.select(F.col(id_col), _make_simhash_pack_udf()(tok_hashes).alias("simhash"))


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash_a, simhash_b) ≤ max_hamming.

    Pigeonhole banding: split 64 bits into 4 16-bit chunks; any pair within
    Hamming ≤ 3 must agree exactly on ≥1 chunk, so an equi-join per chunk
    finds all candidates (no O(n²)), then ``bit_count(a^b)`` verifies.

    The signature table is persisted: both sides of the self-join (and the
    dedup pass) would otherwise re-run the packing UDF over the full corpus.
    """
    sh = simhash(df, id_col, text_col).persist()
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), 16 * c)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for c in range(4)
        ]
    )
    exploded = sh.select(F.col(id_col), F.col("simhash"), F.explode(chunks).alias("cc")).select(
        id_col, "simhash", "cc.chunk", "cc.key"
    )
    a = exploded.select("chunk", "key", F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = exploded.select("chunk", "key", F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, ["chunk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

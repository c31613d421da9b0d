"""Probabilistic-sketch operators with EXACT oracle twins.

Count-min sketch and Bloom filter are normally "rows-only" territory
(opaque sketch bytes), but both are pure functions of (input, hash
family) — so building the hash family from the md5 both engines share
(the minhash/simhash trick, ``dedup._hash64``) makes the ENTIRE sketch,
and every estimate read from it, bit-reproducible in DuckDB SQL. That
turns the classic bounded-memory streaming summaries into first-class
oracle-checked operators instead of trust-me blobs.

Scale posture: a sketch's whole point is Θ(d·w) / Θ(m) state no matter
how many rows or distinct keys flow through it — the build is one
wordcount-shaped shuffle onto a counter/bit table that BROADCASTS to
every consumer afterwards.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _hash_mod(key: Column, salt: int, mod: int) -> Column:
    """52-bit md5-derived hash of ``salt:key`` reduced mod ``mod`` —
    the engine-shared uniform hash (13 hex chars = 52 bits, every value
    exactly representable; DuckDB recomputes it verbatim)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(salt)), key.cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")
    return h % F.lit(mod)


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build a count-min sketch over ``key_col`` occurrences: a
    (row, bucket, cnt) counter table with ``depth`` hash rows of
    ``width`` buckets. One explode (×depth) + one wordcount-shaped
    shuffle; the result is Θ(depth·width) rows regardless of input
    size or key cardinality — the bounded-memory frequency summary."""
    k = F.col(key_col)
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _hash_mod(k, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p")
    ).select("p.row", "p.bucket")
    return pairs.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate key frequencies from a :func:`cms_build` sketch:
    est(key) = min over hash rows of that row's counter — the classic
    one-sided (never under) estimate. ``keys`` is a frame with
    ``key_col``; the sketch (Θ(d·w) rows) broadcasts into the probe.
    Output (key, est)."""
    k = F.col(key_col)
    probes = keys.select(
        k.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _hash_mod(k, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select("key", "p.row", "p.bucket")
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left").select(
        "key", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy("key").agg(F.min("cnt").alias("est"))


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
) -> DataFrame:
    """Build a Bloom filter over the DISTINCT values of ``key_col`` as
    a (bit,) table of set bit positions (≤ ``m_bits`` rows). One
    explode (×k) + one distinct — Θ(m) state however many keys went
    in."""
    k = F.col(key_col)
    return (
        df.select(
            F.explode(
                F.array(*[_hash_mod(k, i, m_bits) for i in range(k_hashes)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
) -> DataFrame:
    """Membership-test ``df``'s keys against a :func:`bloom_build` bit
    table: ``bloom_hit`` = all k bit positions set (no false negatives;
    false-positive rate governed by m/n and k). The bit table (≤ m
    rows) broadcasts; the probe is one explode + broadcast join + a
    per-key count — the semi-join prefilter shape that at 100 TB skips
    the expensive join for the overwhelming majority of non-members."""
    k = F.col(key_col)
    probes = df.select(
        k.alias("key"),
        F.explode(
            F.array(*[_hash_mod(k, i, m_bits) for i in range(k_hashes)])
        ).alias("bit"),
    )
    hits = probes.join(
        F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left"
    )
    return hits.groupBy("key").agg(
        (F.count("_set") == k_hashes).alias("bloom_hit")
    )

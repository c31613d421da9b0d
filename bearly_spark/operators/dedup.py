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

import functools
import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation

from bearly_spark.operators.text import ensure_parallelism, word_tokens


def _observe_bucket_drops(
    buckets: DataFrame, size_col: Column, cap: int, observation: Observation | None
) -> DataFrame:
    """Attach loud bucket-cap saturation metrics to a banding stage.

    Every banded dedup path here drops buckets larger than its cap
    (degenerate-content guard). That is the right guard, but at scale a
    FIXED operating point can saturate it on legitimate content and
    silently lose true pairs — so callers can pass an ``Observation``
    and read ``dropped_buckets`` / ``dropped_ids`` / ``max_bucket_size``
    after the query runs. Zero-cost when unused; the metrics ride the
    existing aggregate, no extra pass."""
    if observation is None:
        return buckets
    over = size_col > cap
    return buckets.observe(
        observation,
        F.sum(F.when(over, 1).otherwise(0)).alias("dropped_buckets"),
        F.sum(F.when(over, size_col).otherwise(0)).alias("dropped_ids"),
        F.max(size_col).alias("max_bucket_size"),
    )


#: Round 13: the parallelism floor moved to ``text.ensure_parallelism``
#: (the tokenize passes there need it too and ``dedup`` already imports
#: from ``text``); this alias keeps the established local name.
_ensure_parallelism = ensure_parallelism


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

def _perm_params(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic multiply-add permutation params over Z_2^64.

    Odd multipliers make ``h -> a*h + b (mod 2^64)`` a bijection, the
    standard cheap stand-in for independent random permutations.
    """
    rng = np.random.RandomState(42)
    hi = rng.randint(0, 2**32, size=num_hashes).astype(np.uint64)
    lo = rng.randint(0, 2**32, size=num_hashes).astype(np.uint64)
    a = ((hi << np.uint64(32)) | lo) | np.uint64(1)
    hi = rng.randint(0, 2**32, size=num_hashes).astype(np.uint64)
    lo = rng.randint(0, 2**32, size=num_hashes).astype(np.uint64)
    b = (hi << np.uint64(32)) | lo
    return a, b


def _hash64(s: str) -> int:
    """64-bit string hash: first 8 bytes of md5, big-endian. md5 (not
    blake2b/xxhash64) because it is the one 128-bit hash BOTH engines
    compute identically — DuckDB recomputes this exact value as
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT``, which is what makes
    the minhash/simhash DuckDB oracle twins possible (round-4 verdict
    #4; same trick as ``text.hashed_tf_embedding``). The hash quality
    difference is irrelevant here: md5 is a stronger mixer than either
    alternative, just marginally slower per call (both are C hashlib)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _hashed_shingles(text: str | None, n: int) -> np.ndarray:
    """Distinct word n-gram shingles of ``text`` as 64-bit md5-derived
    hashes (uint64, :func:`_hash64`). Mirrors :func:`word_shingles`:
    lowercased whitespace tokens, whole-text fallback for docs shorter
    than n tokens."""
    toks = [t.lower() for t in (text or "").split()]
    if len(toks) >= n:
        grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    else:
        grams = {" ".join(toks)}
    return np.fromiter(
        (_hash64(g) for g in grams),
        dtype=np.uint64,
        count=len(grams),
    )


def _make_minhash_udf(num_hashes: int, shingle_n: int):
    """text -> struct<hs: array<long>, sig: array<long>> in one Arrow batch.

    The whole signature kernel lives in a single vectorized pandas UDF
    rather than JVM ``transform``/``array_min`` lambdas: Spark's
    higher-order array functions are CodegenFallback (interpreted,
    per-element expression eval), which made the 64-permutation signature
    ~100x slower than this numpy matrix min. Map-only — partitions stream
    through Arrow batches, no shuffle, scales with input splits.
    """
    a, b = _perm_params(num_hashes)

    @F.pandas_udf("hs array<bigint>, sig array<bigint>")
    def _minhash(texts: pd.Series) -> pd.DataFrame:
        hs_out: list[list[int]] = []
        sig_out: list[list[int]] = []
        for text in texts:
            h = _hashed_shingles(text, shingle_n)
            derived = h[:, None] * a[None, :] + b[None, :]  # (n_shingles, num_hashes)
            hs_out.append(h.view(np.int64).tolist())
            sig_out.append(derived.min(axis=0).view(np.int64).tolist())
        return pd.DataFrame({"hs": hs_out, "sig": sig_out})

    return _minhash


def minhash_band_structs(sig: Column, bands: int, rows_per_band: int) -> Column:
    """``array<struct<band:int, bucket:string>>`` LSH banding of a MinHash
    signature array: bucket = md5 over the band's signature slice
    (comma-joined signed-decimal strings). md5 rather than xxhash64 so
    DuckDB can recompute the IDENTICAL bucket assignment for the oracle
    twins (round-4); the key is an identity, not a quality-critical hash,
    and the md5 cost is per (doc, band) — negligible next to the
    signature UDF. Shared by the batch pair/cluster paths and the
    streaming dedup-at-ingest index so the band layouts can never
    diverge."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(sig, j * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ).alias("bucket"),
            )
            for j in range(bands)
        ]
    )


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    extra_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """(id, [extras...], hs, sig[num_hashes]) — ``hs`` is the distinct
    64-bit hashed shingle set; sig[i] = min over hs of permutation_i(h).
    Map-only. ``extra_cols`` lets a caller ride additional derived
    columns (e.g. a content hash) through the signature stage without a
    join-back shuffle — the streaming dedup index uses it to carry
    ``md5(text)`` alongside the signature."""
    extra_cols = extra_cols or {}
    udf = _make_minhash_udf(num_hashes, shingle_n)
    sel = (
        [F.col(id_col)]
        + [c.alias(n) for n, c in extra_cols.items()]
        + [udf(F.col(text_col)).alias("ms")]
    )
    return _ensure_parallelism(df).select(*sel).select(
        id_col, *extra_cols.keys(), "ms.hs", "ms.sig"
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 1000,
    observation: Observation | None = None,
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
    Jaccard up to md5-derived 64-bit collisions (~n²/2⁶⁴, negligible).

    **Null-text docs never pair** (round-4 ADVICE): there is no content
    to compare, so null-text groups are excluded from both the signature
    stage and the within-group expansion — matching the pre-collapse
    semantics where a null shingle array produced a null Jaccard that
    the threshold filter dropped. Empty-STRING docs still pair as
    identical single-shingle content (they always did).

    Returns (id_a, id_b, jaccard) with jaccard ≥ threshold, id_a < id_b.

    **Duplicate-mass invariance** (round 3, same design as
    ``winnow_overlap_pairs``): documents first collapse into groups by
    exact text (md5), and the ENTIRE expensive pipeline — shingling UDF,
    signature matrix, banding, Jaccard verify — runs once per distinct
    text. A corpus where every doc has C exact copies costs the same
    discovery work as its deduplicated form; only the final expansion
    back to doc pairs is quadratic in C, and that is the answer's own
    size. Within-group pairs (identical texts) have Jaccard exactly 1.0
    by definition and are emitted directly — they can no longer be lost
    to the degenerate-bucket cap, which now counts distinct contents.

    Cost of the collapse: one linear content-keyed shuffle of the corpus
    (partial aggregation merges same-partition duplicates before it
    ships, so the shuffle shrinks toward distinct-content size exactly
    when duplicate mass is high). Real crawl corpora are 30-60%
    duplicates, which is why dedup exists at all — paying one linear
    pass to make the quadratic-prone stages duplicate-invariant is the
    right trade at 100 TB, and at small scale it costs two extra small
    shuffles (measured ~0.5s at sf0.1).
    """
    groups, members, rep_pairs = _minhash_group_stages(
        df, id_col, text_col, num_hashes, bands, shingle_n, threshold, max_bucket, observation
    )
    # expand representative pairs to doc pairs; add within-group pairs
    # (identical texts, Jaccard exactly 1.0 by definition)
    cross = (
        rep_pairs.join(
            members.select(F.col("_gid").alias("id_a"), F.col(id_col).alias("_ia")), "id_a"
        )
        .join(members.select(F.col("_gid").alias("id_b"), F.col(id_col).alias("_ib")), "id_b")
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            "jaccard",
        )
    )
    same = (
        groups.filter((F.col("_gsize") >= 2) & F.col(text_col).isNotNull())
        .select("_gid")
        .join(members.select("_gid", F.col(id_col).alias("_ia")), "_gid")
        .join(members.select("_gid", F.col(id_col).alias("_ib")), "_gid")
        .filter(F.col("_ia") < F.col("_ib"))
        .select(
            F.col("_ia").alias("id_a"),
            F.col("_ib").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
        .filter(F.lit(1.0) >= F.lit(threshold))
    )
    return cross.unionByName(same)


def _minhash_group_stages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    threshold: float,
    max_bucket: int,
    observation: Observation | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The duplicate-mass-invariant MinHash discovery pipeline up to
    REPRESENTATIVE pairs: exact-text group collapse, signature + banding
    + Jaccard verify over one representative per distinct text.

    Returns (groups, members, rep_pairs):
    - groups: (_tkey, _gid, _gsize, text) one row per distinct text;
    - members: (id, _gid) doc → group assignment;
    - rep_pairs: (id_a=gid_a, id_b=gid_b, jaccard) verified pairs
      BETWEEN groups (within-group pairs are definitionally 1.0 and are
      materialized only by the pair-mode expansion).

    Shared by :func:`minhash_dedup_pairs` (quadratic within-group pair
    expansion — the answer's own size) and
    :func:`minhash_dup_clusters` (cluster labels; never materializes
    within-group pairs).
    """
    rows_per_band = num_hashes // bands
    fpk = df.select(F.col(id_col), F.col(text_col)).withColumn(
        "_tkey", F.md5(F.coalesce(F.col(text_col), F.lit("\x00null")))
    )
    groups = (
        fpk.groupBy("_tkey")
        .agg(
            F.min(id_col).alias("_gid"),
            F.count(F.lit(1)).alias("_gsize"),
            F.first(text_col).alias(text_col),
        )
        .persist()
    )
    groups.count()  # pin eagerly — members join + signature stage
    members = (
        fpk.select(F.col(id_col), "_tkey")
        .join(groups.select("_tkey", "_gid"), "_tkey")
        .select(F.col(id_col), "_gid")
    )
    # null-text groups carry no content to compare — exclude them from
    # the signature/banding stage entirely (their docs then never appear
    # in any pair), restoring the pre-collapse null-Jaccard-filtered
    # semantics (round-4 ADVICE)
    reps = groups.filter(F.col(text_col).isNotNull()).select(
        F.col("_gid").alias(id_col), F.col(text_col)
    )

    sig_df = minhash_signature(reps, id_col, text_col, num_hashes, shingle_n).persist()
    # Pin the cache eagerly: the band explode, the skew guard, and the two
    # verify joins materialize concurrently under AQE, and each racer would
    # recompute the (expensive) signature stage against a cold cache.
    sig_df.count()

    band_structs = minhash_band_structs(F.col("sig"), bands, rows_per_band)
    buckets = sig_df.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        id_col, "bb.band", "bb.bucket"
    )

    # One shuffle: gather each bucket's member ids, drop degenerate buckets
    # (> max_bucket: near-identical boilerplate that would go quadratic),
    # and emit in-bucket pairs inline. This replaces the classic
    # count-guard + semi-join + self-join chain (4 passes over the 16n-row
    # exploded table) with a single groupBy pass; in-bucket pair expansion
    # is bounded by max_bucket², and typical buckets hold 1-4 ids.
    ids_sorted = F.array_sort(F.collect_list(id_col))
    bucket_ids = _observe_bucket_drops(
        buckets.groupBy("band", "bucket").agg(ids_sorted.alias("ids")),
        F.size("ids"),
        max_bucket,
        observation,
    ).filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    cand = (
        bucket_ids.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = sig_df.select(F.col(id_col), F.col("hs"))
    rep_pairs = (
        cand.join(sets.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(sets.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
        .select(
            "id_a", "id_b", F.round(jaccard(F.col("hs_a"), F.col("hs_b")), 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return groups, members, rep_pairs


def minhash_dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 1000,
    observation: Observation | None = None,
) -> DataFrame:
    """Near-duplicate CLUSTERS via MinHash — the group-mode default
    consumption shape (round 4): (id, cluster) labels, cluster = the
    minimum doc id in the connected near-dup component.

    Where :func:`minhash_dedup_pairs` expands every within-group pair
    (quadratic in the exact-copy count C — at 256× duplicate mass that
    is the answer's own size, but most consumers want clusters, not
    163M pair rows), this runs :func:`connected_components` over the
    REPRESENTATIVE pair graph (Θ(distinct contents) nodes) and then
    labels each doc through its group membership — one linear join, no
    within-group pair materialization ever. Exactly equivalent to
    components over the pair-mode output (equivalence-tested).
    """
    groups, members, rep_pairs = _minhash_group_stages(
        df, id_col, text_col, num_hashes, bands, shingle_n, threshold, max_bucket, observation
    )
    comp = connected_components(rep_pairs, "id_a", "id_b")
    # groups with >= 2 identical copies cluster on their own even with no
    # cross-group edge (within-group Jaccard is definitionally 1.0);
    # null-text groups excluded — no content, no pairing (round-4 ADVICE)
    solo = (
        groups.filter(
            (F.col("_gsize") >= 2)
            & F.col(text_col).isNotNull()
            & (F.lit(1.0) >= F.lit(threshold))
        )
        .select(F.col("_gid").alias("node"))
        .join(comp.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    allc = comp.unionByName(solo)
    return members.join(allc, members["_gid"] == allc["node"]).select(
        F.col(id_col), F.col("component").alias("cluster")
    )


# -------------------------------------------------------------- SimHash

def _make_simhash_udf():
    """text -> 64-bit SimHash in one Arrow-batched vectorized pass:
    md5-derive a 64-bit hash per lowercased token (duplicates count,
    :func:`_hash64` — DuckDB-recomputable, which is what gives
    ``dedup_simhash`` its exact oracle twin), build the tokens×64 bit
    matrix, column-sum, sign → signature bits. Deterministic across
    workers/sessions; map-only. Null and empty texts both hash to
    signature 0 — i.e. trivially identical empty content; they pair
    with each other at Hamming 0 (a deliberate semantic: filter empty
    docs upstream if that is not wanted).

    Built lazily because pandas_udf registration needs an active session.
    """

    @F.pandas_udf("long")
    def _simhash64(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        weights = (np.uint64(1) << shifts).astype(np.uint64)
        for i, text in enumerate(texts):
            toks = [t.lower() for t in (text or "").split()]
            if not toks:
                out[i] = 0
                continue
            h = np.fromiter(
                (_hash64(t) for t in toks),
                dtype=np.uint64,
                count=len(toks),
            )
            bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            acc = 2 * bits.sum(axis=0) - len(h)
            out[i] = (weights[acc > 0].sum(dtype=np.uint64)).astype(np.int64)
        return pd.Series(out)

    return _simhash64


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — signature compute is map-only."""
    return _ensure_parallelism(df).select(
        F.col(id_col), _make_simhash_udf()(F.col(text_col)).alias("simhash")
    )


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    observation: Observation | None = None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash_a, simhash_b) ≤ max_hamming.

    Pigeonhole banding: split 64 bits into 4 16-bit chunks; any pair within
    Hamming ≤ 3 must agree exactly on ≥1 chunk, so chunk-equality blocking
    finds every candidate **whose shared bucket stays within
    ``max_bucket`` distinct contents** — buckets past the cap are dropped
    (degenerate near-identical boilerplate that would expand
    quadratically), so the pigeonhole completeness guarantee holds only
    for pairs all of whose agreeing chunks sit in capped-in buckets. With
    just 4×65536 possible (chunk, key) buckets, a large diverse corpus
    WILL exceed the cap on common chunk values; size ``max_bucket`` to
    ~N_distinct/65536 × a safety factor at scale, or pass an
    ``observation`` to get a loud dropped-bucket count (see below).
    ``bit_count(a^b)`` verifies surviving candidates exactly.

    Same single-shuffle layout as ``minhash_dedup_pairs``: ONE groupBy
    over (chunk, key) gathers each bucket's (id, simhash) members, drops
    degenerate buckets (> ``max_bucket``), and emits in-bucket pairs
    inline with the hamming verify applied IMMEDIATELY — only true
    near-dup pairs ever reach the pair-dedup shuffle. (The round-2 shape
    was a chunk-key self-join that dropDuplicates'd the FULL candidate
    set, signatures included, before filtering; at 64× adversarial
    duplicate mass that materialized hundreds of millions of pre-filter
    pairs in the dedup exchange and thrashed GC. Caught by the 256×
    scaling probe, tools/scaling_probe.py --docs-only.)

    **Duplicate-mass invariance** (round 3, same design as the minhash
    and winnowing paths): documents first collapse into groups by exact
    text, the signature UDF + banding + verify run once per distinct
    text, and doc pairs expand from representative pairs at the end.
    Within-group pairs (identical texts → identical simhash) are emitted
    directly with hamming 0; ``max_bucket`` caps now count distinct
    contents, so duplicate mass can neither blow up the buckets nor
    evict a page from them.

    The signature table is persisted: the banding pass and any downstream
    consumer would otherwise re-run the packing UDF over the corpus.
    """
    fpk = df.select(F.col(id_col), F.col(text_col)).withColumn(
        "_tkey", F.md5(F.coalesce(F.col(text_col), F.lit("\x00null")))
    )
    groups = (
        fpk.groupBy("_tkey")
        .agg(
            F.min(id_col).alias("_gid"),
            F.count(F.lit(1)).alias("_gsize"),
            F.first(text_col).alias(text_col),
        )
        .persist()
    )
    groups.count()  # pin eagerly — members join + signature stage
    members = (
        fpk.select(F.col(id_col), "_tkey")
        .join(groups.select("_tkey", "_gid"), "_tkey")
        .select(F.col(id_col), "_gid")
    )
    reps = groups.select(F.col("_gid").alias(id_col), F.col(text_col))

    sh = simhash(reps, id_col, text_col).persist()
    sh.count()  # pin eagerly — see minhash_dedup_pairs
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
    # struct sorts by leading field = id, so pairs come out id_a < id_b
    gathered = F.array_sort(
        F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("sh")))
    )
    bucket_members = _observe_bucket_drops(
        exploded.groupBy("chunk", "key").agg(gathered.alias("ms")),
        F.size("ms"),
        max_bucket,
        observation,
    ).filter((F.size("ms") >= 2) & (F.size("ms") <= max_bucket))
    pair_structs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    rep_pairs = (
        bucket_members.select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.bit_count(F.col("p.a.sh").bitwiseXOR(F.col("p.b.sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    cross = (
        rep_pairs.join(
            members.select(F.col("_gid").alias("id_a"), F.col(id_col).alias("_ia")), "id_a"
        )
        .join(members.select(F.col("_gid").alias("id_b"), F.col(id_col).alias("_ib")), "id_b")
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            "hamming",
        )
    )
    same = (
        groups.filter(F.col("_gsize") >= 2)
        .select("_gid")
        .join(members.select("_gid", F.col(id_col).alias("_ia")), "_gid")
        .join(members.select("_gid", F.col(id_col).alias("_ib")), "_gid")
        .filter(F.col("_ia") < F.col("_ib"))
        .select(
            F.col("_ia").alias("id_a"),
            F.col("_ib").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(same)


# ---------------------------------------------------- winnowing (rolling hash)

_WINNOW_BASE = 257
_WINNOW_MOD = (1 << 61) - 1


@functools.lru_cache(maxsize=8)
def _winnow_powers(k: int) -> np.ndarray:
    return np.array(
        [pow(_WINNOW_BASE, k - 1 - j, _WINNOW_MOD) for j in range(k)], dtype=object
    )


def _make_winnow_udf(k: int, window: int):
    """text -> winnowed fingerprint set (array<long>).

    Classic MOSS winnowing: Rabin-Karp rolling hash over character
    k-grams (polynomial base 257 mod 2^61-1), then keep the minimum hash
    of every ``window``-wide span (rightmost on ties, each position kept
    once). Guarantees: any shared substring of length >= k + window - 1
    produces at least one shared fingerprint. Map-only, vectorized per
    Arrow batch.
    """

    @F.pandas_udf("array<bigint>")
    def _winnow(texts: pd.Series) -> pd.Series:
        return pd.Series([winnow_text(t, k, window) for t in texts])

    return _winnow


def winnow_text(text: str | None, k: int = 16, window: int = 8) -> list[int]:
    """Pure winnowing kernel (one document) — the exact computation the
    Arrow-batched UDF applies per row; exposed separately so the
    detection guarantee (any shared substring of length >= k+window-1
    yields a shared fingerprint) is property-testable without a Spark
    round trip (see tests/test_property.py)."""
    powers = _winnow_powers(k)
    s = (text or "").lower()
    if len(s) < k:
        return []
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(object)
    grams = np.lib.stride_tricks.sliding_window_view(codes, k)
    hashes = (grams * powers[None, :]).sum(axis=1) % _WINNOW_MOD
    hashes = hashes.astype(np.uint64)
    if len(hashes) <= window:
        picks = {int(hashes.min())}
    else:
        spans = np.lib.stride_tricks.sliding_window_view(hashes, window)
        idx = spans.argmin(axis=1) + np.arange(len(spans))
        picks = {int(hashes[i]) for i in np.unique(idx)}
    return [np.uint64(p).astype(np.int64).item() for p in picks]


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 16, window: int = 8
) -> DataFrame:
    """(id, fingerprints array<long>) — rolling-hash winnowing sketch."""
    return _ensure_parallelism(df).select(
        F.col(id_col), _make_winnow_udf(k, window)(F.col(text_col)).alias("fingerprints")
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    window: int = 8,
    min_shared: int = 8,
    max_posting: int = 1000,
    observation: Observation | None = None,
) -> DataFrame:
    """Pairs sharing >= min_shared winnowed fingerprints (substring-level
    near-dup/plagiarism detection — catches shared passages that token-set
    Jaccard dilutes away).

    **Duplicate-mass-invariant design** (round 3): documents are first
    collapsed into groups by their EXACT fingerprint set, and the whole
    inverted-index + shared-print counting pipeline runs over one
    representative per group. A corpus where every doc has C exact
    copies costs the naive doc-level pipeline C² times the pair stream
    (measured: 2.9e9 pre-aggregation rows at C=64 on the sf0.1
    documents — it never finished); group-level discovery is invariant
    to C, and the final expansion back to doc pairs is Θ(answer): the
    answer itself is what's quadratic in C.

    Semantics per pair (a, b), a<b:
    - different fingerprint sets → shared = #common prints whose
      GROUP-level posting size is in [2, max_posting] (the degenerate-
      boilerplate cap, now counted over distinct contents — 1M copies of
      one page no longer evict its prints);
    - identical fingerprint sets (same group) → shared = |set| minus
      prints whose group-posting exceeds the cap.
    Pairs with shared >= min_shared are returned as
    (id_a, id_b, shared_prints). The DuckDB oracle twin mirrors this
    group-level computation exactly (registry _winnow_oracle).
    """
    groups, members, rep_pairs, same_groups = _winnow_group_stages(
        df, id_col, text_col, k, window, min_shared, max_posting, observation
    )
    cross = (
        rep_pairs.join(
            members.select(F.col("gid").alias("gid_a"), F.col(id_col).alias("_ia")), "gid_a"
        )
        .join(members.select(F.col("gid").alias("gid_b"), F.col(id_col).alias("_ib")), "gid_b")
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            "shared_prints",
        )
    )
    same = (
        same_groups.join(members.select("gid", F.col(id_col).alias("_ia")), "gid")
        .join(members.select("gid", F.col(id_col).alias("_ib")), "gid")
        .filter(F.col("_ia") < F.col("_ib"))
        .select(F.col("_ia").alias("id_a"), F.col("_ib").alias("id_b"), "shared_prints")
    )
    return cross.unionByName(same)


def _winnow_group_stages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    window: int,
    min_shared: int,
    max_posting: int,
    observation: Observation | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The duplicate-mass-invariant winnowing discovery pipeline up to
    REPRESENTATIVE pairs (shared by the pair- and cluster-mode outputs).

    Returns (groups, members, rep_pairs, same_groups):
    - groups: (fkey, gid, gsize, fps) one row per distinct fingerprint set;
    - members: (id, gid) doc → group assignment;
    - rep_pairs: (gid_a, gid_b, shared_prints) qualifying pairs BETWEEN
      groups (capped-posting inverted index + shared-print count);
    - same_groups: (gid, shared_prints) groups of >= 2 identical
      fingerprint sets whose (cap-surviving) set size qualifies.

    TWO-LEVEL collapse (round 4): docs first collapse by exact text
    (md5), the winnowing UDF runs once per DISTINCT text, and the
    resulting fingerprint sets then collapse again into the fingerprint
    groups. Fingerprints are a pure function of the text, so the output
    is identical to fingerprinting every doc — but at 256× exact-copy
    mass the UDF (the pipeline's Θ(total text bytes) stage) now costs
    Θ(distinct text bytes): the 256× probe dropped from 70s (UDF over
    1.28M docs) to ~8s. Same shape as ``_minhash_group_stages``.
    """
    tkeyed = df.select(F.col(id_col), F.col(text_col)).withColumn(
        "_tkey", F.md5(F.coalesce(F.col(text_col), F.lit("\x00null")))
    )
    tgroups = (
        tkeyed.groupBy("_tkey")
        .agg(
            F.min(id_col).alias("_tgid"),
            F.count(F.lit(1)).alias("_tsize"),
            F.first(text_col).alias(text_col),
        )
        .persist()
    )
    tgroups.count()  # pin eagerly — fingerprint input + members join
    treps = tgroups.select(F.col("_tgid").alias(id_col), F.col(text_col))
    fp = winnow_fingerprints(treps, id_col, text_col, k, window).select(
        F.col(id_col).alias("_tgid"), F.array_sort("fingerprints").alias("fps")
    )
    # group key: the fingerprint set itself (md5 of the sorted longs —
    # collision-negligible, cheaper to shuffle than the array)
    fpk = fp.withColumn(
        "fkey", F.md5(F.concat_ws(",", F.transform(F.col("fps"), lambda x: x.cast("string"))))
    ).join(tgroups.select("_tgid", "_tsize"), "_tgid")
    groups = (
        fpk.groupBy("fkey")
        .agg(
            F.min("_tgid").alias("gid"),
            F.sum("_tsize").alias("gsize"),
            F.first("fps").alias("fps"),
        )
        .persist()
    )
    groups.count()  # pin eagerly — consumed by three branches below
    members = (
        tkeyed.select(F.col(id_col), "_tkey")
        .join(tgroups.select("_tkey", "_tgid"), "_tkey")
        .join(fpk.select("_tgid", "fkey"), "_tgid")
        .join(groups.select("fkey", "gid"), "fkey")
        .select(F.col(id_col), "gid")
    )

    inv = groups.select("gid", F.explode("fps").alias("print"))
    postings = _observe_bucket_drops(
        inv.groupBy("print").agg(F.array_sort(F.collect_list("gid")).alias("gids")),
        F.size("gids"),
        max_posting,
        observation,
    )
    ok = postings.filter((F.size("gids") >= 2) & (F.size("gids") <= max_posting))
    pair_structs = F.flatten(
        F.transform(
            F.col("gids"),
            lambda x, i: F.transform(
                F.slice(F.col("gids"), i + 2, F.size(F.col("gids"))),
                lambda y: F.struct(x.alias("gid_a"), y.alias("gid_b")),
            ),
        )
    )
    rep_pairs = (
        ok.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.gid_a", "p.gid_b")
        .agg(F.count(F.lit(1)).alias("shared_prints"))
        .filter(F.col("shared_prints") >= min_shared)
    )

    # same-group qualification: every member pair shares the whole set
    # (minus capped-out prints); qualifies only with >= 2 members
    n_capped = (
        postings.filter(F.size("gids") > max_posting)
        .select(F.explode("gids").alias("gid"))
        .groupBy("gid")
        .agg(F.count(F.lit(1)).alias("n_capped"))
    )
    same_groups = (
        groups.filter(F.col("gsize") >= 2)
        .join(n_capped, "gid", "left")
        .select(
            "gid",
            (F.size("fps") - F.coalesce(F.col("n_capped"), F.lit(0)))
            .cast("long")
            .alias("shared_prints"),
        )
        .filter(F.col("shared_prints") >= min_shared)
    )
    return groups, members, rep_pairs, same_groups


def winnow_dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    window: int = 8,
    min_shared: int = 8,
    max_posting: int = 1000,
    observation: Observation | None = None,
) -> DataFrame:
    """Substring-overlap CLUSTERS via winnowing — the group-mode default
    consumption shape (round 4): (id, cluster) labels, cluster = the
    minimum doc id in the connected overlap component.

    Motivation (round-3 verdict #2): at 256× duplicate mass the
    pair-mode output IS 163M rows (5000 groups × C(256,2) within-group
    pairs) — pure answer materialization that no consumer of dedup
    clusters needs. This variant runs :func:`connected_components` over
    the REPRESENTATIVE pair graph (Θ(distinct fingerprint sets) nodes)
    and labels docs through group membership: the within-group quadratic
    expansion never happens, so cost is invariant to exact-copy mass.
    Exactly equivalent to components over the pair-mode output
    (equivalence-tested in tests/test_llm_ops.py).
    """
    groups, members, rep_pairs, same_groups = _winnow_group_stages(
        df, id_col, text_col, k, window, min_shared, max_posting, observation
    )
    comp = connected_components(rep_pairs, "gid_a", "gid_b")
    solo = (
        same_groups.select(F.col("gid").alias("node"))
        .join(comp.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    allc = comp.unionByName(solo)
    return members.join(allc, members["gid"] == allc["node"]).select(
        F.col(id_col), F.col("component").alias("cluster")
    )


# ------------------------------------------------- connected components


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iterations: int = 25
) -> DataFrame:
    """Connected components by iterative neighborhood-min label
    propagation: every node repeatedly adopts the minimum label in its
    closed neighborhood until a fixpoint — the step that turns pairwise
    near-dup evidence into dedup CLUSTERS (A~B and B~C group A,B,C even
    though the pair stage never compared A to C).

    Scale shape: converges in O(max component diameter) rounds; near-dup
    components are near-cliques (diameter 2-3), so a handful of rounds in
    practice, with ``max_iterations`` guarding pathological chains. Each
    round is one equi-join + one groupBy-min over the (node, label) table
    — all mergeable partials — and convergence is detected by one scalar
    agg (sum of labels, strictly decreasing until fixpoint), not a
    row-level diff. The symmetrized edge table is persisted once and
    eagerly pinned (lazy caches get recomputed per consumer under AQE).
    For adversarially long chains the alternating large-star/small-star
    contraction ("Connected Components in MapReduce and Beyond") bounds
    rounds by O(log n); unnecessary at dedup diameters.

    Returns (node, component); component = min reachable node id. Nodes
    with no edges don't appear — callers coalesce to self-labels.
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.persist()
    sym.count()

    labels = sym.select("u").distinct().select("u", F.col("u").alias("label")).persist()
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    try:
        for _ in range(max_iterations):
            propagated = sym.join(
                labels.withColumnRenamed("u", "v"), "v"
            ).select("u", "label")
            # localCheckpoint, not persist: each round's plan references
            # the previous round's TWICE (propagate + union), so cached-
            # but-uncheckpointed lineage doubles per round — execution
            # reuses the cache, but Catalyst replans the exponentially
            # growing logical tree (observed: ~5.6k join nodes in the
            # printed plan after 4 rounds). Checkpointing truncates the
            # plan to the materialized blocks each round — the same
            # pattern as connected_components_star below.
            new_labels = (
                propagated.union(labels.select("u", "label"))
                .groupBy("u")
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=True)
            )
            new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
            labels.unpersist()
            labels = new_labels
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
    finally:
        sym.unpersist()


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iterations: int = 30
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction ("Connected Components in MapReduce and Beyond", Kiveris
    et al.) — O(log n) rounds on ANY graph, vs the O(diameter) of
    :func:`connected_components`'s label propagation. The scale choice
    for adversarially chain-shaped duplicate graphs (e.g. near-dup
    chains across a crawl's revision history); for typical near-clique
    dedup components the simpler propagation converges just as fast.

    large-star: every node links its larger neighbors to its minimum
    neighbor; small-star: links its smaller neighbors (and itself) to
    it. Both are one groupBy-min + one equi-join per round — mergeable
    partials, shuffle keyed on node id only. Fixpoint when the canonical
    edge set's (count, sum) signature repeats; the result is a star
    forest with every node directly attached to its component minimum.

    Returns (node, component), component = min reachable node id; same
    contract as :func:`connected_components` (edgeless nodes absent).
    """
    e = (
        edges.select(F.col(src).cast("long").alias("x"), F.col(dst).cast("long").alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .persist()
    )
    e.count()

    def star(cur: DataFrame, large: bool) -> DataFrame:
        sym = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        nbr_min = sym.groupBy("u").agg(F.min("v").alias("mn"))
        withm = sym.join(nbr_min, "u").withColumn("m", F.least("mn", F.col("u")))
        side = (
            withm.filter(F.col("v") > F.col("u"))
            if large
            else withm.filter(F.col("v") < F.col("u"))
        )
        out = side.select(F.col("v").alias("x"), F.col("m").alias("y"))
        if not large:
            # small-star also re-links u itself to m
            out = out.union(withm.select(F.col("u").alias("x"), F.col("m").alias("y")))
        return (
            out.filter(F.col("x") != F.col("y"))
            .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
            .distinct()
        )

    def signature(cur: DataFrame):
        row = cur.agg(
            F.count(F.lit(1)), F.sum("a"), F.sum("b"), F.sum(F.col("a") * F.col("b"))
        ).collect()[0]
        return tuple(row)

    prev_sig = signature(e)
    try:
        for _ in range(max_iterations):
            # localCheckpoint, not persist: each round's plan builds on the
            # previous round's, so after ~10 rounds the accumulated lineage
            # makes Catalyst planning itself the bottleneck (observed as a
            # py4j stack blowup on a 600-node chain). Checkpointing
            # truncates the plan to the materialized blocks — the standard
            # pattern for iterative DataFrame algorithms.
            nxt = star(star(e, large=True), large=False).localCheckpoint(eager=True)
            sig = signature(nxt)
            e.unpersist()
            e = nxt
            if sig == prev_sig:
                break
            prev_sig = sig
        sym = e.select(F.col("a").alias("node"), F.col("b").alias("other")).union(
            e.select(F.col("b").alias("node"), F.col("a").alias("other"))
        )
        return sym.groupBy("node").agg(
            F.least(F.min("other"), F.col("node")).alias("component")
        )
    finally:
        e.unpersist()


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 30,
    min_len: int = 60,
) -> DataFrame:
    """EXACT substring dedup, the span-report half: find every maximal
    run of text that also occurs elsewhere in the corpus (any doc,
    including elsewhere in the SAME doc), as character spans — the
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022) operation, which removes the repeated SUBSTRING rather
    than whole near-dup documents (boilerplate, licenses, templated
    headers survive document-level MinHash because the surrounding text
    differs).

    Algorithm (no suffix array needed on an engine with a shuffle):
    every k-char gram at every position → a gram is *duplicated* iff it
    occurs >1 time corpus-wide (count-only window over the gram — a hot
    gram costs one partition sort, never a pairwise expansion) → the
    surviving (doc, pos) rows merge into maximal spans by
    gaps-and-islands (pos − row_number is constant on a consecutive
    run); a duplicated substring of length M yields M−k+1 consecutive
    positions, so merged spans are exact. Spans shorter than
    ``min_len`` (≥ k) are dropped — the noise floor.

    Scale shape: Θ(total chars) gram rows is the honest cost of
    EXACT spans (Lee et al. pay the same to build the suffix array);
    the shuffle key is the k-byte gram itself. For discovery-only at
    100 TB, the winnowing fingerprints (``winnow_overlap_pairs``) are
    the sampled fast path; this operator is the span-exact finisher.

    Positions are 1-based, ``span_end`` inclusive — SQL substr
    convention, so the DuckDB twin is literal."""
    from pyspark.sql import Window

    if min_len < k:
        raise ValueError(f"min_len ({min_len}) must be >= k ({k})")
    grams = (
        df.filter(F.length(text_col) >= k)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length(text_col) - k + 1)).alias("pos"),
            F.col(text_col),
        )
        .select(id_col, "pos", F.substring(F.col(text_col), F.col("pos"), F.lit(k)).alias("gram"))
    )
    dup = (
        grams.withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("gram")))
        .filter(F.col("n") > 1)
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = dup.withColumn("island", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
            (F.max("pos") + k - F.min("pos")).alias("span_len"),
        )
        .filter(F.col("span_len") >= min_len)
        .select(id_col, "span_start", "span_end", "span_len")
    )


def remove_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The removal half of exact substring dedup: cut every reported
    span out of its document and stitch the remainder back together.
    ``spans`` must be non-overlapping per doc (guaranteed by
    :func:`duplicate_spans`' island merge). Docs with no spans pass
    through intact; output adds ``n_spans_removed`` / ``chars_removed``.

    Per doc the kept text is the ordered concat of the gaps BETWEEN
    spans plus the tail after the last span — computed with one
    lag-window over the span rows and one ordered array fold, all JVM
    built-ins; the documents table itself is touched by exactly one
    left join on the id."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("span_start")
    gaps = (
        spans.join(df.select(id_col, text_col), id_col)
        .withColumn("prev_end", F.lag("span_end", 1, 0).over(w))
        .select(
            F.col(id_col),
            F.col("span_start"),
            F.col("span_len"),
            F.substring(
                F.col(text_col),
                F.col("prev_end") + 1,
                F.col("span_start") - F.col("prev_end") - 1,
            ).alias("gap"),
            F.max("span_end").over(Window.partitionBy(id_col)).alias("max_end"),
        )
    )
    agg = gaps.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_start", "gap"))),
                lambda s: s["gap"],
            ),
            "",
        ).alias("_head"),
        F.first("max_end").alias("_max_end"),
        F.count(F.lit(1)).alias("n_spans_removed"),
        F.sum("span_len").alias("chars_removed"),
    )
    return (
        df.join(agg, id_col, "left")
        .select(
            id_col,
            F.when(
                F.col("_head").isNull(), F.col(text_col)
            )
            .otherwise(
                F.concat(
                    F.col("_head"),
                    F.substring(
                        F.col(text_col), F.col("_max_end") + 1, F.length(text_col)
                    ),
                )
            )
            .alias("cleaned"),
            F.coalesce("n_spans_removed", F.lit(0)).alias("n_spans_removed"),
            F.coalesce("chars_removed", F.lit(0)).alias("chars_removed"),
        )
    )


def line_frequency_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
    min_line_chars: int = 4,
) -> DataFrame:
    """Corpus-frequency LINE dedup (the CCNet/RefinedWeb boilerplate
    pass): drop every line whose exact text occurs ≥ ``min_count``
    times across the whole corpus — navigation bars, cookie banners,
    license footers — and stitch each document's surviving lines back
    together in order. The line-granularity sibling of the exact
    substring pass (:func:`duplicate_spans` catches duplicated RUNS
    inside a line; this catches short templated lines repeated across
    thousands of pages that never reach a 60-char run). Lines shorter
    than ``min_line_chars`` are never removed (blank/separator lines
    are formatting, not boilerplate). NULL text passes through NULL; a
    document whose every line is boilerplate comes back as ``''``.
    Output: (id, cleaned, n_lines_removed).

    Scale shape: split+posexplode is map-only; the line-frequency
    count is one wordcount-shaped shuffle on Θ(total lines); the
    boilerplate SET (heavy hitters only — lines with ≥ min_count
    occurrences) is orders of magnitude smaller than the line stream,
    so AQE broadcasts the flag join; the rebuild is one groupBy(id)
    with an ordered array fold. No hint is pinned: if a pathological
    corpus makes the boilerplate set huge, the join degrades to a
    shuffle instead of OOMing the driver."""
    lines = df.filter(F.col(text_col).isNotNull()).select(
        id_col, F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    )
    boiler = (
        lines.filter(F.length("line") >= min_line_chars)
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("line", F.lit(1).alias("_bp"))
    )
    marked = lines.join(boiler, "line", "left")
    agg = marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                # collect_list skips nulls, so boilerplate rows drop out
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_bp").isNull(), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("_cleaned"),
        F.sum(F.when(F.col("_bp") == 1, 1).otherwise(0)).alias("_removed"),
    )
    return df.join(agg, id_col, "left").select(
        id_col,
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce("_cleaned", F.lit("")))
        .alias("cleaned"),
        F.coalesce("_removed", F.lit(0)).alias("n_lines_removed"),
    )


def entity_match_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[tuple[str, float, str]],
    match_threshold: float = 0.8,
    possible_threshold: float = 0.6,
    max_block: int | None = 10_000,
    observation: Observation | None = None,
) -> DataFrame:
    """Entity resolution (record linkage) by blocked pairwise scoring:
    candidate pairs from an equi-join on ``block_cols`` (the classic
    blocking step — pairs never cross a block, so cost is
    Σ block_size², not n²), scored as a weighted sum of per-field
    similarities and tiered Fellegi-Sunter-style into
    ``match`` / ``possible``. Pairs below ``possible_threshold`` are
    not emitted.

    ``fields`` is ``[(col, weight, kind), ...]`` with kinds:
      - ``levenshtein``: 1 − edit_distance/max(len, len, 1)
      - ``exact``: equality → 1.0 / 0.0
      - ``prefix:<k>``: first k chars equal → 1.0 / 0.0
      - ``numeric:<scale>``: max(0, 1 − |Δ|/scale)
    NULL on either side scores that field 0. Every similarity is a
    fixed tree of single IEEE ops over exact ints, and the weighted
    sum adds in ``fields`` order — engines reproduce the 6dp score
    bit-for-bit. Output: (id_a, id_b, sim_<col>..., score, tier).

    Scale shape: the stream side is round-robin repartitioned to the
    cluster's parallelism BEFORE the join — when Catalyst broadcasts
    the other side (the usual case: blocks are a dimension-sized
    table), every probe task scans its block's hash bucket, so work
    balances regardless of block-size skew AND regardless of how few
    splits the input file had (measured: the sf0.1 part table scans as
    ONE split, which serialized all ~1.3M blocked Levenshtein
    evaluations onto one core — 73.6s; repartitioned, 2.4s). When both
    sides are too big to broadcast, Catalyst falls back to a
    shuffle-on-block-key join and the extra round-robin pass is one
    cheap Θ(n) shuffle.

    Mega-block guard (the LSH bucket-cap discipline, round-7 verdict
    #7): a block larger than ``max_block`` contributes block² pairs —
    one degenerate blocking key (empty string, 'UNKNOWN', a default
    date) can single-handedly go quadratic. Records in blocks past the
    cap are EXCLUDED from pair generation entirely (their pairs are a
    recall trade, loudly reported, not silently slow); pass an
    ``Observation`` and read ``dropped_buckets`` / ``dropped_ids`` /
    ``max_bucket_size`` after the action to see cap pressure.
    ``max_block=None`` disables the guard. The cap gate is one
    Θ(blocks) aggregate + a semi-join — never a driver-side pass."""
    if max_block is None and observation is not None:
        # fail loudly: the Observation is only attached by the cap
        # gate; with the guard disabled it would never be populated and
        # a later observation.get would hang on a metric that no action
        # ever recorded (review catch, round 7)
        raise ValueError(
            "observation requires max_block: the drop metrics are "
            "recorded by the cap gate, which max_block=None disables"
        )
    if max_block is not None:
        if observation is None:
            # the cap defaults ON (round 7) — without an Observation a
            # recall loss from oversized blocks would be invisible, so
            # say up front that the gate is armed blind (ADVICE r8)
            import warnings

            warnings.warn(
                f"entity_match_pairs: max_block={max_block} is active "
                "without an Observation — records in oversized blocks "
                "are excluded from pair generation with no drop "
                "metrics recorded; pass observation= to see "
                "dropped_buckets/dropped_ids, or max_block=None to "
                "disable the cap",
                stacklevel=2,
            )
        sizes = df.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_bsz"))
        sizes = _observe_bucket_drops(
            sizes, F.col("_bsz"), max_block, observation
        )
        keep = sizes.filter(F.col("_bsz") <= max_block).select(*block_cols)
        d0, kk = df.alias("d0"), keep.alias("kk")
        df = d0.join(
            kk,
            [F.col(f"d0.{c}").eqNullSafe(F.col(f"kk.{c}")) for c in block_cols],
            "left_semi",
        )
    a = _ensure_parallelism(df).alias("a")
    b = df.alias("b")
    cond = [F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in block_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    joined = a.join(b, cond)

    sims: list[tuple[str, Column, float]] = []
    for col, weight, kind in fields:
        xa, xb = F.col(f"a.{col}"), F.col(f"b.{col}")
        if kind == "levenshtein":
            sim = F.lit(1.0) - F.levenshtein(xa, xb).cast("double") / F.greatest(
                F.length(xa), F.length(xb), F.lit(1)
            )
        elif kind == "exact":
            sim = F.when(xa == xb, 1.0).otherwise(0.0)
        elif kind.startswith("prefix:"):
            k = int(kind.split(":", 1)[1])
            sim = F.when(
                F.substring(xa, 1, k) == F.substring(xb, 1, k), 1.0
            ).otherwise(0.0)
        elif kind.startswith("numeric:"):
            scale = float(kind.split(":", 1)[1])
            sim = F.greatest(
                F.lit(0.0),
                F.lit(1.0) - F.abs(xa - xb).cast("double") / F.lit(scale),
            )
        else:
            raise ValueError(f"unknown similarity kind {kind!r}")
        sims.append((col, F.coalesce(sim, F.lit(0.0)), weight, kind))

    # Expensive-similarity pushdown (round 9, semantics-preserving):
    # Levenshtein is the per-pair cost driver (O(len²) per evaluation);
    # a pair whose CHEAP similarities already bound the score below
    # ``possible_threshold`` even at sim=1.0 on every expensive field
    # can never be emitted — filter it BEFORE the edit distance runs.
    # Output is identical: only never-emitted pairs are pruned.
    cheap = [(c, s, w) for c, s, w, k in sims if k != "levenshtein"]
    expensive = [(c, s, w) for c, s, w, k in sims if k == "levenshtein"]
    if cheap and expensive:
        cheap_sum = None
        for _, sim, weight in cheap:
            term = F.lit(weight) * sim
            cheap_sum = term if cheap_sum is None else cheap_sum + term
        # Per-pair upper bound on each POSITIVE-weight Levenshtein
        # similarity from the length difference (round 13):
        # edit_distance(a, b) >= |len(a) - len(b)|, so
        # sim = 1 - d/max(len) <= 1 - |Δlen|/max(len). The bound is a
        # pure length expression — no O(len²) DP — and on the sf0.1
        # part blocks it prunes ~half the 26M candidate pairs BEFORE
        # the edit distance runs (measured 4.2s -> 2.3s for the
        # score+filter stage). A negative levenshtein weight maximizes
        # its contribution at sim=0 (contribution 0), so it adds
        # nothing to the bound — exactly the old max(w, 0) clamping.
        exp_bound = None
        for col, _sim, weight in expensive:
            if weight <= 0:
                continue
            xa, xb = F.col(f"a.{col}"), F.col(f"b.{col}")
            ub = F.lit(1.0) - F.abs(
                F.length(xa) - F.length(xb)
            ).cast("double") / F.greatest(F.length(xa), F.length(xb), F.lit(1))
            term = F.lit(weight) * F.coalesce(ub, F.lit(0.0))
            exp_bound = term if exp_bound is None else exp_bound + term
        if exp_bound is None:
            exp_bound = F.lit(0.0)
        # margin: the emitted filter is round(score,6) >= threshold, so
        # a raw score down to threshold - 0.5e-6 still emits — keep a
        # full micro of slack so the bound can never out-prune it
        joined = joined.where(
            cheap_sum + exp_bound >= F.lit(possible_threshold - 1e-6)
        )

    score = None
    for _, sim, weight, _k in sims:
        term = F.lit(weight) * sim
        score = term if score is None else score + term
    score = F.round(score, 6)
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[sim.alias(f"sim_{col}") for col, sim, _, _k in sims],
            score.alias("score"),
        )
        .where(F.col("score") >= possible_threshold)
        .withColumn(
            "tier",
            F.when(F.col("score") >= match_threshold, "match").otherwise("possible"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    max_df: int = 100,
) -> DataFrame:
    """Asymmetric token-set CONTAINMENT near-dup detection:
    ``containment(A in B) = |A∩B| / |A|`` over distinct lowercase
    tokens. Catches the pairs Jaccard structurally misses — a short
    document wholly embedded in a much longer one scores near 1.0 here
    but near |A|/|B| on Jaccard (quote-plus-commentary, boilerplate
    wrappers, chunk-of-superset leaks). Returns
    (id_a, id_b, overlap, containment_a, containment_b) with
    id_a < id_b where the LARGER direction ≥ ``threshold`` (6dp, the
    rounded value is what's thresholded so both engines cut
    identically).

    Scale shape: candidate DISCOVERY is a capped inverted index —
    tokens with document frequency > ``max_df`` don't generate
    candidates (a pair sharing ONLY corpus-stopword tokens is not
    found: the same documented recall trade as the other capped
    inverted-index ops, and such pairs are overwhelmingly false
    positives for containment); VERIFICATION computes the exact
    containment on the candidates' FULL token sets, so emitted scores
    are exact, uncapped values. Work is Θ(posting-list pairs) for
    discovery + Θ(candidates) for verify — never all-pairs."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(F.transform(word_tokens(F.col(text_col)), F.lower)).alias(
            "ts"
        ),
    ).filter(F.size("ts") > 0)
    inv = toks.select("id", F.explode("ts").alias("token"))
    rare = (
        inv.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("token")
    )
    posts = inv.join(rare, "token")
    cand = (
        posts.alias("a")
        .join(posts.alias("b"), "token")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    ta = toks.select(F.col("id").alias("id_a"), F.col("ts").alias("ts_a"))
    tb = toks.select(F.col("id").alias("id_b"), F.col("ts").alias("ts_b"))
    v = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ts_a", "ts_b")).alias("overlap"),
            F.size("ts_a").alias("na"),
            F.size("ts_b").alias("nb"),
        )
        .select(
            "id_a",
            "id_b",
            "overlap",
            F.round(F.col("overlap").cast("double") / F.col("na"), 6).alias(
                "containment_a"
            ),
            F.round(F.col("overlap").cast("double") / F.col("nb"), 6).alias(
                "containment_b"
            ),
        )
    )
    return v.filter(
        F.greatest("containment_a", "containment_b") >= F.lit(threshold)
    )


def golden_records(
    df: DataFrame,
    cluster_cols: list[str],
    rules: dict[str, tuple[str, str]],
) -> DataFrame:
    """Survivorship (golden-record merge): collapse each cluster of
    matched records to ONE canonical row by per-field rules — the step
    after entity resolution (block → score → cluster → MERGE) that
    master-data pipelines ship. ``rules`` maps output column →
    (source column, strategy):

      - ``min`` / ``max``: extreme value (NULLs ignored);
      - ``longest``: the longest non-null string, ties broken by the
        smaller value — "most complete field wins", deterministically;
      - ``first``: the value carried by the row with the smallest
        ``order`` column... (not offered — pick explicitly); use
        ``min``/``max`` on the id instead.

    Every strategy compiles to a single aggregate expression (min /
    max / min_by over a composite ordering struct), so the whole merge
    is ONE groupBy on the cluster key — Θ(records) with mergeable
    partials, no window, no second pass. Adds ``n_members``."""
    aggs = [F.count(F.lit(1)).alias("n_members")]
    for out, (col, strategy) in rules.items():
        c = F.col(col)
        if strategy == "min":
            aggs.append(F.min(c).alias(out))
        elif strategy == "max":
            aggs.append(F.max(c).alias(out))
        elif strategy == "longest":
            # min_by over (-length, value): longest wins, ties take the
            # smaller value. NULL values get an explicit +inf sentinel
            # length — min_by compares NULL struct FIELDS as smallest,
            # which would otherwise crown the null row
            ordk = F.struct(
                F.coalesce(-F.length(c), F.lit(2147483647)).alias("l"),
                c.alias("v"),
            )
            aggs.append(F.min_by(c, ordk).alias(out))
        else:
            raise ValueError(f"unknown survivorship strategy {strategy!r}")
    return df.groupBy(*cluster_cols).agg(*aggs)

"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB:
- the payload is a ``binary`` column in parquet (stored natively, never
  decoded by Spark itself);
- a typed metadata struct (modality, byte length, content hash) rides
  alongside for pruning/routing without touching payload bytes;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages so payload bytes cross into Python once per batch,
  not per row;
- size skew (a few huge videos per partition) is handled by lowering
  ``spark.sql.files.maxPartitionBytes`` or salting on the hash prefix.

The actual codec step is STUBBED (this container has no image/audio libs):
``decode_features`` raises ``NotImplementedError`` in ``strict`` mode and
otherwise emits a deterministic md5-derived fake feature vector — the
Spark-side plumbing (schemas, batching, UDF signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Schema of the decode output — fixed and engine-visible so downstream
#: operators can be planned without running the decoder.
FEATURE_SCHEMA = (
    "doc_id long, modality string, payload_bytes long, feature array<double>"
)

N_FEATURES = 8


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload + metadata struct from a text
    column (stand-in for reading real media bytes from parquet/blob store).
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("modality"),
            F.octet_length(F.col(text_col)).alias("payload_bytes"),
            F.md5(F.col(text_col)).alias("content_md5"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 doubles derived from
    the md5 digest. Replace with PIL/torchvision/ffmpeg in production."""
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:N_FEATURES]]


def pil_image_features(payload: bytes) -> list[float]:
    """REAL image decoder (activates wherever Pillow is installed; this
    container has no codec libs, so it is exercised via an importorskip
    test): decode → RGB → 32×32 resize → 8 features = per-channel
    mean/std + luma mean/std. The production shape for the decode stage —
    swap in torchvision/ffmpeg the same way."""
    import io

    from PIL import Image  # noqa: F401 — hard dep only on this code path

    import numpy as np

    img = Image.open(io.BytesIO(payload)).convert("RGB").resize((32, 32))
    arr = np.asarray(img, dtype=np.float64) / 255.0
    luma = arr @ np.array([0.299, 0.587, 0.114])
    feats = list(arr.mean(axis=(0, 1))) + list(arr.std(axis=(0, 1)))
    feats += [float(luma.mean()), float(luma.std())]
    return [float(f) for f in feats]


def default_decoder():
    """Best real decoder available in this environment, else None.
    Media libs are optional deps: Pillow unlocks image decode; the same
    hook is where ffmpeg/torchaudio would slot in for audio/video."""
    try:
        import PIL  # noqa: F401

        return pil_image_features
    except ImportError:
        return None


def decode_features(df: DataFrame, strict: bool = False, decoder=None) -> DataFrame:
    """Arrow-batched decode/feature-extract over payload binaries.

    ``df`` must have (doc_id, payload, meta) as produced by
    :func:`attach_payload`. ``decoder`` is any ``bytes -> list[float]``
    (length N_FEATURES) callable — :func:`pil_image_features` where
    Pillow is installed, a torchvision/ffmpeg wrapper in production.
    With no decoder given, :func:`default_decoder` is consulted;
    ``strict=True`` then refuses to fall back to the deterministic
    fake-feature path, so a misconfigured cluster fails loudly instead
    of producing md5 pseudo-features.
    """
    decoder = decoder or default_decoder()
    if decoder is None:
        if strict:
            raise NotImplementedError(
                "no media decoder available: install Pillow (images) or pass "
                "decoder=...; strict=False falls back to deterministic fake "
                "features for plumbing tests"
            )
        decoder = _fake_features

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "payload_bytes": [m["payload_bytes"] for m in pdf["meta"]],
                    "feature": [decoder(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(decode, schema=FEATURE_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n_bytes: int = 1000) -> DataFrame:
    """Deterministic 'frame sampling' stand-in for video payloads: emit one
    row per sampled byte offset. Shows the explode-shaped output plumbing a
    real frame sampler would use (one row per frame, offset + frame bytes).
    """
    n_frames = F.greatest(
        F.lit(1), (F.col("meta.payload_bytes") / every_n_bytes).cast("int")
    )
    offsets = F.sequence(F.lit(0), (n_frames - 1) * every_n_bytes, F.lit(every_n_bytes))
    return df.select(
        "doc_id",
        F.explode(offsets).alias("frame_offset"),
        F.col("meta.payload_bytes").alias("payload_bytes"),
    )


# ------------------------------------------------------------------ dedup


def binary_block_table(
    df: DataFrame, id_col: str, payload_col: str, block_bytes: int
) -> DataFrame:
    """(id, bh) DISTINCT block-hash rows: the payload split into fixed
    ``block_bytes`` chunks, each md5'd — all JVM built-ins (sequence/
    explode/substring/md5 — substring and md5 both operate natively on
    BinaryType), no UDF, no payload bytes past the map stage. Repeated
    blocks inside one payload count once (set semantics). Empty/null
    payloads yield no rows."""
    nblocks = F.ceil(F.octet_length(F.col(payload_col)) / F.lit(block_bytes)).cast("int")
    return (
        df.filter(F.octet_length(F.col(payload_col)) > 0)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), nblocks - 1)).alias("_bi"),
            F.col(payload_col),
        )
        .select(
            id_col,
            F.md5(
                F.expr(
                    f"substring({payload_col}, _bi * {block_bytes} + 1, {block_bytes})"
                )
            ).alias("bh"),
        )
        .dropDuplicates([id_col, "bh"])
    )


def binary_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    block_bytes: int = 32,
    threshold: float = 0.5,
    max_posting: int = 1000,
    observation=None,
) -> DataFrame:
    """Near-duplicate MULTIMODAL assets: Jaccard over fixed-size block
    hashes of the raw payload bytes — the content-defined-storage dedup
    model (two encodings of the same image/audio share most chunks;
    re-muxed or partially-corrupted copies share a prefix/suffix of
    blocks). This is the binary-column counterpart of the text family's
    MinHash path, built entirely from JVM expressions (no UDF anywhere:
    block hashing is sequence+substring+md5, discovery is an inverted
    index over block hashes).

    Same scale skeleton as ``dedup.minhash_dedup_pairs`` (round-3
    duplicate-mass-invariance design):

    - exact-copy collapse FIRST (md5 of the whole payload): the block
      stage and the pairwise discovery run once per DISTINCT payload;
      exact copies expand at the end at Θ(answer) cost, as 1.0-pairs
      that can never be lost to a posting cap;
    - discovery is an inverted-index join: only (rep_id, block_hash)
      rows shuffle, a posting list longer than ``max_posting`` distinct
      payloads is dropped (degenerate boilerplate blocks — a run of
      0x00 padding shared by half the corpus must not fan out
      quadratically), dropped mass is reported through ``observation``
      (same contract as the text banding paths), and in-posting pair
      expansion is bounded by max_posting²;
    - exact block-set Jaccard = shared / (|A| + |B| - shared) from the
      per-pair shared-block count plus two broadcast-size set-size
      joins — no re-scan of payloads.

    Fixed (non-content-defined) chunking means an INSERTION that shifts
    byte alignment breaks all downstream block matches — by design:
    this operator targets media/container payloads (aligned edits,
    truncations, metadata patches), not edit-distance text similarity,
    which the MinHash/SimHash/winnowing family owns. Null and empty
    payloads never pair cross-group; exact-copy groups of non-null
    payloads (including empty ones) still emit their within-group 1.0
    pairs.

    Returns (id_a, id_b, jaccard), id_a < id_b, jaccard ≥ threshold.
    """
    from bearly_spark.operators.dedup import _observe_bucket_drops

    # NULL payloads group under a NULL key (groupBy collects NULLs into
    # one group) — structurally distinct from every real byte string, so
    # no in-band sentinel value can ever collide with actual content
    # (review catch, round 6: md5(coalesce(p, b'\\x00null')) merged NULL
    # payloads with a real b'\\x00null' payload into one "exact" group)
    ckey = F.md5(F.col(payload_col))
    fpk = df.select(F.col(id_col), F.col(payload_col)).withColumn("_ckey", ckey)
    groups = (
        fpk.groupBy("_ckey")
        .agg(
            F.min(id_col).alias("_gid"),
            F.count(F.lit(1)).alias("_gsize"),
            F.first(payload_col).alias(payload_col),
        )
        .persist()
    )
    groups.count()  # pin eagerly: members join + block stage both consume it
    members = (
        fpk.select(F.col(id_col), "_ckey")
        .join(groups.select("_ckey", "_gid"), "_ckey")
        .select(F.col(id_col), "_gid")
    )
    reps = groups.filter(F.col(payload_col).isNotNull()).select(
        F.col("_gid").alias(id_col), F.col(payload_col)
    )

    blocks = binary_block_table(reps, id_col, payload_col, block_bytes).persist()
    blocks.count()  # consumed by sizes, postings, and the shared-count join
    sizes = blocks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))

    ids_sorted = F.array_sort(F.collect_list(id_col))
    postings = _observe_bucket_drops(
        blocks.groupBy("bh").agg(ids_sorted.alias("ids")),
        F.size("ids"),
        max_posting,
        observation,
    ).filter((F.size("ids") >= 2) & (F.size("ids") <= max_posting))
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    shared = (
        postings.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.id_a", "p.id_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    rep_pairs = (
        shared.join(sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_shared") / (F.col("_na") + F.col("_nb") - F.col("_shared")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )

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
        groups.filter((F.col("_gsize") >= 2) & F.col(payload_col).isNotNull())
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

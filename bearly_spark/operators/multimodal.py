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

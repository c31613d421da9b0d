"""Multimodal binary columns: ingest, decode/feature-extract, frame sampling.

Split from the original flat registry.py by tools/split_registry.py
(chunks keep original line order, so comments stay with their
statements and helpers precede their consumers).
"""

from __future__ import annotations

import datetime
import math
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bearly_spark.operators import dedup as D
from bearly_spark.operators import maintenance as MT
from bearly_spark.operators import multimodal as M
from bearly_spark.operators import relational as R
from bearly_spark.operators import rounding as _R
from bearly_spark.operators import similarity as S
from bearly_spark.operators import text as T
from bearly_spark.operators import windows as W
from bearly_spark.operators.aggregate import grouped_agg, sum_int64
from bearly_spark.producers import produce_array, produce_stream
from bearly_spark.sources.tables import events_with_timestamp, load_table

from bearly_spark.registry._core import ORACLE, QUERIES, register  # noqa: F401



# ===================================================================
# LLM-pipeline: multimodal columns
# ===================================================================


@register(
    "multimodal_ingest",
    oracle="""
    SELECT doc_id, 'text/plain' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def q_multimodal_ingest(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    p = M.attach_payload(d)
    return p.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.payload_bytes").cast("long").alias("payload_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
    )


# Oracle twin of the decode stub: feature i is md5-digest byte i (hex-pair
# -> int via a digit-lookup strpos), matching _fake_features exactly.
_HEXD = "'0123456789abcdef'"
_DECODE_FEATURES_SQL = ", ".join(
    f"CAST((strpos({_HEXD}, substr(md5(text), {2 * i + 1}, 1)) - 1) * 16"
    f" + (strpos({_HEXD}, substr(md5(text), {2 * i + 2}, 1)) - 1)"
    f" AS BIGINT) AS feature_{i}"
    for i in range(M.N_FEATURES)
)


@register(
    "multimodal_decode_features",
    oracle=f"""
    SELECT doc_id, 'text/plain' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           {_DECODE_FEATURES_SQL}
    FROM documents
    """,
)
def q_multimodal_decode(spark, sf_dir):
    """mapInPandas decode stub, surfaced in driver-hashable scalar form:
    the array<double> feature vector (kept for the pytest path — the
    harness canonicalizer cannot sort/hash list cells) is re-expressed as
    one exact byte-scaled long per dimension (feature*255 is the md5
    digest byte, so round() recovers the integer exactly — no float
    comparison risk)."""
    d = load_table(spark, sf_dir, "documents")
    # decoder pinned to the deterministic md5 stand-in: the payloads are
    # text/plain, not images, and the oracle mirrors exactly this function
    # — environment-installed codecs must not change the result
    feats = M.decode_features(M.attach_payload(d), decoder=M._fake_features)
    return feats.select(
        "doc_id",
        "modality",
        "payload_bytes",
        *[
            F.round(F.col("feature")[i] * 255).cast("long").alias(f"feature_{i}")
            for i in range(M.N_FEATURES)
        ],
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, unnest(range(0, GREATEST(1,
             CAST(FLOOR(octet_length(encode(text)) / 200.0) AS INTEGER)) * 200, 200))
           AS frame_offset,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
    FROM documents
    """,
)
def q_frame_sample(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = M.frame_sample_stub(M.attach_payload(d), every_n_bytes=200)
    return out.select(
        "doc_id",
        F.col("frame_offset").cast("long").alias("frame_offset"),
        F.col("payload_bytes").cast("long").alias("payload_bytes"),
    )

"""bearly-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of WillAyd/bearly, re-expressed Spark-first.

The reference (``/root/reference/src/bearly/bearly_ext.cc``) is an
Arrow-native columnar kernel exposing three functions: ``sum``,
``produce_array`` and ``produce_stream``.  This package supplies that exact
surface (with bit-for-bit semantics, see ``operators.aggregate.sum_int64``)
plus the full relational + LLM-data-pipeline operator set mandated by the
project brief, all built on the Spark DataFrame API so Catalyst/Tungsten
handle optimization, partitioning and scale.

Public surface
--------------
- :func:`bearly_spark.session.get_spark` — tuned SparkSession factory
- :func:`bearly_spark.interchange.from_arrow` / ``to_arrow`` — Arrow
  C-stream ingest/egress (reference O1/O5)
- :func:`bearly_spark.producers.produce_array` / ``produce_stream`` —
  literal producers (reference O6/O7)
- :func:`bearly_spark.operators.aggregate.sum_int64` — the reference's
  flagship operator (O2+O3+O4)
- ``bearly_spark.operators.*`` — relational, window, dedup, similarity,
  text, multimodal operator families
- ``bearly_spark.streaming`` — Structured Streaming view of the events table
- ``bearly_spark.registry`` — the (queries, oracle_sql) contract surface
"""

from bearly_spark.session import get_spark  # noqa: F401
from bearly_spark.interchange import from_arrow, to_arrow  # noqa: F401
from bearly_spark.producers import produce_array, produce_stream  # noqa: F401
from bearly_spark.operators.aggregate import sum_int64  # noqa: F401

__all__ = [
    "get_spark",
    "from_arrow",
    "to_arrow",
    "produce_array",
    "produce_stream",
    "sum_int64",
]

__version__ = "0.1.0"

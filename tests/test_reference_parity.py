"""Golden ports of the reference's three tests
(/root/reference/tests/test_bearly.py) plus the §2.1 semantic-pinning
cases from SURVEY.md — identical inputs and expected outputs, expressed
against the bearly_spark API and asserted via Arrow equality.
"""

import pyarrow as pa
import pytest
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from bearly_spark import from_arrow, produce_array, produce_stream, sum_int64, to_arrow
from bearly_spark.interchange import to_arrow_capsule
from bearly_spark.operators.aggregate import NoSummableColumnsError


def _nullable(table: pa.Table) -> pa.Table:
    """Normalize nullability flags: bearly's capsule exports mark all
    fields nullable (nanoarrow default), while Spark's coalesce() proves
    sum outputs non-null statically — a strictly stronger schema. Values
    and types must still match exactly."""
    return table.cast(
        pa.schema([pa.field(f.name, f.type, nullable=True) for f in table.schema])
    )


def test_produce_array(spark):
    # reference: tests/test_bearly.py:6-10
    result = to_arrow(produce_array(spark))
    expected = pa.table({"awesome_numbers": pa.array([42, 555, None], type=pa.int64())})
    assert result == expected


def test_produce_stream(spark):
    # reference: tests/test_bearly.py:12-21
    result = to_arrow(produce_stream(spark))
    expected = pa.Table.from_pydict(
        {
            "column0": pa.array([42, 84, None], type=pa.int32()),
            "column1": pa.array([555, 1110, None], type=pa.int64()),
        }
    )
    assert result == expected


def test_sum(spark):
    # reference: tests/test_bearly.py:23-39 — the flagship golden test.
    tbl = pa.Table.from_pydict(
        {
            "col0": [1, 2, None],
            "col1": [3, None, 4],
            "col2": ["foo", "bar", "baz"],
        }
    )
    result = _nullable(to_arrow(sum_int64(from_arrow(spark, tbl))))
    expected = pa.Table.from_pydict({"col0": [3], "col1": [7]})
    assert result == expected


def test_sum_capsule_roundtrip(spark):
    """The egress shape of bearly.sum is an Arrow stream capsule
    (bearly_ext.cc:108-110); ours round-trips through the same protocol."""
    tbl = pa.Table.from_pydict({"col0": [1, 2, None]})
    capsule = to_arrow_capsule(sum_int64(from_arrow(spark, tbl)))
    result = _nullable(pa.RecordBatchReader._import_from_c_capsule(capsule).read_all())
    assert result == pa.Table.from_pydict({"col0": [3]})


# ---- §2.1 semantic pins (FIXTURES.md A4) ----


def test_all_null_column_sums_to_zero(spark):
    # §2.1(1): value_or(0) — all-null column sums to 0, not NULL.
    df = spark.createDataFrame(
        [(None,), (None,)], StructType([StructField("x", LongType())])
    )
    assert _nullable(to_arrow(sum_int64(df))) == pa.Table.from_pydict(
        {"x": pa.array([0], type=pa.int64())}
    )


def test_empty_input_yields_one_row_of_zeros(spark):
    # §2.1(2): accumulators init to 0; one output row unconditionally.
    df = spark.createDataFrame([], StructType([StructField("x", LongType())]))
    assert _nullable(to_arrow(sum_int64(df))) == pa.Table.from_pydict(
        {"x": pa.array([0], type=pa.int64())}
    )


def test_int32_columns_dropped_not_upcast(spark):
    # §2.1(3): strict int64 gating — int32 silently dropped.
    schema = StructType(
        [StructField("i32", IntegerType()), StructField("i64", LongType())]
    )
    df = spark.createDataFrame([(1, 10), (2, 20)], schema)
    result = _nullable(to_arrow(sum_int64(df)))
    assert result.column_names == ["i64"]
    assert result == pa.table({"i64": pa.array([30], type=pa.int64())})


def test_no_int64_columns_raises(spark):
    # §2.1(5): pinned degenerate behavior (Spark has no 0-column rows).
    df = spark.createDataFrame(
        [("a", 1)],
        StructType([StructField("s", StringType()), StructField("i", IntegerType())]),
    )
    with pytest.raises(NoSummableColumnsError):
        sum_int64(df)


def test_column_order_and_names_preserved(spark):
    # §2.1(4): output keeps input order among kept columns, names unchanged.
    schema = StructType(
        [
            StructField("z_last", LongType()),
            StructField("m_mid", StringType()),
            StructField("a_first", LongType()),
        ]
    )
    df = spark.createDataFrame([(1, "x", 2)], schema)
    assert to_arrow(sum_int64(df)).column_names == ["z_last", "a_first"]


def test_sum_accepts_any_arrow_stream_capsule_producer(spark):
    """The reference's ingest contract is the Arrow PyCapsule STREAM
    protocol, not a pyarrow type check (`bearly_ext.cc:10-18` calls
    obj.__arrow_c_stream__() on whatever it gets). A minimal foreign
    object exposing ONLY that dunder must flow through from_arrow ->
    sum_int64 with bearly's golden result."""
    import pyarrow as pa

    from bearly_spark.interchange import from_arrow, to_arrow
    from bearly_spark.operators.aggregate import sum_int64

    golden = pa.table(
        {
            "col0": pa.array([1, 2], type=pa.int64()),
            "col1": pa.array([3, 4, None], type=pa.int64()).slice(0, 2),
            "skip": pa.array(["x", "y"]),
        }
    )

    class ForeignProducer:
        """Only the protocol — no pyarrow inheritance, no other methods."""

        def __init__(self, table):
            self._t = table

        def __arrow_c_stream__(self, requested_schema=None):
            return self._t.__arrow_c_stream__(requested_schema)

    df = from_arrow(spark, ForeignProducer(golden))
    out = to_arrow(sum_int64(df))
    assert out.column("col0").to_pylist() == [3]
    assert out.column("col1").to_pylist() == [7]
    assert out.column_names == ["col0", "col1"]

"""Round-11 emission-surface contract (r10 verdict #1/#2/#6).

The driver's result hasher diverges on DATE/DECIMAL/array OUTPUT
columns even when values are exactly equal (the r10 decision table:
four hash-reds, each judge-verified value-equal), and its canonical
sort crashes outright on array cells. These tests pin

- the type LINT: no compared registry query may emit a
  driver-divergent output type unless allowlisted with driver-green
  evidence (the full-registry sweep runs inside the oracle gate —
  ``tools/check_oracle.py::risky_fields`` — this file pins the
  classifier itself);
- the kmeans ``inertia`` BIGINT emission and its overflow GUARD
  (verdict #6): the exact decimal sum is emitted as int64 with a
  raise-not-wrap bound check;
- the retired r10 EWMA bisect probe surface (verdict #3): kept as a
  pytest reference — Spark and DuckDB produce exactly equal values on
  the (priority, day DATE, revenue DECIMAL(18,2)) surface that the
  DRIVER hashes differently, which is the whole point of the probes.
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import pyspark.sql.functions as F
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)


def test_risky_fields_classifier(spark):
    from check_oracle import risky_fields

    df = spark.range(1).select(
        F.lit(1).alias("i"),
        F.lit(1.5).alias("d"),
        F.lit("s").alias("s"),
        F.lit(True).alias("b"),
        F.lit("2020-01-01").cast("date").alias("day"),
        F.lit("1.50").cast("decimal(18,2)").alias("dec"),
        F.array(F.lit(1)).alias("arr"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
        F.struct(F.lit("2020-01-01").cast("date").alias("inner")).alias("st"),
        F.current_timestamp().alias("ts"),
    )
    assert risky_fields(df.schema) == ["day", "dec", "arr", "m", "st", "ts"]


def test_registry_prefix_risky_types_allowlisted():
    """Static cross-check: the deliberate single-type probes ARE on the
    allowlist (so the gate lets them through) and the retired r10
    probes are OUT of the registry (verdict #3)."""
    from check_oracle import RISKY_TYPE_ALLOWLIST

    from bearly_spark.registry import QUERIES

    assert {"ewma_probe_date", "ewma_probe_decimal"} <= RISKY_TYPE_ALLOWLIST
    assert {"ewma_probe_base", "ewma_probe_lag", "ewma_probe_full"}.isdisjoint(
        QUERIES
    )
    assert RISKY_TYPE_ALLOWLIST <= set(QUERIES)


def test_kmeans_inertia_bigint_and_guard(spark):
    from bearly_spark.operators import clustering as C

    # two clusters around fixed centroids; inertia well inside int64
    cents = [[0, 0], [1000000, 0]]
    df = spark.createDataFrame(
        [(0, [0.1, 0.0]), (1, [0.2, 0.0]), (2, [0.9, 0.0]), (3, [1.1, 0.0])],
        "vec_id long, embedding array<float>",
    )
    prof = C.kmeans_cluster_profile(df, centroids=cents)
    assert dict(prof.dtypes)["inertia"] == "bigint"
    rows = {r.cluster: (r.n_vecs, r.inertia) for r in prof.collect()}
    assert rows[0][0] == 2 and rows[1][0] == 2
    # exact integer bound: each dist <= dim * (2 * QUANT_SCALE)^2
    assert all(0 < inertia < 2 * (2 * C.QUANT_SCALE) ** 2 * 2
               for _, inertia in rows.values())

    # the guard: a sum past int64 must RAISE, never wrap. Route the
    # same emission expression over a planted decimal that exceeds the
    # bound (driving >2^63 through the quantized kernel itself would
    # need ~1e5x the auto-k cell occupancy — the docstring bound).
    from pyspark.errors import PySparkException

    big = spark.createDataFrame(
        [(0, Decimal(2**63))], "cluster int, _inertia_dec decimal(38,0)"
    )
    guarded = big.select(
        F.when(
            F.col("_inertia_dec") <= F.lit(9223372036854775807),
            F.col("_inertia_dec").cast("long"),
        )
        .otherwise(F.raise_error(F.lit("kmeans inertia exceeds int64")))
        .alias("inertia")
    )
    with pytest.raises(PySparkException, match="exceeds int64"):
        guarded.collect()


def test_retired_ewma_probe_base_reference(spark, sf_dir):
    """The retired probe-1 surface stays value-equal across engines
    (its r10 driver RED is an emission divergence, not a value bug)."""
    import duckdb

    from bearly_spark.registry.windows_q import (
        EWMA_PROBE_BASE_SQL,
        ewma_probe_base,
    )

    got = {
        (r.priority, r.day.isoformat()): r.revenue
        for r in ewma_probe_base(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    want = {
        (p, d.isoformat()): rev
        for p, d, rev in con.sql(EWMA_PROBE_BASE_SQL).fetchall()
    }
    assert len(got) > 1000
    assert got == want

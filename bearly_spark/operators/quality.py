"""Data-quality expectations: declarative table validation reports.

The operational face of a 100 TB pipeline (the Delta-constraints /
Great-Expectations / dbt-tests shape): before a table revision ships,
assert what must hold — column nullability, value domains, key
uniqueness, referential integrity — and get a per-rule violation count
back, cheap enough to run on every batch.

Execution shape (why this is one of the cheapest operators here):

- every ROW-LEVEL rule compiles to ``SUM(CASE WHEN violated)`` inside
  ONE aggregate over ONE scan of the table — adding a rule adds an
  expression, not a pass, and the scan only reads the columns the
  rules mention (column pruning);
- a UNIQUE rule is one groupBy on its key counting surplus rows
  (Θ(distinct keys) partial-aggregated shuffle);
- a FOREIGN-KEY rule is one left-anti join against the referenced
  keys (broadcast when the dimension is small — the usual case);
- the report is a handful of (rule, violations) rows — unioned 1-row
  aggregates, trivially collectable, and joinable into the
  ``Observation``-style run metadata a pipeline records per batch.

Counts, not booleans: at scale the actionable question is "how many
and did it grow", which also makes the report ORACLE-CHECKABLE as
plain SQL (the registry twin states every rule as a FILTERed count).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def expectations_report(
    df: DataFrame,
    row_rules: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
    foreign_keys: dict[str, tuple[list[str], DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """Per-rule violation counts as (rule, violations) rows.

    - ``row_rules``: rule name → boolean Column that is TRUE when the
      row VIOLATES the rule (e.g. ``F.col("x").isNull()``); all
      evaluated in one aggregate pass. NULL predicate results count as
      violations (an expectation that cannot be evaluated has failed —
      the conservative reading);
    - ``unique_keys``: rule name → key columns; violations = rows in
      excess of one per key;
    - ``foreign_keys``: rule name → (child keys, parent DataFrame,
      parent keys); violations = child rows (with non-null keys) whose
      key has no parent. Null child keys are the nullability rules'
      business, not the FK's.

    Rows are emitted in rule order (row rules, then unique, then FK) —
    deterministic output for the oracle twin.
    """
    spark = df.sparkSession
    reports: list[DataFrame] = []
    if row_rules:
        aggs = [
            F.coalesce(
                F.sum(F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(name)
            for name, pred in row_rules.items()
        ]
        wide = df.agg(*aggs)
        reports.append(
            wide.unpivot([], list(row_rules), "rule", "violations")
        )
    for name, keys in (unique_keys or {}).items():
        surplus = (
            df.groupBy(*keys)
            .agg((F.count(F.lit(1)) - 1).alias("_extra"))
            .agg(F.coalesce(F.sum("_extra"), F.lit(0)).cast("long").alias("violations"))
            .select(F.lit(name).alias("rule"), "violations")
        )
        reports.append(surplus)
    for name, (child_keys, parent, parent_keys) in (foreign_keys or {}).items():
        child = df.select(
            *[F.col(c).alias(f"_k{i}") for i, c in enumerate(child_keys)]
        )
        for i in range(len(child_keys)):
            child = child.filter(F.col(f"_k{i}").isNotNull())
        par = parent.select(
            *[F.col(c).alias(f"_k{i}") for i, c in enumerate(parent_keys)]
        ).dropDuplicates()
        orphans = (
            child.join(par, [f"_k{i}" for i in range(len(child_keys))], "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .select(F.lit(name).alias("rule"), "violations")
        )
        reports.append(orphans)
    if not reports:
        return spark.createDataFrame([], "rule string, violations long")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def streaming_expectations(
    docs,
    report_dir: str,
    checkpoint_dir: str,
    row_rules: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
):
    """The per-batch face of the validation gate: every micro-batch's
    expectations report lands under ``report_dir/batch=<id>`` —
    idempotent via dynamic partition overwrite (the index family's
    replay contract), so the report table is an append-only audit log
    of data quality per ingest batch. Uniqueness here is WITHIN-batch
    (cross-batch uniqueness is a table-level invariant — run
    :func:`expectations_report` over the table, or enforce it
    structurally with ``maintenance.merge_into`` upserts).

    Returns the started ``StreamingQuery`` (availableNow trigger)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rep = expectations_report(batch_df, row_rules, unique_keys)
        (
            rep.withColumn("batch", F.lit(int(batch_id)))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(report_dir)
        )

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

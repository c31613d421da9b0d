"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and (where present) its
``oracle_sql()`` twin on DuckDB over the same parquet fixture dir, then
compares row count, column names, and exact (order-insensitive) values —
a stricter check than the driver's value-hash, so passing here implies
hash-matching there.

Round 11 (verdict #2): the gate previously normalized Decimal->float /
date->isoformat / list->tuple before comparing, which is exactly the
class the DRIVER's hasher diverges on (r10: 4 hash-reds with
judge-verified equal values, all DATE/DECIMAL/array output columns) —
so the builder's gate could never see it. The gate now
  (a) LINTS each compared query's Spark schema: DATE / TIMESTAMP /
      DECIMAL / ARRAY / MAP output columns FAIL unless the query is on
      the driver-green allowlist below, and
  (b) compares RAW python values (no representation normalization)
      for every non-allowlisted query; allowlisted queries keep the
      old normalized compare (their cross-engine representations
      legitimately differ — e.g. DuckDB fetches small DECIMALs as
      float, Spark as decimal.Decimal).

Round 12 (verdict #1): the r11 lint only checked the SPARK half, so
three seats went driver-red with value-equal rows because the DUCKDB
twin emitted uncast ``SUM(int)`` -> HUGEINT, which pandas converts to
float64 while Spark emits int64 — dtype-divergent frames hash apart.
The gate now also
  (c) LINTS the DuckDB twin's result types (``rel.types`` — same
      signal as ``DESCRIBE SELECT * FROM (<oracle>) LIMIT 0``):
      HUGEINT / DECIMAL / DATE / TIMESTAMP / list / struct / map FAIL
      outside the allowlist. The judge's r11 sweep of all 230 twins
      with exactly this check flagged the 3 reds plus the one latent
      never-seated surface (vocab_oov) and nothing else.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

#: Queries allowed to emit DATE/TIMESTAMP/DECIMAL/ARRAY/MAP output
#: columns: each has direct driver-green evidence for its risky type
#: (CORRECTNESS_r10.json) or IS a deliberate single-type probe of the
#: driver's hasher (registry/windows_q.py round-11 probe block).
RISKY_TYPE_ALLOWLIST = {
    "q3_shipping_priority",   # TIMESTAMP — driver-green historically
    "seasonality_orders",     # DECIMAL(28,2) — driver-green r10
    "active_users_events",    # DATE — driver-green r10
    "ewma_probe_date",        # deliberate DATE probe (r11)
    "ewma_probe_decimal",     # deliberate DECIMAL(18,2) probe (r11)
}


def risky_fields(schema) -> list[str]:
    """Names of top-level output columns whose type the driver's result
    hasher has diverged on (r10): date/timestamp/decimal/array/map,
    at any nesting depth."""
    from pyspark.sql import types as T

    def risky(dt) -> bool:
        if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType,
                           T.DecimalType, T.MapType)):
            return True
        if isinstance(dt, T.ArrayType):
            return True
        if isinstance(dt, T.StructType):
            return any(risky(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in schema.fields if risky(f.dataType)]


#: DuckDB result types whose pandas conversion diverges from the Spark
#: dtype even when values are equal (HUGEINT/DECIMAL -> float64/object,
#: DATE/TIMESTAMP -> datetime64, nested -> object-of-list, which crashes
#: the driver's sort_values). Matched as substrings of str(rel.types[i])
#: so parameterized forms (DECIMAL(18,2), VARCHAR[]) are caught too.
_DUCK_RISKY = (
    "HUGEINT", "DECIMAL", "DATE", "TIMESTAMP", "STRUCT", "MAP(", "[]",
)


def duck_risky_fields(cols, types) -> list[str]:
    """Names of DuckDB twin output columns whose fetched type the
    driver's pandas-based hasher diverges on (round-12 gate half:
    the r11 reds were all value-equal HUGEINT surfaces)."""
    out = []
    for name, t in zip(cols, types):
        ts = str(t).upper()
        if any(tok in ts for tok in _DUCK_RISKY):
            out.append(f"{name}:{ts}")
    return out


def _norm_cell(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _strict_cell(v):
    # representation-preserving: only NaN is canonicalized (NaN != NaN
    # would defeat the row sort); every Decimal/date/list reaching this
    # path is a lint bug upstream
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _norm_rows(cols, rows, strict: bool = False):
    cell = _strict_cell if strict else _norm_cell
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def run(sf_dir: str, only: list[str] | None = None) -> int:
    import duckdb

    # lazy oracles (e.g. the IVF twin's k-means fit) read their fixture
    # from this env var; point them at the dir being checked
    os.environ["BEARLY_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod
    from bearly_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        bad_types = risky_fields(df.schema)
        if bad_types and name not in RISKY_TYPE_ALLOWLIST:
            print(
                f"FAIL {name}: driver-divergent output types on "
                f"{bad_types} (emit int/double/string/bool surfaces, "
                f"or allowlist with driver-green evidence)"
            )
            failures += 1
            continue
        if name not in oracles:
            status = "rows-only"
            print(f"ok   {name}: {len(s_rows)} rows ({status})")
            if len(s_rows) == 0:
                print(f"WARN {name}: empty result (weak signal)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = rel.columns
            d_types = rel.types
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        bad_duck = duck_risky_fields(d_cols, d_types)
        if bad_duck and name not in RISKY_TYPE_ALLOWLIST:
            print(
                f"FAIL {name}: driver-divergent ORACLE result types on "
                f"{bad_duck} (CAST to BIGINT/DOUBLE/VARCHAR in the "
                f"twin's final SELECT, or allowlist with driver-green "
                f"evidence)"
            )
            failures += 1
            continue
        strict = name not in RISKY_TYPE_ALLOWLIST
        sc, sr = _norm_rows(s_cols, s_rows, strict=strict)
        dc, dr = _norm_rows(d_cols, d_rows, strict=strict)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            failures += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            failures += 1
            continue
        if sr != dr:
            bad = sum(1 for a, b in zip(sr, dr) if a != b)
            print(f"FAIL {name}: {bad}/{len(sr)} rows differ")
            for a, b in list(zip(sr, dr))[:200]:
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
            failures += 1
            continue
        print(f"ok   {name}: {len(sr)} rows match exactly")
        if len(sr) == 0:
            print(f"WARN {name}: empty result (vacuous match)")
    print(f"\n{'PASS' if failures == 0 else 'FAIL'}: {failures} failures")
    return failures


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or None
    raise SystemExit(1 if run(sf_dir, only) else 0)

"""Registry core: the QUERIES/ORACLE dicts and the @register decorator."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
#: name -> DuckDB SQL twin, or a zero-arg callable producing one (lazy
#: oracles whose constants derive from fixture data — e.g. the IVF twin
#: runs the seeded k-means fit at oracle_sql() time).
ORACLE: dict[str, str | Callable[[], str]] = {}


def register(name: str, oracle: str | Callable[[], str] | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco

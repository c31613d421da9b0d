"""Rounding-midpoint proximity audit over every plain-ROUND oracle twin.

Why: round 6's one driver correctness failure (`ewma_revenue_priority`)
was a quotient landing within 1e-9 of a 6dp rounding midpoint, where
Spark's ROUND (half-up on the shortest-decimal repr) and DuckDB's ROUND
(on the binary value, version-dependent) disagree. Any of the other
plain-`ROUND` twin sites can hit the same class on a future fixture
regeneration or DuckDB upgrade. This probe makes the exposure
measurable: for each twin whose SQL uses `ROUND(`, it rewrites every
`ROUND(expr, d)` into

    CASE WHEN typeof(expr) NOT LIKE 'DECIMAL%'    -- decimal ROUND is
                                                  -- exact in both engines
          AND ABS(x*10^d - FLOOR(x*10^d) - 0.5) < 1e-9
         THEN ERROR('MIDPOINT')                   -- loud, per-row
         ELSE ROUND(expr, d) END

(the rewrite is innermost-first so nested ROUNDs are each probed) and
runs the instrumented twin in DuckDB over the fixture dir. Semantics
are otherwise unchanged, so a clean run means "this twin has zero
midpoint-adjacent rows at this sf" — and a hit names the query so the
site can be converted to the cross-engine floor form
``floor(x*10^d + 0.5)/10^d`` (the `personalized_pagerank` /
`windows.ewma` pattern).

Round 8 closed the probe's floor-form blind spot: a twin already
converted to ``FLOOR(x*10^d + 0.5)/10^d`` was previously skipped
("probed 0 ROUND twins" on ewma — the one query that then failed in the
driver's env, where the pre-floor argument landed EXACTLY on an integer
with a 1-ulp cross-build neighbor). Every ``FLOOR(... + 0.5)`` site is
now also instrumented: rows where the floor argument ``y`` sits within
``4·ulp(y)`` of ANY integer raise the same loud per-row ERROR. A hit
means a 1-ulp engine/build difference in computing ``y`` would flip the
emitted decimal — the site must move to exact-integer emission (the
``windows.ewma`` scaled-DECIMAL pattern), not merely to floor-form.

Usage: PYTHONPATH=. python tools/round_midpoint_probe.py [sf_dir] [query ...]

Run once per fixture scale (the IVF twin's lazy k-means fit reads
BEARLY_ORACLE_SF_DIR at import time):

    PYTHONPATH=. python tools/round_midpoint_probe.py /root/testdata/sf0.01
    PYTHONPATH=. python tools/round_midpoint_probe.py /root/testdata/sf0.1

Exit 0 = zero at-risk rows across all probed twins.
"""

from __future__ import annotations

import os
import re
import sys

_ROUND = re.compile(r"(?<![A-Za-z_0-9])ROUND\s*\(", re.IGNORECASE)


def _balanced_end(sql: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError(f"unbalanced parens at {open_idx}")


def _split_top(args: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for c in args:
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    parts.append("".join(cur))
    return [p.strip() for p in parts]


def instrument(sql: str) -> str:
    """Wrap every ROUND(expr[, d]) in the midpoint-error probe,
    innermost-first (already-instrumented sites use the __RND__
    placeholder so they are not re-matched)."""
    site = 0
    while True:
        matches = list(_ROUND.finditer(sql))
        if not matches:
            break
        chosen = None
        for m in matches:
            open_idx = sql.index("(", m.start())
            end = _balanced_end(sql, open_idx)
            if not _ROUND.search(sql[open_idx + 1 : end]):
                chosen = (m, open_idx, end)
                break
        m, open_idx, end = chosen
        args = _split_top(sql[open_idx + 1 : end])
        e = args[0]
        d = args[1] if len(args) > 1 else "0"
        site += 1
        tag = re.sub(r"\s+", " ", e)[:60].replace("'", "")
        x = f"CAST(({e}) AS DOUBLE) * POW(10.0, ({d}))"
        repl = (
            f"CASE WHEN typeof({e}) NOT LIKE 'DECIMAL%' AND "
            f"ABS({x} - FLOOR({x}) - 0.5) < 1e-9 "
            f"THEN ERROR('MIDPOINT site {site} d={d}: {tag}') "
            f"ELSE __RND__(({e}), ({d})) END"
        )
        sql = sql[: m.start()] + repl + sql[end + 1 :]
    return sql.replace("__RND__(", "ROUND(")


_FLOOR = re.compile(r"(?<![A-Za-z_0-9])FLOOR\s*\(", re.IGNORECASE)
# top-level "... + 0.5" tail marks the half-up rounding form (plain
# bucketing FLOORs — FLOOR(x/2048) etc. — are exact by construction
# and are left alone)
_HALF_TAIL = re.compile(r"\+\s*0?\.5\s*$")


def instrument_floor(sql: str) -> str:
    """Wrap every half-up-form FLOOR(x*scale + 0.5) in an
    integer-boundary proximity probe: ERROR when the argument lies
    within 4 ulps of ANY integer (where a 1-ulp cross-build difference
    in computing the argument flips the floor), innermost-first."""
    site = 0
    while True:
        chosen = None
        for m in _FLOOR.finditer(sql):
            open_idx = sql.index("(", m.start())
            end = _balanced_end(sql, open_idx)
            inner = sql[open_idx + 1 : end]
            if _FLOOR.search(inner):
                continue  # handle the innermost site of this nest first
            chosen = (m, inner, end)
            if _HALF_TAIL.search(inner.strip()):
                break
        if chosen is None:
            break
        m, inner, end = chosen
        if not _HALF_TAIL.search(inner.strip()):
            # bucketing FLOOR (no "+ 0.5" tail): exact by construction,
            # mark done without a probe
            sql = sql[: m.start()] + "__FLR__(" + inner + ")" + sql[end + 1 :]
            continue
        site += 1
        tag = re.sub(r"\s+", " ", inner)[:60].replace("'", "")
        y = f"CAST(({inner}) AS DOUBLE)"
        repl = (
            f"CASE WHEN ABS({y} - ROUND({y})) <= "
            f"4 * GREATEST(ABS({y}), 1.0) * 2.220446049250313e-16 "
            f"THEN ERROR('MIDPOINT floor-site {site}: {tag}') "
            f"ELSE __FLR__(({inner})) END"
        )
        sql = sql[: m.start()] + repl + sql[end + 1 :]
    return sql.replace("__FLR__(", "FLOOR(")


def run(sf_dir: str, only: list[str] | None = None) -> int:
    import duckdb

    os.environ["BEARLY_ORACLE_SF_DIR"] = sf_dir
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    at_risk, errored, probed, skipped = [], [], 0, 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        has_round = bool(_ROUND.search(sql))
        has_floor = any(
            _HALF_TAIL.search(
                sql[m.start() :][
                    sql[m.start() :].index("(") + 1 :
                    _balanced_end(sql[m.start() :], sql[m.start() :].index("("))
                ].strip()
            )
            for m in _FLOOR.finditer(sql)
        )
        if not has_round and not has_floor:
            skipped += 1
            continue
        probed += 1
        try:
            # ROUND sites first (their probe text adds bucketing FLOORs,
            # which the floor pass leaves alone); half-up FLOOR sites
            # second (their probe text adds ROUNDs, no further pass)
            con.sql(instrument_floor(instrument(sql))).fetchall()
            print(f"ok   {name}: 0 midpoint-adjacent rows")
        except Exception as exc:  # noqa: BLE001
            if "MIDPOINT" in str(exc):
                at_risk.append(name)
                detail = str(exc).split("MIDPOINT", 1)[1].strip()
                print(f"RISK {name}: midpoint-adjacent row — {detail}")
            else:
                errored.append(name)
                print(f"ERR  {name}: probe rewrite failed: {exc}")
    print(
        f"\nprobed {probed} ROUND/floor-form twins "
        f"({skipped} with neither skipped): "
        f"{len(at_risk)} at-risk, {len(errored)} probe errors"
    )
    if at_risk:
        print("at-risk (convert to floor-form):", ", ".join(at_risk))
    if errored:
        print("probe errors (inspect manually):", ", ".join(errored))
    return len(at_risk) + len(errored)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(1 if run(sf, sys.argv[2:] or None) else 0)

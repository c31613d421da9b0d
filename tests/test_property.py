"""Property-based tests (hypothesis) for the semantics most likely to hide
edge bugs: the reference sum contract and the temporal joins. Each example
runs real Spark jobs, so example counts are deliberately small."""

from hypothesis import HealthCheck, given, settings, strategies as st

import pyarrow as pa

from bearly_spark import from_arrow, sum_int64, to_arrow
from bearly_spark.operators import relational as R

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_i64 = st.lists(st.one_of(st.none(), st.integers(-(2**40), 2**40)), min_size=0, max_size=8)
_str = st.lists(st.one_of(st.none(), st.text(max_size=5)), min_size=0, max_size=8)


@given(col_a=_i64, col_b=_i64, col_s=_str)
@settings(**_SETTINGS)
def test_sum_int64_matches_null_as_zero_reference(spark, col_a, col_b, col_s):
    """Reference contract (bearly_ext.cc:26-90): sum only int64 columns,
    nulls count as 0, always exactly one row, names/order preserved."""
    n = max(len(col_a), len(col_b), len(col_s))
    pad = lambda xs: xs + [None] * (n - len(xs))  # noqa: E731
    table = pa.table(
        {
            "a": pa.array(pad(col_a), type=pa.int64()),
            "s": pa.array(pad(col_s), type=pa.string()),
            "b": pa.array(pad(col_b), type=pa.int64()),
        }
    )
    got = to_arrow(sum_int64(from_arrow(spark, table)))
    assert got.column_names == ["a", "b"]  # string dropped, order kept
    assert got.num_rows == 1
    assert got.column("a")[0].as_py() == sum(x or 0 for x in pad(col_a))
    assert got.column("b")[0].as_py() == sum(x or 0 for x in pad(col_b))


_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12
)


@given(lefts=_events, rights=_events)
@settings(**_SETTINGS)
def test_asof_join_matches_naive_reference(spark, lefts, rights):
    """asof_join == per-row 'latest right with ts<=left ts, max value on
    ties' over arbitrary key/ts data (including duplicate timestamps)."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], ["k", "ts", "lid"]
    )
    rdf = spark.createDataFrame(
        [(k, t, 1000 + i) for i, (k, t) in enumerate(rights)], ["k", "ts", "val"]
    )
    got = {
        r.lid: r.asof_val
        for r in R.asof_join(
            ldf, rdf, key="k", left_ts="ts", right_ts="ts", value_cols=["val"]
        ).collect()
    }
    for i, (k, t) in enumerate(lefts):
        cands = [1000 + j for j, (rk, rt) in enumerate(rights) if rk == k and rt <= t]
        want = max(
            cands,
            key=lambda v: (rights[v - 1000][1], v),  # latest ts, then max val
            default=None,
        )
        assert got[i] == want, (i, k, t, got[i], want)


@given(lefts=_events, rights=_events, span=st.integers(1, 20))
@settings(**_SETTINGS)
def test_interval_join_matches_brute_filter(spark, lefts, rights, span):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], ["k", "ts", "lid"]
    )
    rdf = spark.createDataFrame(
        [(k, t, 1000 + i) for i, (k, t) in enumerate(rights)], ["k", "ts", "rid"]
    )
    got = {
        (r.lid, r.rid)
        for r in R.interval_join(
            ldf, rdf, key="k", left_ts="ts", right_ts="ts",
            lower_offset=0, upper_offset=span,
        ).select("l.lid", "r.rid").collect()
    }
    want = {
        (i, 1000 + j)
        for i, (lk, lt) in enumerate(lefts)
        for j, (rk, rt) in enumerate(rights)
        if lk == rk and lt < rt <= lt + span
    }
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """dedup.connected_components must agree with a driver-side union-find
    on arbitrary small graphs (same partition of nodes AND the same
    min-id component labels)."""
    from bearly_spark.operators.dedup import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df, "src", "dst").collect()}
    assert got == want


@given(
    a_words=st.lists(st.sampled_from("abcdefghij"), min_size=4, max_size=30),
    b_words=st.lists(st.sampled_from("abcdefghij"), min_size=4, max_size=30),
)
@settings(**_SETTINGS)
def test_minhash_signature_estimates_jaccard(a_words, b_words):
    """The MinHash kernel's signature-agreement fraction must estimate the
    exact shingle Jaccard within the 64-hash binomial error (±0.3 is >4σ)
    — driver-side property over the numpy kernel, no Spark round trip."""
    import numpy as np

    from bearly_spark.operators.dedup import _hashed_shingles, _perm_params

    ta, tb = " ".join(a_words), " ".join(b_words)
    sa, sb = set(_hashed_shingles(ta, 3).tolist()), set(_hashed_shingles(tb, 3).tolist())
    if not sa or not sb:
        return
    true_j = len(sa & sb) / len(sa | sb)

    A, B = _perm_params(64)

    def sig(hs):
        # the production kernel's formula: h*a + b over Z_2^64 wraparound
        hv = np.asarray(sorted(hs), dtype=np.uint64)
        return (hv[:, None] * A[None, :] + B[None, :]).min(axis=0)

    est = float((sig(sa) == sig(sb)).mean())
    assert abs(est - true_j) <= 0.3, (true_j, est)


@given(
    prefix_a=st.text(alphabet="abcdefg ", max_size=60),
    prefix_b=st.text(alphabet="hijklmn ", max_size=60),
    shared=st.text(alphabet="opqrstu ", min_size=23, max_size=80),
    suffix_a=st.text(alphabet="abcdefg ", max_size=60),
    suffix_b=st.text(alphabet="hijklmn ", max_size=60),
)
@settings(max_examples=150, deadline=None)
def test_winnowing_detection_guarantee(prefix_a, prefix_b, shared, suffix_a, suffix_b):
    """The MOSS winnowing guarantee: two documents sharing ANY substring
    of length >= k + window - 1 (23 at k=16, w=8) must share at least one
    fingerprint — regardless of what surrounds the shared passage. The
    disjoint alphabets make the shared passage the only common
    material."""
    from bearly_spark.operators.dedup import winnow_text

    a = prefix_a + shared + suffix_a
    b = prefix_b + shared + suffix_b
    fa, fb = set(winnow_text(a)), set(winnow_text(b))
    assert fa & fb, (a, b)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_star_contraction_matches_union_find(spark, edges):
    """The O(log n) large-star/small-star components must produce the
    same (node -> min-id component) map as union-find on arbitrary
    graphs."""
    from bearly_spark.operators.dedup import connected_components_star

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.component for r in connected_components_star(df, "src", "dst").collect()
    }
    assert got == want


# floor_round is the repo's cross-engine determinism primitive (round-7:
# every midpoint-exposed ROUND twin was converted to it). The property
# that makes it safe is BIT-IDENTITY of floor(x*10^d + 0.5)/10^d across
# Spark, DuckDB and CPython — one fixed IEEE op sequence. Exercise it on
# adversarial inputs: exact d-decimal midpoints, midpoint±1ulp, and
# arbitrary doubles.
import math as _math

_vals = st.one_of(
    # negatives included: bigram log-prob scores are a live negative
    # call site, and true-floor (round half toward +inf) must hold for
    # every sign
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
    # exact/near 6dp midpoints: ±(k/1e6 + 0.5/1e6), perturbed by ±1-2
    # ULP OF THE VALUE (a fixed absolute bump is absorbed by rounding
    # for any k beyond single digits — review catch, round 7)
    st.builds(
        lambda k, bump, sign: sign
        * (lambda m: m + bump * _math.ulp(m))(k / 1e6 + 0.0000005),
        st.integers(0, 10**9),
        st.integers(-2, 2),
        st.sampled_from([-1, 1]),
    ),
)


@given(xs=st.lists(_vals, min_size=1, max_size=6), d=st.sampled_from([2, 4, 6, 10]))
@settings(**_SETTINGS)
def test_floor_round_bit_identical_across_engines(spark, xs, d):
    import math

    import duckdb

    from bearly_spark.operators.rounding import floor_round, floor_round_sql

    import pyspark.sql.functions as F

    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    got_spark = {
        r["i"]: r["y"]
        for r in df.select("i", floor_round(F.col("x"), d).alias("y")).collect()
    }
    expr = floor_round_sql("x", d)
    got_duck = dict(
        duckdb.sql(
            "SELECT i, " + expr + " AS y FROM (SELECT unnest($ids) AS i, unnest($xs) AS x)",
            params={"ids": list(range(len(xs))), "xs": xs},
        ).fetchall()
    )
    scale = float(10**d)
    for i, x in enumerate(xs):
        py = math.floor(x * scale + 0.5) / scale
        assert got_spark[i] == py == got_duck[i], (x, d, got_spark[i], got_duck[i], py)


# |num/den| stays within rational_round's documented BIGINT capacity
# (|micro| = |num/den|·10^d < 9.2e18): hypothesis immediately found the
# overflow edge at num ~ 9.2e12 with digits=6 (Spark's long `div`
# overflows where DuckDB's HUGEINT keeps going — outside the contract
# by design, see the docstring's capacity clause)
_num = st.integers(-(10**11), 10**11)
_den = st.integers(1, 10**12)
_dig = st.sampled_from([0, 2, 4, 6])


@given(pairs=st.lists(st.tuples(_num, _den), min_size=1, max_size=8),
       digits=_dig)
@settings(**_SETTINGS)
def test_rational_round_property(spark, pairs, digits):
    """rational_round (round 8) over random rationals across the full
    documented capacity: Spark's emission, DuckDB's twin SQL and exact
    Python integer arithmetic must be THREE-WAY bit-identical —
    including true boundary cases hypothesis stumbles into and
    negative numerators (trunc-division semantics on both engines)."""
    import duckdb

    from bearly_spark.operators.rounding import (
        rational_round,
        rational_round_sql,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(pairs, "n long, d long")
    got = {
        (r["n"], r["d"]): r["r"]
        for r in df.select(
            "n", "d", rational_round(F.col("n"), F.col("d"), digits).alias("r")
        ).collect()
    }
    vals = ", ".join(f"({n}, {d})" for n, d in pairs)
    duck = {
        (n, d): r
        for n, d, r in duckdb.sql(
            f"SELECT n, d, {rational_round_sql('n', 'd', digits)} AS r "
            f"FROM (VALUES {vals}) t(n, d)"
        ).fetchall()
    }
    s = 10**digits
    for n, d in pairs:
        a, b = 2 * s * n + d, 2 * d
        q = abs(a) // b
        micro = q if a >= 0 else -q
        want = float(micro) / s
        assert got[(n, d)] == want == duck[(n, d)], (n, d, digits)


_pct_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-(10**6), 10**6)),
    min_size=1,
    max_size=40,
)
_pct_qs = st.lists(
    st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]),
    min_size=1,
    max_size=3,
    unique=True,
)


@given(rows=_pct_rows, qs=_pct_qs)
@settings(**_SETTINGS)
def test_exact_percentiles_selection_matches_fraction_reference(spark, rows, qs):
    """The r9 distributed-selection path (global AND few-group) ==
    the exact quantile_cont contract, replayed in pure-Python Fractions,
    over arbitrary grouped 2dp data — including negatives, duplicates,
    single-row groups and the q=0/q=1 extremes."""
    from decimal import Decimal
    from fractions import Fraction

    from bearly_spark.operators.aggregate import exact_percentiles

    data = [(f"g{g}", Decimal(v) / 100) for g, v in rows]
    df = spark.createDataFrame(data, "g string, v decimal(12,2)")
    names = [f"p{i}" for i in range(len(qs))]
    got = {
        r["g"]: [r[n] for n in names]
        for r in exact_percentiles(df, ["g"], "v", qs, names=names).collect()
    }
    by_g: dict[str, list] = {}
    for g, v in data:
        by_g.setdefault(g, []).append(v)
    assert set(got) == set(by_g)
    for g, vals in by_g.items():
        vals = sorted(vals)
        n = len(vals)
        for qi, q in enumerate(qs):
            fr = Fraction(q).limit_denominator(10**6)
            a, b = fr.numerator, fr.denominator
            lo, r_ = divmod((n - 1) * a, b)
            hi = lo + (1 if r_ else 0)
            num = int(vals[lo] * 100) * (b - r_) + int(vals[hi] * 100) * r_
            den = b * 100
            # halfup 4dp via truncating integral division (rational_round)
            t, u = 2 * 10**4 * num + den, 2 * den
            micro = abs(t) // abs(u) * (1 if (t >= 0) == (u > 0) else -1)
            assert got[g][qi] == float(micro) / 1e4, (g, q)

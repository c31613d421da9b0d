"""Planted-fixture tests for the k-means / SemDeDup / prototypes family.

The registry twins (tests/test_oracle_gate.py) pin cross-engine
exactness on real fixture data; these tests pin the SEMANTICS on
hand-computable frames: assignment ties, floor-division centroid means
on negative sums (the trunc-vs-floor trap that bit the first twin
draft), empty-cluster carry-over, the greedy min-id drop rule, the
exact rational-threshold boundary, and prototype tie-breaks.
"""

import pyspark.sql.functions as F
import pytest

from bearly_spark.operators import clustering as C

Q = C.QUANT_SCALE


def _emb(spark, rows):
    """rows: list[(id, list[float])] -> DataFrame(vec_id, embedding).

    Coordinates are given in QUANT UNITS (i / 2^20) so the quantized
    grid values equal the integers passed in — every expectation below
    is exact by construction.
    """
    data = [(i, [float(x) / Q for x in v]) for i, v in rows]
    return spark.createDataFrame(data, "vec_id long, embedding array<float>")


def test_assignment_argmin_and_tie_to_lowest_cluster(spark):
    # seeds are ids 0,1 -> centroids (0,0) and (10,0); id 2 sits exactly
    # between them (dist 25 both) -> tie must go to cluster 0
    df = _emb(spark, [(0, [0, 0]), (1, [10, 0]), (2, [5, 0]), (3, [9, 1])])
    cents = C.seed_centroids(df, k=2)
    assert cents == [[0, 0], [10, 0]]
    got = {
        r.vec_id: (r.cluster, r.dist)
        for r in C.assign_clusters(df, cents).collect()
    }
    assert got[2] == (0, 25)  # tie -> lowest cluster id
    assert got[3] == (1, 2)
    assert got[0] == (0, 0) and got[1] == (1, 0)


def test_refine_means_floor_divide_negative_sums(spark):
    # one cluster, members summing to a NEGATIVE non-multiple: mean of
    # {-5, -2} = -3.5 -> floor = -4 (truncation would give -3; the
    # DuckDB twin's explicit mod-subtract form exists for exactly this)
    df = _emb(spark, [(0, [-5, 3]), (1, [-2, 4])])
    new = C._refine_once(df, [[-5, 3]], "vec_id", "embedding")
    assert new == [[-4, 3]]  # floor(-7/2) = -4, floor(7/2) = 3


def test_refine_empty_cluster_keeps_previous_centroid(spark):
    # duplicate seeds: cluster 1 can never win an argmin tie, so it
    # gets no members and must keep its old centroid verbatim
    df = _emb(spark, [(0, [4, 0]), (1, [4, 0]), (2, [8, 0])])
    cents = [[4, 0], [4, 0]]
    new = C._refine_once(df, cents, "vec_id", "embedding")
    assert new[1] == [4, 0]
    assert new[0] == [(4 + 4 + 8) // 3, 0]


def test_kmeans_profile_exact_counts_and_inertia(spark):
    # two tight blobs around (0,0) and (100,0); k=2, 1 iter converges
    df = _emb(
        spark,
        [(0, [0, 0]), (1, [2, 0]), (2, [100, 0]), (3, [102, 0]), (4, [98, 0])],
    )
    prof = C.kmeans_cluster_profile(df, k=2, iters=1).collect()
    by = {r.cluster: r for r in prof}
    # seeds (0,0)/(2,0): blob {2,100,102,98} -> cluster 1, mean 302/4 ->
    # floor 75; final assignment under ((0,0),(75,0)): {0,1} -> c0 with
    # dists 0+4, {100,102,98} -> c1 with dists 625+729+529
    assert by[0].n_vecs == 2 and int(by[0].inertia) == 0 + 4
    assert by[1].n_vecs == 3 and int(by[1].inertia) == 625 + 729 + 529


def test_semdedup_greedy_min_id_drop_chain(spark):
    # a(10) and b(11) identical, c(12) identical: 11 and 12 both have a
    # lower-id near-dup -> dropped; 10 survives. d(13) orthogonal, kept.
    df = _emb(
        spark,
        [(10, [7, 0]), (11, [7, 0]), (12, [7, 0]), (13, [0, 9])],
    )
    flags = {
        r.vec_id: r.kept
        for r in C.semdedup_flags(df, k=2, iters=0, tau=(19, 20)).collect()
    }
    assert flags == {10: True, 11: False, 12: False, 13: True}


def test_semdedup_exact_rational_threshold_boundary(spark):
    # x=(19,0), y=(19,b) with |y|=20 is impossible on the int grid, but
    # cos((3,4),(4,3)) = 24/25 = 0.96: >= 19/20 -> drop; cos((3,4),(4,-3))
    # = 0 -> keep. Same cell is forced with k=1.
    df = _emb(spark, [(0, [3, 4]), (1, [4, 3]), (2, [4, -3])])
    flags = {
        r.vec_id: r.kept
        for r in C.semdedup_flags(df, k=1, iters=0, tau=(19, 20)).collect()
    }
    assert flags == {0: True, 1: False, 2: True}
    # exactly AT the threshold (>= is inclusive): cos = 24/25 with
    # tau = 24/25 must still drop
    flags = {
        r.vec_id: r.kept
        for r in C.semdedup_flags(df, k=1, iters=0, tau=(24, 25)).collect()
    }
    assert flags[1] is False
    # one notch above (cos < tau): kept
    flags = {
        r.vec_id: r.kept
        for r in C.semdedup_flags(df, k=1, iters=0, tau=(97, 100)).collect()
    }
    assert flags[1] is True


def test_semdedup_cell_cap_truncates_and_reports(spark):
    # cap=2: the WITNESS POOL is ids {0,1}; every row is still tested
    # against it (the multiprobe-consistent rule), so 1 and 2 both drop
    # via witness 0, while 3 (orthogonal to the pool, even though it
    # duplicates capped-out... nothing) stays kept. Whole cell flagged.
    df = _emb(
        spark, [(0, [7, 0]), (1, [7, 0]), (2, [7, 0]), (3, [0, 9]), (4, [0, 9])]
    )
    rows = C.semdedup_flags(df, k=1, iters=0, tau=(19, 20), max_cell=2).collect()
    by = {r.vec_id: r for r in rows}
    assert by[1].kept is False  # witness 0, inside the pool
    assert by[2].kept is False  # tested against the pool despite rank > cap
    assert by[3].kept is True  # no near-dup inside the pool
    # 4 duplicates 3, but 3 is OUTSIDE the capped witness pool: the cap
    # legitimately misses this pair (that's what cell_truncated reports)
    assert by[4].kept is True
    assert all(r.cell_truncated for r in rows)


def test_semdedup_rejects_bad_tau(spark):
    df = _emb(spark, [(0, [1, 0])])
    with pytest.raises(ValueError):
        C.semdedup_flags(df, tau=(0, 5))
    with pytest.raises(ValueError):
        C.semdedup_flags(df, tau=(6, 5))


def test_prototypes_rounds_match_rank_window(spark):
    # 6 points, 2 clusters; includes a dist tie inside cluster 0 (ids
    # 1 and 4 both at dist 1) -> tie breaks to the lower id at rn=2
    df = _emb(
        spark,
        [(0, [0, 0]), (1, [1, 0]), (4, [0, 1]), (5, [3, 0]),
         (2, [100, 0]), (3, [101, 0])],
    )
    assigned = C.assign_clusters(df, [[0, 0], [100, 0]])
    got = sorted(
        (r.cluster, r.rn, r.vec_id, r.dist)
        for r in C.cluster_prototypes(assigned, top=3).collect()
    )
    assert got == [
        (0, 1, 0, 0), (0, 2, 1, 1), (0, 3, 4, 1),
        (1, 1, 2, 0), (1, 2, 3, 1),
    ]


def test_kernel_and_column_quantization_agree(spark, sf_dir):
    """The numpy kernel grid and the Column-expression grid must be the
    same grid — both are floor(float64(v) * 2^20) — on real fixture
    vectors, not just planted dyadic ones."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    col = {
        r.vec_id: list(r.xq)
        for r in emb.select("vec_id", C.quantized_vec(F.col("embedding")).alias("xq")).collect()
    }
    import numpy as np

    for r in emb.collect():
        np_q = C._quantize_np(np.array([r.embedding], dtype=np.float64))[0]
        assert list(np_q) == col[r.vec_id]


# ------------------------------------------------------------------ property
# hypothesis: the distributed pipeline against O(n^2)/O(nk) python-int
# references on arbitrary small integer-grid frames (each example runs
# real Spark jobs, so example counts are deliberately small).

from fractions import Fraction  # noqa: E402

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_vecs = st.lists(
    st.tuples(st.integers(-1000, 1000), st.integers(-1000, 1000)),
    min_size=2,
    max_size=10,
)


def _ref_assign(vecs, cents):
    out = {}
    for i, v in vecs:
        dists = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
        d = min(dists)
        out[i] = (dists.index(d), d)  # first minimal index = lowest cluster
    return out


def _ref_refine(vecs, cents, assign):
    sums = {}
    for i, v in vecs:
        c = assign[i][0]
        s, n = sums.get(c, ([0] * len(v), 0))
        sums[c] = ([a + b for a, b in zip(s, v)], n + 1)
    return [
        [s // sums[c][1] for s in sums[c][0]] if c in sums else list(cents[c])
        for c in range(len(cents))
    ]


@given(raw=_vecs, k=st.integers(1, 3), iters=st.integers(0, 2))
@settings(**_SETTINGS)
def test_kmeans_matches_python_int_reference(spark, raw, k, iters):
    vecs = [(i, list(v)) for i, v in enumerate(raw)]
    if len(vecs) < k:
        return
    df = _emb(spark, vecs)
    assigned, cents = C.kmeans_quantized(df, k=k, iters=iters)
    ref_c = [list(v) for _, v in sorted(vecs)[:k]]
    for _ in range(iters):
        ref_c = _ref_refine(vecs, ref_c, _ref_assign(vecs, ref_c))
    assert cents == ref_c
    ref_a = _ref_assign(vecs, ref_c)
    got = {r.vec_id: (r.cluster, r.dist) for r in assigned.collect()}
    assert got == ref_a


@given(raw=_vecs, num=st.integers(1, 20))
@settings(**_SETTINGS)
def test_semdedup_matches_fraction_reference(spark, raw, num):
    """Greedy drop flags vs an exact-Fraction cosine^2 reference (k=1:
    one cell, so the reference is the plain lower-id scan)."""
    tau = (num, 20)
    vecs = [(i, list(v)) for i, v in enumerate(raw) if v != (0, 0)]
    if len(vecs) < 2:
        return
    df = _emb(spark, vecs)
    got = {
        r.vec_id: r.kept
        for r in C.semdedup_flags(df, k=1, iters=0, tau=tau).collect()
    }
    t2 = Fraction(num * num, 400)
    want = {}
    for j, (jd, jv) in enumerate(vecs):
        dropped = False
        for (idn, iv) in vecs[:j]:
            dot = sum(a * b for a, b in zip(iv, jv))
            if dot > 0 and Fraction(dot * dot, 1) >= t2 * sum(a * a for a in iv) * sum(
                a * a for a in jv
            ):
                dropped = True
                break
        want[jd] = not dropped
    assert got == want


def test_multiprobe_catches_cross_cell_pair(spark):
    """u1/u2 sit just either side of the boundary between axis cells
    with cos ~0.9993: invisible to the classic per-cell rule, caught at
    n_probe=2 through u2's second probe."""
    df = _emb(
        spark,
        [(0, [1000, 0]), (1, [0, 1000]), (2, [720, 694]), (3, [694, 720])],
    )
    cents = [[1000, 0], [0, 1000]]
    f1 = {
        r.vec_id: r.kept
        for r in C.semdedup_flags(df, centroids=cents, tau=(19, 20), n_probe=1).collect()
    }
    f2 = {
        r.vec_id: (r.cluster, r.kept)
        for r in C.semdedup_flags(df, centroids=cents, tau=(19, 20), n_probe=2).collect()
    }
    assert f1 == {0: True, 1: True, 2: True, 3: True}  # blind across cells
    # probe repair: 3 (~2, lower id, foreign cell) drops; its PRIMARY
    # cell label is still its nearest cell (1)
    assert f2 == {0: (0, True), 1: (1, True), 2: (0, True), 3: (1, False)}


def test_multiprobe_clamps_to_k_and_matches_classic(spark):
    """k=1: n_probe clamps to the cell count, and the multiprobe code
    path must reproduce the classic flags exactly (same witnesses)."""
    df = _emb(spark, [(10, [7, 0]), (11, [7, 0]), (12, [7, 0]), (13, [0, 9])])
    cents = [[7, 0]]
    classic = {
        r.vec_id: r.kept
        for r in C.semdedup_flags(df, centroids=cents, tau=(19, 20), n_probe=1).collect()
    }
    multi = {
        r.vec_id: r.kept
        for r in C.semdedup_flags(df, centroids=cents, tau=(19, 20), n_probe=5).collect()
    }
    assert multi == classic == {10: True, 11: False, 12: False, 13: True}


def test_cusum_changepoints_matches_reference_and_alarms(spark):
    """8 low days then 8 high days: CUSUM must ramp on both sides of the
    global-mean reference and cross h on the documented schedule."""
    import datetime

    from bearly_spark.operators.windows import cusum_changepoints

    base = datetime.date(1992, 1, 1)
    rows = [
        (base + datetime.timedelta(days=i), float(10 if i < 8 else 100))
        for i in range(16)
    ]
    df = spark.createDataFrame(rows, "d date, price double")
    got = {
        r.day_idx: (r.rev_micro, r.cusum_pos, r.cusum_neg, r.alarm)
        for r in cusum_changepoints(df, "d", "price").collect()
    }
    # python reference (identical integer recurrence)
    xs = [10_000_000] * 8 + [100_000_000] * 8
    mean = sum(xs) // 16
    k, h = mean // 4, mean * 3
    sp = sn = 0
    for i, x in enumerate(xs):
        sp = max(0, sp + (x - mean - k))
        sn = max(0, sn + (mean - x - k))
        assert got[i] == (x, sp, sn, sp > h or sn > h), f"day {i}"
    # the low regime alarms negative before the cut; the high regime
    # alarms positive after it: 31.25e6 drift/day vs h=165e6 -> the 6th
    # day of each regime (index 5 / 13) is the first past the threshold
    assert got[4][3] is False and got[5][3] is True  # negative side
    assert got[12][3] is False and got[13][3] is True  # positive side


def test_hierarchical_k1_1_degenerates_to_flat(spark, sf_dir):
    """Two-level fit with a single coarse cell must equal the flat fit
    at k=k2 bit-for-bit: coarse assignment is constant, fine seeds are
    the k2 globally-lowest ids, and the fine Lloyd steps reduce to the
    flat steps."""
    from bearly_spark.operators import clustering as C

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    h = [
        (r.cell, r.n_vecs, r.inertia)
        for r in C.hierarchical_cluster_profile(
            emb, k1=1, k2=8, iters=2, fanout=4
        ).collect()
    ]
    f = [
        (r.cluster, r.n_vecs, r.inertia)
        for r in C.kmeans_cluster_profile(emb, k=8, iters=2).collect()
    ]
    assert h == f


def test_hierarchical_fanout_invariant(spark, sf_dir):
    """The salt that bounds cogroup task memory must not change any
    value: partial sums merge and assignment is row-independent."""
    from bearly_spark.operators import clustering as C

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    runs = [
        sorted(
            (r.cell, r.n_vecs, r.inertia)
            for r in C.hierarchical_cluster_profile(
                emb, k1=4, k2=4, iters=1, fanout=fo
            ).collect()
        )
        for fo in (1, 8)
    ]
    assert runs[0] == runs[1]
    assert sum(n for _, n, _ in runs[0]) == emb.count()


def test_hierarchical_fine_centroids_stay_distributed(spark, sf_dir):
    """The fine centroid frame is a DataFrame of (coarse, fine, cq) —
    never a driver list — and covers exactly the non-empty coarse
    cells with at most k2 fine ids each, densely numbered from 0."""
    from pyspark.sql import DataFrame

    from bearly_spark.operators import clustering as C

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    coarse, fine = C.hierarchical_fit(emb, k1=4, k2=3, iters=1, fanout=2)
    assert isinstance(fine, DataFrame)
    rows = fine.collect()
    by_cell: dict[int, list[int]] = {}
    for r in rows:
        by_cell.setdefault(r.coarse, []).append(r.fine)
    for c, fines in by_cell.items():
        assert sorted(fines) == list(range(len(fines))) and len(fines) <= 3
    # every vector lands in a (coarse, fine) cell that exists
    assigned = C.assign_hierarchical(emb, coarse, fine, k2=3, fanout=2)
    pairs = {(r.coarse, r.fine) for r in assigned.select("coarse", "fine").distinct().collect()}
    assert pairs <= {(c, f) for c, fines in by_cell.items() for f in fines}


def test_hier_semdedup_k1_1_equals_flat(spark, sf_dir):
    """The hierarchical pair stage shares _greedy_drop_sorted with the
    flat one; with a single coarse cell and the SAME geometry the two
    paths must emit identical verdicts."""
    import pyspark.sql.functions as F

    from bearly_spark.operators import clustering as C

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    aug = emb.unionByName(
        emb.filter(F.col("vec_id") < 20).withColumn(
            "vec_id", F.col("vec_id") + 100000
        )
    )
    fitted = C.hierarchical_fit(emb, k1=1, k2=8, iters=2, fanout=4)
    h = {
        r.vec_id: r.kept
        for r in C.semdedup_flags_hier(aug, fanout=4, fitted=fitted).collect()
    }
    f = {
        r.vec_id: r.kept
        for r in C.semdedup_flags(
            aug, centroids=C.lloyd_fit(emb, k=8, iters=2)
        ).collect()
    }
    assert h == f
    assert sorted(i for i, k in h.items() if not k) == list(
        range(100000, 100020)
    )


def _ref_hier(vecs, k1, k2, iters):
    """Pure-python two-level reference: coarse flat fit, per-cell fine
    seeds = k2 lowest ids (placeholder = coarse centroid for empty
    cells), `iters` fine Lloyd steps within each cell, two-stage
    assignment. Third implementation guarding Spark and the SQL twin
    against each other."""
    coarse = [list(v) for _, v in sorted(vecs)[:k1]]
    for _ in range(iters):
        coarse = _ref_refine(vecs, coarse, _ref_assign(vecs, coarse))
    ca = _ref_assign(vecs, coarse)
    cells = {}
    for i, v in sorted(vecs):
        cells.setdefault(ca[i][0], []).append((i, v))
    fine = {c: [list(v) for _, v in members[:k2]] for c, members in cells.items()}
    for c in range(len(coarse)):
        fine.setdefault(c, [list(coarse[c])])
    for _ in range(iters):
        for c, members in cells.items():
            fine[c] = _ref_refine(members, fine[c], _ref_assign(members, fine[c]))
    out = {}
    for i, v in vecs:
        c = _ref_assign([(i, v)], coarse)[i][0]
        f, d = _ref_assign([(i, v)], fine[c])[i]
        out[i] = (c, f, d)
    return coarse, fine, out


@given(raw=_vecs, k1=st.integers(1, 3), k2=st.integers(1, 3), iters=st.integers(0, 2))
@settings(**_SETTINGS)
def test_hierarchical_matches_python_int_reference(spark, raw, k1, k2, iters):
    vecs = [(i, list(v)) for i, v in enumerate(raw)]
    if len(vecs) < k1:
        return
    df = _emb(spark, vecs)
    coarse, fine_df = C.hierarchical_fit(df, k1=k1, k2=k2, iters=iters, fanout=2)
    ref_coarse, ref_fine, ref_out = _ref_hier(vecs, k1, k2, iters)
    assert coarse == ref_coarse
    got_fine = {}
    for r in fine_df.collect():
        got_fine.setdefault(r.coarse, {})[r.fine] = list(r.cq)
    want_fine = {
        c: {j: list(cq) for j, cq in enumerate(fl)} for c, fl in ref_fine.items()
    }
    assert got_fine == want_fine
    assigned = C.assign_hierarchical(df, coarse, fine_df, k2=k2, fanout=2)
    got = {r.vec_id: (r.coarse, r.fine, r.dist) for r in assigned.collect()}
    assert got == ref_out

"""Measure the round-5 k-means centroid-update vectorization.

Round-4 verdict #3: ``similarity._kmeans_fit``'s Lloyd update looped
``for j in range(n_cells): mat[assign == j].mean()`` driver-side —
O(n_cells x sample) boolean masks per iteration, which at the round-4
auto-sized operating point (n_cells ~ sqrt(N) -> 4096 on a 100k-row
sample) is ~4e9 ops per fit. Round 5 replaces it with a per-dimension
``np.bincount`` scatter: O(sample x dim) per iteration.

Round 5 also moved the ASSIGNMENT matmul to float32 with in-place
post-ops (sgemm is 6.5x dgemm here, and the (sample x n_cells) distance
temp halves), so the two fits can diverge where float32 flips a
near-tied cell assignment — reported below as centroid divergence
relative to centroid scale. This tool times BOTH forms at the
auto-sized operating point, so the speedup claim and the
divergence-is-noise claim are each measured, not asserted.

Run: python tools/kmeans_fit_bench.py [n_sample] [n_cells] [dim]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bearly_spark.operators.similarity import _kmeans_fit  # noqa: E402


def _kmeans_fit_masked(mat, n_cells, seed=42, iters=10):
    """The pre-round-5 Lloyd update (per-cell boolean masks), kept here
    verbatim as the measured baseline — same seeding, same assignment."""
    rng = np.random.RandomState(seed)
    x2 = (mat**2).sum(axis=1)
    first = mat[rng.randint(len(mat))]
    d2 = x2 - 2.0 * (mat @ first) + (first**2).sum()
    centroids = [first]
    for _ in range(1, n_cells):
        np.maximum(d2, 0.0, out=d2)
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        nxt = mat[rng.choice(len(mat), p=probs)]
        centroids.append(nxt)
        d2 = np.minimum(d2, x2 - 2.0 * (mat @ nxt) + (nxt**2).sum())
    C = np.asarray(centroids)
    for _ in range(iters):
        d = x2[:, None] - 2.0 * (mat @ C.T) + (C**2).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for j in range(n_cells):
            members = mat[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    rng = np.random.RandomState(7)
    mat = rng.randn(n, dim)

    # seeding is shared code; isolate the Lloyd-iteration cost by
    # timing a 0-iteration fit (pure seeding) and subtracting
    t0 = time.perf_counter()
    _kmeans_fit(mat, n_cells, iters=0)
    t_seed = time.perf_counter() - t0
    print(f"seeding only:        {t_seed:8.2f}s", flush=True)

    t0 = time.perf_counter()
    c_new = _kmeans_fit(mat, n_cells)
    t_new = time.perf_counter() - t0
    print(f"vectorized fit x10:  {t_new:8.2f}s", flush=True)

    # the masked baseline at the full operating point runs for MINUTES
    # (the round-4 finding this tool exists to quantify): measure ONE
    # Lloyd iteration and extrapolate to the shared 10-iteration fit
    t0 = time.perf_counter()
    c_old = _kmeans_fit_masked(mat, n_cells, iters=1)
    t_old1 = time.perf_counter() - t0
    t_old = t_seed + (t_old1 - t_seed) * 10

    # divergence after ONE iteration of each form (same comparison
    # basis: the extrapolated baseline never runs all 10)
    c_new1 = _kmeans_fit(mat, n_cells, iters=1)
    diff = float(np.abs(c_new1 - c_old).max())
    scale = float(np.abs(c_old).max())
    print(f"sample={n} n_cells={n_cells} dim={dim}")
    print(f"masked fit x10 (extrapolated from 1 iter): {t_old:8.2f}s")
    print(
        f"per-iteration speedup: "
        f"{(t_old - t_seed) / max(t_new - t_seed, 1e-9):8.1f}x"
    )
    print(f"max |centroid diff| after 1 iter: {diff:.3e} (scale {scale:.3e})")


if __name__ == "__main__":
    main()

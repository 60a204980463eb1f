"""Index-sizing math for the ANN / near-dup operators.

The LSH and IVF operators are parameterized by bucket/cell counts. These
are the scaling rules that keep candidate-generation cost bounded as the
corpus grows — the demo parameterizations in the query registry are
derived from THESE functions applied to the gate corpus, not hand-picked
constants, so the same call sites size correctly at 100 TB.

Worked examples (n = corpus vector/doc count):

* ``lsh_n_planes(n, target)`` — planes ≈ ceil(log2(n / target)).
  Each hyperplane halves expected bucket occupancy, so ``p`` planes give
  ``2**p`` buckets and ~``n / 2**p`` vectors per bucket. The within-bucket
  self-join then does ~``n·target/2`` comparisons total instead of n²/2.
  - gate corpus: n=500, target 8 → 6 planes (64 buckets)
  - 100 TB text corpus: n=1e11 docs, target 256 → ceil(log2(3.9e8)) = 29
    planes, ~5.4e8 buckets, ≈1.3e13 comparisons — linear-ish in n, vs the
    impossible 5e21 of all-pairs.
  More planes → higher precision, lower recall per bucket; recover recall
  with multi-probe (see ``lsh_bucketed_topk`` ``n_probes``) rather than
  fewer planes, because probe count grows the join linearly while fewer
  planes grow buckets (and the self-join) quadratically.

* ``ivf_n_cells(n)`` — cells ≈ √n. Assignment cost is n·cells (broadcast
  centroid scan) and per-cell list length is n/cells; √n equalizes the two
  at n^1.5 total work, the standard IVF balance (FAISS guideline).
  - gate corpus: n=500 → 22 cells (~23 vectors/cell)
  - n=1e9 embeddings → ~31.6k centroids: still broadcastable (31.6k × 64
    dims × 4 B ≈ 8 MB), lists of ~31.6k — each cell join fits one task.

* ``minhash_lsh_threshold(n_hashes, band_rows)`` — the Jaccard similarity
  at which a pair's candidate probability crosses 1/2: t ≈ (1/b)^(1/r)
  with b = n_hashes // band_rows bands of r rows. The registry's
  (n_hashes=16, band_rows=2) → b=8, t ≈ (1/8)^(1/2) ≈ 0.35 — a
  recall-leaning curve (most >0.35-Jaccard pairs become candidates), with
  the exact-Jaccard verify stage (``dedup_lsh_verified``) supplying the
  precision.

All functions are pure arithmetic — call them at plan-build time with the
(estimated) corpus size; none of them touch Spark.
"""

from __future__ import annotations

import math
import random


def lsh_n_planes(n_vectors: int, target_bucket_occupancy: int = 256) -> int:
    """Hyperplane count such that expected bucket occupancy ≈ target:
    ceil(log2(n / target)), min 1. See module docstring for the math."""
    if n_vectors <= 0:
        raise ValueError("n_vectors must be positive")
    if target_bucket_occupancy <= 0:
        raise ValueError("target_bucket_occupancy must be positive")
    return max(1, math.ceil(math.log2(max(2.0, n_vectors / target_bucket_occupancy))))


def ivf_n_cells(n_vectors: int) -> int:
    """IVF coarse-cell count ≈ √n — balances centroid-assignment cost
    (n·cells) against inverted-list occupancy (n/cells)."""
    if n_vectors <= 0:
        raise ValueError("n_vectors must be positive")
    return max(1, math.isqrt(n_vectors))


def minhash_lsh_threshold(n_hashes: int, band_rows: int) -> float:
    """Jaccard similarity at which the banding scheme's candidate
    probability crosses ~1/2: (1/b)^(1/r), b = n_hashes // band_rows."""
    b = n_hashes // band_rows
    if b < 1:
        raise ValueError("band_rows must divide into n_hashes at least once")
    return (1.0 / b) ** (1.0 / band_rows)


def random_hyperplanes(
    n_planes: int, dim: int, seed: int = 42, decimals: int = 6
) -> list[list[float]]:
    """Seeded hyperplane constants for ``hyperplane_bucket`` — rounded so
    the identical literals embed into an oracle SQL string (engine-portable
    bucket assignment). Components are uniform on [-1, 1]; for bucketing
    only the SIGN of the dot product matters, so no normalization needed."""
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), decimals) for _ in range(dim)]
        for _ in range(n_planes)
    ]

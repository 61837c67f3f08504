"""On-device k-means (Lloyd's) for IVF training.

Replaces FAISS's IVF ``index.train`` (``VectorStore_Faiss.py:181-184``).
Each iteration is two dense device ops: assignment = one (N, k) score
matmul + argmax on the MXU/VPU; update = ``segment_sum`` of points by
cluster. Empty clusters re-seed from the points farthest from their
centroid (standard FAISS-style repair). Deterministic given the seed.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_clusters", "n_iters"))
def _kmeans_run(
    x: jax.Array, init: jax.Array, n_clusters: int, n_iters: int
) -> Tuple[jax.Array, jax.Array]:
    """Returns (centroids (k, d), assignments (N,))."""
    x_sq = jnp.sum(x * x, axis=1)  # (N,)

    def step(centroids, _):
        c_sq = jnp.sum(centroids * centroids, axis=1)  # (k,)
        # squared distance up to the constant x_sq: -2 x·c + ||c||²
        cross = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
        d2 = c_sq[None, :] - 2.0 * cross  # (N, k)
        assign = jnp.argmin(d2, axis=1)
        sums = jax.ops.segment_sum(x, assign, num_segments=n_clusters)
        counts = jax.ops.segment_sum(
            jnp.ones_like(assign, dtype=jnp.float32), assign, num_segments=n_clusters
        )
        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty-cluster repair: take the globally farthest points
        dist_to_own = jnp.take_along_axis(d2, assign[:, None], axis=1)[:, 0] + x_sq
        far_idx = jnp.argsort(-dist_to_own)[:n_clusters]
        empty = counts < 1.0
        new_centroids = jnp.where(empty[:, None], x[far_idx], new_centroids)
        return new_centroids, None

    centroids, _ = jax.lax.scan(step, init, None, length=n_iters)
    # final assignment
    c_sq = jnp.sum(centroids * centroids, axis=1)
    cross = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
    assign = jnp.argmin(c_sq[None, :] - 2.0 * cross, axis=1)
    return centroids, assign


def kmeans(
    x: np.ndarray,
    n_clusters: int,
    n_iters: int = 10,
    sample_size: int = 131072,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Train on (a sample of) x; assign all rows. Returns
    (centroids (k, d) f32, assignments (N,) i32)."""
    x = np.asarray(x, dtype=np.float32)
    n = x.shape[0]
    if n < n_clusters:
        raise ValueError(f"need at least {n_clusters} points, got {n}")
    rng = np.random.default_rng(seed)
    train = x
    if n > sample_size:
        train = x[rng.choice(n, size=sample_size, replace=False)]
    # kmeans++ costs k sequential distance passes over its input; seed it
    # on a bounded subsample (>= 8 points per center) so large-nlist
    # builds don't spend minutes in python init — Lloyd iterations on the
    # full training sample do the real work
    init_pool = train
    init_cap = max(n_clusters * 8, 8192)
    if len(init_pool) > init_cap:
        init_pool = init_pool[rng.choice(len(init_pool), size=init_cap, replace=False)]
    init = _kmeans_pp_init(init_pool, n_clusters, rng)
    centroids, _ = _kmeans_run(
        jnp.asarray(train), jnp.asarray(init), n_clusters, n_iters
    )
    # assign the full corpus (chunked to bound memory)
    centroids_np = np.asarray(jax.device_get(centroids), dtype=np.float32)
    assign = np.empty(n, dtype=np.int32)
    chunk = 1 << 18
    for start in range(0, n, chunk):
        part = x[start : start + chunk]
        assign[start : start + chunk] = np.asarray(
            jax.device_get(_assign_chunk(jnp.asarray(part), centroids))
        )
    return centroids_np, assign


def _kmeans_pp_init(
    x: np.ndarray, n_clusters: int, rng: np.random.Generator
) -> np.ndarray:
    """kmeans++ seeding: each next center drawn ∝ squared distance to the
    nearest existing center — avoids the split/merged-cluster local optima
    of uniform random init."""
    n = x.shape[0]
    centers = np.empty((n_clusters, x.shape[1]), dtype=np.float32)
    centers[0] = x[rng.integers(n)]
    d2 = ((x - centers[0]) ** 2).sum(axis=1)
    for i in range(1, n_clusters):
        probs = d2 / max(d2.sum(), 1e-12)
        centers[i] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((x - centers[i]) ** 2).sum(axis=1))
    return centers


@jax.jit
def _assign_chunk(x: jax.Array, centroids: jax.Array) -> jax.Array:
    c_sq = jnp.sum(centroids * centroids, axis=1)
    cross = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
    return jnp.argmin(c_sq[None, :] - 2.0 * cross, axis=1).astype(jnp.int32)

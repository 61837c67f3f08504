"""Similarity scoring primitives.

These replace the score computations the reference delegated to FAISS C++
(``VectorStore_Faiss.py:110-148``: IndexFlatIP / IndexFlatL2 / cosine via
``normalize_L2`` + IP). On TPU every metric is a single batched matmul on
the MXU:

  cosine  : q̂ @ Êᵀ                      (both sides pre-normalized)
  ip      : q @ Eᵀ
  l2      : -(‖q‖² - 2 q·e + ‖e‖²)      (negated so that larger == closer,
                                          letting one top-k kernel serve all
                                          metrics)

Corpus row norms (‖e‖²) are maintained incrementally by the index so the l2
path stays one matmul + rank-1 updates rather than a second corpus pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

METRICS = ("cosine", "ip", "l2")

# HOST-side constant on purpose: a module-level jnp scalar is a device
# array, and every fresh jit trace that captures it inlines it as an MLIR
# constant — lowering then fetches ._value, a device round trip that
# blocks the whole compile when the axon tunnel stalls (observed: 10-min
# hang in lower_jaxpr_to_fun at a first (B, k) trace). numpy constants
# lower without touching the device.
NEG_INF = np.float32(-np.inf)

# On TPU, float32 jnp.dot with DEFAULT precision runs as bf16 passes on the
# MXU. Flat search advertises *exact* results (parity with FAISS IndexFlat*),
# so score matmuls on f32 corpora default to HIGHEST; bf16-stored corpora
# use DEFAULT (they already chose speed over the last bits).
EXACT_PRECISION = jax.lax.Precision.HIGHEST


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Row-normalize to unit L2 norm (safe at zero)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def pairwise_scores(
    queries: jax.Array,
    corpus: jax.Array,
    metric: str,
    corpus_sqnorm: jax.Array | None = None,
    precision: jax.lax.Precision | None = None,
) -> jax.Array:
    """(B, d) × (N, d) → (B, N) scores where larger means more similar.

    For ``cosine`` the corpus is assumed pre-normalized (done at add time by
    the index); queries are normalized here. For ``l2`` pass the cached
    ``corpus_sqnorm`` (N,) to avoid recomputing ‖e‖² per query.
    ``precision`` defaults to HIGHEST for f32 corpora (exactness contract)
    and DEFAULT for lower-precision storage.
    """
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}, expected one of {METRICS}")
    if precision is None:
        precision = (
            EXACT_PRECISION if corpus.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
        )
    queries = queries.astype(corpus.dtype)
    if metric == "cosine":
        queries = l2_normalize(queries)
        return jnp.dot(
            queries, corpus.T, preferred_element_type=jnp.float32, precision=precision
        )
    if metric == "ip":
        return jnp.dot(
            queries, corpus.T, preferred_element_type=jnp.float32, precision=precision
        )
    # l2
    if corpus_sqnorm is None:
        corpus_sqnorm = jnp.sum(
            corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=-1
        )
    q32 = queries.astype(jnp.float32)
    q_sqnorm = jnp.sum(q32 * q32, axis=-1, keepdims=True)  # (B, 1)
    cross = jnp.dot(
        queries, corpus.T, preferred_element_type=jnp.float32, precision=precision
    )
    return -(q_sqnorm - 2.0 * cross + corpus_sqnorm[None, :])

"""Masked top-k selection over scored corpora.

The query hot path the reference ran through FAISS ``index.search``
(``VectorStore_Faiss.py:263``) becomes: score matmul (``ops.scoring``) →
mask tombstoned rows to -inf → ``lax.top_k``. A fused Pallas variant that
never materializes the (B, N) score matrix in HBM lives in
``rag_arc_tpu.ops.fused_mips`` — this module is the XLA reference
implementation and the oracle the kernel is tested against.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rag_arc_tpu.ops.scoring import NEG_INF, pairwise_scores


@partial(jax.jit, static_argnames=("k", "metric"))
def masked_topk(
    queries: jax.Array,
    corpus: jax.Array,
    valid: jax.Array,
    k: int,
    metric: str = "cosine",
    corpus_sqnorm: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k by score with invalid rows excluded.

    Returns ``(scores (B, k), positions (B, k))``; positions of padded /
    deleted slots never appear as long as ≥k rows are valid (masked scores
    are -inf; callers with fewer than k valid rows filter -inf on host).
    """
    scores = pairwise_scores(queries, corpus, metric, corpus_sqnorm)
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    return jax.lax.top_k(scores, k)


def merge_topk(
    scores: jax.Array, positions: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Merge per-shard top-k candidate sets into a global top-k.

    ``scores``/``positions`` are (B, S*k) — S shards' candidates
    concatenated along the last axis, positions already globally offset.
    """
    s, idx = jax.lax.top_k(scores, k)
    return s, jnp.take_along_axis(positions, idx, axis=-1)

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


@partial(jax.jit, static_argnames=("k", "metric", "chunk"))
def masked_topk_chunked(
    queries: jax.Array,
    corpus: jax.Array,
    valid: jax.Array,
    sqnorm: jax.Array,
    k: int,
    metric: str = "cosine",
    chunk: int = 262144,
) -> tuple[jax.Array, jax.Array]:
    """Memory-bounded exact top-k: the corpus streams in chunks via
    ``lax.scan`` and only (B, chunk) scores exist at once, merged into a
    running (B, k). XLA fallback when the Pallas fused kernel is
    unavailable (non-TPU backends); peak memory O(B·chunk) instead of
    O(B·N)."""
    n = corpus.shape[0]
    if n % chunk != 0:
        raise ValueError(f"corpus rows {n} not a multiple of chunk {chunk}")
    b = queries.shape[0]
    if metric == "cosine":
        from rag_arc_tpu.ops.scoring import l2_normalize

        queries = l2_normalize(queries)

    n_chunks = n // chunk
    corpus_c = corpus.reshape(n_chunks, chunk, corpus.shape[1])
    valid_c = valid.reshape(n_chunks, chunk)
    sqnorm_c = sqnorm.reshape(n_chunks, chunk)
    init = (
        jnp.full((b, k), -jnp.inf, dtype=jnp.float32),
        jnp.full((b, k), -1, dtype=jnp.int32),
    )

    def step(carry, inputs):
        run_s, run_p = carry
        idx, c_corpus, c_valid, c_sqnorm = inputs
        scores = pairwise_scores(
            queries, c_corpus, "ip" if metric == "cosine" else metric, c_sqnorm
        )
        scores = jnp.where(c_valid[None, :], scores, NEG_INF)
        s, local = jax.lax.top_k(scores, k)
        p = (idx * chunk + local).astype(jnp.int32)
        cat_s = jnp.concatenate([run_s, s], axis=1)
        cat_p = jnp.concatenate([run_p, p], axis=1)
        ms, sel = jax.lax.top_k(cat_s, k)
        return (ms, jnp.take_along_axis(cat_p, sel, axis=1)), None

    (scores, positions), _ = jax.lax.scan(
        step,
        init,
        (jnp.arange(n_chunks, dtype=jnp.int32), corpus_c, valid_c, sqnorm_c),
    )
    return scores, positions


def merge_topk(
    scores: jax.Array, positions: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Merge per-shard top-k candidate sets into a global top-k.

    ``scores``/``positions`` are (B, S*k) — S shards' candidates
    concatenated along the last axis, positions already globally offset.
    """
    s, idx = jax.lax.top_k(scores, k)
    return s, jnp.take_along_axis(positions, idx, axis=-1)

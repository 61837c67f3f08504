"""BM25 scoring as a dense TPU kernel.

Replaces the reference's rank_bm25 ``BM25Okapi`` + ``np.argsort`` scoring
(``core/retrieval/bm25.py:306-313``) with a document-major device layout:

- ``doc_terms (N, Dmax) int32`` — each row holds the document's unique
  term ids, padded with ``DOC_PAD``.
- ``doc_weights (N, Dmax) float32`` — the *fully precomputed* per-term
  BM25 weight ``idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))``; the
  only query-time work left is matching query terms and summing weights.

Scoring a query batch is then a scan over ≤``QMAX`` query-term slots; each
step does a dense masked compare-and-accumulate over ``(B, N, Dmax)`` on
the VPU — no scatter, no variable-length postings, static shapes, and it
shards across chips by rows exactly like the dense index. The IDF follows
BM25Okapi semantics: ``ln((N−df+0.5)/(df+0.5))`` with negative values
floored to ``epsilon · mean(idf)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DOC_PAD = -1  # padding term id in doc_terms
QUERY_PAD = -2  # padding term id in query slots (never matches DOC_PAD)


def compute_idf(doc_freq: np.ndarray, n_docs: int, epsilon: float = 0.25) -> np.ndarray:
    """BM25Okapi IDF with the negative-IDF epsilon floor."""
    idf = np.log((n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
    positive = idf[idf > 0]
    avg_idf = positive.mean() if positive.size else 1.0
    eps_floor = epsilon * avg_idf
    return np.where(idf < 0, eps_floor, idf).astype(np.float32)


def compute_doc_weights(
    tf: np.ndarray,
    idf_per_slot: np.ndarray,
    doc_len: np.ndarray,
    avgdl: float,
    k1: float = 1.5,
    b: float = 0.75,
) -> np.ndarray:
    """Precompute the document-side BM25 weight for every (doc, term) slot.

    ``tf (N, Dmax)``: term frequency per slot; ``idf_per_slot (N, Dmax)``:
    idf of the slot's term; ``doc_len (N,)``: document lengths in tokens.
    """
    norm = k1 * (1.0 - b + b * doc_len[:, None] / max(avgdl, 1e-9))
    return (idf_per_slot * tf * (k1 + 1.0) / (tf + norm)).astype(np.float32)


def bm25_scores_kernel(
    doc_terms: jax.Array,
    doc_weights: jax.Array,
    query_terms: jax.Array,
    query_counts: jax.Array,
) -> jax.Array:
    """(B, N) BM25 scores.

    ``query_terms (B, QMAX) int32`` padded with QUERY_PAD;
    ``query_counts (B, QMAX) float32`` — query-term multiplicity (rank_bm25
    scores each occurrence of a repeated query term).
    """

    def step(scores, slot):
        qt, qc = slot  # (B,), (B,)
        # (B, N, Dmax) masked compare, summed over Dmax → (B, N)
        match = doc_terms[None, :, :] == qt[:, None, None]
        contrib = jnp.sum(jnp.where(match, doc_weights[None, :, :], 0.0), axis=-1)
        return scores + qc[:, None] * contrib, None

    b = query_terms.shape[0]
    # Zero init derived from the (possibly mesh-sharded) corpus operand so
    # the scan carry has matching "varying" type inside shard_map.
    init = jnp.zeros((b, 1), dtype=jnp.float32) + (doc_weights[:, 0] * 0.0)[None, :]
    scores, _ = jax.lax.scan(
        step, init, (query_terms.T, query_counts.T)
    )  # scan over QMAX slots
    return scores


@partial(jax.jit, static_argnames=("k",))
def bm25_topk(
    doc_terms: jax.Array,
    doc_weights: jax.Array,
    valid: jax.Array,
    query_terms: jax.Array,
    query_counts: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    scores = bm25_scores_kernel(doc_terms, doc_weights, query_terms, query_counts)
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


def numpy_bm25_oracle(
    tokenized_docs: list[list[str]],
    tokenized_query: list[str],
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
) -> np.ndarray:
    """Straightforward host BM25Okapi for oracle testing (the reference's
    rank_bm25 dependency is re-derived here from the published formula)."""
    n = len(tokenized_docs)
    doc_len = np.array([len(d) for d in tokenized_docs], dtype=np.float64)
    avgdl = doc_len.mean() if n else 0.0
    vocab: dict[str, int] = {}
    for doc in tokenized_docs:
        for t in doc:
            vocab.setdefault(t, len(vocab))
    df = np.zeros(len(vocab))
    tfs = []
    for doc in tokenized_docs:
        tf: dict[int, int] = {}
        for t in doc:
            tf[vocab[t]] = tf.get(vocab[t], 0) + 1
        tfs.append(tf)
        for tid in tf:
            df[tid] += 1
    idf = compute_idf(df, n, epsilon)
    scores = np.zeros(n)
    for q in tokenized_query:
        tid = vocab.get(q)
        if tid is None:
            continue
        for i, tf in enumerate(tfs):
            f = tf.get(tid, 0)
            if f:
                norm = k1 * (1 - b + b * doc_len[i] / avgdl)
                scores[i] += idf[tid] * f * (k1 + 1) / (f + norm)
    return scores

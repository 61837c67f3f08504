"""On-device reciprocal-rank fusion.

The host ``RRFusion`` (utils/fusion.py) dedups by document content —
needed when fusing across *different* retrievers with unrelated id spaces.
When every path shares one id space (multi-query rewrite fan-out over a
single store — BASELINE config 4), fusion itself can stay on device: one
XLA program computes RRF scores with position-identity dedup over the
(B, P, k) candidate tensor and returns the fused top-k, so the variants'
candidates never visit the host individually.

Shapes are tiny (P·k ≤ a few hundred), so this is plain jnp — the win is
avoiding P·k per-candidate host resolutions and a python fuse loop per
query, not FLOPs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k_out", "rrf_k"))
def rrf_fuse_positions(
    positions: jax.Array,  # (B, P, k) int32 candidate ids per path, -1 = empty
    k_out: int,
    rrf_k: int = 60,
) -> tuple[jax.Array, jax.Array]:
    """Fuse P ranked candidate lists per query into an RRF top-k_out.

    Returns (scores (B, k_out), positions (B, k_out)); empty slots are
    (-inf, -1). Duplicate ids accumulate 1/(rrf_k + rank) across all their
    occurrences (reference Fusion.py:45-76 semantics, id-keyed).
    """
    b, p, k = positions.shape
    flat = positions.reshape(b, p * k)  # (B, M)
    # ranks are 1-based (reference Fusion.py assigns rank = i + 1), so the
    # top hit contributes 1/(rrf_k + 1)
    ranks = jnp.tile(jnp.arange(1, k + 1, dtype=jnp.float32), (p,))  # (M,)
    contrib = jnp.where(flat >= 0, 1.0 / (rrf_k + ranks)[None, :], 0.0)  # (B, M)

    # pairwise identity: same[b, i, j] = flat[b,i] == flat[b,j] (valid only)
    eq = (flat[:, :, None] == flat[:, None, :]) & (flat[:, :, None] >= 0)
    # accumulate every occurrence's contribution onto each candidate slot
    scores = jnp.einsum("bij,bj->bi", eq.astype(jnp.float32), contrib)
    # keep only the first occurrence of each id (mask later duplicates)
    idx = jnp.arange(p * k)
    earlier_dup = jnp.any(eq & (idx[None, :, None] > idx[None, None, :]), axis=2)
    scores = jnp.where((flat >= 0) & ~earlier_dup, scores, -jnp.inf)

    fused_scores, sel = jax.lax.top_k(scores, k_out)
    fused_positions = jnp.take_along_axis(flat, sel, axis=1)
    fused_positions = jnp.where(
        jnp.isneginf(fused_scores), -1, fused_positions
    )
    return fused_scores, fused_positions

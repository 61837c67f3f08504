"""Fused MIPS + top-k Pallas kernel.

The XLA path (``ops.topk.masked_topk``) materializes the full (B, N) score
matrix in HBM — at B=4096, N=2M that is 32 GB and OOMs the chip. This
kernel never materializes scores: the corpus streams through VMEM in tiles
(Pallas double-buffers the HBM→VMEM DMA automatically via the grid
BlockSpec), each tile's scores are computed on the MXU and immediately
folded into a running (B, k) top-k held in VMEM scratch, and only the
final (B, k) leaves the chip. This is SURVEY.md §7's "fused top-k" hard
part: HBM traffic drops from O(B·N) to O(N·d + B·k).

Grid layout: ``(corpus_tiles, query_blocks)`` with the query axis
innermost. The corpus BlockSpec depends only on the tile index, so Mosaic
keeps the tile resident in VMEM across all query blocks — the corpus is
read from HBM exactly once per search regardless of batch size, which is
what lets large batches amortize bandwidth (the whole point of batched
MIPS on TPU).

Top-k maintenance: per (tile, qblock), up-to-k extraction rounds pull the
tile-local top-k in place, then a 2k-wide merge updates the running lists.
Two optimizations keep the VPU cost down (both exact):
- threshold early-exit (``skip_tiles``): one count of scores beating each
  query's current kth-best gates every round through ``lax.cond`` — after
  the first few tiles most run 0–2 rounds, and losing tiles skip entirely;
- packed extraction (``packed``): the order-preserving float→int32
  transform with the within-tile index in the low bits makes one int32
  max carry both score and position (no argmax pass, deterministic
  index tie-breaks; score quantized to ~12 mantissa bits at tile 2048).
Measured on v5e (2M×768 bf16, B=512, k=10): tile 2048 × q_block 256 is
the VMEM-feasible optimum.

Metrics: cosine (pre-normalized corpus; queries normalized here), ip, and
l2 via the ‖q‖²−2q·e+‖e‖² trick (sqnorm streamed with the tile).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # sentinel below any real score, avoids inf-inf NaN


def _fused_kernel(q_ref, corpus_ref, valid_ref, sqnorm_ref, out_s_ref, out_p_ref,
                  run_s, run_p, *, k: int, tile_n: int, q_block: int, metric: str,
                  skip_tiles: bool, packed: bool):
    tile_idx = pl.program_id(0)
    q_idx = pl.program_id(1)
    row0 = q_idx * q_block

    @pl.when(tile_idx == 0)
    def _init():
        run_s[pl.ds(row0, q_block), :] = jnp.full((q_block, k), NEG, jnp.float32)
        run_p[pl.ds(row0, q_block), :] = jnp.full((q_block, k), -1, jnp.int32)

    q = q_ref[:]  # (q_block, D)
    tile = corpus_ref[:]  # (TILE_N, D) — resident across the q_idx sweep
    scores = jax.lax.dot_general(
        q,
        tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (q_block, TILE_N)
    if metric == "l2":
        # -(‖q‖² - 2 q·e + ‖e‖²); ‖q‖² is rank-preserving but kept for
        # score parity with the exact path
        q32 = q.astype(jnp.float32)
        q_sq = jnp.sum(q32 * q32, axis=1, keepdims=True)
        scores = -(q_sq - 2.0 * scores + sqnorm_ref[:])  # sqnorm (1, TILE_N)
    valid = valid_ref[:]  # (1, TILE_N) int8; Mosaic wants ≥2-D layouts
    scores = jnp.where(valid != 0, scores, NEG)

    base = tile_idx * tile_n

    # threshold early-exit: θ_q = the query's current kth-best. Scores ≤ θ_q
    # can never enter the global top-k, so (a) a tile where no score beats
    # any θ_q skips everything, and (b) extraction stops after
    # max_q |{scores_q > θ_q}| rounds instead of always k. After the first
    # ~k tiles raise θ, most tiles run 0–2 rounds. Exact by construction.
    if skip_tiles:
        theta = jnp.min(run_s[pl.ds(row0, q_block), :], axis=1, keepdims=True)
        counts = jnp.sum((scores > theta).astype(jnp.int32), axis=1)  # (qb,)
        max_count = jnp.max(counts)
        needs_work = max_count > 0
    else:
        max_count = jnp.int32(k)
        needs_work = tile_idx >= 0  # always

    # packed extraction: apply the order-preserving float→int32 transform
    # (b >= 0 ? b : b ^ 0x7FFFFFFF — IEEE bit patterns become monotone
    # under signed comparison) and steal the low ceil(log2(tile_n)) bits
    # for the within-tile index. One int32 max then carries both the best
    # score (quantized by idx_bits mantissa bits — 12 at tile_n=2048, step
    # ~1e-4 relative) and its position; each round is max + equality-mask
    # (2 passes) instead of max/argmax/slot-write/mask (4), with ties
    # broken deterministically by the embedded index.
    idx_bits = (tile_n - 1).bit_length()
    use_packed = packed and idx_bits <= 16

    @pl.when(needs_work)
    def _work():
        # phase 1: tile-local top-k in place over scores. No (B, TILE_N)
        # position tensor — positions come from argmax directly. Each round
        # is real control flow (lax.cond): rounds past max_count cost O(1).
        cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        cols_k = jax.lax.broadcasted_iota(jnp.int32, (q_block, k), 1)

        if use_packed:
            low_mask = jnp.int32((1 << idx_bits) - 1)
            flip = jnp.int32(0x7FFFFFFF)
            bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
            keyed = jnp.where(bits >= 0, bits, bits ^ flip)
            pack = (keyed & ~low_mask) | cols
            INT_MIN = jnp.int32(-2147483648)
            init = (
                pack,
                jnp.full((q_block, k), NEG, jnp.float32),
                jnp.full((q_block, k), -1, jnp.int32),
            )

            def round_body(r, carry):
                def extract(c):
                    p, ts, tp = c
                    best = jnp.max(p, axis=1, keepdims=True)  # (q_block, 1)
                    idx = best & low_mask
                    keyed_best = best & ~low_mask
                    score_bits = jnp.where(
                        keyed_best >= 0, keyed_best, keyed_best ^ flip
                    )
                    score = jax.lax.bitcast_convert_type(score_bits, jnp.float32)
                    slot = cols_k == r
                    ts = jnp.where(slot, score, ts)
                    tp = jnp.where(slot, base + idx, tp)
                    p = jnp.where(p == best, INT_MIN, p)
                    return p, ts, tp

                return jax.lax.cond(max_count > r, extract, lambda c: c, carry)
        else:
            init = (
                scores,
                jnp.full((q_block, k), NEG, jnp.float32),
                jnp.full((q_block, k), -1, jnp.int32),
            )

            def round_body(r, carry):
                def extract(c):
                    s, ts, tp = c
                    best = jnp.max(s, axis=1, keepdims=True)  # (q_block, 1)
                    idx = jnp.argmax(s, axis=1).astype(jnp.int32)  # (q_block,)
                    # write column r via a static mask (Mosaic has no value
                    # dynamic_update_slice; r is a Python int here)
                    slot = cols_k == r
                    ts = jnp.where(slot, best, ts)
                    tp = jnp.where(slot, base + idx[:, None], tp)
                    s = jnp.where(cols == idx[:, None], NEG, s)
                    return s, ts, tp

                return jax.lax.cond(max_count > r, extract, lambda c: c, carry)

        carry = init
        for r in range(k):
            carry = round_body(r, carry)
        _, tile_s, tile_p = carry

        # phase 2: merge running (q_block, k) with tile (q_block, k).
        cand_s = jnp.concatenate(
            [run_s[pl.ds(row0, q_block), :], tile_s], axis=1
        )
        cand_p = jnp.concatenate(
            [run_p[pl.ds(row0, q_block), :], tile_p], axis=1
        )
        cols2k = jax.lax.broadcasted_iota(jnp.int32, cand_s.shape, 1)
        new_s = []
        new_p = []
        for _ in range(k):
            best = jnp.max(cand_s, axis=1, keepdims=True)
            idx = jnp.argmax(cand_s, axis=1)
            onehot = cols2k == idx[:, None]
            # gather-free position extraction (Mosaic has no general gather)
            new_p.append(jnp.sum(jnp.where(onehot, cand_p, 0), axis=1, keepdims=True))
            new_s.append(best)
            cand_s = jnp.where(onehot, NEG, cand_s)
        run_s[pl.ds(row0, q_block), :] = jnp.concatenate(new_s, axis=1)
        run_p[pl.ds(row0, q_block), :] = jnp.concatenate(new_p, axis=1)

    @pl.when(tile_idx == pl.num_programs(0) - 1)
    def _emit():
        out_s_ref[:] = run_s[pl.ds(row0, q_block), :]
        out_p_ref[:] = run_p[pl.ds(row0, q_block), :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "tile_n", "q_block", "metric", "interpret", "skip_tiles", "packed"
    ),
)
def fused_mips_topk(
    queries: jax.Array,
    corpus: jax.Array,
    valid: jax.Array,
    sqnorm: jax.Array,
    k: int,
    tile_n: int = 1024,
    q_block: int = 256,
    metric: str = "cosine",
    interpret: bool = False,
    skip_tiles: bool = False,
    packed: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(B, d) × (N, d) → top-k (scores (B, k), positions (B, k)).

    N must be a multiple of ``tile_n`` and B of ``q_block`` (the index pads
    its capacity / the caller pads the batch); ``valid`` masks padding and
    tombstones. For cosine the corpus must be pre-normalized (queries are
    normalized here). ``interpret=True`` runs in the Pallas interpreter
    (CPU-testable oracle parity).
    """
    n, d = corpus.shape
    b = queries.shape[0]
    q_block = min(q_block, b)
    if n % tile_n != 0:
        raise ValueError(f"corpus rows {n} not a multiple of tile_n {tile_n}")
    if b % q_block != 0:
        raise ValueError(f"batch {b} not a multiple of q_block {q_block}")
    if metric == "cosine":
        norm = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
        queries = queries / jnp.maximum(norm, 1e-12)
    queries = queries.astype(corpus.dtype)
    valid_i8 = valid.astype(jnp.int8).reshape(1, n)
    sqnorm_2d = sqnorm.reshape(1, n)

    grid = (n // tile_n, b // q_block)
    kernel = functools.partial(
        _fused_kernel, k=k, tile_n=tile_n, q_block=q_block, metric=metric,
        skip_tiles=skip_tiles, packed=packed,
    )
    out_s, out_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_block, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_block, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries, corpus, valid_i8, sqnorm_2d)
    return out_s, out_p

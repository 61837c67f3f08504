"""Two-level exact MIPS top-k: sub-tile max kernel + candidate rescore.

Replaces ``ops.fused_mips`` as the TPU throughput path (same contract:
exact FAISS-flat behavior, ``VectorStore_Faiss.py:250-274``). The r1 fused
kernel maintained a running (B, k) top-k inside the grid, which serialized
every step through VMEM scratch and spent ~20 µs/step on extraction rounds,
``lax.cond`` chains, and misaligned (B, k) updates — leaving 3-8x on the
table vs the matmul roofline. This design removes *all* per-step state:

  pass 1 (Pallas): scores = q · tileᵀ on the MXU, tombstone mask, then an
    exact max over every ``g``-row sub-tile → (B, N/g) f32. No scratch, no
    conditionals, no cross-step dependency: Mosaic pipelines HBM→VMEM DMA
    against pure matmul at full depth, and the corpus is read exactly once
    per search (query axis is the inner grid dimension).
  select (XLA): ``lax.top_k`` over the (B, N/g) maxes picks each query's
    top-k sub-tiles. Tiny: N/g columns instead of N.
  pass 2 (XLA): gather those k·g rows, rescore exactly, global
    ``lax.top_k``.

Exactness proof: if a row r is among the true top-k, its sub-tile's max is
>= score(r) >= s_k (the k-th best score). At most k sub-tiles can have
max >= s_k — each such sub-tile contributes one score >= s_k and there are
only k of those — so every winner-bearing sub-tile is among the top-k
sub-tiles by max. The candidate set therefore contains the entire exact
top-k, and pass 2 rescores with true (un-quantized) scores, so the result
equals the exact search bit-for-bit at equal matmul precision.

Measured on v5e (2M×768 bf16 corpus, B=512, k=10, fetch-verified timing,
same-session A/B): tile 2048 × q_block 512 × g=32 runs 21.3 ms/batch
median (24.0k QPS, recall@10 0.995 vs f32 exact) with ±1.5% run-to-run
spread, vs 47.2 ms for the r1 fused kernel in the same session. Sweep:
g=128 → 32.4 ms, g=64 → 23.8 ms, g=32 → 21.3 ms, g=16 → 21.9 ms
(plateau); q_block 256 and tile 1024 both lose slightly; tile 4096 fails
compile on VMEM. The selection stage must NOT be ``lax.top_k`` — XLA
lowers that to a full variadic sort (~30 ms on the (512, 62k) sub-max
matrix); ``_iterative_argmax`` does a hierarchical tournament instead.

Current production state: the SINGLE-invocation streaming producer
(ops/two_level_stream.py) replaced this grid kernel on the default path,
selection became the tournament argmax, and the sweep re-ran at the new
select cost — g=16 now wins (smaller rescore gather). Full bench:
35.7k QPS sustained at recall@10 0.994 (see ARCHITECTURE.md §2b for the
measured floors and the failed-experiments record).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # sentinel below any real score, avoids inf-inf NaN


def _subtile_max_kernel(q_ref, corpus_ref, valid_ref, sqnorm_ref, out_ref,
                        *, g: int, metric: str):
    # transposed layout throughout: scores are (tile_n, q_block) so the
    # output block is (tile_n/g, q_block) — Mosaic requires the last two
    # block dims to be (8, 128)-aligned, which (q_block, tile_n/g) is not.
    # This l2 variant keeps the (tile_n, 1) column operands: the 3-D
    # blocked sqnorm form (see _subtile_max_kernel_ip's valid handling)
    # fails Mosaic lowering on v5e for the fused -(q_sq - 2s + sqnorm)
    # expression, and l2 is not the production metric — cosine/ip (the
    # column-free kernel below) and the int8 kernels carry the 10M-scale
    # paths. At 10M rows the columns would lane-pad 128x (5.1 GiB for an
    # f32 column, the measured OOM pattern); l2 corpora that large should
    # use the certified stream or int8 paths.
    q = q_ref[:]           # (q_block, d)
    tile = corpus_ref[:]   # (tile_n, d) — resident across the q sweep
    scores = jax.lax.dot_general(
        tile,
        q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (tile_n, q_block) f32
    if metric == "l2":
        q32 = q.astype(jnp.float32)
        q_sq = jnp.sum(q32 * q32, axis=1)[None, :]  # (1, q_block)
        scores = -(q_sq - 2.0 * scores + sqnorm_ref[:])  # sqnorm (tile_n, 1)
    scores = jnp.where(valid_ref[:] != 0, scores, NEG)  # valid (tile_n, 1)
    tn, qb = scores.shape
    out_ref[:] = jnp.max(scores.reshape(tn // g, g, qb), axis=1)


def _subtile_max_kernel_ip(q_ref, corpus_ref, valid_ref, out_ref,
                           *, g: int):
    """Cosine/ip grid kernel: no sqnorm operand at all — the l2 kernel's
    sqnorm stream would be pure dead DMA here (Pallas operands are opaque
    to XLA DCE, so an unused ref still materializes its padded layout)."""
    q = q_ref[:]
    tile = corpus_ref[:]
    scores = jax.lax.dot_general(
        tile,
        q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tn, qb = scores.shape
    s3 = scores.reshape(tn // g, g, qb)
    v3 = valid_ref[:].astype(jnp.int32)[:, :, None]  # i8->i32: Mosaic minor-dim rule
    s3 = jnp.where(v3 != 0, s3, NEG)
    out_ref[:] = jnp.max(s3, axis=1)


def _subtile_max_kernel_i8(q_ref, corpus_ref, scale_ref, valid_ref, out_ref,
                           *, g: int):
    """Int8 variant: corpus rows are per-row-scaled int8; the MXU runs the
    int8×int8→int32 product at twice the bf16 rate, and the row scale
    applies before the sub-tile max (scales differ per row, so max must
    see scaled values). The per-query quantization scale is constant per
    column and therefore cannot change any per-query ordering — it is
    never applied."""
    q = q_ref[:]           # (q_block, d) int8
    tile = corpus_ref[:]   # (tile_n, d) int8
    scores = jax.lax.dot_general(
        tile,
        q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (tile_n, q_block) int32
    tn, qb = scores.shape
    s3 = scores.astype(jnp.float32).reshape(tn // g, g, qb)
    s3 = s3 * scale_ref[:][:, :, None]   # scale (tile_n/g, g) per-row
    v3 = valid_ref[:].astype(jnp.int32)[:, :, None]  # i8->i32: Mosaic minor-dim rule
    s3 = jnp.where(v3 != 0, s3, NEG)
    out_ref[:] = jnp.max(s3, axis=1)


# any real int8 dot is bounded by 127*127*d (|dot| < 1.3e7 at d=768); the
# sentinel sits far below, and surviving maxes are compared against half
# its scaled value before the per-sub-tile scale folds in
_MASK_I32 = -(1 << 30)


def _subtile_max_kernel_i8_block(q_ref, corpus_ref, sub_scale_ref, valid_ref,
                                 out_ref, *, g: int):
    """Block-shared-scale int8 variant: when every row of a ``g``-row
    sub-tile carries the SAME quantization scale (flat.py's invariant —
    QUANT_BLOCK=32 blocks share one scale and g divides 32), the scale can
    fold in AFTER the sub-tile max: max(s·x_i) == s·max(x_i) for s > 0,
    value-identical to the per-row kernel. Tombstones are masked on the
    raw int32 scores with a sentinel no real dot can reach.

    Why this exists: the per-row kernel ships scale as an (N, 1) f32
    column and valid as an (N, 1) int8 column. TPU tiled layout pads the
    minor dim to 128 lanes, so at 10M rows the scale column alone
    materializes a 5.1 GiB temp (XLA memory_analysis: 5.96 GiB temps for
    pass-1, the measured 10M+refine OOM). Per-sub-tile scale is (N/g, 1)
    → 128x smaller, cutting pass-1 temps to 1.49 GiB and making 10M int8
    + int4-residual search fit one 16 GB chip."""
    q = q_ref[:]           # (q_block, d) int8
    tile = corpus_ref[:]   # (tile_n, d) int8
    scores = jax.lax.dot_general(
        tile,
        q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (tile_n, q_block) int32
    tn, qb = scores.shape
    s3 = scores.reshape(tn // g, g, qb)
    v3 = valid_ref[:].astype(jnp.int32)[:, :, None]  # i8->i32: Mosaic minor-dim rule
    s3 = jnp.where(v3 != 0, s3, _MASK_I32)
    m = jnp.max(s3, axis=1).astype(jnp.float32)
    out_ref[:] = jnp.where(
        m <= _MASK_I32 * 0.5, NEG, m * sub_scale_ref[:]  # scale (tn/g, 1)
    )


def quantize_rows(vectors, axis: int = -1):
    """Symmetric per-row int8 quantization: returns (int8 codes, f32
    scales) with ``codes * scale ≈ vectors``."""
    import numpy as _np

    vectors = _np.asarray(vectors, dtype=_np.float32)
    amax = _np.abs(vectors).max(axis=axis, keepdims=True)
    scale = _np.maximum(amax, 1e-12) / 127.0
    codes = _np.clip(_np.rint(vectors / scale), -127, 127).astype(_np.int8)
    return codes, scale.squeeze(axis).astype(_np.float32)


def quantize_rows_blocked(vectors, block: int = 32):
    """Symmetric int8 quantization with ONE shared scale per ``block``
    consecutive rows (the streaming kernel's sub-tile). Pads the row count
    up to a block multiple (zero rows, scale shared with their block).

    Why blocks: when every row of a sub-tile shares its scale, the raw
    int32 sub-tile max times that scale IS the exact scaled sub-max — the
    streaming int8 producer needs no per-row scale stream (Mosaic rejects
    the (tile_n, 1) DMA) and no upper-bound slack; the classic two-level
    selection proof applies unchanged under the blocked-quantized metric.
    Cost vs per-row scales: rows whose amax is below their block's max
    use proportionally fewer levels (recall impact is measured, not
    assumed — see tests and the bench).

    Returns (codes (n_pad, d) int8, scales (n_pad,) f32 expanded per row).
    """
    import numpy as _np

    vectors = _np.asarray(vectors, dtype=_np.float32)
    n, d = vectors.shape
    n_pad = ((n + block - 1) // block) * block
    if n_pad != n:
        vectors = _np.concatenate(
            [vectors, _np.zeros((n_pad - n, d), dtype=_np.float32)]
        )
    blocks = vectors.reshape(n_pad // block, block, d)
    amax = _np.abs(blocks).max(axis=(1, 2), keepdims=True)
    scale = _np.maximum(amax, 1e-12) / 127.0
    codes = _np.clip(_np.rint(blocks / scale), -127, 127).astype(_np.int8)
    scales = _np.repeat(scale[:, 0, 0].astype(_np.float32), block)
    return codes.reshape(n_pad, d), scales


@functools.partial(
    jax.jit,
    static_argnames=("k", "g", "tile_n", "q_block", "interpret",
                     "block_scales"),
)
def two_level_topk_i8(
    queries: jax.Array,    # (B, d) f32
    corpus: jax.Array,     # (N, d) int8, rows pre-normalized then quantized
    row_scale: jax.Array,  # (N,) f32
    valid: jax.Array,      # (N,) bool
    k: int,
    g: int = 32,
    tile_n: int = 2048,
    q_block: int = 512,
    interpret: bool = False,
    block_scales: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Quantized two-level top-k (cosine/ip). Pass 1 and pass 2 use the
    SAME int8 arithmetic, so the sub-tile-selection exactness proof holds
    for the quantized metric; the result is the exact top-k of the int8
    dot scaled back to the cosine range (~0.1-0.5% from f32 — recall is
    measured, not assumed; see tests and the bench).

    ``block_scales=True`` asserts every g-row sub-tile shares ONE scale
    (true for flat.py storage: QUANT_BLOCK-shared scales, g | 32) and
    switches to the low-memory pass-1 kernel (scale applied per sub-tile
    after an int32-sentinel-masked max — value-identical under the
    invariant, 128x smaller scale operand; see
    _subtile_max_kernel_i8_block). Callers with genuinely per-row scales
    (quantize_rows) must leave it False."""
    n, d = corpus.shape
    b_in = queries.shape[0]
    # Mosaic's int8 dot lowers to the int32-accumulating MXU path only for
    # matrix RHS — a (1, d) single-query RHS takes the matrix-vector rule,
    # which rejects preferred_element_type=int32 (isolated repro on this
    # backend: qb=1 fails, qb>=2 compiles). Pad one zero query and slice.
    if b_in == 1:
        queries = jnp.concatenate([queries, jnp.zeros_like(queries)])
    b = queries.shape[0]
    q_block = min(q_block, b)
    if tile_n % g != 0 or n % tile_n != 0 or b % q_block != 0:
        raise ValueError("alignment: n % tile_n, tile_n % g, b % q_block")
    q_i8, qscale = quantize_queries(queries)

    n_sub = n // g
    # valid ships as (n_sub, g) blocks, not an (n, 1) column — the column
    # lane-pads to 128 and costs 128x its bytes in HBM (1.28 GiB at 10M
    # rows); the block form costs 128/g x (see _subtile_max_kernel)
    valid_blk = valid.astype(jnp.int8).reshape(n_sub, g)
    if block_scales:
        # one scale per sub-tile (row 0 stands for the whole block)
        scale_col = row_scale.reshape(n_sub, g)[:, :1]
        kernel = functools.partial(_subtile_max_kernel_i8_block, g=g)
        scale_spec = pl.BlockSpec(
            (tile_n // g, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )
    else:
        scale_col = row_scale.reshape(n_sub, g)
        kernel = functools.partial(_subtile_max_kernel_i8, g=g)
        scale_spec = pl.BlockSpec(
            (tile_n // g, g), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )
    sub_max_t = pl.pallas_call(
        kernel,
        grid=(n // tile_n, b // q_block),
        in_specs=[
            pl.BlockSpec((q_block, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            scale_spec,
            pl.BlockSpec(
                (tile_n // g, g), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_n // g, q_block), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_sub, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + 4 * b * n_sub,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_i8, corpus, scale_col, valid_blk)

    s, pos = select_rescore_i8(
        q_i8, qscale, corpus, row_scale, valid, sub_max_t, k, g
    )
    return s[:b_in], pos[:b_in]


def subtile_max_scan(
    queries: jax.Array,   # (B, d) already normalized/cast to corpus dtype
    corpus: jax.Array,    # (N, d) f32/bf16, or int8 codes
    g: int = 16,
    tile_n: int = 2048,
) -> jax.Array:
    """(N/g, B) sub-tile maxima via a plain ``lax.scan`` over corpus
    tiles — the A/B reference producer (producer="scan").

    Measured same-session on v5e (2M×768 bf16 B=512, FULL certified
    path): scan 22.0 ms vs the Pallas stream kernel's 17.2 ms — the
    stream kernel stays the default. (A pass-1-only probe once showed
    the scan at 12.2 ms; that was an XLA dead-code artifact — fetching
    one output element let XLA elide most scan steps. Pallas kernels are
    opaque to DCE, so only full-path or fully-fetched comparisons are
    trustworthy.) The scan's remaining virtues: no Mosaic constraints —
    any B (the stream kernel needs B % 128 == 0), any backend (CPU runs
    it without interpret mode), no VMEM budget.

    Maskless like the stream kernel: dead rows must be ZEROED
    (flat.mark_deleted's invariant) and exactness comes from the
    caller's certificate. int8 corpora emit raw int32 maxes converted
    to f32 (exact for d ≤ 1040)."""
    n, d = corpus.shape
    b = queries.shape[0]
    if n % tile_n or tile_n % g:
        raise ValueError("alignment: n % tile_n == 0, tile_n % g == 0")
    int8_mode = corpus.dtype == jnp.int8
    tiles = corpus.reshape(n // tile_n, tile_n, d)

    def step(carry, tile):
        s = jax.lax.dot_general(
            tile,
            queries,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if int8_mode else jnp.float32,
        )  # (tile_n, B)
        sub = jnp.max(s.reshape(tile_n // g, g, b), axis=1)
        return carry, sub.astype(jnp.float32)

    _, subs = jax.lax.scan(step, 0, tiles)
    return subs.reshape(n // g, b)


def quantize_queries(queries: jax.Array):
    """Normalize + symmetric per-query int8 quantization (the query-side
    half of the int8 metric). Returns (codes (B, d) int8, scale (B, 1))."""
    norm = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
    qn = queries / jnp.maximum(norm, 1e-12)
    qmax = jnp.max(jnp.abs(qn), axis=-1, keepdims=True)
    qscale = jnp.maximum(qmax, 1e-12) / 127.0
    q_i8 = jnp.clip(jnp.round(qn / qscale), -127, 127).astype(jnp.int8)
    return q_i8, qscale


def select_rescore_i8(q_i8, qscale, corpus, row_scale, valid, sub_max_t, k, g):
    """Int8 stages 2+3: sub-tile select from the (N/g, B) sub-max matrix,
    gather + rescore with the SAME int8 arithmetic as pass 1, global
    top-k. Shared by the grid producer above and the streaming producer
    (ops/two_level_stream.py)."""
    n_sub = sub_max_t.shape[0]
    k_tiles = min(k, n_sub)
    top_sub, sel_live = _iterative_argmax(sub_max_t.T, k_tiles)
    s, pos = rescore_i8(q_i8, corpus, row_scale, valid, top_sub, sel_live, k, g)
    return fold_qscale(s, pos, qscale, k)


def rescore_i8(q_i8, corpus, row_scale, valid, top_sub, sel_live, k, g):
    """Gather the selected sub-tiles' rows and rescore exactly under the
    per-row int8 metric. Returns RAW scores (codes·codes × row_scale, no
    per-query fold) so callers can compare against same-unit bounds."""
    b = q_i8.shape[0]
    k_tiles = top_sub.shape[1]
    rows = (
        top_sub[:, :, None] * g + jnp.arange(g, dtype=top_sub.dtype)[None, None, :]
    ).reshape(b, k_tiles * g)
    cand = jnp.take(corpus, rows, axis=0)              # (B, C, d) int8
    cand_scale = jnp.take(row_scale, rows, axis=0)     # (B, C)
    cand_valid = jnp.take(valid, rows, axis=0)
    cand_valid = cand_valid & jnp.repeat(sel_live, g, axis=1)
    ci32 = jax.lax.dot_general(
        q_i8,
        cand,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (B, C) — same arithmetic as pass 1
    cscores = ci32.astype(jnp.float32) * cand_scale
    cscores = jnp.where(cand_valid, cscores, NEG)
    k_out = min(k, cscores.shape[1])
    s, ci = jax.lax.top_k(cscores, k_out)
    pos = jnp.take_along_axis(rows, ci, axis=1).astype(jnp.int32)
    pos = jnp.where(s <= NEG * 0.5, -1, pos)
    return s, pos


def fold_qscale(s, pos, qscale, k):
    """Fold the per-query quantization scale into raw int8-metric scores
    (reporting them in the cosine range) and pad out to k columns."""
    s = jnp.where(s <= NEG * 0.5, s, s * qscale)
    k_out = s.shape[1]
    if k_out < k:
        pad = k - k_out
        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=NEG)
        pos = jnp.pad(pos, ((0, 0), (0, pad)), constant_values=-1)
    return s, pos


def iterative_argmax_resid(x: jax.Array, k: int, chunk: int = 512):
    """Indices of the k largest entries per row (score-descending, ties
    toward the lower index), a liveness flag per pick, and the row-max of
    the UNSELECTED remainder (the a-posteriori bound the streaming int8
    path's certificate compares against).

    Hierarchical tournament instead of k full argmax passes: one pass
    builds per-chunk (max, argmax); each of the k selection steps then
    reads only the (B, n_chunks) summary, re-gathers the ONE chunk it
    picked from, masks every prior pick that falls in it, and scatters the
    chunk's refreshed (max, argmax) back. HBM traffic drops from 2k full
    reads of x (e.g. ~2.5 GB at k=10 over a (512, 62500) sub-max matrix)
    to one full read + k ~1 MB chunk gathers. Tie-breaking matches the
    naive version: argmax picks the first chunk holding the global max,
    then the first position inside it."""
    b, c = x.shape
    w = min(chunk, c)
    # prefer a chunk width that DIVIDES c: the pad below copies the whole
    # (B, c) matrix (610 MB at 10M capacity / g=16 — real HBM at the
    # 10M+refine ceiling). Capacities are ADD_BLOCK (1024) multiples, so
    # a 128-lane-aligned divisor almost always exists.
    if c % w:
        for cand in (512, 256, 128):
            if cand <= chunk and c % cand == 0:
                w = cand
                break
    n_chunks = -(-c // w)
    c_pad = n_chunks * w
    if c_pad != c:
        x = jnp.pad(x, ((0, 0), (0, c_pad - c)), constant_values=NEG)
    xc = x.reshape(b, n_chunks, w)
    cmax = jnp.max(xc, axis=2)                          # (B, nc)
    carg = jnp.argmax(xc, axis=2).astype(jnp.int32)     # (B, nc)
    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)[None, :]
    in_chunk = jnp.arange(w, dtype=jnp.int32)[None, :]
    picked0 = jnp.full((b, k), -1, dtype=jnp.int32)

    # lax.scan, NOT a Python loop: the body is identical per step, and
    # unrolling it k times made the HLO grow with k — a kf=40 rescore
    # fetch at 10M capacity produced a compile so large the remote
    # compiler effectively hung (measured r3); the scanned graph is O(1)
    # in k
    def step(carry, j):
        cmax, carg, picked = carry
        bc = jnp.argmax(cmax, axis=1).astype(jnp.int32)           # (B,)
        best = jnp.take_along_axis(cmax, bc[:, None], axis=1)[:, 0]
        idx = (
            jnp.take_along_axis(carg, bc[:, None], axis=1)[:, 0] + bc * w
        )
        # exhausted rows re-pick sentinel positions; clamp so downstream
        # gathers stay in range (live marks them dead either way)
        idx = jnp.minimum(idx, c - 1)
        picked = jax.lax.dynamic_update_slice(
            picked, idx[:, None], (0, j)
        )
        # refresh the picked chunk: gather it, mask ALL prior picks that
        # land in it (several picks can share a chunk), reduce, scatter
        vals = jnp.take_along_axis(xc, bc[:, None, None], axis=1)[:, 0, :]
        cols = bc[:, None] * w + in_chunk                         # (B, w)
        hit = jnp.any(cols[:, None, :] == picked[:, :, None], axis=1)
        vals = jnp.where(hit, NEG, vals)
        new_max = jnp.max(vals, axis=1)
        new_arg = jnp.argmax(vals, axis=1).astype(jnp.int32)
        sel = chunk_ids == bc[:, None]
        cmax = jnp.where(sel, new_max[:, None], cmax)
        carg = jnp.where(sel, new_arg[:, None], carg)
        return (cmax, carg, picked), (idx, best > NEG * 0.5)

    (cmax, carg, _), (out, live) = jax.lax.scan(
        step, (cmax, carg, picked0), jnp.arange(k, dtype=jnp.int32)
    )
    return (
        jnp.transpose(out, (1, 0)),
        jnp.transpose(live, (1, 0)),
        jnp.max(cmax, axis=1),
    )


def _iterative_argmax(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Indices of the k largest entries per row, score-descending (exact;
    ties break toward the lower index), plus a liveness flag per pick.
    O(k) cheap passes over x. Once a row runs out of non-sentinel values,
    argmax re-picks column 0 — ``live`` marks those picks so the caller
    can mask them (otherwise a sub-tile's rows would enter the candidate
    set twice and could duplicate positions in the final top-k)."""
    idx, live, _ = iterative_argmax_resid(x, k)
    return idx, live


@functools.partial(
    jax.jit,
    static_argnames=("k", "g", "tile_n", "q_block", "metric", "interpret"),
)
def two_level_topk(
    queries: jax.Array,
    corpus: jax.Array,
    valid: jax.Array,
    sqnorm: jax.Array,
    k: int,
    g: int = 32,
    tile_n: int = 2048,
    q_block: int = 512,
    metric: str = "cosine",
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(B, d) × (N, d) → exact top-k (scores (B, k), positions (B, k)).

    N must be a multiple of ``tile_n`` (itself a multiple of ``g``) and B of
    ``q_block``; ``valid`` masks padding and tombstones (empty slots return
    score ``NEG`` / position -1, like ``fused_mips_topk``). For cosine the
    corpus must be pre-normalized; queries are normalized here.
    ``interpret=True`` runs pass 1 in the Pallas interpreter (CPU oracle
    tests).
    """
    n, d = corpus.shape
    b = queries.shape[0]
    q_block = min(q_block, b)
    if tile_n % g != 0:
        raise ValueError(f"tile_n {tile_n} not a multiple of g {g}")
    if n % tile_n != 0:
        raise ValueError(f"corpus rows {n} not a multiple of tile_n {tile_n}")
    if b % q_block != 0:
        raise ValueError(f"batch {b} not a multiple of q_block {q_block}")
    if metric == "cosine":
        norm = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
        queries = queries / jnp.maximum(norm, 1e-12)
    queries = queries.astype(corpus.dtype)
    n_sub = n // g
    # cosine/ip: per-row valid ships as (n_sub, g) blocks, NOT an (n, 1)
    # column — the TPU tiled layout pads the minor dim to 128 lanes, so a
    # column costs 128x its bytes in HBM (measured: 5.1 GiB for one f32
    # column at 10M rows) while the block form costs 128/g x. l2 keeps the
    # column layout: its fused 3-D blocked form fails Mosaic lowering on
    # v5e (see _subtile_max_kernel), and l2 is not the at-scale path.
    if metric == "l2":
        kernel = functools.partial(_subtile_max_kernel, g=g, metric=metric)
        col_spec = pl.BlockSpec(
            (tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )
        in_specs_tail = [col_spec, col_spec]
        operands = (
            valid.astype(jnp.int8).reshape(n, 1),
            sqnorm.astype(jnp.float32).reshape(n, 1),
        )
    else:
        kernel = functools.partial(_subtile_max_kernel_ip, g=g)
        in_specs_tail = [
            pl.BlockSpec(
                (tile_n // g, g), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            )
        ]
        operands = (valid.astype(jnp.int8).reshape(n_sub, g),)
    sub_max_t = pl.pallas_call(
        kernel,
        grid=(n // tile_n, b // q_block),
        in_specs=[
            pl.BlockSpec((q_block, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            *in_specs_tail,
        ],
        out_specs=pl.BlockSpec(
            (tile_n // g, q_block), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_sub, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * corpus.dtype.itemsize + 4 * b * n_sub,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, corpus, *operands)

    return select_rescore(queries, corpus, valid, sqnorm, sub_max_t, k, g, metric)


def select_rescore(queries, corpus, valid, sqnorm, sub_max_t, k, g, metric):
    """Stages 2+3 of the two-level search: select each query's top-k
    sub-tiles from the (N/g, B) sub-max matrix, gather + exactly rescore
    their rows, global top-k. Shared by the grid producer above and the
    streaming producer (ops/two_level_stream.py). ``queries`` must already
    be normalized (cosine) and cast to the corpus dtype."""
    b = queries.shape[0]
    n_sub = sub_max_t.shape[0]
    # select: each query's top-k sub-tiles by max — provably a superset of
    # the sub-tiles containing the exact top-k rows (see module docstring).
    # NOT lax.top_k: XLA lowers that to a full variadic sort (~30 ms on the
    # (512, 15648) matrix, measured). Row-major tournament after ONE
    # transpose: a column-major variant that skipped the transpose was
    # measured 3x SLOWER on TPU (its per-pick chunk gather along the major
    # axis with a per-lane index lowers to a full-array cross-lane gather;
    # the row-major per-row chunk slice is cheap).
    k_tiles = min(k, n_sub)
    top_sub, sel_live = _iterative_argmax(sub_max_t.T, k_tiles)
    rows = (
        top_sub[:, :, None] * g + jnp.arange(g, dtype=top_sub.dtype)[None, None, :]
    ).reshape(b, k_tiles * g)

    # rescore: gather candidates and redo the exact scores
    cand = jnp.take(corpus, rows, axis=0)        # (B, C, d)
    cand_valid = jnp.take(valid, rows, axis=0)   # (B, C)
    cand_valid = cand_valid & jnp.repeat(sel_live, g, axis=1)
    cscores = jax.lax.dot_general(
        queries,
        cand,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, C)
    if metric == "l2":
        q32 = queries.astype(jnp.float32)
        q_sq = jnp.sum(q32 * q32, axis=1, keepdims=True)
        csq = jnp.take(sqnorm, rows, axis=0)
        cscores = -(q_sq - 2.0 * cscores + csq)
    cscores = jnp.where(cand_valid, cscores, NEG)
    k_out = min(k, cscores.shape[1])
    s, ci = jax.lax.top_k(cscores, k_out)
    pos = jnp.take_along_axis(rows, ci, axis=1).astype(jnp.int32)
    pos = jnp.where(s <= NEG * 0.5, -1, pos)
    if k_out < k:
        pad = k - k_out
        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=NEG)
        pos = jnp.pad(pos, ((0, 0), (0, pad)), constant_values=-1)
    return s, pos

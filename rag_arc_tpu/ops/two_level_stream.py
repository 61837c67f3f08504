"""Streaming variant of the two-level pass-1 kernel.

Together with ops/two_level.py this is the TPU-native replacement for the
reference's FAISS C++ exact search (``VectorStore_Faiss.py:250-274``,
IndexFlat/knn on CPU): same exact top-k contract, re-designed as an MXU
matmul + hierarchical max/select so one v5e chip serves 2M×768 at ~36k
QPS (the reference publishes no numbers; see BENCH_r02/r03).

The grid version (ops/two_level.py) pays Mosaic's per-grid-step cost ~977
times per search (measured ~8-27 µs/step depending on chip load, against
an 8.2 µs matmul per step). This variant runs ONE kernel invocation and
streams the corpus through a manually double-buffered HBM→VMEM DMA
pipeline inside a ``fori_loop``:

  for each tile (fori_loop):
      wait this tile's DMA; start the next tile's DMA
      dot (tile, q) on the MXU
      sub-tile max → staging buffer (double-buffered)
      async-copy staging → the (N/g, B) output in HBM

The output lives in HBM (memory_space=ANY) and is written by explicit
DMA, so VMEM holds only two corpus buffers + the score slab + staging.
Exactness and the select/rescore stages are identical to two_level.py —
this swaps only the sub-tile-max producer. Cosine/ip only (l2 would need
a second sqnorm stream; the grid kernel covers it).

Production path: ``two_level_topk_certified`` below runs pass 1 MASKLESS
(Mosaic cannot lower the row-mask's lane-crossing reshape, and skipping
the mask is faster anyway). Correctness comes from the index layer
zeroing dead rows (flat.mark_deleted) plus a positive-kth-score
certificate with an in-program ``lax.cond`` fallback to the masked grid
kernel — see its docstring for the proof.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_arc_tpu.ops.two_level import (
    NEG,
    quantize_queries,
    select_rescore,
    two_level_topk,
    two_level_topk_i8,
)


def _stream_kernel_piped(q_ref, corpus_hbm, out_hbm, *, g: int,
                         tile_n: int, n_tiles: int):
    """Software-pipelined maskless producer: the VPU reduces tile i-1's
    score slab while the MXU runs tile i's dot (two slabs, no data
    dependency between the units within a step). The plain kernel
    serializes dot → max per step, leaving the MXU idle through the
    reduce; measured pass-1 sits ~50% over the pure-matmul floor. Needs
    2 score slabs: tile_n is halved by the caller to stay in VMEM."""
    qb = q_ref.shape[0]
    d = q_ref.shape[1]
    rows_out = tile_n // g

    def body(corpus_buf, slab, stage, copy_sem, out_sem):
        q = q_ref[:]

        def tile_dma(slot, i):
            return pltpu.make_async_copy(
                corpus_hbm.at[pl.ds(i * tile_n, tile_n), :],
                corpus_buf.at[slot],
                copy_sem.at[slot],
            )

        def out_dma(slot, i):
            return pltpu.make_async_copy(
                stage.at[slot],
                out_hbm.at[pl.ds(i * rows_out, rows_out), :],
                out_sem.at[slot],
            )

        def dot_into(i):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_tiles)
            def _():
                tile_dma(jax.lax.rem(i + 1, 2), i + 1).start()

            tile_dma(slot, i).wait()
            int8_mode = corpus_hbm.dtype == jnp.int8
            slab[slot] = jax.lax.dot_general(
                corpus_buf[slot],
                q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=(
                    jnp.int32 if int8_mode else jnp.float32
                ),
            ).astype(jnp.float32)

        def reduce_ship(i):
            slot = jax.lax.rem(i, 2)

            @pl.when(i >= 2)
            def _():
                out_dma(slot, i - 2).wait()

            s3 = slab[slot].reshape(rows_out, g, qb)
            stage[slot] = jnp.max(s3, axis=1)
            out_dma(slot, i).start()

        tile_dma(0, 0).start()
        dot_into(0)

        def step(i, _):
            # issue tile i's dot FIRST (MXU), then reduce tile i-1's slab
            # (VPU) — independent, so the scheduler can overlap them
            dot_into(i)
            reduce_ship(i - 1)
            return 0

        jax.lax.fori_loop(1, n_tiles, step, 0)
        reduce_ship(n_tiles - 1)

        @pl.when(n_tiles >= 2)
        def _():
            out_dma(jax.lax.rem(n_tiles - 2, 2), n_tiles - 2).wait()

        out_dma(jax.lax.rem(n_tiles - 1, 2), n_tiles - 1).wait()

    pl.run_scoped(
        body,
        corpus_buf=pltpu.VMEM((2, tile_n, d), corpus_hbm.dtype),
        slab=pltpu.VMEM((2, tile_n, qb), jnp.float32),
        stage=pltpu.VMEM((2, rows_out, qb), jnp.float32),
        copy_sem=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
    )


def _stream_kernel(q_ref, corpus_hbm, valid_hbm, out_hbm, *, g: int,
                   tile_n: int, n_tiles: int, masked: bool = True):
    qb = q_ref.shape[0]
    d = q_ref.shape[1]
    rows_out = tile_n // g
    v_rows = tile_n // 128  # valid ships as (N/128, 128) — DMA wants 128 lanes

    def body(corpus_buf, valid_buf, stage, copy_sem, valid_sem, out_sem):
        q = q_ref[:]

        def tile_dma(slot, i):
            return pltpu.make_async_copy(
                corpus_hbm.at[pl.ds(i * tile_n, tile_n), :],
                corpus_buf.at[slot],
                copy_sem.at[slot],
            )

        def valid_dma(slot, i):
            return pltpu.make_async_copy(
                valid_hbm.at[pl.ds(i * v_rows, v_rows), :],
                valid_buf.at[slot],
                valid_sem.at[slot],
            )

        def out_dma(slot, i):
            return pltpu.make_async_copy(
                stage.at[slot],
                out_hbm.at[pl.ds(i * rows_out, rows_out), :],
                out_sem.at[slot],
            )

        tile_dma(0, 0).start()
        if masked:
            valid_dma(0, 0).start()

        def step(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_tiles)
            def _():
                tile_dma(nxt, i + 1).start()
                if masked:
                    valid_dma(nxt, i + 1).start()

            tile_dma(slot, i).wait()
            if masked:
                valid_dma(slot, i).wait()

            int8_mode = corpus_hbm.dtype == jnp.int8
            scores = jax.lax.dot_general(
                corpus_buf[slot],
                q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                # int8 codes ride the int8 MXU path (2x the bf16 rate);
                # the RAW int32 maxes ship out and the per-row scale
                # applies outside the kernel as a selection upper bound
                # (see two_level_topk_certified_i8)
                preferred_element_type=jnp.int32 if int8_mode else jnp.float32,
            )  # (tile_n, qb)
            s3 = scores.reshape(rows_out, g, qb)
            if masked:
                # additive mask in the 3-D grouping the grid kernel uses
                # (Mosaic rejects 4-D int8 shape casts): 0 live, NEG dead
                bias = (valid_buf[slot].astype(jnp.float32) - 1.0) * -NEG
                bias3 = bias.reshape(rows_out, g)
                s3 = s3 + bias3[:, :, None]

            # the staging slot was last shipped at step i-2; make sure that
            # copy drained before overwriting it
            @pl.when(i >= 2)
            def _():
                out_dma(slot, i - 2).wait()

            stage[slot] = jnp.max(s3, axis=1).astype(jnp.float32)
            out_dma(slot, i).start()
            return 0

        jax.lax.fori_loop(0, n_tiles, step, 0)

        # drain the last (up to two) outstanding staging copies
        @pl.when(n_tiles >= 2)
        def _():
            out_dma(jax.lax.rem(n_tiles - 2, 2), n_tiles - 2).wait()

        out_dma(jax.lax.rem(n_tiles - 1, 2), n_tiles - 1).wait()

    pl.run_scoped(
        body,
        corpus_buf=pltpu.VMEM((2, tile_n, d), corpus_hbm.dtype),
        valid_buf=pltpu.VMEM((2, v_rows, 128), jnp.int8),
        stage=pltpu.VMEM((2, rows_out, qb), jnp.float32),
        copy_sem=pltpu.SemaphoreType.DMA((2,)),
        valid_sem=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("g", "tile_n", "interpret", "masked", "pipelined"),
)
def subtile_max_stream(
    queries: jax.Array,   # (B, d) — normalized/cast by the caller
    corpus: jax.Array,    # (N, d)
    valid: jax.Array,     # (N,) bool
    g: int = 32,
    tile_n: int = 2048,
    interpret: bool = False,
    masked: bool = False,
    pipelined: bool = False,
) -> jax.Array:
    """(N/g, B) sub-tile maxima — streaming producer for two_level's
    select/rescore stages. Whole query batch in one kernel invocation.

    ``masked=False`` (the default, and the only variant production uses —
    ``two_level_topk_certified`` guarantees exactness via the certificate
    instead) is the Mosaic-compilable path. ``masked=True`` applies the
    valid-row bias in-kernel; it is exercised in interpret mode as a test
    oracle but performs the lane-crossing (v_rows, 128) → (rows, g)
    reshape that Mosaic cannot lower, so don't ship it to a real TPU.

    ``pipelined`` (maskless only) uses the two-slab variant that issues
    tile i's matmul before reducing tile i-1's slab, letting the MXU and
    VPU overlap; the caller should halve tile_n for the extra slab.

    On real TPUs B must be a multiple of 128 (B is the minor axis of the
    staging buffer and output DMA; Mosaic rejects partial-lane tiles —
    b=96 fails compile, b=128 works). Interpret mode accepts any B."""
    n, d = corpus.shape
    b = queries.shape[0]
    if n % tile_n or tile_n % 128 or 128 % g:
        raise ValueError(
            "alignment: n % tile_n == 0, tile_n % 128 == 0, 128 % g == 0"
        )
    if masked and corpus.dtype == jnp.int8:
        raise ValueError("masked mode is f32/bf16-only; int8 uses the "
                         "upper-bound certified path")
    if pipelined and masked:
        raise ValueError("the pipelined producer is maskless-only")
    n_tiles = n // tile_n
    if pipelined:
        kernel = functools.partial(
            _stream_kernel_piped, g=g, tile_n=tile_n, n_tiles=n_tiles
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        operands = (queries.astype(corpus.dtype), corpus)
    else:
        kernel = functools.partial(
            _stream_kernel, g=g, tile_n=tile_n, n_tiles=n_tiles,
            masked=masked,
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        operands = (
            queries.astype(corpus.dtype),
            corpus,
            valid.astype(jnp.int8).reshape(n // 128, 128),
        )
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n // g, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * corpus.dtype.itemsize + 4 * b * (n // g),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=("k", "g", "tile_n", "interpret", "producer",
                     "block_scales"),
)
def two_level_topk_certified_i8(
    queries: jax.Array,    # (B, d) f32
    corpus: jax.Array,     # (N, d) int8 codes, DEAD ROWS MUST BE ZEROED
    row_scale: jax.Array,  # (N,) f32
    valid: jax.Array,      # (N,) bool
    k: int,
    g: int = 32,
    tile_n: int = 2048,
    interpret: bool = False,
    producer: str = "stream",
    block_scales: bool = False,
):
    """Int8 certified streaming top-k — upper-bound selection.

    The maskless stream kernel outputs RAW int32 sub-tile maxes (int8
    MXU path, no per-row scale stream — Mosaic rejects the (tile_n, 1)
    manual DMA that would need). Selection then uses an admissible
    per-sub-tile upper bound computed outside the kernel:

        ub = smax·raw  if raw >= 0  else  smin·raw

    where smax/smin are each sub-tile's max/min row scale. For any row r
    in the sub-tile, score_r = s_r·x_r <= ub (case x_r >= 0: s_r <= smax;
    case all x_r < 0: s_r >= smin flips under the negative sign), so the
    bound never under-ranks a winner-bearing sub-tile. Rescore is exact
    per-row int8 (identical to the grid path's metric), and the
    a-posteriori certificate

        returned k-th raw score >= max ub over UNSELECTED sub-tiles

    proves no winner was left behind: an unselected row's score is <=
    its sub-tile's ub <= that max <= s_k. On failure a ``lax.cond``
    falls back to the masked int8 grid kernel in-program. Zero queries
    (batch padding) are excused. RAW int32 maxes convert exactly to f32
    for d <= 1040 (|dot| <= d·127² < 2^24).

    Returns (scores (B, k) in the cosine range, positions, certified).
    """
    from rag_arc_tpu.ops.two_level import (
        fold_qscale,
        iterative_argmax_resid,
        rescore_i8,
    )

    n = corpus.shape[0]
    qnorm = jnp.sqrt(jnp.sum(queries * queries, axis=-1))
    q_i8, qscale = quantize_queries(queries)
    raw = _produce(
        q_i8, corpus, valid, g, tile_n, interpret, producer
    )  # (N/g, B) f32 of raw int32 maxes
    sg = row_scale.reshape(n // g, g)
    smax = jnp.max(sg, axis=1)[:, None]  # (N/g, 1)
    smin = jnp.min(sg, axis=1)[:, None]
    ub = jnp.where(raw >= 0.0, smax * raw, smin * raw)

    k_tiles = min(k, n // g)
    top_sub, sel_live, max_unsel = iterative_argmax_resid(ub.T, k_tiles)
    s_raw, pos = rescore_i8(
        q_i8, corpus, row_scale, valid, top_sub, sel_live, k, g
    )
    ok = jnp.all((s_raw[:, -1] >= max_unsel) | (qnorm == 0.0))
    s, pos = fold_qscale(s_raw, pos, qscale, k)

    def fallback(args):
        q, c, rs, v = args
        return two_level_topk_i8(
            q, c, rs, v, k, g=g, tile_n=tile_n, interpret=interpret,
            block_scales=block_scales,
        )

    s, pos = jax.lax.cond(
        ok,
        lambda args: (s, pos),
        fallback,
        (queries, corpus, row_scale, valid),
    )
    return s, pos, ok


def _produce(qc, corpus, valid, g, tile_n, interpret, producer):
    """Dispatch pass 1 to the selected maskless producer. "stream" (the
    default: manual-DMA Pallas kernel) | "stream_piped" (two-slab
    MXU/VPU-overlap variant, no measured win) | "scan" (plain XLA scan).

    Measurement note (same-session v5e, 2M×768 B=512, FULL certified
    path): stream 17.2 ms vs scan 22.0 ms. A pass-1-only probe had shown
    the scan "faster" (12.2 vs 19.0) — that was an XLA dead-code artifact
    (the probe fetched one output element, letting XLA elide most scan
    steps; Pallas kernels are opaque, so their number was real)."""
    from rag_arc_tpu.ops.two_level import subtile_max_scan

    if producer == "scan":
        return subtile_max_scan(qc, corpus, g=g, tile_n=tile_n)
    return subtile_max_stream(
        qc, corpus, valid, g=g, tile_n=tile_n, interpret=interpret,
        masked=False, pipelined=producer == "stream_piped",
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "g", "tile_n", "metric", "interpret", "producer"),
)
def two_level_topk_certified(
    queries: jax.Array,   # (B, d) f32
    corpus: jax.Array,    # (N, d), DEAD ROWS MUST BE ZEROED (flat.mark_deleted)
    valid: jax.Array,     # (N,) bool
    sqnorm: jax.Array,    # (N,) f32 (unused for cosine/ip; kept for fallback)
    k: int,
    g: int = 32,
    tile_n: int = 2048,
    metric: str = "cosine",
    interpret: bool = False,
    producer: str = "stream",
):
    """Streaming two-level top-k with a device-side exactness certificate.

    Pass 1 runs the maskless streaming producer (one kernel invocation, no
    per-grid-step Mosaic cost — measured ~15% over the grid producer).
    Dead/padding corpus rows are zeroed by the index layer, so their
    cosine/ip scores are exactly 0 and the sub-tile-selection exactness
    proof holds whenever the true k-th score is positive:

      certificate: returned scores are a subset of true scores, so
      returned s_k <= true s_k. If returned s_k > 0 then true s_k > 0, and
      every zeroed-row sub-tile max (= 0) < s_k cannot displace a
      winner-bearing sub-tile — capture is provably complete.

    When any live query's k-th score is <= 0 (negative-similarity top-k,
    or fewer than k live rows), a ``lax.cond`` falls back to the exact
    masked grid path (ops/two_level.py) on device — no host round trip.
    All-zero queries (batch padding) are excused from the certificate;
    their slots are garbage either way and callers trim them.

    Returns (scores (B, k), positions (B, k), certified bool scalar).
    Cosine/ip only — l2 needs the sqnorm stream the grid kernel has.
    """
    if metric not in ("cosine", "ip"):
        raise ValueError(f"stream path supports cosine/ip, not {metric!r}")
    qnorm = jnp.sqrt(jnp.sum(queries * queries, axis=-1, keepdims=True))
    if metric == "cosine":
        queries = queries / jnp.maximum(qnorm, 1e-12)
    qc = queries.astype(corpus.dtype)
    sub = _produce(qc, corpus, valid, g, tile_n, interpret, producer)
    s, pos = select_rescore(qc, corpus, valid, sqnorm, sub, k, g, metric)
    is_padding = (qnorm[:, 0] == 0.0)
    ok = jnp.all((s[:, -1] > 0.0) | is_padding)

    def fallback(args):
        q, c, v, sq = args
        return two_level_topk(
            q, c, v, sq, k, g=g, tile_n=tile_n, metric=metric,
            interpret=interpret,
        )

    s, pos = jax.lax.cond(
        ok,
        lambda args: (s, pos),
        fallback,
        (queries, corpus, valid, sqnorm),
    )
    return s, pos, ok

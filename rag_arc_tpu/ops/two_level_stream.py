"""Streaming variant of the two-level pass-1 kernel.

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
    select_rescore_i8,
    two_level_topk,
    two_level_topk_i8,
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

            scores = jax.lax.dot_general(
                corpus_buf[slot],
                q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
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

            stage[slot] = jnp.max(s3, axis=1)
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
    jax.jit, static_argnames=("g", "tile_n", "interpret", "masked")
)
def subtile_max_stream(
    queries: jax.Array,   # (B, d) — normalized/cast by the caller
    corpus: jax.Array,    # (N, d)
    valid: jax.Array,     # (N,) bool
    g: int = 32,
    tile_n: int = 2048,
    interpret: bool = False,
    masked: bool = True,
) -> jax.Array:
    """(N/g, B) sub-tile maxima — streaming producer for two_level's
    select/rescore stages. Whole query batch in one kernel invocation.

    On real TPUs B must be a multiple of 128 (B is the minor axis of the
    staging buffer and output DMA; Mosaic rejects partial-lane tiles —
    b=96 fails compile, b=128 works). Interpret mode accepts any B."""
    n, d = corpus.shape
    b = queries.shape[0]
    if n % tile_n or tile_n % 128 or 128 % g:
        raise ValueError(
            "alignment: n % tile_n == 0, tile_n % 128 == 0, 128 % g == 0"
        )
    n_tiles = n // tile_n
    kernel = functools.partial(
        _stream_kernel, g=g, tile_n=tile_n, n_tiles=n_tiles, masked=masked
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n // g, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * corpus.dtype.itemsize + 4 * b * (n // g),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        queries.astype(corpus.dtype),
        corpus,
        valid.astype(jnp.int8).reshape(n // 128, 128),
    )


def _stream_kernel_i8(q_ref, corpus_hbm, scale_hbm, out_hbm, *, g: int,
                      tile_n: int, n_tiles: int):
    """Int8 streaming producer: codes dot on the int8 MXU (2x the bf16
    rate), per-row dequant scale streamed as a (tile_n, 1) column — the
    same broadcast the grid kernel uses, no lane-crossing reshape."""
    qb = q_ref.shape[0]
    d = q_ref.shape[1]
    rows_out = tile_n // g

    def body(corpus_buf, scale_buf, stage, copy_sem, scale_sem, out_sem):
        q = q_ref[:]

        def tile_dma(slot, i):
            return pltpu.make_async_copy(
                corpus_hbm.at[pl.ds(i * tile_n, tile_n), :],
                corpus_buf.at[slot],
                copy_sem.at[slot],
            )

        def scale_dma(slot, i):
            return pltpu.make_async_copy(
                scale_hbm.at[pl.ds(i * tile_n, tile_n), :],
                scale_buf.at[slot],
                scale_sem.at[slot],
            )

        def out_dma(slot, i):
            return pltpu.make_async_copy(
                stage.at[slot],
                out_hbm.at[pl.ds(i * rows_out, rows_out), :],
                out_sem.at[slot],
            )

        tile_dma(0, 0).start()
        scale_dma(0, 0).start()

        def step(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_tiles)
            def _():
                tile_dma(nxt, i + 1).start()
                scale_dma(nxt, i + 1).start()

            tile_dma(slot, i).wait()
            scale_dma(slot, i).wait()

            scores = jax.lax.dot_general(
                corpus_buf[slot],
                q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (tile_n, qb) int32
            scores = scores.astype(jnp.float32) * scale_buf[slot]
            s3 = scores.reshape(rows_out, g, qb)

            @pl.when(i >= 2)
            def _():
                out_dma(slot, i - 2).wait()

            stage[slot] = jnp.max(s3, axis=1)
            out_dma(slot, i).start()
            return 0

        jax.lax.fori_loop(0, n_tiles, step, 0)

        @pl.when(n_tiles >= 2)
        def _():
            out_dma(jax.lax.rem(n_tiles - 2, 2), n_tiles - 2).wait()

        out_dma(jax.lax.rem(n_tiles - 1, 2), n_tiles - 1).wait()

    pl.run_scoped(
        body,
        corpus_buf=pltpu.VMEM((2, tile_n, d), jnp.int8),
        scale_buf=pltpu.VMEM((2, tile_n, 1), jnp.float32),
        stage=pltpu.VMEM((2, rows_out, qb), jnp.float32),
        copy_sem=pltpu.SemaphoreType.DMA((2,)),
        scale_sem=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    jax.jit, static_argnames=("g", "tile_n", "interpret")
)
def subtile_max_stream_i8(
    q_i8: jax.Array,      # (B, d) int8 — pre-quantized by the caller
    corpus: jax.Array,    # (N, d) int8 codes, DEAD ROWS ZEROED
    row_scale: jax.Array, # (N,) f32 per-row dequant scale
    g: int = 32,
    tile_n: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """(N/g, B) sub-tile maxima over scaled int8 scores — streaming
    producer for the int8 select/rescore stages."""
    n, d = corpus.shape
    b = q_i8.shape[0]
    if n % tile_n or tile_n % 128 or 128 % g:
        raise ValueError(
            "alignment: n % tile_n == 0, tile_n % 128 == 0, 128 % g == 0"
        )
    n_tiles = n // tile_n
    kernel = functools.partial(
        _stream_kernel_i8, g=g, tile_n=tile_n, n_tiles=n_tiles
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n // g, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + 4 * n + 4 * b * (n // g),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_i8, corpus, row_scale.reshape(n, 1))


@functools.partial(
    jax.jit, static_argnames=("k", "g", "tile_n", "interpret")
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
):
    """Int8 variant of the certified streaming top-k. Same certificate:
    zeroed dead codes score exactly 0 under the quantized metric, and the
    reported scores carry the (positive) per-query scale, so sign is
    preserved — returned kth score > 0 certifies complete capture under
    the quantized metric. Fallback: the masked int8 grid path.

    STATUS: interpret-mode only. On real TPUs Mosaic rejects the manual
    (tile_n, 1) DMA the per-row scale stream requires (isolated repro:
    a kernel that only starts/waits that copy fails compile), so the flat
    index keeps int8 on the grid producer (19.1 ms at the bench shape —
    within noise of the bf16 stream anyway). Productionizing would take a
    per-128-row-block shared scale so the multiply can move outside the
    kernel; parked as a round-3 candidate."""
    qnorm = jnp.sqrt(jnp.sum(queries * queries, axis=-1))
    q_i8, qscale = quantize_queries(queries)
    sub = subtile_max_stream_i8(
        q_i8, corpus, row_scale, g=g, tile_n=tile_n, interpret=interpret
    )
    s, pos = select_rescore_i8(
        q_i8, qscale, corpus, row_scale, valid, sub, k, g
    )
    ok = jnp.all((s[:, -1] > 0.0) | (qnorm == 0.0))

    def fallback(args):
        q, c, rs, v = args
        return two_level_topk_i8(
            q, c, rs, v, k, g=g, tile_n=tile_n, interpret=interpret
        )

    s, pos = jax.lax.cond(
        ok,
        lambda args: (s, pos),
        fallback,
        (queries, corpus, row_scale, valid),
    )
    return s, pos, ok


@functools.partial(
    jax.jit, static_argnames=("k", "g", "tile_n", "metric", "interpret")
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
    sub = subtile_max_stream(
        qc, corpus, valid, g=g, tile_n=tile_n, interpret=interpret,
        masked=False,
    )
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

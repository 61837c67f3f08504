"""Kernel A/B probe on the real chip: r1 fused kernel vs two-level top-k.

Timing per CLAUDE.md: the only trustworthy completion signal through the
axon tunnel is fetching result bytes, so each measurement times a stream
of dispatches ending in a device_get. Repeats the stream REPS times and
prints min/median per config (the shared chip shows run-to-run variance).

Usage: python tools/kernel_probe.py [--n 2000000] [--b 512] [--reps 5]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--stream", type=int, default=8, help="batches per timed stream")
    ap.add_argument("--configs", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from rag_arc_tpu.ops.fused_mips import fused_mips_topk
    from rag_arc_tpu.ops.two_level import (
        quantize_rows_blocked,
        two_level_topk,
        two_level_topk_i8,
    )

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)
    # host data prep is single-core on this box (~10 min at 2M x 768);
    # cache the prepared corpus + oracle across probe invocations
    cache = Path(f"/tmp/probe_cache_{args.n}_{args.d}_{args.b}_{args.stream}.npz")
    if cache.exists():
        z = np.load(cache)
        corpus, queries, exact_top = z["corpus"], z["queries"], z["exact_top"]
        print(f"corpus cache hit: {cache}", flush=True)
    else:
        corpus = rng.standard_normal((args.n, args.d), dtype=np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        q_idx = rng.integers(0, args.n, size=args.b * args.stream)
        queries = corpus[q_idx] + 0.1 * rng.standard_normal(
            (args.b * args.stream, args.d), dtype=np.float32
        )
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        sub = queries[:128]
        exact = np.empty((128, args.n), dtype=np.float32)
        step = 1 << 18
        for s in range(0, args.n, step):
            exact[:, s : s + step] = sub @ corpus[s : s + step].T
        exact_top = np.argpartition(-exact, args.k, axis=1)[:, : args.k]
        del exact
        np.savez(cache, corpus=corpus, queries=queries, exact_top=exact_top)
    # pad rows up to the largest tile in the sweep (invalid, like the index
    # pads capacity)
    n_pad = ((args.n + 4095) // 4096) * 4096
    padded = np.zeros((n_pad, args.d), dtype=np.float32)
    padded[: args.n] = corpus
    emb = jnp.asarray(padded, dtype=jnp.bfloat16)
    # block-shared scales = what DeviceFlatIndex stores (the certified i8
    # stream's upper bound is tight — smax == smin per sub-tile)
    i8_cache = Path(str(cache).replace(".npz", "_i8.npz"))
    if i8_cache.exists():
        z = np.load(i8_cache)
        codes, scales = z["codes"], z["scales"]
    else:
        codes, scales = quantize_rows_blocked(padded, 32)
        np.savez(i8_cache, codes=codes, scales=scales)
    emb_i8 = jnp.asarray(codes)
    row_scale = jnp.asarray(scales)
    del codes, scales
    valid = jnp.asarray(np.arange(n_pad) < args.n)
    sqnorm = jnp.ones((n_pad,), dtype=jnp.float32)
    del padded

    dev_q = [
        jax.device_put(jnp.asarray(queries[i * args.b : (i + 1) * args.b]))
        for i in range(args.stream)
    ]
    jax.block_until_ready(dev_q)

    def timed(fn, check_recall=True):
        # warmup + compile
        t0 = time.time()
        out = fn(dev_q[0])
        _ = np.asarray(out[1][:1])
        compile_s = time.time() - t0
        recall = None
        if check_recall:
            got = np.asarray(jax.device_get(fn(dev_q[0])[1]))[:128]
            recall = float(
                np.mean(
                    [
                        len(set(got[i].tolist()) & set(exact_top[i].tolist()))
                        / args.k
                        for i in range(128)
                    ]
                )
            )
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            outs = [fn(qb) for qb in dev_q]
            jax.device_get([o[1] for o in outs])
            times.append((time.time() - t0) / args.stream)
        return compile_s, recall, np.asarray(times)

    configs = []
    if args.configs:
        for spec in args.configs.split(";"):
            configs.append(json.loads(spec))
    else:
        configs = [
            {"kind": "fused", "tile_n": 2048, "q_block": 256},
            {"kind": "two_level", "tile_n": 2048, "q_block": 512, "g": 128},
            {"kind": "two_level", "tile_n": 2048, "q_block": 256, "g": 128},
            {"kind": "two_level", "tile_n": 1024, "q_block": 512, "g": 128},
            {"kind": "two_level", "tile_n": 4096, "q_block": 256, "g": 128},
            {"kind": "two_level", "tile_n": 2048, "q_block": 512, "g": 256},
        ]

    for cfg in configs:
        kind = cfg["kind"]
        try:
            if kind == "fused":
                fn = lambda q: fused_mips_topk(  # noqa: E731
                    q, emb, valid, sqnorm, args.k,
                    tile_n=cfg["tile_n"], q_block=cfg.get("q_block", 256),
                    skip_tiles=True, packed=True,
                )
            elif kind == "stream":
                from rag_arc_tpu.ops.two_level_stream import (
                    two_level_topk_certified,
                )

                fn = lambda q: two_level_topk_certified(  # noqa: E731
                    q, emb, valid, sqnorm, args.k,
                    g=cfg.get("g", 32), tile_n=cfg["tile_n"],
                    producer=cfg.get("producer", "scan"),
                )[:2]
            elif kind == "i8_stream":
                from rag_arc_tpu.ops.two_level_stream import (
                    two_level_topk_certified_i8,
                )

                fn = lambda q: two_level_topk_certified_i8(  # noqa: E731
                    q, emb_i8, row_scale, valid, args.k,
                    g=cfg.get("g", 32), tile_n=cfg["tile_n"],
                    producer=cfg.get("producer", "scan"),
                )[:2]
            elif kind == "i8":
                fn = lambda q: two_level_topk_i8(  # noqa: E731
                    q, emb_i8, row_scale, valid, args.k,
                    g=cfg.get("g", 32), tile_n=cfg["tile_n"],
                    q_block=cfg.get("q_block", 512),
                )
            elif kind == "dma_only":
                # corpus-stream bandwidth floor: same DMA pipeline as the
                # stream producer, but the MXU never runs — isolates
                # whether pass-1 is DMA-bound or compute-bound
                import functools as _ft

                from jax.experimental import pallas as pl
                from jax.experimental.pallas import tpu as pltpu

                tile_n = cfg["tile_n"]
                n_pad_t = emb.shape[0]
                n_tiles = n_pad_t // tile_n
                d_ = emb.shape[1]

                def _dma_kernel(corpus_hbm, out_ref, *, tile_n, n_tiles):
                    # out_ref lives in VMEM (8, d): a running max keeps
                    # the DMA'd bytes observable without any output DMA
                    def body(buf, copy_sem):
                        def tile_dma(slot, i):
                            return pltpu.make_async_copy(
                                corpus_hbm.at[pl.ds(i * tile_n, tile_n), :],
                                buf.at[slot],
                                copy_sem.at[slot],
                            )

                        out_ref[:] = jnp.full(
                            out_ref.shape, -3e38, jnp.float32
                        )
                        tile_dma(0, 0).start()

                        def step(i, _):
                            slot = jax.lax.rem(i, 2)
                            nxt = jax.lax.rem(i + 1, 2)

                            @pl.when(i + 1 < n_tiles)
                            def _():
                                tile_dma(nxt, i + 1).start()

                            tile_dma(slot, i).wait()
                            t = buf[slot].astype(jnp.float32)
                            m = jnp.max(
                                t.reshape(tile_n // 8, 8, d_), axis=0
                            )
                            out_ref[:] = jnp.maximum(out_ref[:], m)
                            return 0

                        jax.lax.fori_loop(0, n_tiles, step, 0)

                    pl.run_scoped(
                        body,
                        buf=pltpu.VMEM((2, tile_n, d_), corpus_hbm.dtype),
                        copy_sem=pltpu.SemaphoreType.DMA((2,)),
                    )

                src = emb_i8 if cfg.get("dtype") == "int8" else emb

                @jax.jit
                def _dma(corpus):
                    out = pl.pallas_call(
                        _ft.partial(
                            _dma_kernel, tile_n=tile_n, n_tiles=n_tiles
                        ),
                        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct((8, d_), jnp.float32),
                        compiler_params=pltpu.CompilerParams(
                            has_side_effects=True
                        ),
                    )(corpus)
                    return out[:1, :1]

                fn = lambda q: (None, _dma(src))  # noqa: E731
            elif kind == "xla_scan":
                # the same dot + sub-max as pass-1, written as a plain XLA
                # scan over corpus chunks — measures XLA's own achieved
                # MXU efficiency on identical shapes/traffic (if this
                # matches the Pallas kernel, 12.4 ms is the shape's real
                # floor, not kernel overhead)
                tile_n = cfg["tile_n"]
                g = cfg.get("g", 16)
                n_pad_t = emb.shape[0]

                @functools.partial(jax.jit, static_argnames=("tile_n", "g"))
                def _scan(q, emb, tile_n, g):
                    qc = q.astype(emb.dtype)
                    tiles = emb.reshape(-1, tile_n, emb.shape[1])

                    def step(carry, tile):
                        s = jax.lax.dot_general(
                            tile, qc,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        sub = jnp.max(
                            s.reshape(tile_n // g, g, -1), axis=1
                        )
                        return carry, sub

                    _, subs = jax.lax.scan(step, 0, tiles)
                    return subs[:1, :1, :1]

                fn = lambda q: (None, _scan(q, emb, tile_n, g))  # noqa: E731
                # pass-1 producer alone (fetch one element to force it);
                # device arrays ride as jit ARGS, not captured constants
                from rag_arc_tpu.ops.two_level_stream import subtile_max_stream

                g = cfg.get("g", 32)

                @functools.partial(
                    jax.jit,
                    static_argnames=("g", "tile_n", "masked", "pipelined"),
                )
                def _p1(q, emb, valid, g, tile_n, masked, pipelined):
                    sub = subtile_max_stream(
                        q.astype(emb.dtype), emb, valid, g=g, tile_n=tile_n,
                        masked=masked, pipelined=pipelined,
                    )
                    return sub[:1, :1]

                fn = lambda q: (  # noqa: E731
                    None,
                    _p1(q, emb, valid, g=g, tile_n=cfg["tile_n"],
                        masked=cfg.get("masked", False),
                        pipelined=cfg.get("pipelined", False)),
                )
            elif kind == "select_only":
                # stages 2+3 on a precomputed sub-max matrix (q mismatch is
                # fine for timing; shapes match the real pipeline)
                from rag_arc_tpu.ops.two_level import select_rescore
                from rag_arc_tpu.ops.two_level_stream import subtile_max_stream

                g = cfg.get("g", 32)
                sub_pre = jax.block_until_ready(
                    subtile_max_stream(
                        dev_q[0].astype(emb.dtype), emb, valid,
                        g=g, tile_n=cfg["tile_n"], masked=False,
                    )
                )

                @functools.partial(jax.jit, static_argnames=("k", "g"))
                def _sel(q, emb, valid, sqnorm, sub, k, g):
                    return select_rescore(
                        q.astype(emb.dtype), emb, valid, sqnorm, sub, k, g,
                        "cosine",
                    )

                fn = lambda q: _sel(  # noqa: E731
                    q, emb, valid, sqnorm, sub_pre, args.k, g
                )
            else:
                fn = lambda q: two_level_topk(  # noqa: E731
                    q, emb, valid, sqnorm, args.k,
                    g=cfg.get("g", 128), tile_n=cfg["tile_n"],
                    q_block=cfg.get("q_block", 512),
                )
            compile_s, recall, times = timed(
                fn,
                check_recall=kind
                not in ("p1_stream", "select_only", "argmax_only",
                        "dma_only", "xla_scan"),
            )
            ms = times * 1e3
            print(
                json.dumps(
                    {
                        "cfg": cfg,
                        "compile_s": round(compile_s, 1),
                        "recall": None if recall is None else round(recall, 4),
                        "ms_min": round(float(ms.min()), 2),
                        "ms_median": round(float(np.median(ms)), 2),
                        "ms_all": [round(float(x), 2) for x in ms],
                        "qps_at_median": round(args.b / np.median(ms) * 1e3, 0),
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — sweep keeps going
            print(json.dumps({"cfg": cfg, "error": str(exc)[:300]}), flush=True)


if __name__ == "__main__":
    main()

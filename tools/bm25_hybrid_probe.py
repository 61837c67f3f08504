"""Hybrid-BM25 component timing on the real chip: where do the head-
profile milliseconds go? (matmul | +iter_topk | +tail slabs | full)"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402

sys.path.insert(0, str(REPO / "tools"))
from bm25_bench import synth_corpus  # noqa: E402


def med(dispatch, fetch, inner=8, reps=5):
    import jax

    ts = []
    for _ in range(reps):
        t0 = time.time()
        outs = [dispatch() for _ in range(inner)]
        jax.device_get(fetch(outs[-1]))
        ts.append(time.time() - t0)
        del outs
    return float(np.median(ts)) / inner


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"device: {jax.devices()[0]}", flush=True)

    from rag_arc_tpu.index.bm25 import DeviceBM25Index
    from rag_arc_tpu.ops.bm25 import _iter_topk

    rng = np.random.default_rng(0)
    n = int(os.environ.get("PROBE_N", 1_000_000))
    t0 = time.time()
    if os.environ.get("PROBE_CSR") == "1":
        # big corpora: reuse the bench CSR cache (no python strings)
        from bm25_bench import synth_csr

        cache = REPO / ".jax_cache" / f"bm25_csr_{n}_v50000_l60_s0.npz"
        if cache.exists():
            z = np.load(cache)
            csr = (z["off"], z["tid"], z["cnt"], z["lens"])
        else:
            csr = synth_csr(rng, n)
        index = DeviceBM25Index(
            backend="hybrid",
            head_dtype=jnp.bfloat16 if n >= 4_000_000 else jnp.float32,
        )
        index.build_from_csr(*csr)
    else:
        texts = synth_corpus(rng, n)
        index = DeviceBM25Index(backend="hybrid")
        index.build_from_texts_native(texts)
    print(f"build: {time.time()-t0:.1f}s  H={index._w_head.shape[0]} "
          f"max_tail_df={index._max_tail_df} nnz={index._tail_docs_dev.size}",
          flush=True)

    b = int(os.environ.get("PROBE_B", 32))
    queries = [
        [f"w{t}" for t in (rng.zipf(1.3, size=8) % 50_000)] for _ in range(b)
    ]
    # encode once (host side), reuse arrays
    h = index._w_head.shape[0]
    max_df = index._max_tail_df
    q_head = np.zeros((b, h), np.float32)
    rows = []
    t_max = 1
    for i, toks in enumerate(queries):
        counts = {}
        for tok in toks:
            tid = index.vocab.get(tok)
            if tid is not None:
                counts[tid] = counts.get(tid, 0) + 1
        row = []
        for tid, c in counts.items():
            slot = index._head_slot[tid]
            if slot >= 0:
                q_head[i, slot] += c
            else:
                s0 = int(index._tail_off[tid])
                rem = int(index._tail_off[tid + 1]) - s0
                while rem > 0:
                    seg = min(rem, max_df)
                    row.append((s0, seg, float(c)))
                    s0 += seg
                    rem -= seg
        rows.append(row)
        t_max = max(t_max, len(row))
    T = max(8, 1 << int(np.ceil(np.log2(t_max))))
    starts = np.zeros((b, T), np.int32)
    lens = np.zeros((b, T), np.int32)
    cts = np.zeros((b, T), np.float32)
    for i, row in enumerate(rows):
        for j, (s0, ln, c) in enumerate(row):
            starts[i, j], lens[i, j], cts[i, j] = s0, ln, c
    print(f"T={T} (t_max {t_max}), tail width {T*max_df}", flush=True)

    dq = jnp.asarray(q_head)
    dst, dln, dct = jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(cts)
    W, V = index._w_head, index._hvalid
    TD, TW = index._tail_docs_dev, index._tail_w_dev

    mm = jax.jit(lambda q, w: jnp.dot(q, w, preferred_element_type=jnp.float32))
    jax.block_until_ready(mm(dq, W))
    t = med(lambda: mm(dq, W), lambda o: o[:1, :1])
    print(f"head matmul: {t*1e3:.2f} ms", flush=True)

    @jax.jit
    def mm_topk(q, w, v):
        s = jnp.where(v[None, :], jnp.dot(q, w, preferred_element_type=jnp.float32), -jnp.inf)
        return _iter_topk(s, 10)

    jax.block_until_ready(mm_topk(dq, W, V))
    t = med(lambda: mm_topk(dq, W, V), lambda o: o[0][:1])
    print(f"matmul+iter_topk: {t*1e3:.2f} ms", flush=True)

    from rag_arc_tpu.ops.bm25 import _coarse_topk

    if W.shape[1] % 512 == 0:

        @jax.jit
        def mm_coarse(q, w, v):
            s = jnp.where(
                v[None, :],
                jnp.dot(q, w, preferred_element_type=jnp.float32),
                -jnp.inf,
            )
            return _coarse_topk(s, 10, 512)

        jax.block_until_ready(mm_coarse(dq, W, V))
        t = med(lambda: mm_coarse(dq, W, V), lambda o: o[0][:1])
        print(f"matmul+coarse_topk: {t*1e3:.2f} ms", flush=True)

    @partial(jax.jit, static_argnames=("max_df",))
    def slabs(td, tw, st, ln, ct, max_df):
        span = jnp.arange(max_df, dtype=jnp.int32)
        in_list = span[None, None, :] < ln[:, :, None]

        def grab(s):
            return (
                jax.lax.dynamic_slice(td, (s,), (max_df,)),
                jax.lax.dynamic_slice(tw, (s,), (max_df,)),
            )

        d, w = jax.vmap(grab)(st.reshape(-1))
        w = w.reshape(b, T, max_df) * ct[:, :, None]
        return d.reshape(b, -1), jnp.where(in_list, w, 0.0).reshape(b, -1)

    jax.block_until_ready(slabs(TD, TW, dst, dln, dct, max_df))
    t = med(lambda: slabs(TD, TW, dst, dln, dct, max_df), lambda o: o[1][:1, :1])
    print(f"tail slab gather: {t*1e3:.2f} ms", flush=True)

    from rag_arc_tpu.ops.bm25 import bm25_hybrid_topk

    full = lambda: bm25_hybrid_topk(W, V, dq, TD, TW, dst, dln, dct, 10, max_df)
    jax.block_until_ready(full())
    t = med(full, lambda o: o[1][:1])
    print(f"full hybrid_topk: {t*1e3:.2f} ms", flush=True)

    # end-to-end through the index (incl. host encode), serial: each batch
    # pays host encode + upload + program + fetch with zero overlap
    _ = index._hybrid_search(queries, 10)
    t0 = time.time()
    for _ in range(5):
        index._hybrid_search(queries, 10)
    print(f"end-to-end serial search(): {(time.time()-t0)/5*1e3:.2f} ms", flush=True)

    # streamed: search_dispatch() enqueues batch i+1 while batch i's device
    # program runs — the tunnel RTT and host encode amortize across the
    # stream (this is how the retriever's invoke_batch drives the index)
    reps = 16
    t0 = time.time()
    pend = [index.search_dispatch(queries, 10) for _ in range(reps)]
    outs = [p.result() for p in pend]
    dt = (time.time() - t0) / reps
    print(f"end-to-end streamed dispatch (head/zipf): {dt*1e3:.2f} ms/batch "
          f"({b/dt:,.0f} qps)", flush=True)

    sel = [
        [f"w{t}" for t in rng.integers(1_000, 50_000, size=8)]
        for _ in range(b)
    ]
    index.search(sel, 10)  # warm the selective bucket signature
    t0 = time.time()
    pend = [index.search_dispatch(sel, 10) for _ in range(reps)]
    outs = [p.result() for p in pend]
    dt = (time.time() - t0) / reps
    print(f"end-to-end streamed dispatch (selective): {dt*1e3:.2f} ms/batch "
          f"({b/dt:,.0f} qps)", flush=True)


if __name__ == "__main__":
    main()

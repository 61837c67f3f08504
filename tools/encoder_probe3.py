"""Packed-encoder throughput probe (round 3): does sequence packing
deliver short-query throughput at L=128 MFU on the real chip?

Measures, fetch-terminated, same-session:
  1. packed forward (B rows × 128 tokens, ~8 short docs/row) → queries/s
  2. unpacked short-query forward (L=16 rows) for the A/B
  3. flagship doc forward at L=128 (docs/s) with bf16 params
  4. simulated e2e: packed encode → gather (B,dim) → 2M index search
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402


def med_time(dispatch, inner=8, reps=5, fetch=None):
    import jax

    ts = []
    for _ in range(reps):
        t0 = time.time()
        outs = [dispatch() for _ in range(inner)]
        jax.device_get(fetch(outs[-1]) if fetch else outs[-1])
        ts.append(time.time() - t0)
        del outs
    return float(np.median(ts)) / inner


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    from rag_arc_tpu.models.encoder import (
        PackedTextEncoder,
        TextEncoder,
        TransformerConfig,
        init_encoder,
    )
    from rag_arc_tpu.models.packing import pack_token_lists

    cfg = TransformerConfig(vocab_size=32768, dim=768, depth=12, heads=12, max_len=512)
    model, params = init_encoder(cfg)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    packed = PackedTextEncoder(cfg, max_segments=8)
    fwd = jax.jit(model.apply)
    pfwd = jax.jit(packed.apply)

    # realistic short queries: 8-24 tokens (MSMARCO-ish)
    n_q = 4096
    qlists = [
        rng.integers(4, 32768, size=int(rng.integers(8, 25))).tolist()
        for _ in range(n_q)
    ]
    ids, pos, seg, mapping = pack_token_lists(qlists, row_len=128, max_segments=8)
    R = ids.shape[0]
    r_pad = 1 << int(np.ceil(np.log2(R)))
    ids = np.pad(ids, ((0, r_pad - R), (0, 0)))
    pos = np.pad(pos, ((0, r_pad - R), (0, 0)))
    seg = np.pad(seg, ((0, r_pad - R), (0, 0)), constant_values=-1)
    print(f"{n_q} queries packed into {R} rows (pad {r_pad})", flush=True)

    d_ids = jnp.asarray(ids)
    d_pos = jnp.asarray(pos)
    d_seg = jnp.asarray(seg)
    jax.block_until_ready(pfwd(params, d_ids, d_pos, d_seg))
    t = med_time(lambda: pfwd(params, d_ids, d_pos, d_seg),
                 fetch=lambda o: o[:1, :1, :1])
    print(
        f"packed fwd: {t*1e3:.2f} ms for {n_q} queries -> "
        f"{n_q/t:,.0f} queries/s", flush=True,
    )

    # unpacked A/B: same queries one-per-row at L=16/24 bucket
    L = 24
    u_ids = np.zeros((n_q, L), np.int32)
    u_mask = np.zeros((n_q, L), bool)
    for i, tl in enumerate(qlists):
        tl = tl[:L]
        u_ids[i, : len(tl)] = tl
        u_mask[i, : len(tl)] = True
    du_ids, du_mask = jnp.asarray(u_ids), jnp.asarray(u_mask)
    jax.block_until_ready(fwd(params, du_ids, du_mask))
    t = med_time(lambda: fwd(params, du_ids, du_mask),
                 fetch=lambda o: o[:1, :1])
    print(f"unpacked L={L} fwd: {t*1e3:.2f} ms -> {n_q/t:,.0f} queries/s", flush=True)

    # flagship doc forward (L=128, B=512), bf16 params
    b_ids = jnp.asarray(rng.integers(4, 32768, (512, 128)).astype(np.int32))
    b_mask = jnp.ones((512, 128), bool)
    jax.block_until_ready(fwd(params, b_ids, b_mask))
    t = med_time(lambda: fwd(params, b_ids, b_mask), fetch=lambda o: o[:1, :1])
    print(f"doc fwd L=128 B=512: {t*1e3:.2f} ms -> {512/t:,.0f} docs/s", flush=True)

    # e2e: packed encode -> gather queries -> 2M search
    from rag_arc_tpu.index.flat import DeviceFlatIndex

    N = int(os.environ.get("PROBE_CORPUS_N", 2_000_000))
    corpus = rng.random((N, 768), dtype=np.float32) - 0.5
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    index = DeviceFlatIndex(dim=768, metric="cosine", capacity=N, dtype=jnp.bfloat16)
    step = 1 << 17
    for s in range(0, N, step):
        index.add(corpus[s : s + step])
    jax.block_until_ready(index.emb)

    rows_map = jnp.asarray(np.asarray([r for r, _ in mapping], np.int32))
    slots_map = jnp.asarray(np.asarray([s for _, s in mapping], np.int32))

    def e2e(ids, pos, seg):
        out = pfwd(params, ids, pos, seg)          # (R, S, dim) f32
        q = out[rows_map, slots_map]               # (n_q, dim)
        # search in 512-query slabs (the kernel's proven batch shape)
        res = []
        for s in range(0, n_q, 512):
            res.append(index.search_device(q[s : s + 512], 10))
        return res

    warm = e2e(d_ids, d_pos, d_seg)
    _ = np.asarray(warm[-1][1][:1])
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        outs = e2e(d_ids, d_pos, d_seg)
        jax.device_get([o[1] for o in outs])
    t = (time.time() - t0) / reps
    print(f"e2e packed encode+search: {t*1e3:.1f} ms for {n_q} -> {n_q/t:,.0f} qps", flush=True)


if __name__ == "__main__":
    main()

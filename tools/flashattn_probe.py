"""Chip A/B: Pallas flash attention vs einsum attention in FlaxQwen3LM.

Two stages:
1. numerics — small eligible shape (head_dim 128, L 256), left-padded
   batch, same params: max |Δ| of last_logits between attn_impl settings
   (pad rows differ by design; last_logits reads live positions only).
2. perf — the bench's rerank shape (qwen3-0.6B, B=64, L=512, bf16 random
   weights): pairs/s for each impl, fetch-terminated timing per CLAUDE.md.

Usage: python tools/flashattn_probe.py [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402


def rand_params(jax, jnp, model, seed=0):
    rng_key = jax.random.PRNGKey(seed)
    ids1 = jnp.zeros((1, 8), jnp.int32)
    params = jax.eval_shape(model.init, rng_key, ids1, jnp.ones((1, 8), bool))
    leaves, treedef = jax.tree_util.tree_flatten(
        params, is_leaf=lambda x: hasattr(x, "shape")
    )
    keys = jax.random.split(rng_key, len(leaves))
    mats = [
        jax.device_put(jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02)
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, mats)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from rag_arc_tpu.models.qwen3 import FlaxQwen3LM, Qwen3Config

    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- stage 1: numerics on an eligible small shape -------------------
    import dataclasses

    small = Qwen3Config(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, rope_theta=10000.0, dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    B, L = 4, 256
    ids = jnp.asarray(rng.integers(4, 500, (B, L)), jnp.int32)
    pad = np.zeros((B, L), bool)
    for i, n_live in enumerate((L, L - 7, L - 130, 5)):  # left padding
        pad[i, L - n_live:] = True
    mask = jnp.asarray(pad)

    outs = {}
    params = None
    for impl in ("einsum", "flash"):
        cfg = dataclasses.replace(small, attn_impl=impl)
        model = FlaxQwen3LM(cfg)
        if params is None:
            params = model.init(jax.random.PRNGKey(1), ids, mask)
        f = jax.jit(lambda p, i, m, _m=model: _m.apply(p, i, m, method=_m.last_logits))
        outs[impl] = np.asarray(f(params, ids, mask))
    d = np.abs(outs["einsum"] - outs["flash"]).max()
    rel = d / max(np.abs(outs["einsum"]).max(), 1e-9)
    print(f"numerics: max|Δ| last_logits = {d:.3e} (rel {rel:.3e})", flush=True)

    # ---- stage 2: perf at the rerank bench shape -------------------------
    B, L = 64, 512
    ids = jnp.asarray(rng.integers(4, 151936, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), dtype=bool)
    params = None
    res = {}
    for impl in ("einsum", "flash"):
        cfg = Qwen3Config(dtype=jnp.bfloat16, attn_impl=impl)
        model = FlaxQwen3LM(cfg)
        if params is None:
            t0 = time.time()
            params = rand_params(jax, jnp, model)
            print(f"params ready: {time.time()-t0:.0f}s", flush=True)
        f = jax.jit(lambda p, i, m, _m=model: _m.apply(p, i, m, method=_m.last_logits))
        jax.block_until_ready(f(params, ids, mask))
        t0 = time.time()
        outs = [f(params, ids, mask) for _ in range(args.reps)]
        _ = jax.device_get(outs[-1][:1, :1])
        dt = (time.time() - t0) / args.reps
        res[impl] = B / dt
        print(f"{impl}: {1e3*dt:.1f} ms/batch = {B/dt:.1f} pairs/s", flush=True)
    print(f"flash speedup: {res['flash']/res['einsum']:.3f}x", flush=True)


if __name__ == "__main__":
    main()

"""Encoder ablation probe (round 3): where do the non-MXU milliseconds go?

All timings fetch only a few bytes (jitted graphs cannot be DCE'd by a
small post-hoc fetch — the jit computes its full outputs), dispatch 8+
forwards per rep, median of 5 reps. Same-session comparisons only.
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


def med_time(dispatch, inner=8, reps=5):
    import jax

    ts = []
    for _ in range(reps):
        t0 = time.time()
        outs = [dispatch() for _ in range(inner)]
        jax.device_get(outs[-1][:1, :1])
        ts.append(time.time() - t0)
        del outs  # cap live HBM (an (65536,3072) int32 out is 805 MB)
    return float(np.median(ts)) / inner


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # ---- matmul roofline by shape, fetch-tiny ---------------------------
    mm_bf = jax.jit(lambda a, b: jnp.dot(a, b))
    mm_i8 = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    )
    shapes = [
        (65536, 768, 3072),   # mlp up at B*L=65536
        (65536, 3072, 768),   # mlp down
        (65536, 768, 2304),   # qkv
        (65536, 768, 768),    # attn out
        (8192, 8192, 8192),   # square reference (peak-chaser)
        (16384, 4096, 4096),
    ]
    for (M, K_, N) in shapes:
        a_bf = jnp.asarray(rng.standard_normal((M, K_)), jnp.bfloat16)
        b_bf = jnp.asarray(rng.standard_normal((K_, N)), jnp.bfloat16)
        flops = 2 * M * K_ * N
        jax.block_until_ready(mm_bf(a_bf, b_bf))
        t = med_time(lambda: mm_bf(a_bf, b_bf), inner=4)
        print(f"matmul bf16 {M}x{K_}x{N}: {t*1e3:.3f} ms  {flops/t/1e12:.1f} TFLOP/s", flush=True)
        del a_bf, b_bf
    for (M, K_, N) in [(65536, 768, 3072), (8192, 8192, 8192)]:
        a_i8 = jnp.asarray(rng.integers(-127, 127, (M, K_)), jnp.int8)
        b_i8 = jnp.asarray(rng.integers(-127, 127, (K_, N)), jnp.int8)
        flops = 2 * M * K_ * N
        jax.block_until_ready(mm_i8(a_i8, b_i8))
        t = med_time(lambda: mm_i8(a_i8, b_i8), inner=4)
        print(f"matmul int8 {M}x{K_}x{N}: {t*1e3:.3f} ms  {flops/t/1e12:.1f} TOP/s", flush=True)
        del a_i8, b_i8

    # ---- encoder ablations at B=512 L=128 ------------------------------
    from rag_arc_tpu.models.encoder import (
        TransformerConfig,
        TextEncoder,
        init_encoder,
    )

    B, L = 512, 128
    cfg = TransformerConfig(vocab_size=32768, dim=768, depth=12, heads=12, max_len=512)
    model, params = init_encoder(cfg)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    ids = jnp.asarray(rng.integers(4, 32768, (B, L)).astype(np.int32))
    mask = jnp.ones((B, L), dtype=bool)
    tok_flops = 2 * 12 * cfg.dim * cfg.dim * 12 + 2 * 2 * L * cfg.dim

    def bench(name, fwd, prm, b=B, l=L):
        i = jnp.asarray(rng.integers(4, 32768, (b, l)).astype(np.int32))
        m = jnp.ones((b, l), dtype=bool)
        jax.block_until_ready(fwd(prm, i, m))
        t = med_time(lambda: fwd(prm, i, m))
        per_tok = 2 * 12 * cfg.dim * cfg.dim * 12 + 2 * 2 * l * cfg.dim
        print(
            f"{name}: {t*1e3:.2f} ms  {b/t:,.0f} docs/s  "
            f"MFU {b*l*per_tok/t/197e12*100:.1f}%",
            flush=True,
        )
        return t

    bench("full/bf16p", jax.jit(model.apply), params)

    # ablation variants via monkeypatched Block internals
    import rag_arc_tpu.models.encoder as enc

    class MLPOnlyBlock(nn.Module):
        cfg: TransformerConfig

        @nn.compact
        def __call__(self, x, attn_bias):
            cfg = self.cfg
            h = nn.LayerNorm(dtype=cfg.dtype, name="ln_attn")(x)
            h = nn.Dense(3 * cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="qkv")(h)
            q, _, _ = jnp.split(h, 3, axis=-1)
            x = x + nn.Dense(cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="attn_out")(q)
            h = nn.LayerNorm(dtype=cfg.dtype, name="ln_mlp")(x)
            h = nn.Dense(cfg.mlp_ratio * cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_up")(h)
            h = nn.gelu(h)
            h = nn.Dense(cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_down")(h)
            return x + h

    class SoftmaxFreeBlock(enc.Block):
        @nn.compact
        def __call__(self, x, attn_bias):
            cfg = self.cfg
            h = nn.LayerNorm(dtype=cfg.dtype, name="ln_attn")(x)
            qkv = nn.Dense(3 * cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            b, l, _ = q.shape
            shape = (b, l, cfg.heads, cfg.head_dim)
            q = q.reshape(shape).transpose(0, 2, 1, 3)
            k = k.reshape(shape).transpose(0, 2, 1, 3)
            v = v.reshape(shape).transpose(0, 2, 1, 3)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(cfg.head_dim)
            probs = (scores * (1.0 / l)).astype(cfg.dtype)  # no softmax, bf16 scores
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, cfg.dim)
            x = x + nn.Dense(cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="attn_out")(ctx)
            h = nn.LayerNorm(dtype=cfg.dtype, name="ln_mlp")(x)
            h = nn.Dense(cfg.mlp_ratio * cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_up")(h)
            h = nn.gelu(h)
            h = nn.Dense(cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_down")(h)
            return x + h

    class F32ScoreBf16SoftmaxBlock(enc.Block):
        @nn.compact
        def __call__(self, x, attn_bias):
            cfg = self.cfg
            h = nn.LayerNorm(dtype=cfg.dtype, name="ln_attn")(x)
            qkv = nn.Dense(3 * cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            b, l, _ = q.shape
            shape = (b, l, cfg.heads, cfg.head_dim)
            q = q.reshape(shape).transpose(0, 2, 1, 3)
            k = k.reshape(shape).transpose(0, 2, 1, 3)
            v = v.reshape(shape).transpose(0, 2, 1, 3)
            # bf16 scores storage (max-sub still stable enough for L=512)
            scores = (
                jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(cfg.head_dim)
            ).astype(cfg.dtype)
            scores = scores + attn_bias.astype(cfg.dtype)
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cfg.dtype)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, cfg.dim)
            x = x + nn.Dense(cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="attn_out")(ctx)
            h = nn.LayerNorm(dtype=cfg.dtype, name="ln_mlp")(x)
            h = nn.Dense(cfg.mlp_ratio * cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_up")(h)
            h = nn.gelu(h)
            h = nn.Dense(cfg.mlp_ratio * cfg.dim // cfg.mlp_ratio, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_down")(h)
            return x + h

    for name, blk in [
        ("mlp-only", MLPOnlyBlock),
        ("no-softmax", SoftmaxFreeBlock),
        ("bf16-scores", F32ScoreBf16SoftmaxBlock),
    ]:
        orig = enc.Block
        enc.Block = blk
        try:
            m2 = TextEncoder(cfg)
            bench(name, jax.jit(m2.apply), params)
        finally:
            enc.Block = orig

    # ---- token-budget bucketing: ~64k tokens per dispatch --------------
    fwd = jax.jit(model.apply)
    for l, b in ((16, 4096), (32, 2048), (64, 1024), (128, 512), (256, 256)):
        bench(f"budget L={l} B={b}", fwd, params, b=b, l=l)


if __name__ == "__main__":
    main()

"""Fused qk-RMSNorm + RoPE + layout transform + GQA repeat (attention prep).

Round-5 rerank probe (`bench_results/rerank_probe_r05.txt`) decomposed the
Qwen3-0.6B B=64 L=512 rerank forward: the qk-norm/rope/transpose/repeat
machinery between the projections and the flash kernel cost ~5.1 ms/layer
under XLA — more than flash attention itself (2.8 ms). The XLA lowering
materializes every step in HBM: the f32 norm passes, rope products,
`concatenate`, the (B,L,H,D)->(B,H,L,D) transposes, and `jnp.repeat` of
K/V for GQA — each a full round trip over ~134-268 MB tensors, 28 layers
deep.

This kernel does the whole prep in ONE HBM pass per tensor: reads the
projected q/k/v in their natural (B, L, H*D) projection layout (heads
merged into lanes, L in sublanes), applies Qwen3's per-head RMS norm and
the rotation in f32 in VMEM, and writes bf16 (B, H, L, D) blocks with K/V
written once per query head (the GQA repeat is free at write time). The
rotation uses the roll formulation: with duplicated-angle ``cos_full =
[cos a, cos a]`` and sign-folded ``sin_signed = [-sin a, sin a]``,

    rope(x) = x * cos_full + roll(x, D/2, lanes) * sin_signed

which is exactly the HF half-split convention (reference reranker:
``core/rerank/Reranker_Qwen3.py:9-13`` runs this under torch). cos/sin are
position-only — computed ONCE per forward (`rope_cos_sin`) and reused by
all layers, instead of being re-derived 28 times.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rope_cos_sin(positions: jax.Array, theta: float, d: int):
    """Per-forward rope tables. positions (B, L) int -> cos_full,
    sin_signed, both (B, L, D) f32 (duplicated angles / sign-folded sin,
    see module docstring)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions[:, :, None].astype(jnp.float32) * inv_freq[None, None, :]
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    return (
        jnp.concatenate([cos, cos], axis=-1),
        jnp.concatenate([-sin, sin], axis=-1),
    )


def _kernel(cos_ref, sin_ref, qs_ref, ks_ref, q_ref, k_ref, v_ref,
            qo_ref, ko_ref, vo_ref,
            *, group: int, d: int, eps: float, norm: bool, interpret: bool):
    cos = cos_ref[...]
    sin = sin_ref[...]
    # interpret mode (CPU tests) has no Mosaic roll primitive
    roll = (lambda x: jnp.roll(x, d // 2, axis=2)) if interpret else (
        lambda x: pltpu.roll(x, d // 2, axis=2))

    def rmsnorm(x32, s_ref):
        if not norm:
            return x32
        var = jnp.mean(x32 * x32, axis=2, keepdims=True)
        return x32 * jax.lax.rsqrt(var + eps) * s_ref[...][None, :, :]

    def rot(x32):
        return x32 * cos + roll(x32) * sin

    for g in range(group):
        x = q_ref[:, :, g * d : (g + 1) * d].astype(jnp.float32)
        # assigning the (bb, L, D) tile into the (bb, g, L, D) slot IS the
        # (B,L,H,D)->(B,H,L,D) transpose — no data shuffle beyond the DMA
        qo_ref[:, g, :, :] = rot(rmsnorm(x, qs_ref)).astype(qo_ref.dtype)
    k = rot(rmsnorm(k_ref[:, :, :].astype(jnp.float32), ks_ref))
    k = k.astype(ko_ref.dtype)
    v = v_ref[:, :, :]
    for g in range(group):
        ko_ref[:, g, :, :] = k
        vo_ref[:, g, :, :] = v


def rope_prep_ref(q, k, v, cos, sin, qs=None, ks=None, eps: float = 1e-6):
    """XLA reference (used on CPU and by parity tests): same math, the
    multi-pass lowering this kernel exists to avoid. q (B,L,NH,D),
    k/v (B,L,NKV,D); qs/ks optional (D,) RMS-norm scales."""
    d = q.shape[-1]

    def norm(x, s):
        if s is None:
            return x.astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        return x32 * jax.lax.rsqrt(var + eps) * s.astype(jnp.float32)

    def one(x, s):
        xT = norm(x, s).transpose(0, 2, 1, 3)  # (B, H, L, D) f32
        r = xT * cos[:, None] + jnp.roll(xT, d // 2, axis=-1) * sin[:, None]
        return r.astype(q.dtype)

    group = q.shape[2] // k.shape[2]
    kr = jnp.repeat(one(k, ks), group, axis=1)
    vr = jnp.repeat(v.transpose(0, 2, 1, 3), group, axis=1)
    return one(q, qs), kr, vr


@functools.partial(
    jax.jit, static_argnames=("nh", "nkv", "d", "eps", "interpret"))
def rope_prep(q, k, v, cos, sin, qs=None, ks=None, *, nh: int, nkv: int,
              d: int, eps: float = 1e-6, interpret: bool = False):
    """q (B,L,NH*D), k/v (B,L,NKV*D) — the raw projection layouts; cos/sin
    (B,L,D) f32 from rope_cos_sin; qs/ks optional (D,) per-head RMS-norm
    scales (Qwen3 q_norm/k_norm — folded into the same pass when given).
    Returns normed+roped+transposed+GQA-repeated (B,NH,L,D) x3 in q.dtype.
    Requires D % 128 == 0 and L % 8 == 0 (callers gate on flash-attention
    eligibility, which is stricter)."""
    b, l, _ = q.shape
    group = nh // nkv
    norm = qs is not None
    if norm:
        qs2 = qs.astype(jnp.float32).reshape(1, d)
        ks2 = ks.astype(jnp.float32).reshape(1, d)
    else:
        qs2 = jnp.ones((1, d), jnp.float32)
        ks2 = qs2
    # VMEM cap: ~40 B/(batch-row x position x lane) empirical footprint
    # (f32 cos/sin + bf16 q/k/v + 3 outs, double-buffered; the compiler
    # measured 20 MB at bb=8, L=512, D=128 against the 16 MB scoped limit)
    bb = next(
        (c for c in (8, 4, 2, 1)
         if b % c == 0 and c * l * d * 40 <= 14 * 1024 * 1024),
        None,
    )
    if bb is None:  # very long sequences: one batch row won't fit VMEM
        return rope_prep_ref(
            q.reshape(b, l, nh, d), k.reshape(b, l, nkv, d),
            v.reshape(b, l, nkv, d), cos, sin,
            qs if norm else None, ks if norm else None, eps,
        )
    grid = (b // bb, nkv)
    out = jax.ShapeDtypeStruct((b, nh, l, d), q.dtype)
    out_spec = pl.BlockSpec((bb, group, l, d), lambda i, j: (i, j, 0, 0))
    qo, ko, vo = pl.pallas_call(
        functools.partial(_kernel, group=group, d=d, eps=eps, norm=norm,
                          interpret=interpret),
        grid=grid,
        in_specs=[
            # cos/sin index_maps ignore j: consecutive grid steps reuse
            # the fetched block (j is the fast axis), so the f32 tables
            # are pulled once per batch block, not once per kv head
            pl.BlockSpec((bb, l, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((bb, l, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((bb, l, group * d), lambda i, j: (i, 0, j)),
            pl.BlockSpec((bb, l, d), lambda i, j: (i, 0, j)),
            pl.BlockSpec((bb, l, d), lambda i, j: (i, 0, j)),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[out, out, out],
        interpret=interpret,
    )(cos, sin, qs2, ks2, q, k, v)
    return qo, ko, vo

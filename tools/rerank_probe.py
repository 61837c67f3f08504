"""Rerank per-op breakdown probe (round 5, VERDICT r4 #3).

Where do the 414 ms of the Qwen3-0.6B B=64 L=512 rerank forward go?
The matmul-only roofline is ~146 ms (35.6 MFLOP/token x 32k tokens x 28
layers at 197 TFLOP/s), flash attention was measured 4.06 ms/layer
(~114 ms total), so ~150 ms is unaccounted for. This probe decomposes
the forward with in-model ablations (monkeypatched module variants over
the SAME param tree — the only decomposition method that survives XLA
fusion, per tools/encoder_probe2.py's r3 methodology) plus pure-matmul
rooflines at the exact layer shapes.

Run on chip: python tools/rerank_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from rag_arc_tpu.models import qwen3 as q3
from rag_arc_tpu.models.qwen3 import (
    FlaxQwen3LM,
    Qwen3Config,
    RMSNorm,
    Qwen3Attention,
    rope,
    _flash_eligible,
)

PEAK = 197e12


def med_time(fn, reps=5, inner=4):
    """Fetch-terminated stream timing (repo timing rule)."""
    ts = []
    for _ in range(reps):
        t0 = time.time()
        o = None
        for _i in range(inner):
            o = fn()  # drop earlier refs: 64 live (32k, 2k) outputs OOM
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
        ts.append((time.time() - t0) / inner)
    return float(np.median(ts))


def main():
    print(f"# device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)

    B, L = 64, 512
    M = B * L

    # ---- stage A: pure matmul rooflines at the exact layer shapes ------
    def mmbench(name, Mm, K, N, dtype=jnp.bfloat16, reps=3):
        a = jnp.asarray(rng.standard_normal((Mm, K)), dtype)
        b = jnp.asarray(rng.standard_normal((K, N)), dtype)
        f = jax.jit(lambda x, y: x @ y)
        jax.block_until_ready(f(a, b))
        # inner=64: sub-ms ops must amortize the ~35 ms tunnel readback
        # or the number is the RTT, not the matmul
        t = med_time(lambda: f(a, b), reps=reps, inner=64)
        tf = 2 * Mm * K * N / t / 1e12
        print(f"A matmul {name} {Mm}x{K}x{N} {dtype.__name__}: "
              f"{t*1e3:.3f} ms  {tf:.1f} TFLOP/s", flush=True)
        return t

    t_q = mmbench("q_proj", M, 1024, 2048)
    t_kv = mmbench("k_proj", M, 1024, 1024)
    t_qkv = mmbench("qkv_merged", M, 1024, 4096)
    t_o = mmbench("o_proj", M, 2048, 1024)
    t_g = mmbench("gate", M, 1024, 3072)
    t_gu = mmbench("gateup_merged", M, 1024, 6144)
    t_d = mmbench("down", M, 3072, 1024)
    t_lm = mmbench("lm_head_f32", B, 1024, 151936, jnp.float32)
    split = t_q + 2 * t_kv + t_o + 2 * t_g + t_d
    merged = t_qkv + t_o + t_gu + t_d
    print(f"A per-layer matmuls: split {split*1e3:.3f} ms, merged {merged*1e3:.3f} ms "
          f"(x28: {split*28*1e3:.0f} / {merged*28*1e3:.0f} ms)", flush=True)

    # ---- stage B: in-model ablations over one shared param tree --------
    cfg = Qwen3Config(dtype=jnp.bfloat16)
    cfg_e = Qwen3Config(dtype=jnp.bfloat16, attn_impl="einsum")
    model = FlaxQwen3LM(cfg)
    key = jax.random.PRNGKey(0)
    ids1 = jnp.zeros((1, 8), jnp.int32)
    shapes = jax.eval_shape(model.init, key, ids1, jnp.ones((1, 8), bool))
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: hasattr(x, "shape"))
    keys = jax.random.split(key, len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [jax.device_put(jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02)
         for k, l in zip(keys, leaves)],
    )
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), dtype=bool)

    flops_pair = L * cfg.num_hidden_layers * (
        2 * 1024 * 128 * (2 * 16 + 2 * 8) + 6 * 1024 * 3072 + 4 * L * 16 * 128
    )

    def run(name, mdl, method=None, note=""):
        m = method or mdl.last_logits
        f = jax.jit(lambda p, i, k: mdl.apply(p, i, k, method=m))
        jax.block_until_ready(f(params, ids, mask))
        t = med_time(lambda: f(params, ids, mask))
        mfu = B * flops_pair / t / PEAK
        print(f"B {name}: {t*1e3:.1f} ms  {B/t:.1f} pairs/s  MFU(full-fwd-flops) "
              f"{mfu*100:.1f}%  {note}", flush=True)
        return t

    t_full = run("full/flash", model)
    t_ein = run("full/einsum", FlaxQwen3LM(cfg_e))
    t_hid = run("hidden_only/flash", model, method=model.hidden,
                note="(lm_head cost = full - this)")

    # -- ablation variants: same param tree, pieces skipped --------------
    class AttnNoCore(Qwen3Attention):
        """Projections+norms+rope kept, attention core replaced by ctx=v
        (same shapes into o_proj). full - this = flash-core cost.
        NOTE: post-r5-fusion model (fused qkv_proj; XLA rope path forced
        so this variant keeps measuring the unfused prep cost — the
        historical numbers in bench_results/rerank_probe_r05.txt were
        taken against the pre-fusion model)."""

        @nn.compact
        def __call__(self, x, bias, positions, mask, rope_cs=None):
            cfg = self.cfg
            b, l, _ = x.shape
            hd, nh, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
            dense = lambda f_, n_: nn.Dense(f_, use_bias=False, dtype=cfg.dtype, name=n_)
            qkv = dense(nh * hd + 2 * nkv * hd, "qkv_proj")(x)
            q = qkv[..., : nh * hd].reshape(b, l, nh, hd)
            k = qkv[..., nh * hd : (nh + nkv) * hd].reshape(b, l, nkv, hd)
            v = qkv[..., (nh + nkv) * hd :].reshape(b, l, nkv, hd)
            q = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="q_norm")(q)
            k = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="k_norm")(k)
            q = rope(q.transpose(0, 2, 1, 3), positions, cfg.rope_theta)
            k = rope(k.transpose(0, 2, 1, 3), positions, cfg.rope_theta)
            v = v.transpose(0, 2, 1, 3)
            # epsilon-weighted q/k terms keep them live (x*0 would be
            # algebraically simplified away, DCE-ing the projections)
            eps = jnp.asarray(1e-6, cfg.dtype)
            ctx = (jnp.repeat(v, nh // nkv, axis=1)
                   + eps * q
                   + eps * jnp.mean(k, axis=(1, 2), keepdims=True))
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
            return dense(cfg.hidden_size, "o_proj")(ctx)

    class AttnProjOnly(Qwen3Attention):
        """q->o only, no kv/norm/rope: isolates qkv-side elementwise."""

        @nn.compact
        def __call__(self, x, bias, positions, mask, rope_cs=None):
            cfg = self.cfg
            b, l, _ = x.shape
            hd, nh, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
            dense = lambda f_, n_: nn.Dense(f_, use_bias=False, dtype=cfg.dtype, name=n_)
            qkv = dense(nh * hd + 2 * nkv * hd, "qkv_proj")(x)
            q = qkv[..., : nh * hd]
            return dense(cfg.hidden_size, "o_proj")(q)

    class LayerNoMLP(q3.Qwen3Layer):
        @nn.compact
        def __call__(self, x, bias, positions, mask, rope_cs=None):
            cfg = self.cfg
            h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="input_layernorm")(x)
            x = x + Qwen3Attention(cfg, name="self_attn")(
                h, bias, positions, mask, rope_cs)
            return x

    orig_attn, orig_layer = q3.Qwen3Attention, q3.Qwen3Layer
    try:
        q3.Qwen3Attention = AttnNoCore
        t_nocore = run("no_attn_core/flash", FlaxQwen3LM(cfg), None,
                       note="(attention-core = full - this)")
        q3.Qwen3Attention = AttnProjOnly
        t_projonly = run("attn_proj_only", FlaxQwen3LM(cfg), None,
                         note="(qknorm+rope+repeat = no_attn_core - this)")
        q3.Qwen3Attention = orig_attn
        q3.Qwen3Layer = LayerNoMLP
        t_nomlp = run("no_mlp/flash", FlaxQwen3LM(cfg), None,
                      note="(mlp = full - this)")
    finally:
        q3.Qwen3Attention = orig_attn
        q3.Qwen3Layer = orig_layer

    print("# ---- decomposition (ms) ----", flush=True)
    print(f"lm_head            : {(t_full-t_hid)*1e3:8.1f}", flush=True)
    print(f"attention core     : {(t_full-t_nocore)*1e3:8.1f}  (28 layers)", flush=True)
    print(f"qknorm+rope+repeat : {(t_nocore-t_projonly)*1e3:8.1f}", flush=True)
    print(f"mlp (incl norm)    : {(t_full-t_nomlp)*1e3:8.1f}", flush=True)
    print(f"matmul roofline    : {split*28*1e3:8.1f}  (split-proj measured rate)", flush=True)
    print(f"full               : {t_full*1e3:8.1f}", flush=True)

    # ---- stage C: splash attention candidate (native GQA) --------------
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            CausalMask, MultiHeadMask, make_splash_mqa_single_device,
            splash_attention_kernel, splash_attention_mask,
        )

        nh, nkv, hd = 16, 8, 128
        group = nh // nkv
        # GQA as B*nkv independent MQA problems: q (group, L, d) per kv head
        mask1 = MultiHeadMask([CausalMask((L, L)) for _ in range(group)])
        kern = make_splash_mqa_single_device(mask1)
        qb = jnp.asarray(
            rng.standard_normal((B * nkv, group, L, hd)), jnp.bfloat16)
        kb = jnp.asarray(rng.standard_normal((B * nkv, L, hd)), jnp.bfloat16)
        vb = jnp.asarray(rng.standard_normal((B * nkv, L, hd)), jnp.bfloat16)
        f = jax.jit(jax.vmap(kern))
        jax.block_until_ready(f(qb, kb, vb))
        t = med_time(lambda: f(qb, kb, vb), inner=32)
        print(f"C splash mqa causal (B={B},{nh}q/{nkv}kv,L={L},d={hd}): "
              f"{t*1e3:.3f} ms/layer-attn", flush=True)
        # mha variant at repeated kv for comparison
        mask2 = MultiHeadMask([CausalMask((L, L)) for _ in range(nh)])
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            make_splash_mha_single_device)
        kern2 = make_splash_mha_single_device(mask2)
        qb2 = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.bfloat16)
        kb2 = jnp.asarray(rng.standard_normal((B, nh, L, hd)), jnp.bfloat16)
        f2 = jax.jit(jax.vmap(kern2))
        jax.block_until_ready(f2(qb2, kb2, kb2))
        t2 = med_time(lambda: f2(qb2, kb2, kb2), inner=32)
        print(f"C splash mha causal (B={B},{nh}h,L={L},d={hd}): "
              f"{t2*1e3:.3f} ms/layer-attn", flush=True)
    except Exception as e:
        print(f"C splash probe failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

"""Same-session A/B probe for the encoder serving path (VERDICT r2 #1).

Measures, on the real chip, with fetch-terminated timing:
  1. int8 vs bf16 matmul microbenchmark (does XLA use the v5e 2x int8 MXU
     mode? CLAUDE.md notes the *Pallas* int8 path showed no 2x — this
     checks the XLA path, which may lower differently).
  2. Encoder forward variants at the flagship config (768x12, L=128):
       base      - current TextEncoder (f32 params, bf16 compute)
       bf16p     - params cast to bf16 (half param HBM traffic, no casts)
       fusedattn - bf16p + attention restructured to avoid the explicit
                   (B,H,L,L) f32 round trip / transposes where possible
  3. Batch sweep for the best variant.
  4. Length sweep (bucketing payoff) for the best variant.

Timing rule (CLAUDE.md): dispatch a stream of >=N forwards, terminate
with a device_get fetch; median of >=5 reps; same-session A/B only.
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


def timed_stream(fn, args_list, reps=5, inner=None):
    """Median wall time of dispatching fn over args_list + one fetch."""
    inner = inner or len(args_list)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        outs = [fn(*a) for a in args_list[:inner]]
        import jax

        jax.device_get(outs[-1])
        np.asarray(outs[0]).ravel()[:1]  # force first too (stream drained)
        ts.append(time.time() - t0)
    return float(np.median(ts)) / inner


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    rng = np.random.default_rng(0)

    # ---- 1. int8 vs bf16 matmul micro ------------------------------------
    M, K_, N = 16384, 768, 3072
    a_f = rng.standard_normal((M, K_), dtype=np.float32)
    b_f = rng.standard_normal((K_, N), dtype=np.float32)
    a_bf = jnp.asarray(a_f, jnp.bfloat16)
    b_bf = jnp.asarray(b_f, jnp.bfloat16)
    a_i8 = jnp.asarray(np.clip(a_f * 10, -127, 127).astype(np.int8))
    b_i8 = jnp.asarray(np.clip(b_f * 10, -127, 127).astype(np.int8))

    @jax.jit
    def mm_bf(a, b):
        return jnp.dot(a, b)

    @jax.jit
    def mm_i8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    flops = 2 * M * K_ * N
    for name, f, aa, bb in [("bf16", mm_bf, a_bf, b_bf), ("int8", mm_i8, a_i8, b_i8)]:
        jax.block_until_ready(f(aa, bb))
        t = timed_stream(lambda: f(aa, bb), [()] * 20, reps=5)
        print(f"matmul {name}: {t*1e3:.3f} ms  {flops/t/1e12:.1f} TFLOP/s", flush=True)

    # ---- 2. encoder variants --------------------------------------------
    from rag_arc_tpu.models.encoder import TransformerConfig, init_encoder

    B, L = 512, 128
    cfg = TransformerConfig(vocab_size=32768, dim=768, depth=12, heads=12, max_len=512)
    model, params = init_encoder(cfg)
    ids_np = rng.integers(4, 32768, (B, L)).astype(np.int32)
    ids = jnp.asarray(ids_np)
    mask = jnp.ones((B, L), dtype=bool)
    tok_flops = 2 * 12 * cfg.dim * cfg.dim * 12 + 2 * 2 * L * cfg.dim  # per tok
    batch_flops = B * L * tok_flops

    variants = {}
    variants["base"] = (jax.jit(model.apply), params)

    params_bf = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    variants["bf16p"] = (jax.jit(model.apply), params_bf)

    # fusedattn: encoder with attention in (b,l,h,d) layout, no transposes,
    # bf16 softmax path (scores still accumulate f32 in the einsum)
    try:
        from rag_arc_tpu.models.encoder import TextEncoderFast  # noqa

        fast = TextEncoderFast(cfg)
        fparams = {"params": params_bf["params"]}
        variants["fusedattn"] = (jax.jit(fast.apply), fparams)
    except ImportError:
        print("TextEncoderFast not present; skipping", flush=True)

    results = {}
    for name, (fwd, prm) in variants.items():
        out = fwd(prm, ids, mask)
        jax.block_until_ready(out)
        t = timed_stream(lambda: fwd(prm, ids, mask), [()] * 8, reps=5)
        dps = B / t
        results[name] = t
        print(
            f"encoder {name}: {t*1e3:.2f} ms/batch  {dps:,.0f} docs/s  "
            f"MFU {batch_flops/t/197e12*100:.1f}%",
            flush=True,
        )

    best = min(results, key=results.get)
    fwd, prm = variants[best]
    print(f"best: {best}", flush=True)

    # ---- 3. batch sweep --------------------------------------------------
    for b in (64, 128, 256, 512, 1024):
        ids_b = jnp.asarray(rng.integers(4, 32768, (b, L)).astype(np.int32))
        mask_b = jnp.ones((b, L), dtype=bool)
        jax.block_until_ready(fwd(prm, ids_b, mask_b))
        t = timed_stream(lambda: fwd(prm, ids_b, mask_b), [()] * 8, reps=5)
        print(f"B={b}: {t*1e3:.2f} ms  {b/t:,.0f} docs/s", flush=True)

    # ---- 4. length sweep (bucketing payoff) ------------------------------
    for l in (16, 32, 64, 128):
        ids_l = jnp.asarray(rng.integers(4, 32768, (512, l)).astype(np.int32))
        mask_l = jnp.ones((512, l), dtype=bool)
        jax.block_until_ready(fwd(prm, ids_l, mask_l))
        t = timed_stream(lambda: fwd(prm, ids_l, mask_l), [()] * 8, reps=5)
        print(f"L={l}: {t*1e3:.2f} ms  {512/t:,.0f} docs/s", flush=True)


if __name__ == "__main__":
    main()

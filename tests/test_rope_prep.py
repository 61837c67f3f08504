"""Parity tests for the fused rope+transpose+GQA-repeat prep kernel
(`ops/rope_prep.py`, interpret mode — the TPU path is exercised by
tools/rerank_probe.py and the bench rerank section on chip).

Reference semantics: HF half-split rotary embedding as implemented by
`models/qwen3.py::rope` (torch-parity-tested against Qwen3ForCausalLM),
plus the (B,L,H,D)->(B,H,L,D) transpose and `jnp.repeat` GQA expansion
the kernel folds in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_arc_tpu.ops.rope_prep import rope_cos_sin, rope_prep, rope_prep_ref
from rag_arc_tpu.models.qwen3 import rope


def _mk(rng, b, l, nh, nkv, d, dtype=jnp.bfloat16):
    q = jnp.asarray(rng.standard_normal((b, l, nh * d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, l, nkv * d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, l, nkv * d)), dtype)
    return q, k, v


def _leftpad_positions(rng, b, l):
    """HF left-padded position ids: zeros through the pad, then 0..n-1."""
    pos = np.zeros((b, l), np.int32)
    for i in range(b):
        live = int(rng.integers(1, l + 1))
        pos[i, l - live :] = np.arange(live)
    return jnp.asarray(pos)


@pytest.mark.parametrize("nh,nkv", [(8, 4), (4, 4), (8, 2)])
def test_kernel_matches_ref(nh, nkv):
    rng = np.random.default_rng(0)
    b, l, d = 4, 64, 128
    q, k, v = _mk(rng, b, l, nh, nkv, d)
    pos = _leftpad_positions(rng, b, l)
    cos, sin = rope_cos_sin(pos, 1e6, d)
    qo, ko, vo = rope_prep(q, k, v, cos, sin, nh=nh, nkv=nkv, d=d,
                           interpret=True)
    qr, kr, vr = rope_prep_ref(
        q.reshape(b, l, nh, d), k.reshape(b, l, nkv, d),
        v.reshape(b, l, nkv, d), cos, sin)
    assert qo.shape == (b, nh, l, d)
    # atol: one bf16 ulp at O(1) magnitudes — interpret-mode FMA
    # contraction rounds single elements differently from the ref
    np.testing.assert_allclose(
        np.asarray(qo, np.float32), np.asarray(qr, np.float32), atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(ko, np.float32), np.asarray(kr, np.float32), atol=1e-2)
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(vr))


def test_kernel_norm_folding_matches_ref():
    """qs/ks given -> Qwen3 per-head RMS norm happens inside the kernel."""
    rng = np.random.default_rng(7)
    b, l, nh, nkv, d = 4, 64, 8, 4, 128
    q, k, v = _mk(rng, b, l, nh, nkv, d)
    qs = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
    ks = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
    pos = _leftpad_positions(rng, b, l)
    cos, sin = rope_cos_sin(pos, 1e6, d)
    qo, ko, vo = rope_prep(q, k, v, cos, sin, qs, ks, nh=nh, nkv=nkv, d=d,
                           interpret=True)
    qr, kr, vr = rope_prep_ref(
        q.reshape(b, l, nh, d), k.reshape(b, l, nkv, d),
        v.reshape(b, l, nkv, d), cos, sin, qs, ks)
    np.testing.assert_allclose(
        np.asarray(qo, np.float32), np.asarray(qr, np.float32), atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(ko, np.float32), np.asarray(kr, np.float32), atol=1e-2)
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(vr))


def test_norm_fold_matches_model_rmsnorm_then_rope():
    """Folded norm+rope == the model's sequential RMSNorm -> rope chain
    (f32 end-to-end; the sequential chain's intermediate bf16 rounding is
    the only difference, bounded by one ulp)."""
    import flax.linen as nn
    from rag_arc_tpu.models.qwen3 import RMSNorm

    rng = np.random.default_rng(8)
    b, l, nh, nkv, d = 2, 32, 4, 2, 128
    q, k, v = _mk(rng, b, l, nh, nkv, d)
    qs = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
    ks = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
    pos = _leftpad_positions(rng, b, l)
    cos, sin = rope_cos_sin(pos, 1e6, d)
    qr, kr, _ = rope_prep_ref(
        q.reshape(b, l, nh, d), k.reshape(b, l, nkv, d),
        v.reshape(b, l, nkv, d), cos, sin, qs, ks)

    norm = RMSNorm(1e-6, jnp.float32)
    qn = norm.apply({"params": {"weight": qs}}, q.reshape(b, l, nh, d))
    kn = norm.apply({"params": {"weight": ks}}, k.reshape(b, l, nkv, d))
    q_old = rope(qn.transpose(0, 2, 1, 3), pos, 1e6)
    k_old = jnp.repeat(
        rope(kn.transpose(0, 2, 1, 3), pos, 1e6), nh // nkv, axis=1)
    np.testing.assert_allclose(
        np.asarray(qr, np.float32), np.asarray(q_old, np.float32), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(kr, np.float32), np.asarray(k_old, np.float32), atol=2e-2)


def test_ref_matches_model_rope():
    """The roll/sign-fold formulation == models.qwen3.rope (the
    torch-parity-tested HF convention) + transpose + repeat."""
    rng = np.random.default_rng(1)
    b, l, nh, nkv, d = 2, 32, 4, 2, 128
    q, k, v = _mk(rng, b, l, nh, nkv, d, dtype=jnp.float32)
    pos = _leftpad_positions(rng, b, l)
    cos, sin = rope_cos_sin(pos, 1e6, d)
    qr, kr, vr = rope_prep_ref(
        q.reshape(b, l, nh, d), k.reshape(b, l, nkv, d),
        v.reshape(b, l, nkv, d), cos, sin)
    q_old = rope(q.reshape(b, l, nh, d).transpose(0, 2, 1, 3), pos, 1e6)
    k_old = jnp.repeat(
        rope(k.reshape(b, l, nkv, d).transpose(0, 2, 1, 3), pos, 1e6),
        nh // nkv, axis=1)
    v_old = jnp.repeat(
        v.reshape(b, l, nkv, d).transpose(0, 2, 1, 3), nh // nkv, axis=1)
    np.testing.assert_allclose(np.asarray(qr), np.asarray(q_old), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kr), np.asarray(k_old), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(vr), np.asarray(v_old))


@pytest.mark.parametrize("b", [1, 2, 6])
def test_batch_block_selection(b):
    """bb must divide B; odd batches fall through to smaller blocks."""
    rng = np.random.default_rng(2)
    l, nh, nkv, d = 16, 4, 2, 128
    q, k, v = _mk(rng, b, l, nh, nkv, d)
    pos = _leftpad_positions(rng, b, l)
    cos, sin = rope_cos_sin(pos, 1e4, d)
    qo, ko, vo = rope_prep(q, k, v, cos, sin, nh=nh, nkv=nkv, d=d,
                           interpret=True)
    qr, kr, vr = rope_prep_ref(
        q.reshape(b, l, nh, d), k.reshape(b, l, nkv, d),
        v.reshape(b, l, nkv, d), cos, sin)
    np.testing.assert_allclose(
        np.asarray(qo, np.float32), np.asarray(qr, np.float32), atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(ko, np.float32), np.asarray(kr, np.float32), atol=1e-2)


def test_vmem_fallback_long_sequence():
    """Sequences too long for one VMEM batch row take the XLA reference
    path (same math) instead of crashing."""
    rng = np.random.default_rng(3)
    b, l, nh, nkv, d = 1, 4096, 2, 1, 128
    q, k, v = _mk(rng, b, l, nh, nkv, d)
    pos = jnp.asarray(np.tile(np.arange(l), (b, 1)), jnp.int32)
    cos, sin = rope_cos_sin(pos, 1e6, d)
    qo, ko, vo = rope_prep(q, k, v, cos, sin, nh=nh, nkv=nkv, d=d,
                           interpret=True)
    assert qo.shape == (b, nh, l, d) and ko.shape == vo.shape == qo.shape

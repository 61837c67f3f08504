"""Flax transformer stack: text encoder + causal LM.

This is the TPU replacement for the reference's torch forwards — the
sentence-transformers embedder (``huggingface.py:96-134``) and the Qwen3
cross-encoder reranker's causal LM (``Reranker_Qwen3.py:41-49``). One
shared pre-LN transformer trunk serves both:

- ``TextEncoder``  — bidirectional attention, masked mean pooling,
  L2-normalized embeddings (what a sentence-transformer computes).
- ``CausalLM``     — causal attention + logit head over the vocabulary
  (what the pointwise reranker scores yes/no with).

Design notes (TPU-first):
- bf16 activations/params by default; logits and pooling accumulate in f32.
- Static shapes everywhere; attention masks are dense bool tensors.
- Tensor-parallel layout is expressed as PartitionSpec rules keyed on
  parameter paths (``param_shardings``): attention QKV and MLP up-project
  shard columns across ``"tp"``, output/down projections shard rows, so
  each block needs exactly one psum (inserted by XLA) on its residual.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 32768
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    max_len: int = 512
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    causal: bool = False

    @property
    def head_dim(self) -> int:
        assert self.dim % self.heads == 0
        return self.dim // self.heads

    @classmethod
    def tiny(cls, **kw) -> "TransformerConfig":
        """Test-size config (runs in milliseconds on CPU)."""
        base = dict(vocab_size=512, dim=64, depth=2, heads=4, max_len=64)
        base.update(kw)
        return cls(**base)


class Block(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x: jax.Array, attn_bias: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = nn.LayerNorm(dtype=cfg.dtype, name="ln_attn")(x)
        qkv = nn.Dense(
            3 * cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="qkv"
        )(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, l, _ = q.shape
        shape = (b, l, cfg.heads, cfg.head_dim)
        q = q.reshape(shape).transpose(0, 2, 1, 3)
        k = k.reshape(shape).transpose(0, 2, 1, 3)
        v = v.reshape(shape).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(cfg.head_dim)
        scores = scores + attn_bias  # (B, 1, L, L) additive mask
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, cfg.dim)
        x = x + nn.Dense(
            cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="attn_out"
        )(ctx)

        h = nn.LayerNorm(dtype=cfg.dtype, name="ln_mlp")(x)
        h = nn.Dense(
            cfg.mlp_ratio * cfg.dim,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="mlp_up",
        )(h)
        h = nn.gelu(h)
        h = nn.Dense(
            cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_down"
        )(h)
        return x + h


class Trunk(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, l = ids.shape
        tok = nn.Embed(
            cfg.vocab_size,
            cfg.dim,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="tok_embed",
        )(ids)
        # positions from the mask, not arange: under LEFT padding (the
        # cross-encoder path) real tokens must embed positions 0..n-1
        # regardless of how much padding the batch's longest row forced —
        # absolute arange made a pair's score depend on batch composition.
        # Right-padded rows see cumsum-1 == arange on their real tokens,
        # and pad positions never reach pooling/attention outputs.
        # (Same recipe as models/qwen3.py, mirroring HF position_ids.)
        positions = jnp.clip(jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1, 0)
        pos = nn.Embed(
            cfg.max_len,
            cfg.dim,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="pos_embed",
        )(positions)
        x = tok + pos

        # additive attention bias: -inf at masked keys; causal if configured
        neg = jnp.asarray(-1e9, dtype=jnp.float32)
        key_mask = mask[:, None, None, :]  # (B, 1, 1, L)
        bias = jnp.where(key_mask, 0.0, neg)
        if cfg.causal:
            causal = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None, :, :]
            bias = jnp.where(causal, bias, neg)

        for i in range(cfg.depth):
            x = Block(cfg, name=f"block_{i}")(x, bias)
        return nn.LayerNorm(dtype=cfg.dtype, name="ln_final")(x)


def l2_normalize_rows(pooled: jax.Array) -> jax.Array:
    """L2-normalize along the last axis (f32; zero rows stay zero). The
    ONE normalization shared by every encoder head — the packed/fast
    variants' parity with TextEncoder depends on identical arithmetic."""
    norm = jnp.sqrt(jnp.sum(pooled * pooled, axis=-1, keepdims=True))
    return pooled / jnp.maximum(norm, 1e-12)


def masked_mean_pool(x: jax.Array, mask: jax.Array) -> jax.Array:
    """f32-accumulated masked mean over the length axis (all-False rows
    pool to exact zero)."""
    m = mask[..., None].astype(jnp.float32)
    return jnp.sum(x.astype(jnp.float32) * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1.0
    )


class TextEncoder(nn.Module):
    """Masked-mean-pooled, L2-normalized sentence encoder."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        x = Trunk(self.cfg, name="trunk")(ids, mask)
        return l2_normalize_rows(masked_mean_pool(x, mask))


class CausalLM(nn.Module):
    """Causal trunk + vocabulary logits (for cross-encoder scoring)."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(
        self, ids: jax.Array, mask: jax.Array, last_only: bool = False
    ) -> jax.Array:
        """Logits (B, L, V) — or (B, V) for the LAST position only when
        ``last_only=True``. Cross-encoder scoring (rerank/cross_encoder.py)
        reads one position's yes/no logits; projecting the whole sequence
        through the vocab head would cost L× the head FLOPs and an
        O(B·L·V) activation for nothing (4.3 GB at B=64, L=512, V=32k).
        The head params are identical either way, so trained checkpoints
        serve both."""
        cfg = dataclasses.replace(self.cfg, causal=True)
        x = Trunk(cfg, name="trunk")(ids, mask)
        if last_only:
            x = x[:, -1, :]
        return nn.Dense(
            cfg.vocab_size,
            dtype=jnp.float32,
            param_dtype=cfg.param_dtype,
            name="lm_head",
        )(x)


class FastBlock(nn.Module):
    """Serving-optimized block: attention stays in (B, L, H, D) layout
    (no explicit head transposes — XLA picks layouts for the einsums),
    probabilities cast to the compute dtype immediately after the f32
    softmax, and the key mask kept at (B, 1, 1, L) so no (B, H, L, L)
    bias tensor is ever materialized. Numerics match Block to ~1e-2
    relative (bf16 rounding only); the parameter tree is identical, so
    trained Block params load directly."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x: jax.Array, key_bias: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = nn.LayerNorm(dtype=cfg.dtype, name="ln_attn")(x)
        qkv = nn.Dense(
            3 * cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="qkv"
        )(h)
        b, l, _ = qkv.shape
        qkv = qkv.reshape(b, l, 3, cfg.heads, cfg.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum(
            "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / np.sqrt(cfg.head_dim))
        scores = scores + key_bias  # (B, 1, 1, L) broadcasts over h, l
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, cfg.dim)
        x = x + nn.Dense(
            cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="attn_out"
        )(ctx)

        h = nn.LayerNorm(dtype=cfg.dtype, name="ln_mlp")(x)
        h = nn.Dense(
            cfg.mlp_ratio * cfg.dim,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="mlp_up",
        )(h)
        h = nn.gelu(h)
        h = nn.Dense(
            cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="mlp_down"
        )(h)
        return x + h


class TextEncoderFast(nn.Module):
    """Serving twin of TextEncoder built from FastBlock (bidirectional
    only — the causal path keeps the reference Block). Same param tree
    as TextEncoder, so ``encoder_params["params"]`` swap in directly."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg

        class _FastTrunk(nn.Module):
            cfg: TransformerConfig

            @nn.compact
            def __call__(self, ids, mask):
                cfg = self.cfg
                tok = nn.Embed(
                    cfg.vocab_size,
                    cfg.dim,
                    dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype,
                    name="tok_embed",
                )(ids)
                # mask-derived positions, matching Trunk exactly (the
                # parity contract between the twins)
                positions = jnp.clip(
                    jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1, 0
                )
                pos = nn.Embed(
                    cfg.max_len,
                    cfg.dim,
                    dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype,
                    name="pos_embed",
                )(positions)
                x = tok + pos
                neg = jnp.asarray(-1e9, dtype=jnp.float32)
                key_bias = jnp.where(mask[:, None, None, :], 0.0, neg)
                for i in range(cfg.depth):
                    x = FastBlock(cfg, name=f"block_{i}")(x, key_bias)
                return nn.LayerNorm(dtype=cfg.dtype, name="ln_final")(x)

        x = _FastTrunk(cfg, name="trunk")(ids, mask)
        return l2_normalize_rows(masked_mean_pool(x, mask))


class PackedTextEncoder(nn.Module):
    """Sequence-packed twin of TextEncoder (same param tree): several
    short documents share one MXU-sized attention row.

    Why: attention over an L=16 query is a 16×16 matmul — ~1.5% MXU
    utilization — and the measured encoder MFU collapses from ~52% at
    L=128 to ~34% at L=16 (tools/encoder_probe2.py). Packing K short
    docs into one 128-token row with a block-diagonal attention mask
    restores L=128 matmul shapes while doing zero padding work, so
    short-query throughput scales with 1/length instead of flatlining.

    Inputs: ``ids (B, L)``, ``pos_ids (B, L)`` (token offset *within its
    document* — position embeddings must restart per segment for parity
    with the unpacked forward), ``seg_ids (B, L)`` (document slot id
    0..max_segments-1, -1 on padding). Output: ``(B, max_segments, dim)``
    L2-normalized segment mean-pools; slots with no tokens return 0 — the
    caller keeps a (row, slot) → document mapping.
    """

    cfg: TransformerConfig
    max_segments: int = 8

    @nn.compact
    def __call__(
        self, ids: jax.Array, pos_ids: jax.Array, seg_ids: jax.Array
    ) -> jax.Array:
        cfg = self.cfg
        max_segments = self.max_segments

        class _PackedTrunk(nn.Module):
            cfg: TransformerConfig

            @nn.compact
            def __call__(self, ids, pos_ids, seg_ids):
                cfg = self.cfg
                tok = nn.Embed(
                    cfg.vocab_size,
                    cfg.dim,
                    dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype,
                    name="tok_embed",
                )(ids)
                pos = nn.Embed(
                    cfg.max_len,
                    cfg.dim,
                    dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype,
                    name="pos_embed",
                )(pos_ids)
                x = tok + pos
                neg = jnp.asarray(-1e9, dtype=jnp.float32)
                # block-diagonal attention: token i attends to j iff both
                # sit in the same segment (padding seg -1 never matches a
                # valid key because the key side also requires seg >= 0)
                same = seg_ids[:, None, :, None] == seg_ids[:, None, None, :]
                key_valid = (seg_ids >= 0)[:, None, None, :]
                bias = jnp.where(same & key_valid, 0.0, neg)
                for i in range(cfg.depth):
                    x = Block(cfg, name=f"block_{i}")(x, bias)
                return nn.LayerNorm(dtype=cfg.dtype, name="ln_final")(x)

        x = _PackedTrunk(cfg, name="trunk")(ids, pos_ids, seg_ids)
        onehot = jax.nn.one_hot(seg_ids, max_segments, dtype=jnp.float32)
        sums = jnp.einsum("bld,bls->bsd", x.astype(jnp.float32), onehot)
        counts = jnp.sum(onehot, axis=1)  # (B, S)
        pooled = sums / jnp.maximum(counts[..., None], 1.0)
        return l2_normalize_rows(pooled)


# -- parameter sharding (tensor parallel) ---------------------------------

_TP_RULES: Tuple[Tuple[str, P], ...] = (
    ("qkv/kernel", P(None, "tp")),
    ("qkv/bias", P("tp")),
    ("attn_out/kernel", P("tp", None)),
    ("mlp_up/kernel", P(None, "tp")),
    ("mlp_up/bias", P("tp")),
    ("mlp_down/kernel", P("tp", None)),
    ("lm_head/kernel", P(None, "tp")),
    ("lm_head/bias", P("tp")),
    ("tok_embed/embedding", P("tp", None)),
)


def param_shardings(params: Dict, mesh: Mesh) -> Dict:
    """NamedShardings for a param tree: tp rules by path, replicate rest."""

    def spec_for(path: str) -> P:
        for suffix, spec in _TP_RULES:
            if path.endswith(suffix):
                return spec
        return P()

    def assign(path_tuple, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_tuple)
        return NamedSharding(mesh, spec_for(path))

    return jax.tree_util.tree_map_with_path(assign, params)


def init_encoder(
    cfg: TransformerConfig, seed: int = 0
) -> Tuple[TextEncoder, Dict]:
    model = TextEncoder(cfg)
    ids = jnp.zeros((1, min(8, cfg.max_len)), dtype=jnp.int32)
    mask = jnp.ones_like(ids, dtype=bool)
    params = model.init(jax.random.PRNGKey(seed), ids, mask)
    return model, params


def init_causal_lm(cfg: TransformerConfig, seed: int = 0) -> Tuple[CausalLM, Dict]:
    model = CausalLM(cfg)
    ids = jnp.zeros((1, min(8, cfg.max_len)), dtype=jnp.int32)
    mask = jnp.ones_like(ids, dtype=bool)
    params = model.init(jax.random.PRNGKey(seed), ids, mask)
    return model, params


def count_params(params: Dict) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))

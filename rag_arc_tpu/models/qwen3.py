"""Weight-compatible Flax Qwen3 causal LM.

The reference's reranker is literally a Qwen3 cross-encoder running under
torch/CUDA (``core/rerank/Reranker_Qwen3.py:9-13``). This module implements
the Qwen3 decoder computation in Flax — RMSNorm, per-head QK-norm, RoPE,
grouped-query attention, SwiGLU MLP — with a converter from an HF torch
``state_dict``, so *the actual production reranker checkpoint* runs on TPU
through ``CrossEncoderReranker``. Numeric parity vs torch
``Qwen3ForCausalLM`` is tested on random-init models (no downloads).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    vocab_size: int = 151936
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    max_position_embeddings: int = 32768
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    dtype: Any = jnp.float32
    # "auto" → Pallas flash attention on TPU at eligible shapes (L and
    # head_dim multiples of 128), einsum elsewhere; "einsum"/"flash" force.
    attn_impl: str = "auto"

    @classmethod
    def tiny(cls, **kw) -> "Qwen3Config":
        base = dict(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=8,
            max_position_embeddings=64,
            rope_theta=10000.0,
        )
        base.update(kw)
        return cls(**base)


class RMSNorm(nn.Module):
    eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, scale_only: bool = False) -> jax.Array:
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        if scale_only:
            # fused attention prep applies the norm inside its Pallas
            # kernel; it only needs the scale param (declared here so the
            # param tree is identical on every path)
            return scale
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        out = x32 * jax.lax.rsqrt(var + self.eps)
        return (out * scale).astype(self.dtype)


def rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding, HF half-split convention. x: (B, H, L, D)."""
    d = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = positions[:, None, :, None].astype(jnp.float32) * inv_freq[None, None, None, :]
    cos = jnp.cos(angles)  # (B, 1, L, D/2)
    sin = jnp.sin(angles)
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _flash_eligible(cfg: Qwen3Config, l: int) -> bool:
    """Pallas flash attention eligibility. The kernel tiles (q_len, kv_len)
    in 128-step blocks with head_dim as the lane axis, so both must be
    multiples of 128; on CPU there is no Mosaic backend, so "auto" only
    picks it when the default backend is a TPU."""
    if cfg.attn_impl == "einsum":
        return False
    if cfg.attn_impl not in ("auto", "flash"):
        raise ValueError(f"attn_impl must be auto|einsum|flash, got {cfg.attn_impl!r}")
    if cfg.head_dim % 128 or l % 128 or l < 128:
        return False
    if cfg.attn_impl == "flash":
        return True
    try:
        # the axon tunnel backend reports "tpu" in current sessions but
        # other repo paths (flat.py) defensively accept "axon" too —
        # match that convention
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


class Qwen3Attention(nn.Module):
    cfg: Qwen3Config

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: jax.Array | None,
        positions: jax.Array,
        mask: jax.Array,
        rope_cs: tuple[jax.Array, jax.Array] | None = None,
    ) -> jax.Array:
        cfg = self.cfg
        b, l, _ = x.shape
        hd = cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        dense = lambda features, name: nn.Dense(  # noqa: E731
            features, use_bias=False, dtype=cfg.dtype, name=name
        )
        # ONE fused projection: separate q/k/v matmuls ran at 78-118
        # TFLOP/s at these K=1024 shapes, the merged (1024, 4096) one at
        # 146 (bench_results/rerank_probe_r05.txt stage A) — ~1 ms/layer.
        # Column-identical math; the HF checkpoint converter concatenates.
        qkv = dense(nh * hd + 2 * nkv * hd, "qkv_proj")(x)
        q = qkv[..., : nh * hd].reshape(b, l, nh, hd)
        k = qkv[..., nh * hd : (nh + nkv) * hd].reshape(b, l, nkv, hd)
        v = qkv[..., (nh + nkv) * hd :].reshape(b, l, nkv, hd)
        use_flash = _flash_eligible(cfg, l)
        qn = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="q_norm")
        kn = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="k_norm")
        if use_flash and rope_cs is not None:
            # fused qk-norm+rope+transpose+GQA-repeat: ONE HBM pass per
            # tensor (the XLA lowering of the else-branch was measured at
            # ~5.1 ms/layer vs 2.8 fused at B=64 L=512 —
            # bench_results/rerank_probe_r05.txt)
            from rag_arc_tpu.ops.rope_prep import rope_prep

            q, k, v = rope_prep(
                q.reshape(b, l, nh * hd),
                k.reshape(b, l, nkv * hd),
                v.reshape(b, l, nkv * hd),
                rope_cs[0], rope_cs[1],
                qs=qn(q, scale_only=True), ks=kn(k, scale_only=True),
                eps=cfg.rms_norm_eps, nh=nh, nkv=nkv, d=hd,
            )
        else:
            # Qwen3's per-head RMS normalization of q and k
            q = qn(q)
            k = kn(k)
            q = rope(q.transpose(0, 2, 1, 3), positions, cfg.rope_theta)
            k = rope(k.transpose(0, 2, 1, 3), positions, cfg.rope_theta)
            v = v.transpose(0, 2, 1, 3)
            group = nh // nkv  # grouped-query attention: repeat kv heads
            k = jnp.repeat(k, group, axis=1)
            v = jnp.repeat(v, group, axis=1)
        if use_flash:
            # Fused attention: never materializes the (B, H, L, L) scores/
            # probs in HBM — at the reranker shape (B=64, L=512, 28 layers)
            # that round-trip is ~GBs of traffic per layer. Padding is
            # encoded as segment ids (pad=0, live=1): live queries attend
            # live keys causally, exactly the einsum path's
            # `causal & key_live` bias for every live row; PAD rows attend
            # only pads (the einsum path lets them see live keys), but no
            # consumer reads pad positions (embed/last_logits take the last
            # live token of left-padded rows).
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention)

            # chip-measured blocks (tools/flashattn_probe.py sweep, B=64
            # L=512 D=128): q512/k512/block_b=8 = 4.06 ms/layer-attention
            # vs 10.66 ms at the library's 128-defaults — the grid drops
            # from 4096 tiny programs to 128 fat ones. Blocks must divide
            # their axis (the gate guarantees l % 128 == 0), so take the
            # largest 128-multiple divisor ≤ 512.
            bq = next(c for c in (512, 384, 256, 128) if l % c == 0)
            bb = next(c for c in (8, 4, 2, 1) if b % c == 0)
            seg = mask.astype(jnp.int32)
            ctx = flash_attention(
                q, k, v,
                segment_ids=SegmentIds(q=seg, kv=seg),
                causal=True,
                sm_scale=float(1.0 / np.sqrt(hd)),
                block_sizes=BlockSizes(
                    block_q=bq, block_k_major=bq, block_k=bq, block_b=bb,
                ),
            ).astype(cfg.dtype)
        else:
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / np.sqrt(hd)
            probs = jax.nn.softmax(scores + bias, axis=-1).astype(cfg.dtype)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
        return dense(cfg.hidden_size, "o_proj")(ctx)


class Qwen3Layer(nn.Module):
    cfg: Qwen3Config

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: jax.Array | None,
        positions: jax.Array,
        mask: jax.Array,
        rope_cs: tuple[jax.Array, jax.Array] | None = None,
    ) -> jax.Array:
        cfg = self.cfg
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="input_layernorm")(x)
        x = x + Qwen3Attention(cfg, name="self_attn")(
            h, bias, positions, mask, rope_cs
        )
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="post_attention_layernorm")(x)
        # fused gate|up (same 135 -> 158 TFLOP/s merged-matmul win as qkv)
        gu = nn.Dense(
            2 * cfg.intermediate_size, use_bias=False, dtype=cfg.dtype,
            name="gateup_proj",
        )(h)
        gate = gu[..., : cfg.intermediate_size]
        up = gu[..., cfg.intermediate_size :]
        down = nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype, name="down_proj")(
            nn.silu(gate) * up
        )
        return x + down


class FlaxQwen3LM(nn.Module):
    cfg: Qwen3Config

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype
        )
        self.layers = [
            Qwen3Layer(cfg, name=f"layers_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        self.norm = RMSNorm(cfg.rms_norm_eps, cfg.dtype)
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=jnp.float32
            )

    def hidden(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        """Final-norm hidden states (B, L, H). Left-padding aware:
        positions count from the first live token (HF position_ids
        semantics for padded batches)."""
        l = ids.shape[1]
        x = self.embed_tokens(ids)
        positions = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        positions = jnp.maximum(positions, 0)
        if _flash_eligible(self.cfg, l):
            bias = None  # flash path masks via segment ids, skip (B,1,L,L)
            # rope tables are position-only: one (B, L, D) cos/sin pair
            # feeds all layers' fused prep kernels (ops/rope_prep.py)
            from rag_arc_tpu.ops.rope_prep import rope_cos_sin

            rope_cs = rope_cos_sin(
                positions, self.cfg.rope_theta, self.cfg.head_dim
            )
        else:
            rope_cs = None
            neg = jnp.asarray(-1e9, jnp.float32)
            causal = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None, :, :]
            key_live = mask[:, None, None, :]
            bias = jnp.where(causal & key_live, 0.0, neg)
        for layer in self.layers:
            x = layer(x, bias, positions, mask, rope_cs)
        return self.norm(x)

    def embed(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        """Last-live-token pooled, L2-normalized embeddings — the pooling
        Qwen3-Embedding models use. Rows must be LEFT-padded so the last
        position is the final live token."""
        hidden = self.hidden(ids, mask)
        pooled = hidden[:, -1, :].astype(jnp.float32)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )

    def last_logits(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        """Logits (B, V) at the LAST position only. The yes/no reranker
        (Reranker_Qwen3.py:41-49 semantics) reads a single position; full
        (B, L, V) logits at Qwen3's 152k vocab would be a ~20 GB f32
        activation for a 64-pair × 512-token batch — this path projects
        one (B, H) slice instead (rows must be left-padded, as the
        reranker's tokenizer guarantees)."""
        x = self.hidden(ids, mask)[:, -1, :]
        if self.cfg.tie_word_embeddings:
            return self.embed_tokens.attend(x.astype(jnp.float32))
        return self.lm_head(x)

    def __call__(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        """Returns logits (B, L, V)."""
        x = self.hidden(ids, mask)
        if self.cfg.tie_word_embeddings:
            logits = self.embed_tokens.attend(x.astype(jnp.float32))
        else:
            logits = self.lm_head(x)
        return logits


# -- torch state_dict → flax params ----------------------------------------


def _t(w) -> np.ndarray:
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def convert_torch_qwen3(state_dict: Dict[str, Any], cfg: Qwen3Config) -> Dict:
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}

    def dense(key: str) -> Dict[str, np.ndarray]:
        return {"kernel": _t(sd[f"{key}.weight"]).T}

    def norm(key: str) -> Dict[str, np.ndarray]:
        return {"weight": _t(sd[f"{key}.weight"])}

    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": _t(sd["embed_tokens.weight"])},
        "norm": norm("norm"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense("lm_head")
    def cat(*keys: str) -> Dict[str, np.ndarray]:
        # HF stores separate q/k/v (gate/up) weights; the model fuses
        # them into one projection (column-identical math, one matmul)
        return {
            "kernel": np.concatenate(
                [_t(sd[f"{k}.weight"]).T for k in keys], axis=1
            )
        }

    for i in range(cfg.num_hidden_layers):
        lyr = f"layers.{i}"
        params[f"layers_{i}"] = {
            "self_attn": {
                "qkv_proj": cat(
                    f"{lyr}.self_attn.q_proj",
                    f"{lyr}.self_attn.k_proj",
                    f"{lyr}.self_attn.v_proj",
                ),
                "o_proj": dense(f"{lyr}.self_attn.o_proj"),
                "q_norm": norm(f"{lyr}.self_attn.q_norm"),
                "k_norm": norm(f"{lyr}.self_attn.k_norm"),
            },
            "input_layernorm": norm(f"{lyr}.input_layernorm"),
            "post_attention_layernorm": norm(f"{lyr}.post_attention_layernorm"),
            "gateup_proj": cat(f"{lyr}.mlp.gate_proj", f"{lyr}.mlp.up_proj"),
            "down_proj": dense(f"{lyr}.mlp.down_proj"),
        }
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}


class Qwen3Embeddings:
    """Embeddings over a (weight-ported) Qwen3 trunk with last-token
    pooling — the reference's example embedder family (Qwen 0.6B,
    examples/graph_extract/test_hyperrag_store.py)."""

    def __init__(self, model: FlaxQwen3LM, params: Dict, tokenizer, batch_size: int = 32):
        from rag_arc_tpu.models.tokenizer import HFTokenizerAdapter

        self.model = model
        self.params = params
        self.tokenizer = (
            tokenizer
            if hasattr(tokenizer, "batch_encode")
            else HFTokenizerAdapter(tokenizer, max_len=model.cfg.max_position_embeddings)
        )
        self.batch_size = batch_size
        self.dim = model.cfg.hidden_size
        self._fwd = jax.jit(
            lambda p, ids, mask: self.model.apply(p, ids, mask, method=FlaxQwen3LM.embed)
        )

    def encode(self, texts) -> np.ndarray:
        import math

        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for start in range(0, len(texts), self.batch_size):
            chunk = [t.replace("\n", " ") for t in texts[start : start + self.batch_size]]
            ids, mask = self.tokenizer.batch_encode(chunk, left_pad=True)
            pad = (1 << math.ceil(math.log2(max(len(chunk), 1)))) - len(chunk)
            if pad:
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
            emb = self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask, bool))
            out[start : start + len(chunk)] = np.asarray(emb)[: len(chunk)]
        return out

    def embed_documents(self, texts):
        return self.encode(list(texts)).tolist()

    def embed_query(self, text):
        return self.encode([text])[0].tolist()


def load_hf_qwen3(model_name_or_path: str) -> Tuple["FlaxQwen3LM", Dict, Any]:
    """Load a local HF Qwen3 checkpoint (e.g. a Qwen3-Reranker) into the
    Flax model. Returns (model, params, hf_tokenizer)."""
    from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer

    hf = AutoConfig.from_pretrained(model_name_or_path)
    cfg = Qwen3Config(
        vocab_size=hf.vocab_size,
        hidden_size=hf.hidden_size,
        intermediate_size=hf.intermediate_size,
        num_hidden_layers=hf.num_hidden_layers,
        num_attention_heads=hf.num_attention_heads,
        num_key_value_heads=hf.num_key_value_heads,
        head_dim=getattr(hf, "head_dim", hf.hidden_size // hf.num_attention_heads),
        max_position_embeddings=hf.max_position_embeddings,
        rope_theta=hf.rope_theta,
        rms_norm_eps=hf.rms_norm_eps,
        tie_word_embeddings=hf.tie_word_embeddings,
    )
    torch_model = AutoModelForCausalLM.from_pretrained(model_name_or_path)
    params = convert_torch_qwen3(torch_model.state_dict(), cfg)
    tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
    return FlaxQwen3LM(cfg), params, tokenizer

"""Weight-compatible Flax Qwen2-VL — the DotsOCR-family layout VLM.

The reference runs its layout VLM (rednote-hilab/dots.ocr, a Qwen2-VL-style
vision-language model) under torch/CUDA+flash-attn or behind a vLLM server
(``core/file_management/parser/pdf_parser.py:62-129``). This module ports
the architecture to Flax so OCR ingestion can run TPU-native end to end:

- vision tower: Conv3D patch embed (14px patches, 2-frame temporal),
  pre-norm blocks with 2D rotary position embeddings over the (h, w) patch
  grid and full attention within an image, QuickGELU MLP, and a 2x2
  PatchMerger projecting into the text hidden size;
- text decoder: Qwen2 blocks (biased qkv, no qk-norm — the one structural
  difference from ``models/qwen3.py``) with *multimodal* rotary embeddings
  (3D t/h/w position ids, channel sections per ``mrope_section``);
- image embeddings replace the ``<|image_pad|>`` placeholder span;
- greedy KV-cache decoding under jit for generation.

Numeric parity vs torch ``Qwen2VLForConditionalGeneration`` is tested on
random-init tiny models, including greedy-decode agreement
(tests/test_qwen2vl.py) — the same playbook as the BERT/Qwen3 ports.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    hidden_size: int = 3584  # text hidden size the merger projects into
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    max_position_embeddings: int = 32768
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    mrope_section: Tuple[int, ...] = (16, 24, 24)
    tie_word_embeddings: bool = False
    image_token_id: int = 151655
    vision_start_token_id: int = 151652
    vision: Qwen2VLVisionConfig = dataclasses.field(
        default_factory=Qwen2VLVisionConfig
    )
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw) -> "Qwen2VLConfig":
        base = dict(
            vocab_size=256,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
            rope_theta=10000.0,
            mrope_section=(2, 1, 1),  # sums to head_dim//2 = 4
            image_token_id=250,
            vision_start_token_id=251,
            vision=Qwen2VLVisionConfig(
                depth=2,
                embed_dim=32,
                hidden_size=32,
                num_heads=4,
                patch_size=4,
                temporal_patch_size=2,
                spatial_merge_size=2,
                mlp_ratio=2.0,
            ),
        )
        base.update(kw)
        return cls(**base)


class RMSNorm(nn.Module):
    eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + self.eps) * scale).astype(self.dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2 :]
    return jnp.concatenate([-x2, x1], axis=-1)


# -- vision tower ------------------------------------------------------------


def vision_rotary_angles(
    grid_thw: Tuple[int, int, int], head_dim: int, merge: int, theta: float = 10000.0
) -> np.ndarray:
    """Per-patch (S, head_dim/2) rotary angles over the (h, w) grid, in the
    merge-window traversal order the image processor flattens patches with
    (modeling_qwen2_vl.py rot_pos_emb)."""
    t, h, w = grid_thw
    dim = head_dim // 2  # VisionRotaryEmbedding(head_dim // 2)
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

    def window_order(p):
        return (
            p.reshape(h // merge, merge, w // merge, merge)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )

    hpos, wpos = window_order(hpos), window_order(wpos)
    freqs_h = hpos[:, None] * inv_freq[None, :]  # (h*w, dim/2)
    freqs_w = wpos[:, None] * inv_freq[None, :]
    angles = np.concatenate([freqs_h, freqs_w], axis=-1)  # (h*w, dim)
    return np.tile(angles, (t, 1)).astype(np.float32)  # (S, head_dim/2)


class VisionBlock(nn.Module):
    cfg: Qwen2VLVisionConfig

    @nn.compact
    def __call__(self, x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
        cfg = self.cfg
        s, _ = x.shape
        nh, hd = cfg.num_heads, cfg.head_dim
        h = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * cfg.embed_dim, dtype=cfg.dtype, name="qkv")(h)
        q, k, v = [
            a.squeeze(1) for a in jnp.split(qkv.reshape(s, 3, nh, hd), 3, axis=1)
        ]  # (S, nh, hd) each
        # 2D rope in f32 (apply_rotary_pos_emb_vision)
        q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
        c, sn = cos[:, None, :], sin[:, None, :]
        q = ((q32 * c) + (_rotate_half(q32) * sn)).astype(cfg.dtype)
        k = ((k32 * c) + (_rotate_half(k32) * sn)).astype(cfg.dtype)
        scores = jnp.einsum(
            "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("hqk,khd->qhd", probs, v).reshape(s, nh * hd)
        x = x + nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="proj")(ctx)
        h = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="norm2")(x)
        mlp_dim = int(cfg.embed_dim * cfg.mlp_ratio)
        h = nn.Dense(mlp_dim, dtype=cfg.dtype, name="fc1")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
        return x + nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="fc2")(h)


class VisionTower(nn.Module):
    cfg: Qwen2VLVisionConfig

    @nn.compact
    def __call__(self, patches: jax.Array, angles: jax.Array) -> jax.Array:
        """``patches (S, C·T·P·P)`` in processor order; ``angles
        (S, head_dim/2)`` from :func:`vision_rotary_angles`. Full attention
        over the (single-image) sequence. Returns merged embeddings
        (S / merge², text_hidden)."""
        cfg = self.cfg
        # Conv3D with stride == kernel over pre-extracted patches is a
        # single matmul on the flattened patch
        x = nn.Dense(
            cfg.embed_dim, use_bias=False, dtype=cfg.dtype, name="patch_embed"
        )(patches)
        emb = jnp.concatenate([angles, angles], axis=-1)  # (S, head_dim)
        cos, sin = jnp.cos(emb), jnp.sin(emb)
        for i in range(cfg.depth):
            x = VisionBlock(cfg, name=f"blocks_{i}")(x, cos, sin)
        merge_sq = cfg.spatial_merge_size**2
        x = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="ln_q")(x)
        x = x.reshape(-1, cfg.embed_dim * merge_sq)
        x = nn.Dense(cfg.embed_dim * merge_sq, dtype=cfg.dtype, name="mlp_0")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="mlp_2")(x)


# -- text decoder with mrope ---------------------------------------------------


def mrope_cos_sin(
    position_ids: jax.Array,  # (3, B, L) int32 — t/h/w position ids
    head_dim: int,
    mrope_section: Tuple[int, ...],
    theta: float,
) -> Tuple[jax.Array, jax.Array]:
    """Multimodal rotary cos/sin (B, L, head_dim): per-section channels take
    their angles from the t/h/w position id streams
    (apply_multimodal_rotary_pos_emb)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = (
        position_ids[:, :, :, None].astype(jnp.float32) * inv_freq[None, None, None, :]
    )  # (3, B, L, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (3, B, L, hd)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    sections = list(mrope_section) * 2
    starts = np.cumsum([0] + sections[:-1])
    cos_parts = [
        jax.lax.dynamic_slice_in_dim(cos[i % 3], int(s), sec, axis=-1)
        for i, (s, sec) in enumerate(zip(starts, sections))
    ]
    sin_parts = [
        jax.lax.dynamic_slice_in_dim(sin[i % 3], int(s), sec, axis=-1)
        for i, (s, sec) in enumerate(zip(starts, sections))
    ]
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


class Qwen2VLAttention(nn.Module):
    cfg: Qwen2VLConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: jax.Array,
        cos: jax.Array,
        sin: jax.Array,
        cache: Optional[Tuple[jax.Array, jax.Array]] = None,
        cache_index: Optional[jax.Array] = None,
    ):
        cfg = self.cfg
        b, l, _ = x.shape
        hd = cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        q = nn.Dense(nh * hd, use_bias=True, dtype=cfg.dtype, name="q_proj")(x)
        k = nn.Dense(nkv * hd, use_bias=True, dtype=cfg.dtype, name="k_proj")(x)
        v = nn.Dense(nkv * hd, use_bias=True, dtype=cfg.dtype, name="v_proj")(x)
        q = q.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, nkv, hd).transpose(0, 2, 1, 3)
        c, sn = cos[:, None, :, :], sin[:, None, :, :]
        q = (q * c) + (_rotate_half(q) * sn)
        k = (k * c) + (_rotate_half(k) * sn)
        new_cache = None
        if cache is not None:
            ck, cv = cache  # (B, nkv, MAX, hd)
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, cache_index, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, cache_index, 0))
            k, v = ck, cv
            new_cache = (ck, cv)
        group = nh // nkv
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        probs = jax.nn.softmax(scores + bias, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
        out = nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype, name="o_proj")(ctx)
        return out, new_cache


class Qwen2VLLayer(nn.Module):
    cfg: Qwen2VLConfig

    @nn.compact
    def __call__(self, x, bias, cos, sin, cache=None, cache_index=None):
        cfg = self.cfg
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="input_layernorm")(x)
        attn, new_cache = Qwen2VLAttention(cfg, name="self_attn")(
            h, bias, cos, sin, cache, cache_index
        )
        x = x + attn
        h = RMSNorm(cfg.rms_norm_eps, cfg.dtype, name="post_attention_layernorm")(x)
        gate = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=cfg.dtype, name="gate_proj")(h)
        up = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=cfg.dtype, name="up_proj")(h)
        down = nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype, name="down_proj")(
            nn.silu(gate) * up
        )
        return x + down, new_cache


class FlaxQwen2VL(nn.Module):
    cfg: Qwen2VLConfig

    def setup(self):
        cfg = self.cfg
        self.visual = VisionTower(cfg.vision, name="visual")
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype)
        self.layers = [
            Qwen2VLLayer(cfg, name=f"layers_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        self.norm = RMSNorm(cfg.rms_norm_eps, cfg.dtype)
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False, dtype=jnp.float32)

    def encode_image(self, patches: jax.Array, angles: jax.Array) -> jax.Array:
        return self.visual(patches, angles)

    def _logits(self, x: jax.Array) -> jax.Array:
        if self.cfg.tie_word_embeddings:
            return self.embed_tokens.attend(x.astype(jnp.float32))
        return self.lm_head(x)

    def _run(self, x, bias, position_ids, caches=None, cache_index=None):
        cfg = self.cfg
        cos, sin = mrope_cos_sin(
            position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta
        )
        cos, sin = cos.astype(cfg.dtype), sin.astype(cfg.dtype)
        new_caches = []
        for i, layer in enumerate(self.layers):
            x, new_cache = layer(
                x, bias, cos, sin,
                None if caches is None else caches[i],
                cache_index,
            )
            new_caches.append(new_cache)
        return self.norm(x), new_caches

    def __call__(
        self,
        input_ids: jax.Array,       # (B, L)
        image_embeds: jax.Array,    # (N_img_tokens, H) merged vision embeds
        position_ids: jax.Array,    # (3, B, L)
        image_start: jax.Array,     # () — index of the first image token
    ) -> jax.Array:
        """Prefill logits (B, L, V): image embeddings replace the
        contiguous ``<|image_pad|>`` span starting at ``image_start``."""
        x = self.embed_tokens(input_ids)
        patch = image_embeds[None].astype(x.dtype)
        x = jax.lax.dynamic_update_slice(x, patch, (0, image_start, 0))
        l = input_ids.shape[1]
        neg = jnp.asarray(-1e9, jnp.float32)
        bias = jnp.where(jnp.tril(jnp.ones((l, l), bool))[None, None], 0.0, neg)
        x, _ = self._run(x, bias, position_ids)
        return self._logits(x)

    def prefill_with_cache(
        self, input_ids, image_embeds, position_ids, image_start, max_len: int
    ):
        """Prefill returning (last_logits (B, V), caches) with KV buffers
        padded to ``max_len`` for the decode loop."""
        cfg = self.cfg
        b, l = input_ids.shape
        x = self.embed_tokens(input_ids)
        patch = image_embeds[None].astype(x.dtype)
        x = jax.lax.dynamic_update_slice(x, patch, (0, image_start, 0))
        neg = jnp.asarray(-1e9, jnp.float32)
        causal = jnp.tril(jnp.ones((l, l), bool))
        # full-width bias against the padded cache: causal over the first
        # l slots, everything past them masked
        bias_full = jnp.full((1, 1, l, max_len), neg)
        bias_full = jax.lax.dynamic_update_slice(
            bias_full, jnp.where(causal, 0.0, neg)[None, None], (0, 0, 0, 0)
        )
        nkv, hd = cfg.num_key_value_heads, cfg.head_dim
        caches = [
            (
                jnp.zeros((b, nkv, max_len, hd), cfg.dtype),
                jnp.zeros((b, nkv, max_len, hd), cfg.dtype),
            )
            for _ in range(cfg.num_hidden_layers)
        ]
        x, caches = self._run(
            x, bias_full, position_ids, caches, jnp.int32(0)
        )
        return self._logits(x[:, -1, :]), caches

    def decode_step(
        self,
        token: jax.Array,        # (B, 1)
        position_id: jax.Array,  # (3, B, 1)
        caches,
        cache_index: jax.Array,  # () — number of tokens already cached
    ):
        """One greedy-decode step: returns (logits (B, V), new caches)."""
        x = self.embed_tokens(token)
        max_len = caches[0][0].shape[2]
        neg = jnp.asarray(-1e9, jnp.float32)
        live = jnp.arange(max_len) <= cache_index
        bias = jnp.where(live[None, None, None, :], 0.0, neg)
        x, caches = self._run(x, bias, position_id, caches, cache_index)
        return self._logits(x[:, -1, :]), caches


# -- host-side helpers ---------------------------------------------------------


def rope_index_single_image(
    input_ids: np.ndarray,  # (L,) one unpadded sequence
    grid_thw: Tuple[int, int, int],
    cfg: Qwen2VLConfig,
) -> np.ndarray:
    """3D position ids (3, L) for one sequence containing one image span
    (Qwen2VLModel.get_rope_index semantics, single-image case): text runs
    count all three dims together; the image span gets t/h/w grid ids
    offset past the preceding text; text after resumes at max+1."""
    merge = cfg.vision.spatial_merge_size
    t, h, w = grid_thw
    gh, gw = h // merge, w // merge
    span = t * gh * gw
    img_positions = np.nonzero(input_ids == cfg.image_token_id)[0]
    if img_positions.size == 0:
        pos = np.arange(len(input_ids))
        return np.broadcast_to(pos, (3, len(input_ids))).copy()
    st = int(img_positions[0])
    if img_positions.size != span:
        raise ValueError(
            f"image token span {img_positions.size} != grid size {span}"
        )
    out = np.zeros((3, len(input_ids)), dtype=np.int64)
    out[:, :st] = np.arange(st)
    tpos = np.repeat(np.arange(t), gh * gw)
    hpos = np.tile(np.repeat(np.arange(gh), gw), t)
    wpos = np.tile(np.arange(gw), t * gh)
    out[0, st : st + span] = st + tpos
    out[1, st : st + span] = st + hpos
    out[2, st : st + span] = st + wpos
    tail_start = out[:, : st + span].max() + 1
    n_tail = len(input_ids) - (st + span)
    out[:, st + span :] = tail_start + np.arange(n_tail)
    return out


def next_rope_position(position_ids: np.ndarray) -> int:
    """Position id for the next generated token (all 3 dims equal)."""
    return int(position_ids.max()) + 1


# -- torch state_dict → flax params ---------------------------------------------


def _t(w) -> np.ndarray:
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def convert_torch_qwen2vl(state_dict: Dict[str, Any], cfg: Qwen2VLConfig) -> Dict:
    sd = dict(state_dict)
    # modern HF checkpoints prefix with model.language_model / model.visual
    renames = {
        "model.language_model.": "",
        "model.visual.": "visual.",
        "language_model.": "",
        "model.": "",
        "visual.": "visual.",
    }
    out_sd: Dict[str, Any] = {}
    for key, val in sd.items():
        new = key
        for pre, to in renames.items():
            if new.startswith(pre):
                new = to + new[len(pre):]
                break
        out_sd[new] = val
    sd = out_sd

    def dense(key: str, bias: bool = False) -> Dict[str, np.ndarray]:
        p = {"kernel": _t(sd[f"{key}.weight"]).T}
        if bias:
            p["bias"] = _t(sd[f"{key}.bias"])
        return p

    def norm(key: str) -> Dict[str, np.ndarray]:
        return {"weight": _t(sd[f"{key}.weight"])}

    def lnorm(key: str) -> Dict[str, np.ndarray]:
        return {"scale": _t(sd[f"{key}.weight"]), "bias": _t(sd[f"{key}.bias"])}

    vcfg = cfg.vision
    visual: Dict[str, Any] = {
        # Conv3D (E, C, T, P, P) → flattened-patch matmul kernel
        "patch_embed": {
            "kernel": _t(sd["visual.patch_embed.proj.weight"])
            .reshape(vcfg.embed_dim, -1)
            .T
        },
        "ln_q": lnorm("visual.merger.ln_q"),
        "mlp_0": dense("visual.merger.mlp.0", bias=True),
        "mlp_2": dense("visual.merger.mlp.2", bias=True),
    }
    for i in range(vcfg.depth):
        blk = f"visual.blocks.{i}"
        visual[f"blocks_{i}"] = {
            "norm1": lnorm(f"{blk}.norm1"),
            "norm2": lnorm(f"{blk}.norm2"),
            "qkv": dense(f"{blk}.attn.qkv", bias=True),
            "proj": dense(f"{blk}.attn.proj", bias=True),
            "fc1": dense(f"{blk}.mlp.fc1", bias=True),
            "fc2": dense(f"{blk}.mlp.fc2", bias=True),
        }

    params: Dict[str, Any] = {
        "visual": visual,
        "embed_tokens": {"embedding": _t(sd["embed_tokens.weight"])},
        "norm": norm("norm"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense("lm_head")
    for i in range(cfg.num_hidden_layers):
        lyr = f"layers.{i}"
        params[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": dense(f"{lyr}.self_attn.q_proj", bias=True),
                "k_proj": dense(f"{lyr}.self_attn.k_proj", bias=True),
                "v_proj": dense(f"{lyr}.self_attn.v_proj", bias=True),
                "o_proj": dense(f"{lyr}.self_attn.o_proj"),
            },
            "input_layernorm": norm(f"{lyr}.input_layernorm"),
            "post_attention_layernorm": norm(f"{lyr}.post_attention_layernorm"),
            "gate_proj": dense(f"{lyr}.mlp.gate_proj"),
            "up_proj": dense(f"{lyr}.mlp.up_proj"),
            "down_proj": dense(f"{lyr}.mlp.down_proj"),
        }
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}


def config_from_hf(hf_cfg) -> Qwen2VLConfig:
    v = hf_cfg.vision_config
    return Qwen2VLConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        num_key_value_heads=hf_cfg.num_key_value_heads,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        rope_theta=hf_cfg.rope_theta,
        rms_norm_eps=hf_cfg.rms_norm_eps,
        mrope_section=tuple(hf_cfg.rope_scaling["mrope_section"]),
        tie_word_embeddings=hf_cfg.tie_word_embeddings,
        image_token_id=hf_cfg.image_token_id,
        vision_start_token_id=hf_cfg.vision_start_token_id,
        vision=Qwen2VLVisionConfig(
            depth=v.depth,
            embed_dim=v.embed_dim,
            hidden_size=hf_cfg.hidden_size,
            num_heads=v.num_heads,
            in_channels=v.in_channels,
            patch_size=v.patch_size,
            temporal_patch_size=v.temporal_patch_size,
            spatial_merge_size=v.spatial_merge_size,
            mlp_ratio=v.mlp_ratio,
        ),
    )


def load_hf_qwen2vl(model_name_or_path: str) -> Tuple["FlaxQwen2VL", Dict, Any, Any]:
    """Load a local HF Qwen2-VL-family checkpoint. Returns
    (model, params, hf_tokenizer, hf_image_processor)."""
    from transformers import (
        AutoConfig,
        AutoProcessor,
        Qwen2VLForConditionalGeneration,
    )

    hf_cfg = AutoConfig.from_pretrained(model_name_or_path)
    cfg = config_from_hf(hf_cfg)
    torch_model = Qwen2VLForConditionalGeneration.from_pretrained(model_name_or_path)
    params = convert_torch_qwen2vl(torch_model.state_dict(), cfg)
    try:
        processor = AutoProcessor.from_pretrained(model_name_or_path)
        tokenizer = processor.tokenizer
        image_processor = processor.image_processor
    except Exception:
        # AutoProcessor can require optional deps the checkpoint never
        # uses (e.g. the video processor needs torchvision); fall back
        # to loading the two pieces the OCR path actually needs
        from transformers import AutoImageProcessor, AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        image_processor = AutoImageProcessor.from_pretrained(model_name_or_path)
    return FlaxQwen2VL(cfg), params, tokenizer, image_processor


# -- greedy generation ------------------------------------------------------------


class Qwen2VLGenerator:
    """Greedy KV-cache decoding for one image + prompt (the OCR page
    workload). Prefill and per-token step are jitted; the loop is host-side
    python over device state (no host transfers inside the loop except the
    1-int argmax fetch used for the stop check)."""

    def __init__(self, model: FlaxQwen2VL, params: Dict, max_len: int = 2048):
        """``max_len`` caps the KV cache; the actual cache for a call is
        sized to the prompt + budget (rounded to 256 so repeat calls reuse
        compilations)."""
        self.model = model
        self.params = params
        self.cfg = model.cfg
        self.max_len = max_len
        self._encode = jax.jit(
            lambda p, patches, angles: model.apply(
                p, patches, angles, method=FlaxQwen2VL.encode_image
            )
        )
        self._prefill = jax.jit(
            lambda p, ids, img, pos, start, ml: model.apply(
                p, ids, img, pos, start, ml,
                method=FlaxQwen2VL.prefill_with_cache,
            ),
            static_argnums=(5,),
        )
        self._step = jax.jit(
            lambda p, tok, pos, caches, idx: model.apply(
                p, tok, pos, caches, idx, method=FlaxQwen2VL.decode_step
            )
        )

    def generate(
        self,
        input_ids: np.ndarray,          # (L,) prompt with image-pad span
        patches: np.ndarray,            # (S, C·T·P·P)
        grid_thw: Tuple[int, int, int],
        max_new_tokens: int = 256,
        eos_token_id: Optional[int] = None,
    ) -> List[int]:
        cfg = self.cfg
        angles = vision_rotary_angles(
            grid_thw, cfg.vision.head_dim, cfg.vision.spatial_merge_size
        )
        image_embeds = self._encode(
            self.params, jnp.asarray(patches), jnp.asarray(angles)
        )
        pos = rope_index_single_image(input_ids, grid_thw, cfg)
        img_idx = np.nonzero(input_ids == cfg.image_token_id)[0]
        start = int(img_idx[0]) if img_idx.size else 0
        # cache sized to this call, bucketed for compile reuse
        need = len(input_ids) + max_new_tokens
        cache_len = min(-(-need // 256) * 256, max(self.max_len, 256))
        if len(input_ids) >= cache_len:
            raise ValueError(
                f"prompt of {len(input_ids)} tokens exceeds the cache cap "
                f"{cache_len} (raise max_len)"
            )
        logits, caches = self._prefill(
            self.params,
            jnp.asarray(input_ids[None]),
            image_embeds,
            jnp.asarray(pos[:, None, :]),
            jnp.int32(start),
            cache_len,
        )
        next_pos = next_rope_position(pos)
        cache_index = len(input_ids)
        out: List[int] = []
        token = int(np.asarray(jnp.argmax(logits, axis=-1))[0])
        for _ in range(max_new_tokens):
            if eos_token_id is not None and token == eos_token_id:
                break
            out.append(token)
            if cache_index >= cache_len:
                break
            pos3 = jnp.full((3, 1, 1), next_pos, dtype=jnp.int32)
            logits, caches = self._step(
                self.params,
                jnp.asarray([[token]], dtype=jnp.int32),
                pos3,
                caches,
                jnp.int32(cache_index),
            )
            token = int(np.asarray(jnp.argmax(logits, axis=-1))[0])
            next_pos += 1
            cache_index += 1
        return out

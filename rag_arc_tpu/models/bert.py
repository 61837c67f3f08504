"""Weight-compatible Flax BERT encoder.

The reference consumes pretrained torch checkpoints through
sentence-transformers (``huggingface.py``). For checkpoint compatibility —
users bringing an existing BERT-family embedder to TPU — this module
implements the exact HF ``BertModel`` computation (post-LN residuals,
token-type embeddings, eps=1e-12, tanh pooler) in Flax, plus a converter
from a torch ``state_dict``. Numeric parity with torch is tested to ~1e-4
on random-initialized models (no network needed).

For training-from-scratch the leaner pre-LN ``rag_arc_tpu.models.encoder``
trunk is preferred; this class exists to load real weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw) -> "BertConfig":
        base = dict(
            vocab_size=128,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=64,
            max_position_embeddings=64,
        )
        base.update(kw)
        return cls(**base)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jax.Array, attn_bias: jax.Array) -> jax.Array:
        cfg = self.cfg
        q = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="q")(x)
        k = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="k")(x)
        v = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="v")(x)
        b, l, _ = x.shape
        shape = (b, l, cfg.num_attention_heads, cfg.head_dim)
        q = q.reshape(shape).transpose(0, 2, 1, 3)
        k = k.reshape(shape).transpose(0, 2, 1, 3)
        v = v.reshape(shape).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(cfg.head_dim)
        probs = jax.nn.softmax(scores + attn_bias, axis=-1).astype(cfg.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, cfg.hidden_size)
        attn_out = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln_attn")(
            x + attn_out
        )
        inter = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="intermediate")(x)
        inter = nn.gelu(inter, approximate=False)  # HF uses exact gelu
        out = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output")(inter)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln_out")(
            x + out
        )


class FlaxBertModel(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        ids: jax.Array,
        mask: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (last_hidden_state (B, L, H), pooled (B, H))."""
        cfg = self.cfg
        b, l = ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(ids)
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype, name="tok")(ids)
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=cfg.dtype, name="pos"
        )(jnp.arange(l)[None, :])
        typ = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, dtype=cfg.dtype, name="typ"
        )(token_type_ids)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ln_embed"
        )(tok + pos + typ)
        bias = jnp.where(mask[:, None, None, :], 0.0, -1e9)
        for i in range(cfg.num_hidden_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(x, bias)
        pooled = nn.tanh(
            nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="pooler")(x[:, 0])
        )
        return x, pooled

    def mean_pooled(self, params: Dict, ids: jax.Array, mask: jax.Array) -> jax.Array:
        """Sentence-transformers-style masked mean pooling + L2 norm."""
        hidden, _ = self.apply(params, ids, mask)
        m = mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )


# -- torch state_dict → flax params ----------------------------------------


def _t(w) -> np.ndarray:
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def convert_torch_bert(state_dict: Dict[str, Any], cfg: BertConfig) -> Dict:
    """Map an HF ``BertModel`` state_dict onto FlaxBertModel params.

    Accepts keys with or without the leading ``bert.`` prefix.
    """
    sd = {k.removeprefix("bert."): v for k, v in state_dict.items()}

    def dense(prefix: str) -> Dict[str, np.ndarray]:
        return {
            "kernel": _t(sd[f"{prefix}.weight"]).T,  # torch (out,in) → (in,out)
            "bias": _t(sd[f"{prefix}.bias"]),
        }

    def ln(prefix: str) -> Dict[str, np.ndarray]:
        return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}

    params: Dict[str, Any] = {
        "tok": {"embedding": _t(sd["embeddings.word_embeddings.weight"])},
        "pos": {"embedding": _t(sd["embeddings.position_embeddings.weight"])},
        "typ": {"embedding": _t(sd["embeddings.token_type_embeddings.weight"])},
        "ln_embed": ln("embeddings.LayerNorm"),
        "pooler": dense("pooler.dense"),
    }
    for i in range(cfg.num_hidden_layers):
        enc = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "q": dense(f"{enc}.attention.self.query"),
            "k": dense(f"{enc}.attention.self.key"),
            "v": dense(f"{enc}.attention.self.value"),
            "attn_out": dense(f"{enc}.attention.output.dense"),
            "ln_attn": ln(f"{enc}.attention.output.LayerNorm"),
            "intermediate": dense(f"{enc}.intermediate.dense"),
            "output": dense(f"{enc}.output.dense"),
            "ln_out": ln(f"{enc}.output.LayerNorm"),
        }
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}


def load_hf_bert(model_name_or_path: str) -> Tuple["FlaxBertModel", Dict, Any]:
    """Load a local HF BERT checkpoint into the Flax model. Returns
    (model, params, hf_tokenizer)."""
    from transformers import AutoConfig, AutoModel, AutoTokenizer

    hf_cfg = AutoConfig.from_pretrained(model_name_or_path)
    cfg = BertConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        type_vocab_size=hf_cfg.type_vocab_size,
    )
    torch_model = AutoModel.from_pretrained(model_name_or_path)
    params = convert_torch_bert(torch_model.state_dict(), cfg)
    tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
    return FlaxBertModel(cfg), params, tokenizer


class BertEmbeddings:
    """Embeddings implementation over a weight-ported BERT (mean pooling,
    L2 norm — sentence-transformers semantics) with jitted batched forward."""

    def __init__(self, model: FlaxBertModel, params: Dict, tokenizer, batch_size: int = 32):
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
            lambda p, ids, mask: self.model.mean_pooled(p, ids, mask)
        )

    def encode(self, texts) -> np.ndarray:
        import math

        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for start in range(0, len(texts), self.batch_size):
            chunk = [t.replace("\n", " ") for t in texts[start : start + self.batch_size]]
            ids, mask = self.tokenizer.batch_encode(chunk)
            pad = (1 << math.ceil(math.log2(max(len(chunk), 1)))) - len(chunk)
            if pad:
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
            emb = self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask))
            out[start : start + len(chunk)] = np.asarray(emb)[: len(chunk)]
        return out

    def embed_documents(self, texts):
        return self.encode(list(texts)).tolist()

    def embed_query(self, text):
        return self.encode([text])[0].tolist()

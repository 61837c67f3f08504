"""JAX-native text embeddings.

Replaces the reference's ``HuggingFaceEmbeddings``
(``core/file_management/embeddings/huggingface.py:9``, a torch/CUDA
sentence-transformers wrapper) with a Flax ``TextEncoder`` forward pass:
batched, jitted, length-bucketed (so serving traffic hits a handful of
compiled shapes), and optionally pjit-sharded over a mesh (data-parallel
batch axis). Newlines are stripped before encoding, matching the
reference's behavior (``huggingface.py:116``).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag_arc_tpu.models.embeddings import Embeddings
from rag_arc_tpu.models.encoder import TextEncoder, TransformerConfig, init_encoder
from rag_arc_tpu.models.tokenizer import HashTokenizer

LENGTH_BUCKETS = (16, 32, 64, 128, 256, 512)


class FlaxEncoderEmbeddings(Embeddings):
    def __init__(
        self,
        cfg: Optional[TransformerConfig] = None,
        params: Optional[Dict] = None,
        tokenizer=None,
        batch_size: int = 64,
        mesh: Optional[Mesh] = None,
        seed: int = 0,
    ):
        self.cfg = cfg or TransformerConfig()
        self.model = TextEncoder(self.cfg)
        if params is None:
            _, params = init_encoder(self.cfg, seed=seed)
        self.params = params
        self.tokenizer = tokenizer or HashTokenizer(
            vocab_size=self.cfg.vocab_size, max_len=self.cfg.max_len
        )
        self.batch_size = batch_size
        self.mesh = mesh
        self.dim = self.cfg.dim
        if mesh is not None:
            batch_sharding = NamedSharding(mesh, P("data", None))
            self._forward = jax.jit(
                self.model.apply, in_shardings=(None, batch_sharding, batch_sharding)
            )
        else:
            self._forward = jax.jit(self.model.apply)

    def _bucket_len(self, n: int) -> int:
        for b in LENGTH_BUCKETS:
            if b >= n and b <= self.cfg.max_len:
                return b
        return self.cfg.max_len

    def encode(self, texts: List[str]) -> np.ndarray:
        if not texts:
            return np.empty((0, self.dim), dtype=np.float32)
        cleaned = [t.replace("\n", " ") for t in texts]
        out = np.empty((len(cleaned), self.dim), dtype=np.float32)
        bs = self.batch_size
        for start in range(0, len(cleaned), bs):
            chunk = cleaned[start : start + bs]
            # tokenize once; right-pad the encoded batch to its bucket
            ids2, mask2 = self.tokenizer.batch_encode(chunk)
            length = self._bucket_len(ids2.shape[1])
            if length > ids2.shape[1]:
                pad = length - ids2.shape[1]
                ids2 = np.pad(ids2, ((0, 0), (0, pad)))
                mask2 = np.pad(mask2, ((0, 0), (0, pad)))
            elif length < ids2.shape[1]:
                ids2, mask2 = ids2[:, :length], mask2[:, :length]
            b_pad = 1 << math.ceil(math.log2(max(len(chunk), 1)))
            if b_pad > len(chunk):
                ids2 = np.pad(ids2, ((0, b_pad - len(chunk)), (0, 0)))
                mask2 = np.pad(mask2, ((0, b_pad - len(chunk)), (0, 0)))
            emb = self._forward(self.params, jnp.asarray(ids2), jnp.asarray(mask2))
            out[start : start + len(chunk)] = np.asarray(jax.device_get(emb))[
                : len(chunk)
            ]
        return out

    def embed_documents(self, texts: List[str]) -> List[List[float]]:
        return self.encode(texts).tolist()

    def encode_device(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        """Device-to-device path: embeddings stay on device (the serving
        hot path chains this straight into index search — only ids/scores
        ever cross the host boundary)."""
        return self._forward(self.params, ids, mask)

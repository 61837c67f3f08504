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
from rag_arc_tpu.models.encoder import (
    PackedTextEncoder,
    TextEncoder,
    TransformerConfig,
    init_encoder,
)
from rag_arc_tpu.models.packing import pack_token_lists
from rag_arc_tpu.models.tokenizer import HashTokenizer

LENGTH_BUCKETS = (16, 32, 64, 128, 256, 512)

# packed serving path: docs at or under this token count share MXU-sized
# rows (PackedTextEncoder). 64 = half a row — anything shorter wastes
# >50% of its padded row AND runs tiny attention matmuls on the MXU
PACK_MAX_TOKENS = 64
PACK_ROW_LEN = 128
# encode() dispatches chunks ahead of their fetch to amortize the
# host<->device round trip over a window; the cap bounds live output
# buffers (~12 MB/chunk) so bulk million-doc ingests can't OOM the chip
MAX_INFLIGHT_CHUNKS = 16
PACK_MAX_SEGMENTS = 8


class FlaxEncoderEmbeddings(Embeddings):
    def __init__(
        self,
        cfg: Optional[TransformerConfig] = None,
        params: Optional[Dict] = None,
        tokenizer=None,
        batch_size: int = 64,
        mesh: Optional[Mesh] = None,
        seed: int = 0,
        pack_short: bool = True,
    ):
        self.cfg = cfg or TransformerConfig()
        self.model = TextEncoder(self.cfg)
        # reproducible iff a fresh instance re-derives identical vectors:
        # default-seeded params + default (hash) tokenizer
        self._reproducible = params is None and tokenizer is None
        self._seed = seed
        if params is None:
            _, params = init_encoder(self.cfg, seed=seed)
        self.params = params
        self.tokenizer = tokenizer or HashTokenizer(
            vocab_size=self.cfg.vocab_size, max_len=self.cfg.max_len
        )
        self.batch_size = batch_size
        self.mesh = mesh
        self.dim = self.cfg.dim
        self.pack_short = bool(pack_short)
        self.packed_model = PackedTextEncoder(
            self.cfg, max_segments=PACK_MAX_SEGMENTS
        )
        if mesh is not None:
            batch_sharding = NamedSharding(mesh, P("data", None))
            self._forward = jax.jit(
                self.model.apply, in_shardings=(None, batch_sharding, batch_sharding)
            )
            self._packed_forward = jax.jit(
                self.packed_model.apply,
                in_shardings=(
                    None, batch_sharding, batch_sharding, batch_sharding,
                ),
            )
        else:
            self._forward = jax.jit(self.model.apply)
            self._packed_forward = jax.jit(self.packed_model.apply)

    def describe(self) -> dict:
        c = self.cfg
        return {
            "kind": "flax",
            "dim": self.dim,
            "seed": self._seed,
            "reproducible": self._reproducible,
            # full architecture: a rebuild from dim alone would silently
            # mismatch a custom-depth/heads encoder
            "cfg": {
                "vocab_size": c.vocab_size,
                "dim": c.dim,
                "depth": c.depth,
                "heads": c.heads,
                "mlp_ratio": c.mlp_ratio,
                "max_len": c.max_len,
                "causal": c.causal,
            },
        }

    def _bucket_len(self, n: int) -> int:
        for b in LENGTH_BUCKETS:
            if b >= n and b <= self.cfg.max_len:
                return b
        return self.cfg.max_len

    def _token_lists(self, texts: List[str]) -> List[List[int]]:
        if hasattr(self.tokenizer, "encode"):
            return [self.tokenizer.encode(t) for t in texts]
        ids, mask = self.tokenizer.batch_encode(texts)
        return [ids[i, mask[i]].tolist() for i in range(len(texts))]

    def encode(self, texts: List[str]) -> np.ndarray:
        if not texts:
            return np.empty((0, self.dim), dtype=np.float32)
        cleaned = [t.replace("\n", " ") for t in texts]
        out = np.empty((len(cleaned), self.dim), dtype=np.float32)
        token_lists = self._token_lists(cleaned)
        if self.pack_short:
            short = [
                i for i, tl in enumerate(token_lists)
                if len(tl) <= PACK_MAX_TOKENS
            ]
        else:
            short = []
        long = (
            [i for i in range(len(cleaned)) if len(token_lists[i]) > PACK_MAX_TOKENS]
            if self.pack_short
            else list(range(len(cleaned)))
        )
        if short:
            out[short] = self._encode_packed([token_lists[i] for i in short])
        if long:
            out[long] = self._encode_bucketed([token_lists[i] for i in long])
        return out

    def _encode_packed(self, token_lists: List[List[int]]) -> np.ndarray:
        """Short docs: pack several to an MXU-sized row (block-diagonal
        attention, segment pooling). One fetch for the whole stream."""
        ids, pos, seg, mapping = pack_token_lists(
            token_lists, row_len=PACK_ROW_LEN, max_segments=PACK_MAX_SEGMENTS
        )
        n_rows = ids.shape[0]
        rows_per = max(self.batch_size, 65536 // PACK_ROW_LEN)
        outs: list = []
        host_rows: list = []

        def drain() -> None:
            # one fetch per window: amortizes the host<->device round trip
            # while BOUNDING live device output buffers — an unbounded
            # deferred fetch holds every chunk's output in HBM at once and
            # OOMs million-doc ingests
            fetched = jax.device_get([o for o, _ in outs])
            host_rows.extend(
                np.asarray(f)[:r] for f, (_, r) in zip(fetched, outs)
            )
            outs.clear()

        for start in range(0, n_rows, rows_per):
            cids = ids[start : start + rows_per]
            cpos = pos[start : start + rows_per]
            cseg = seg[start : start + rows_per]
            r = cids.shape[0]
            r_pad = 1 << math.ceil(math.log2(max(r, 1)))
            if r_pad > r:
                cids = np.pad(cids, ((0, r_pad - r), (0, 0)))
                cpos = np.pad(cpos, ((0, r_pad - r), (0, 0)))
                cseg = np.pad(
                    cseg, ((0, r_pad - r), (0, 0)), constant_values=-1
                )
            outs.append(
                (
                    self._packed_forward(
                        self.params,
                        jnp.asarray(cids),
                        jnp.asarray(cpos),
                        jnp.asarray(cseg),
                    ),
                    r,
                )
            )
            if len(outs) >= MAX_INFLIGHT_CHUNKS:
                drain()
        drain()
        all_rows = np.concatenate(host_rows, axis=0)
        out = np.empty((len(token_lists), self.dim), dtype=np.float32)
        for i, (r, s) in enumerate(mapping):
            out[i] = all_rows[r, s]
        return out

    def _encode_bucketed(self, token_lists: List[List[int]]) -> np.ndarray:
        """Long docs: one doc per row, padded to a length bucket."""
        out = np.empty((len(token_lists), self.dim), dtype=np.float32)
        bs = self.batch_size
        outs: list = []

        def drain() -> None:
            # windowed fetch: RTT amortized, device memory bounded
            fetched = jax.device_get([e for _, _, e in outs])
            for (start, n, _), f in zip(outs, fetched):
                out[start : start + n] = np.asarray(f)[:n]
            outs.clear()

        for start in range(0, len(token_lists), bs):
            chunk = token_lists[start : start + bs]
            longest = max(len(tl) for tl in chunk)
            length = self._bucket_len(longest)
            ids2 = np.zeros((len(chunk), length), dtype=np.int32)
            mask2 = np.zeros((len(chunk), length), dtype=bool)
            for i, tl in enumerate(chunk):
                tl = tl[:length]
                ids2[i, : len(tl)] = tl
                mask2[i, : len(tl)] = True
            b_pad = 1 << math.ceil(math.log2(max(len(chunk), 1)))
            if b_pad > len(chunk):
                ids2 = np.pad(ids2, ((0, b_pad - len(chunk)), (0, 0)))
                mask2 = np.pad(mask2, ((0, b_pad - len(chunk)), (0, 0)))
            emb = self._forward(self.params, jnp.asarray(ids2), jnp.asarray(mask2))
            outs.append((start, len(chunk), emb))
            if len(outs) >= MAX_INFLIGHT_CHUNKS:
                drain()
        drain()
        return out

    def embed_documents(self, texts: List[str]) -> List[List[float]]:
        return self.encode(texts).tolist()

    def encode_device(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        """Device-to-device path: embeddings stay on device (the serving
        hot path chains this straight into index search — only ids/scores
        ever cross the host boundary)."""
        return self._forward(self.params, ids, mask)

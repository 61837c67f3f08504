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
        # batch paddings must divide the data axis: in_shardings of
        # P("data", ...) reject a batch dim not divisible by the axis size
        self._data_ax = int(mesh.shape["data"]) if mesh is not None else 1
        self.dim = self.cfg.dim
        self.pack_short = bool(pack_short)
        # packed routing must respect the position table: a doc of
        # PACK_MAX_TOKENS tokens gets per-segment positions up to that
        # count, which nn.Embed would silently CLAMP past cfg.max_len
        self._pack_max = min(PACK_MAX_TOKENS, self.cfg.max_len)
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
                # dtypes change the VECTORS (bf16 vs f32 activations drift
                # through the depth); a rebuild that silently flips to the
                # bf16 default would score queries against a numerically
                # different space than the snapshot's documents
                "dtype": jnp.dtype(c.dtype).name,
                "param_dtype": jnp.dtype(c.param_dtype).name,
            },
        }

    def _bucket_len(self, n: int) -> int:
        for b in LENGTH_BUCKETS:
            if b >= n and b <= self.cfg.max_len:
                return b
        return self.cfg.max_len

    def _pad_count(self, n: int) -> int:
        """Pow2 batch pad (bounded compile-shape count), rounded up to the
        mesh data-axis size — in_shardings of P('data', ...) reject a
        batch dim the axis doesn't divide."""
        p = 1 << math.ceil(math.log2(max(n, 1)))
        ax = self._data_ax
        if ax > 1 and p % ax:
            p = ((p + ax - 1) // ax) * ax
        return p

    def _token_lists(self, texts: List[str]) -> List[List[int]]:
        if hasattr(self.tokenizer, "encode"):
            return [self.tokenizer.encode(t) for t in texts]
        # chunked: one corpus-wide batch_encode would materialize an
        # (N, longest) padded id matrix for a million-doc ingest before
        # any encoding starts
        out: List[List[int]] = []
        for start in range(0, len(texts), 256):
            chunk = texts[start : start + 256]
            ids, mask = self.tokenizer.batch_encode(chunk)
            out.extend(ids[i, mask[i]].tolist() for i in range(len(chunk)))
        return out

    def encode(self, texts: List[str]) -> np.ndarray:
        if not texts:
            return np.empty((0, self.dim), dtype=np.float32)
        cleaned = [t.replace("\n", " ") for t in texts]
        out = np.empty((len(cleaned), self.dim), dtype=np.float32)
        token_lists = self._token_lists(cleaned)
        if self.pack_short:
            short = [
                i for i, tl in enumerate(token_lists)
                if len(tl) <= self._pack_max
            ]
        else:
            short = []
        long = (
            [i for i in range(len(cleaned)) if len(token_lists[i]) > self._pack_max]
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
        out = np.empty((len(token_lists), self.dim), dtype=np.float32)
        map_rows = np.asarray([r for r, _ in mapping], dtype=np.int64)
        map_segs = np.asarray([s for _, s in mapping], dtype=np.int64)

        def drain() -> None:
            # one fetch per window: amortizes the host<->device round trip
            # while BOUNDING live device output buffers — an unbounded
            # deferred fetch holds every chunk's output in HBM at once and
            # OOMs million-doc ingests. Each fetched (rows, S, dim) chunk
            # scatters straight into `out` and is dropped — retaining all
            # chunks would hold S/occupancy times the real output on host
            fetched = jax.device_get([o for o, _, _ in outs])
            for f, (_, start, r) in zip(fetched, outs):
                sel = np.nonzero((map_rows >= start) & (map_rows < start + r))[0]
                out[sel] = np.asarray(f)[map_rows[sel] - start, map_segs[sel]]
            outs.clear()

        for start in range(0, n_rows, rows_per):
            cids = ids[start : start + rows_per]
            cpos = pos[start : start + rows_per]
            cseg = seg[start : start + rows_per]
            r = cids.shape[0]
            r_pad = self._pad_count(r)
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
                    start,
                    r,
                )
            )
            if len(outs) >= MAX_INFLIGHT_CHUNKS:
                drain()
        drain()
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
            b_pad = self._pad_count(len(chunk))
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

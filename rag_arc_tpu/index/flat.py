"""HBM-resident flat (exact) vector index.

This is the TPU-native replacement for the reference's FAISS flat indexes
(``VectorStore_Faiss.py:110-154``: IndexFlatIP / IndexFlatL2, cosine via
``faiss.normalize_L2``). Design:

- The corpus is a capacity-padded device array ``emb (capacity, dim)`` with
  a ``valid (capacity,)`` tombstone mask and an incrementally maintained
  ``sqnorm`` cache for the l2 metric. Capacity is static per compile;
  growth doubles it (bounded recompilation, like amortized vectors).
- **Adds** write power-of-two padded blocks via ``dynamic_update_slice``
  under jit with buffer donation — no host mirror, no rebuild (the
  reference rebuilds the whole FAISS index on delete,
  ``VectorStore_Faiss.py:374-415``; here deletes just clear mask bits).
- **Search** is one XLA program: score matmul on the MXU → tombstone mask →
  ``lax.top_k``. With a mesh, rows are sharded across the ``"data"`` axis
  (``NamedSharding(P("data", None))``), each shard computes its local
  top-k inside ``shard_map``, and the (n_shards·k) candidate set — tiny
  compared to the score matrix — is merged into the global top-k. The
  merge is the only cross-chip traffic and rides ICI.
- Query batches are padded to a small set of bucket sizes so serving
  traffic doesn't cause recompilation storms.
"""

from __future__ import annotations

import logging
import math
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag_arc_tpu.ops.scoring import NEG_INF, pairwise_scores
from rag_arc_tpu.parallel.mesh import (
    CORPUS_AXIS,
    REPLICA_AXIS,
    SLICE_AXIS,
    corpus_sharding,
    replicated_sharding,
    round_up,
    row_sharding,
    shard_count,
)

logger = logging.getLogger(__name__)

ADD_BLOCK = 1024  # minimum add granularity (pads small adds up to this)
QUERY_BUCKETS = (1, 8, 32, 128, 512)  # query-batch padding buckets
QUANT_BLOCK = 32  # int8 mode: rows per shared quantization scale (= the
#                   two-level kernels' default sub-tile g)


def _pad_pow2(n: int, minimum: int) -> int:
    return max(minimum, 1 << math.ceil(math.log2(max(n, 1))))


class DeviceFlatIndex:
    """Exact MIPS/L2/cosine index over device-resident vectors."""

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        capacity: int = 4096,
        dtype: jnp.dtype = jnp.float32,
        mesh: Optional[Mesh] = None,
        axis_name: str = CORPUS_AXIS,
        rescore_i8: bool = True,
        refine: Optional[str] = "default",
        kf_mult: int = 2,
    ):
        self.dim = int(dim)
        self.metric = metric
        self.dtype = dtype
        # int8 mode: rows store as per-row-scaled symmetric int8 (2x the
        # rows per chip vs bf16; the int8 MXU path runs 2x the bf16 rate).
        # Search is exact under the quantized metric (ops/two_level.py
        # int8 notes); recall vs f32 ~matches bf16. Cosine/ip only.
        self.quantized = jnp.dtype(dtype) == jnp.int8
        # int8 searches over-fetch candidates and exact-rescore them with
        # the f32 query by default (removes query-side quantization error)
        self.rescore_i8 = bool(rescore_i8)
        # residual refinement ladder (int8 only): store per-row residual
        # codes (x - dequant(x)) at int4 (+50% HBM, packed 2/byte) or int8
        # (+100%) and fold them into the candidate rescore. Measured
        # recall@10 on the near-tie cluster corpus: raw quantized metric
        # 0.74 → +f32-query rescore 0.74 → +int4 residual 0.95 → +int8
        # residual 0.99 (f32 ceiling 1.0). The scan stays pure int8 — the
        # residuals are touched only for the ~4k gathered candidates.
        if refine not in (None, "int4", "int8", "default"):
            raise ValueError("refine must be None, 'int4' or 'int8'")
        if refine == "default":
            # int4 nibble-packing needs an even dim; odd dims get the int8
            # sidecar instead of an error when the user didn't choose
            refine = "int4" if dim % 2 == 0 else "int8"
        self.refine = refine if self.quantized else None
        # quantized-rescore over-fetch: the scan returns kf = kf_mult*k
        # sub-tile candidates whose g rows are gathered + exactly rescored.
        # The gather is the quantized path's dominant non-scan cost (kf*g
        # rows/query of random HBM reads). Measured same-session at
        # 10Mx768 B=512 (bench_results/refine_sweep_r04_10M.txt):
        # kf_mult 4 → 9.5k QPS, 2 → 11.4k, both recall 1.000 on the
        # 128-query oracle; kf_mult=1 → 12.4k but recall drops to 0.976
        # (and 0.66 on the near-tie cluster corpus, where 2/3/4 are
        # indistinguishable at 0.897). Default 2 = the knee.
        if kf_mult < 1:
            raise ValueError("kf_mult must be >= 1")
        self.kf_mult = int(kf_mult)
        if self.refine == "int4" and dim % 2:
            raise ValueError("int4 refine needs an even dim (2 codes/byte)")
        if self.quantized and metric == "l2":
            raise ValueError("int8 storage supports cosine/ip, not l2")
        # int8 shards like bf16: QUANT_BLOCK (32) divides ADD_BLOCK (1024),
        # so per-shard row ranges never straddle a quantization block and
        # the (N,) scale column shards with the rows (P(axis)) unchanged
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_shards = shard_count(mesh, axis_name) if mesh is not None else 1
        # optional query-replica axis: a ("replica", "data") mesh keeps a
        # full corpus copy per replica group and splits the query batch
        # across groups — QPS scales with replicas for VPU-bound search,
        # at memory cost x replicas (see parallel.mesh.replica_mesh)
        self.n_replicas = (
            mesh.shape[REPLICA_AXIS]
            if mesh is not None and REPLICA_AXIS in mesh.axis_names
            else 1
        )
        # DCN multi-slice: the corpus partitions across slices, shards
        # within each slice; the query merge is hierarchical (ICI inside
        # the slice, then one (B, k) hop per slice over DCN)
        self.n_slices = (
            mesh.shape[SLICE_AXIS]
            if mesh is not None and SLICE_AXIS in mesh.axis_names
            else 1
        )
        # per-shard row count must stay a multiple of the Pallas tile so the
        # fused kernel runs inside shard_map
        self._row_multiple = ADD_BLOCK * self.n_shards
        self.capacity = round_up(max(capacity, self._row_multiple), self._row_multiple)
        self.size = 0  # high-water mark of written rows
        self.n_deleted = 0
        self._gap_rows = 0  # int8 block-alignment padding rows (never valid)
        self._tail_scale = 0.0  # int8: scale of the partial tail block
        # jitted mesh-search closures, keyed by (path, B, dtype, k,
        # capacity, _force_stream). Building the shard_map closure fresh
        # per call defeats jax.jit's trace cache — measured 249 ms/batch
        # vs 12.5 ms direct on a 1-device chip mesh (the executable
        # reload, not the kernel, was the whole mesh-vs-direct gap)
        self._mesh_jit_cache: dict = {}
        self._alloc(self.capacity)

    # -- allocation / sharding --------------------------------------------

    def _shardings(self):
        if self.mesh is None:
            return None, None, None
        return (
            corpus_sharding(self.mesh, self.axis_name),
            row_sharding(self.mesh, self.axis_name),
            replicated_sharding(self.mesh),
        )

    def _alloc(self, capacity: int) -> None:
        emb_s, row_s, _ = self._shardings()
        self.emb = jnp.zeros((capacity, self.dim), dtype=self.dtype)
        self.valid = jnp.zeros((capacity,), dtype=jnp.bool_)
        # in int8 mode sqnorm doubles as the per-row dequantization scale
        self.sqnorm = jnp.zeros((capacity,), dtype=jnp.float32)
        self._alloc_res(capacity)
        if emb_s is not None:
            self.emb = jax.device_put(self.emb, emb_s)
            self.valid = jax.device_put(self.valid, row_s)
            self.sqnorm = jax.device_put(self.sqnorm, row_s)

    def _alloc_res(self, capacity: int) -> None:
        emb_s, row_s, _ = self._shardings()
        if self.refine:
            res_cols = self.dim // 2 if self.refine == "int4" else self.dim
            res_dtype = jnp.uint8 if self.refine == "int4" else jnp.int8
            self.res = jnp.zeros((capacity, res_cols), dtype=res_dtype)
            self.res_scale = jnp.zeros((capacity,), dtype=jnp.float32)
            if emb_s is not None:
                self.res = jax.device_put(self.res, emb_s)
                self.res_scale = jax.device_put(self.res_scale, row_s)
        else:
            self.res = self.res_scale = None

    def _grow_to(self, min_capacity: int) -> None:
        new_cap = self.capacity
        while new_cap < min_capacity:
            new_cap *= 2
        new_cap = round_up(new_cap, self._row_multiple)
        if new_cap == self.capacity:
            return
        logger.info("growing index capacity %d → %d", self.capacity, new_cap)
        old_emb, old_valid, old_sqnorm = self.emb, self.valid, self.sqnorm
        old_res, old_res_scale = self.res, self.res_scale
        old_cap = self.capacity
        self.capacity = new_cap
        self._alloc(new_cap)
        self.emb = _paste(self.emb, old_emb)
        self.valid = _paste_1d(self.valid, old_valid)
        self.sqnorm = _paste_1d(self.sqnorm, old_sqnorm)
        if self.refine:
            self.res = _paste(self.res, old_res)
            self.res_scale = _paste_1d(self.res_scale, old_res_scale)
        del old_emb, old_valid, old_sqnorm, old_res, old_res_scale, old_cap
        # mesh closures compiled for the old capacity can never be hit again
        self._mesh_jit_cache.clear()

    # -- mutation ---------------------------------------------------------

    def add(self, vectors: np.ndarray) -> np.ndarray:
        """Append rows; returns their positions (shape (n,))."""
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(
                f"expected (n, {self.dim}) vectors, got {vectors.shape}"
            )
        n = vectors.shape[0]
        if n == 0:
            return np.empty((0,), dtype=np.int64)
        if self.metric == "cosine":
            norms = np.linalg.norm(vectors, axis=1, keepdims=True)
            vectors = vectors / np.maximum(norms, 1e-12)
        start = self.size
        if self.quantized:
            from rag_arc_tpu.ops.two_level import quantize_rows_blocked

            # ONE scale per 32-row ALIGNED block (= the stream kernel's
            # sub-tile): raw int32 sub-maxes scale exactly outside the
            # kernel, so the certified int8 stream path stays exact under
            # the blocked-quantized metric. A partial tail block is
            # FILLED by the next add using the cached tail-block scale
            # (codes must share their block's scale), so single-doc adds
            # don't burn a block each; only when a new row's amax exceeds
            # the tail block's range does the cursor realign, leaving
            # <= 31 gap rows (zero codes, never valid).
            used = start % QUANT_BLOCK
            code_parts, scale_parts = [], []
            rest = vectors
            if used:
                head = rest[: QUANT_BLOCK - used]
                amax = float(np.abs(head).max()) if head.size else 0.0
                if self._tail_scale > 0 and amax <= 127.0 * self._tail_scale:
                    code_parts.append(
                        np.clip(
                            np.rint(head / self._tail_scale), -127, 127
                        ).astype(np.int8)
                    )
                    scale_parts.append(
                        np.full(len(head), self._tail_scale, np.float32)
                    )
                    rest = rest[len(head):]
                else:
                    gap = QUANT_BLOCK - used
                    self._gap_rows += gap
                    start += gap
            if len(rest):
                c, s = quantize_rows_blocked(rest, QUANT_BLOCK)
                code_parts.append(c[: len(rest)])
                scale_parts.append(s[: len(rest)])
                self._tail_scale = float(s[len(rest) - 1])
            f32_rows = vectors  # normalized originals, aligned with codes
            vectors = np.concatenate(code_parts) if code_parts else rest
            sqnorm = (
                np.concatenate(scale_parts)
                if scale_parts
                else np.empty(0, np.float32)
            )
            if self.refine and n:
                resid = f32_rows - vectors.astype(np.float32) * sqnorm[:, None]
                res_codes, res_scales = _encode_residual(resid, self.refine)
            n_write = n
        else:
            sqnorm = (vectors * vectors).sum(axis=1).astype(np.float32)
            n_write = n

        padded = _pad_pow2(n_write, ADD_BLOCK)
        if start + padded > self.capacity:
            # The pow2 block bucketing (bounded compile count) would spill
            # past capacity even though the ROWS fit — e.g. the final
            # chunk of an exactly-sized build. Growing here would double
            # HBM for pure padding (and silently double every subsequent
            # scan's cost); use an exact-fit capacity-capped tail block
            # instead (one extra compile per capacity-full event). Note
            # the tail is NOT necessarily ADD_BLOCK-aligned: capacity -
            # start can be ragged after quantized-gap/ragged adds.
            if start + n_write <= self.capacity:
                padded = min(round_up(n_write, ADD_BLOCK), self.capacity - start)
            else:
                self._grow_to(start + padded)
        block = np.zeros((padded, self.dim), dtype=vectors.dtype)
        block[:n_write] = vectors
        block_sq = np.zeros((padded,), dtype=np.float32)
        block_sq[:n_write] = sqnorm

        self.emb, self.valid, self.sqnorm = _add_block(
            self.emb,
            self.valid,
            self.sqnorm,
            jnp.asarray(block, dtype=self.dtype),
            jnp.asarray(block_sq),
            jnp.int32(start),
            jnp.int32(n),
        )
        if self.refine:
            res_block = np.zeros((padded, self.res.shape[1]), self.res.dtype)
            res_block[:n_write] = res_codes
            res_scale_block = np.zeros((padded,), np.float32)
            res_scale_block[:n_write] = res_scales
            self.res, self.res_scale = _add_res_block(
                self.res,
                self.res_scale,
                jnp.asarray(res_block),
                jnp.asarray(res_scale_block),
                jnp.int32(start),
            )
        self.size = start + n
        return np.arange(start, start + n, dtype=np.int64)

    def mark_deleted(self, positions: np.ndarray) -> None:
        """Tombstone rows: clear their valid bits AND zero their vectors.

        Zeroing makes dead rows score exactly 0 under cosine/ip, which is
        what lets the maskless streaming kernel (ops/two_level_stream.py)
        skip the validity stream in pass 1 — its exactness certificate
        relies on every dead/padding row scoring 0. ``take()`` of a deleted
        position returns zeros from then on (it was dead data anyway)."""
        positions = np.unique(np.asarray(positions, dtype=np.int32))
        if positions.size == 0:
            return
        # count only rows that were actually live: double-deleting (a
        # retried request, a stale id map) must not inflate n_deleted —
        # that corrupts n_active and fires compaction early
        was_valid = int(
            np.asarray(jnp.take(self.valid, jnp.asarray(positions))).sum()
        )
        padded = _pad_pow2(positions.size, 8)
        block = np.full((padded,), positions[0], dtype=np.int32)
        block[: positions.size] = positions
        self.valid, self.emb = _clear_rows(
            self.valid, self.emb, jnp.asarray(block)
        )
        if self.refine:
            # the residual sidecar must die with the row: the refined
            # rescore adds decode(res)·res_scale to the (now zero) code
            # score, and a leftover residual would give a deleted row a
            # nonzero exact score that can outrank weak live docs
            self.res_scale = _clear_res_scale(self.res_scale, jnp.asarray(block))
        self.n_deleted += was_valid

    def restore_rows(
        self,
        rows: np.ndarray,
        aux: np.ndarray,
        valid: np.ndarray,
        n_deleted: int = 0,
        gap_rows: int = 0,
        res: Optional[np.ndarray] = None,
        res_scale: Optional[np.ndarray] = None,
        refine: Optional[str] = None,
    ) -> None:
        """Place snapshot rows directly (no re-quantization): ``rows`` are
        stored values (int8 codes in quantized mode), ``aux`` the sqnorm /
        scale column, ``valid`` the per-row liveness. Bit-exact restore
        path for quantized snapshots (index/persistence.py). The index
        adopts the SNAPSHOT's residual-refine mode: residual codes cannot
        be recomputed from the primary codes alone, so a snapshot without
        a residual sidecar restores with refinement off."""
        size = int(len(rows))
        if size == 0:
            return
        if self.size or self.n_deleted:
            # pasting over a non-empty index would leave rows in
            # [size, old_size) valid and searchable — restore is a
            # fresh-index operation (persistence.load_store's usage)
            raise ValueError(
                "restore_rows requires an empty index; this one holds "
                f"{self.size} rows"
            )
        want_refine = refine if (self.quantized and res is not None) else None
        if want_refine != self.refine:
            self.refine = want_refine
            self._alloc_res(self.capacity)
        self._grow_to(round_up(size, self._row_multiple))
        self.emb = _paste(self.emb, jnp.asarray(rows, dtype=self.dtype))
        self.sqnorm = _paste_1d(self.sqnorm, jnp.asarray(aux, dtype=jnp.float32))
        self.valid = _paste_1d(self.valid, jnp.asarray(valid, dtype=jnp.bool_))
        if self.refine:
            self.res = _paste(self.res, jnp.asarray(res, dtype=self.res.dtype))
            self.res_scale = _paste_1d(
                self.res_scale, jnp.asarray(res_scale, dtype=jnp.float32)
            )
        self.size = size
        self.n_deleted = int(n_deleted)
        self._gap_rows = int(gap_rows)
        if self.quantized and size % QUANT_BLOCK:
            # rows always follow a realignment gap, so the row at size-1
            # carries the (partial) tail block's scale
            self._tail_scale = float(np.asarray(aux)[size - 1])
        else:
            self._tail_scale = 0.0

    def compact(self) -> Dict[int, int]:
        """Drop tombstoned rows; returns old→new position mapping.

        The reference's answer to deletes is a full index rebuild
        (``VectorStore_Faiss.py:374-415``); here rebuilds happen only when
        explicitly requested (or when fragmentation crosses a policy
        threshold in the vector store layer).
        """
        valid = np.asarray(jax.device_get(self.valid[: self.size]))
        emb = np.asarray(jax.device_get(self.emb[: self.size]), dtype=np.float32)
        if self.quantized:
            scale = np.asarray(jax.device_get(self.sqnorm[: self.size]))
            emb = emb * scale[:, None]
            if self.refine:
                # fold the residual ladder in so survivors re-quantize
                # from the highest-fidelity reconstruction available
                res = np.asarray(jax.device_get(self.res[: self.size]))
                rs = np.asarray(jax.device_get(self.res_scale[: self.size]))
                emb = emb + _decode_residual_np(res, self.refine) * rs[:, None]
        keep = np.nonzero(valid)[0]
        mapping = {int(old): new for new, old in enumerate(keep)}
        self.size = 0
        self.n_deleted = 0
        self._gap_rows = 0
        self._tail_scale = 0.0
        self._alloc(self.capacity)
        if keep.size:
            # re-add survivors through the ONE add() path. Quantized rows
            # re-quantize exactly (amax of codes·scale is 127·scale);
            # cosine rows re-normalize already-unit vectors (a no-op up to
            # storage rounding). The pow2/capacity-capped padding logic
            # must live in one place — the r2 silent-capacity-doubling bug
            # lived in a duplicate of exactly this logic.
            self.add(emb[keep])
        return mapping

    # -- query ------------------------------------------------------------

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Batched exact top-k. Returns (scores (B, k), positions (B, k)).

        Slots with no valid match carry score -inf and position -1.
        """
        return self.search_dispatch(queries, k)()

    def search_dispatch(
        self, queries: np.ndarray, k: int
    ) -> "Callable[[], Tuple[np.ndarray, np.ndarray]]":
        """Enqueue a search; the returned callable blocks on the single
        result readback. Streaming callers dispatch every batch first and
        fetch in order, so the ~35 ms tunnel round trip amortizes over
        the stream instead of gating each batch."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if queries.shape[1] != self.dim:
            raise ValueError(f"query dim {queries.shape[1]} != index dim {self.dim}")
        k = int(k)
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        k_eff = min(k, self.capacity)
        b = queries.shape[0]
        b_pad = next((x for x in QUERY_BUCKETS if x >= b), round_up(b, 512))
        b_pad = round_up(b_pad, self.n_replicas)
        q = np.zeros((b_pad, self.dim), dtype=np.float32)
        q[:b] = queries

        s_dev, p_dev = self.search_device(jnp.asarray(q), k_eff)
        # under an active TransferPool (streamed callers) the readback
        # rides ONE pooled device_get for the whole stream instead of a
        # ~35 ms tunnel round trip per batch
        from rag_arc_tpu.utils.transfers import current_pool

        pool = current_pool()
        handle = pool.register((s_dev, p_dev)) if pool is not None else None

        def fetch() -> Tuple[np.ndarray, np.ndarray]:
            # ONE fetch for both outputs: device_get of the pair is a
            # single host round trip (35 ms RTT through this box's tunnel)
            if handle is not None:
                scores, positions = pool.result(handle)
            else:
                scores, positions = jax.device_get((s_dev, p_dev))
            scores = np.asarray(scores)[:b]
            positions = np.asarray(positions)[:b].astype(np.int64)
            # normalize the two device sentinels to the documented
            # contract (-inf / -1): the direct path emits -inf scores,
            # the Pallas paths emit the finite NEG=-3e38 sentinel with
            # position -1 — callers must see ONE convention regardless
            # of which kernel ran
            positions = np.where(
                np.isneginf(scores) | (scores <= -1.0e38), -1, positions
            )
            scores = np.where(positions < 0, -np.inf, scores)
            if k_eff < k:  # index smaller than k: pad result
                pad = k - k_eff
                scores = np.concatenate(
                    [scores, np.full((b, pad), -np.inf, dtype=scores.dtype)],
                    axis=1,
                )
                positions = np.concatenate(
                    [positions, np.full((b, pad), -1, dtype=positions.dtype)],
                    axis=1,
                )
            return scores, positions

        return fetch

    # direct-path peak memory budget for the (B, N) score matrix; beyond
    # this the chunked/fused paths kick in
    SCORE_BYTES_BUDGET = 1 << 30

    # test hook: force the certified streaming path in interpret mode on
    # CPU (the eligibility check normally requires a real TPU backend)
    _force_stream = False
    _last_certified = None

    # sub-tile rows per pass-1 max (the two-level kernels' g). 16 measured
    # fastest with the tournament select (2Mx768 B=512 same-session sweep:
    # g16 16.9 ms, g32 17.9, g64 21.6); must divide QUANT_BLOCK so int8
    # sub-tiles never straddle a scale block (keeps the certificate exact)
    SUBTILE_G = 16

    def _stream_eligible(self, b: int) -> bool:
        """Can the maskless streaming producer run this search? Gates the
        bf16/f32 certified stream AND the int8 certified stream (the
        quantized branch of search_device calls this first). Requires
        dead rows zeroed (mark_deleted guarantees it), cosine/ip, a
        single-device corpus, and the whole query batch + two corpus
        tiles fitting VMEM (the stream kernel takes B in one invocation —
        no query grid axis). An XLA-scan producer without these Mosaic
        constraints exists (producer="scan") but measured SLOWER at the
        full-path level (22.0 vs 17.2 ms same-session), so small batches
        keep the grid path."""
        if self.mesh is not None:
            return False
        if not self._force_stream and 4 * b * self.capacity <= self.SCORE_BYTES_BUDGET:
            # small enough for the direct score matrix — stream not worth it
            return False
        return self._stream_constraints_ok(b, min(self._tile_n(), 2048))

    def _stream_ok_local(self, b_local: int, tile: int) -> bool:
        """Per-shard variant of ``_stream_eligible`` for shard_map bodies:
        the same Mosaic/VMEM constraints evaluated at the shard's query
        slice and tile. Measured on the real chip via a 1-device mesh
        (tools/mesh_parity_probe.py, 2M×768 bf16 B=512): the certified
        stream inside shard_map runs at +0.1% vs the direct path, while
        the masked grid kernel in shard_map was 10x slower — so the mesh
        path prefers the stream whenever it can compile."""
        return self._stream_constraints_ok(b_local, tile)

    def _ip_unscale(self, q: jax.Array, s: jax.Array) -> jax.Array:
        """Every int8 path scores with a NORMALIZED query (the quantized
        pipeline is shared with cosine, where rows are unit-norm); for
        metric='ip' the absolute scores must be q·x, so multiply back by
        ‖q‖ at the very end — exact, and ranking-invariant per query
        (score-threshold filtering depends on the absolute values)."""
        if not (self.quantized and self.metric == "ip"):
            return s
        qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
        return s * qn

    def _stream_constraints_ok(self, b: int, tile: int) -> bool:
        """The ONE Mosaic/VMEM eligibility model for the stream kernel —
        shared by the direct gate and the per-shard mesh gate so the
        probe-measured constants can never drift apart. Constraints:
        cosine/ip only (dead rows must score 0 for the certificate);
        int8 needs dim ≤ 1040 (raw int32 dots must convert to f32
        exactly: |dot| ≤ dim·127² < 2²⁴); Mosaic rejects B below/not a
        multiple of 128 query lanes (b=96 fails compile, b=128 works)
        and B=512 is the largest probe-verified batch; the 4-term VMEM
        sum must fit 14 MB (g=16/tile=2048/B=512/d=768 bf16 ≈ 13.1 MB
        compiles + runs on v5e, ~2 MB headroom). ``_force_stream`` (test
        hook) skips the backend/batch-shape gates but keeps the rest."""
        if self.metric not in ("cosine", "ip"):
            return False
        if self.quantized and self.dim > 1040:
            return False
        if not self._force_stream:
            if jax.default_backend() not in ("tpu", "axon"):
                return False
            if b < 128 or b % 128 != 0 or b > 512:
                return False
        item = jnp.dtype(self.dtype).itemsize
        vmem = (
            2 * tile * self.dim * item     # double-buffered corpus tiles
            + tile * b * 4                 # (tile, B) score slab
            + 2 * (tile // self.SUBTILE_G) * b * 4  # staging buffers
            + b * self.dim * item          # resident query block
        )
        return vmem <= (14 << 20)

    def _tile_n(self) -> int:
        """Largest power-of-two multiple of ADD_BLOCK that divides capacity,
        capped at 256k rows (keeps Pallas tiles / scan chunks aligned)."""
        m = self.capacity // ADD_BLOCK
        tile = ADD_BLOCK
        while m % 2 == 0 and tile < (1 << 18):
            m //= 2
            tile *= 2
        return tile

    def search_device(self, q: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
        """Device-to-device search: ``q`` is already a padded (B, dim)
        device array and results stay on device. This is the serving hot
        path — callers chain the encoder forward into this without any
        host round trip, and pipeline batches without blocking.

        Path selection: mesh → per-shard top-k + merge; TPU with a large
        score matrix → fused Pallas kernel (no (B, N) materialization);
        large score matrix elsewhere → chunked scan; else direct matmul.

        Device-side empty slots carry the finite NEG=-3e38 sentinel on the
        Pallas paths (position -1); the host boundary (``search``,
        ``_batch_search_raw``) normalizes them to the documented -inf.
        """
        # the certificate flag describes THIS search only; non-stream
        # paths must not leave a stale one behind for stats()
        self._last_certified = None
        if self.mesh is not None:
            b0 = q.shape[0]
            if self.n_replicas > 1 and b0 % self.n_replicas:
                # replica meshes split the query batch over REPLICA_AXIS;
                # search() rounds the batch up but device-chained callers
                # (vector_store._batch_search_raw) pad to a power of two
                # only — enforce the divisibility here
                q = jnp.pad(
                    q, ((0, round_up(b0, self.n_replicas) - b0), (0, 0))
                )
            s, p = self._search_sharded(q, k)
            return self._ip_unscale(q, s)[:b0], p[:b0]
        if self.quantized:
            # fetch extra candidates from the quantized scan, then rescore
            # them with the full-precision query (and the residual ladder
            # when refine is on): quantized-metric ceiling 0.979 → ≥0.99
            # at 10M for one tiny gather+dot
            kf = self._kf_local(k, self.capacity)
            # auto-widen sub-tiles until resident + search temporaries fit
            # the chip. Temp model calibrated against XLA memory_analysis
            # of the block_scales kernels (r3): the (N, 1) valid column
            # pads to 128 lanes (cap·128 bytes) and the select stage holds
            # ~2 (N/g, B) f32 slabs. (The old per-row-scale kernel padded
            # the f32 scale column too — 5.1 GB at 10M, the measured OOM;
            # block_scales=True removed it, and with it the need to demote
            # the certified stream to the grid kernel near the ceiling.)
            g = self.SUBTILE_G
            res_bytes = 0 if self.res is None else (
                self.res.shape[1] + 4
            ) * self.capacity
            resident = self.capacity * (self.dim + 5) + res_bytes
            # temp model (slightly above XLA memory_analysis): 128-lane
            # padded valid column + ~1.5 (N/g, B) f32 select slabs
            # (measured 2.90e9 B=512 g=16 at 10M; model gives 3.2e9)
            while (
                g < QUANT_BLOCK
                and resident + 128 * self.capacity
                + 6 * (self.capacity // g) * q.shape[0]
                > (14 << 30)
            ):
                g *= 2
            if self._stream_eligible(q.shape[0]):
                from rag_arc_tpu.ops.two_level_stream import (
                    two_level_topk_certified_i8,
                )

                s, p, ok = two_level_topk_certified_i8(
                    q, self.emb, self.sqnorm, self.valid, kf,
                    g=g, tile_n=min(self._tile_n(), 2048),
                    interpret=self._force_stream, block_scales=True,
                )
                self._last_certified = ok
            elif jax.default_backend() in ("tpu", "axon"):
                from rag_arc_tpu.ops.two_level import two_level_topk_i8

                s, p = two_level_topk_i8(
                    q, self.emb, self.sqnorm, self.valid, kf,
                    g=g, tile_n=min(self._tile_n(), 2048),
                    block_scales=True,
                )
            elif 4 * q.shape[0] * self.capacity > self.SCORE_BYTES_BUDGET:
                # non-TPU backend, score matrix too big to materialize:
                # Mosaic can't lower here, so stream row chunks through
                # XLA with a running top-k (mirrors masked_topk_chunked)
                s, p = _i8_topk_chunked(
                    self.emb, self.sqnorm, self.valid, q, kf,
                    chunk=self._tile_n(),
                )
            else:
                s, p = _search_single_i8(self.emb, self.sqnorm, self.valid, q, kf)
            if kf > k:
                if self.refine:
                    s, p = _i8_rescore_refined(
                        q, self.emb, self.sqnorm, self.res, self.res_scale,
                        s, p, k, self.refine,
                    )
                else:
                    s, p = _i8_rescore(q, self.emb, self.sqnorm, s, p, k)
            return self._ip_unscale(q, s), p
        score_bytes = 4 * q.shape[0] * self.capacity
        if score_bytes <= self.SCORE_BYTES_BUDGET and not self._force_stream:
            return _search_single(self.emb, self.valid, self.sqnorm, q, k, self.metric)
        if self._stream_eligible(q.shape[0]):
            from rag_arc_tpu.ops.two_level_stream import two_level_topk_certified

            # streaming pass-1 (one kernel invocation, manual DMA pipeline)
            # measured ~15% over the grid producer; exactness guaranteed by
            # the positive-kth-score certificate with an in-program grid
            # fallback (lax.cond), so results match the masked path always
            s, p, ok = two_level_topk_certified(
                q, self.emb, self.valid, self.sqnorm, k,
                g=self.SUBTILE_G, tile_n=min(self._tile_n(), 2048),
                metric=self.metric, interpret=self._force_stream,
            )
            self._last_certified = ok  # device scalar; stats() fetches lazily
            return s, p
        if jax.default_backend() in ("tpu", "axon"):
            from rag_arc_tpu.ops.two_level import two_level_topk

            # two-level beats the r1 fused kernel ~2.2x at the bench shape
            # (21.3 ms vs 47.2 ms same-session, 2Mx768 bf16 B=512) and is
            # run-to-run stable; see ops/two_level.py
            return two_level_topk(
                q, self.emb, self.valid, self.sqnorm, k,
                g=self.SUBTILE_G, tile_n=min(self._tile_n(), 2048),
                metric=self.metric,
            )
        from rag_arc_tpu.ops.topk import masked_topk_chunked

        return masked_topk_chunked(
            q, self.emb, self.valid, self.sqnorm, k,
            metric=self.metric, chunk=self._tile_n(),
        )

    def _kf_local(self, k_local: int, local_cap: int) -> int:
        """Candidate over-fetch for quantized rescore (shared by every
        mesh path and the direct path — keep the formula in ONE place).
        The floor scales with kf_mult so kf_mult=4 (default) reproduces
        the historical max(4k, 32)."""
        return (
            min(max(self.kf_mult * k_local, 8 * self.kf_mult), local_cap)
            if self.quantized and (self.rescore_i8 or self.refine)
            else k_local
        )

    def _refine_shard_args(self, row2d_spec, row1d_spec):
        """(args, specs) for threading the residual arrays through a
        shard_map when refine is enabled; empty tuples otherwise."""
        if self.refine:
            return (self.res, self.res_scale), (row2d_spec, row1d_spec)
        return (), ()

    def _make_local_producer(self, b_local, tile, use_fused, k_local, kf_local):
        """Per-shard top-k producer shared by all three mesh bodies.

        Kernel preference (1-device-mesh A/B on the real chip,
        tools/mesh_parity_probe.py): certified stream (+0.1% vs the
        direct single-chip path) > masked grid kernel (10x slower inside
        shard_map) > lax.top_k over the materialized score matrix (small
        local corpora only). Returns (s, idx) with LOCAL row indices;
        callers add the shard offset and merge."""
        metric = self.metric
        quantized = self.quantized
        refine = self.refine
        stream_ok = (use_fused or self._force_stream) and self._stream_ok_local(
            b_local, tile
        )
        g = self.SUBTILE_G
        interp = self._force_stream

        def produce(q_local, emb, valid, sqnorm, extra):
            if quantized:
                # sqnorm carries the per-row int8 scales; the blocked
                # scales are row-aligned so they sharded with the rows
                if stream_ok:
                    from rag_arc_tpu.ops.two_level_stream import (
                        two_level_topk_certified_i8,
                    )

                    s, idx, _ = two_level_topk_certified_i8(
                        q_local, emb, sqnorm, valid, kf_local,
                        g=g, tile_n=tile, interpret=interp,
                        block_scales=True,
                    )
                elif use_fused:
                    from rag_arc_tpu.ops.two_level import two_level_topk_i8

                    s, idx = two_level_topk_i8(
                        q_local, emb, sqnorm, valid, kf_local,
                        g=g, tile_n=tile, block_scales=True,
                    )
                else:
                    s, idx = _i8_topk_body(emb, sqnorm, valid, q_local, kf_local)
                if kf_local > k_local:
                    if refine:
                        s, idx = _i8_rescore_refined_body(
                            q_local, emb, sqnorm, extra[0], extra[1], s, idx,
                            k_local, refine,
                        )
                    else:
                        s, idx = _i8_rescore_body(
                            q_local, emb, sqnorm, s, idx, k_local
                        )
            elif stream_ok:
                from rag_arc_tpu.ops.two_level_stream import (
                    two_level_topk_certified,
                )

                s, idx, _ = two_level_topk_certified(
                    q_local, emb, valid, sqnorm, k_local,
                    g=g, tile_n=tile, metric=metric, interpret=interp,
                )
            elif use_fused:
                from rag_arc_tpu.ops.two_level import two_level_topk

                s, idx = two_level_topk(
                    q_local, emb, valid, sqnorm, k_local,
                    g=g, tile_n=tile, metric=metric,
                )
            else:
                scores = pairwise_scores(q_local, emb, metric, sqnorm)
                scores = jnp.where(valid[None, :], scores, NEG_INF)
                s, idx = jax.lax.top_k(scores, k_local)
            return s, idx

        return produce

    def _mesh_jit_key(self, path: str, q: jax.Array, k: int):
        # refine/rescore_i8 are baked into the cached closure (kf_local and
        # the rescore body) and refine can change at snapshot-restore time —
        # key on them so a restore never reuses a stale executable
        return (path, q.shape, jnp.dtype(q.dtype).name, k, self.capacity,
                self._force_stream, self.refine, self.rescore_i8,
                self.kf_mult)

    @staticmethod
    def _merge_gathered(s_all, p_all, b, k):
        """Merge gathered per-shard candidates (S, b, k_local) → (b, k).
        The ONE implementation of the transpose/reshape/top_k merge used
        by every mesh path; clamps to the available candidate count and
        pads back to k so callers always see (b, k)."""
        s_flat = jnp.transpose(s_all, (1, 0, 2)).reshape(b, -1)
        p_flat = jnp.transpose(p_all, (1, 0, 2)).reshape(b, -1)
        kk = min(k, s_flat.shape[1])
        sm, sel = jax.lax.top_k(s_flat, kk)
        pm = jnp.take_along_axis(p_flat, sel, axis=-1)
        if kk < k:
            sm = jnp.pad(sm, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
            pm = jnp.pad(pm, ((0, 0), (0, k - kk)), constant_values=-1)
        return sm, pm

    def _search_sharded(self, q: jax.Array, k: int):
        mesh, axis = self.mesh, self.axis_name
        local_cap = self.capacity // self.n_shards
        k_local = min(k, local_cap)
        if self.n_slices > 1:
            return self._search_sliced(q, k, k_local, local_cap)
        if self.n_replicas > 1:
            return self._search_replicated(q, k, k_local, local_cap)
        extra_args, extra_specs = self._refine_shard_args(P(axis, None), P(axis))
        run = self._mesh_jit_cache.get(self._mesh_jit_key("data", q, k))
        if run is None:
            # fused Pallas kernel per shard on TPU once the local score
            # matrix is worth it (per-shard lax.top_k over millions of rows
            # is both a compile hog and an O(B·N_local) HBM write)
            use_fused = (
                jax.default_backend() in ("tpu", "axon")
                and 4 * q.shape[0] * local_cap > self.SCORE_BYTES_BUDGET
            )
            tile = ADD_BLOCK
            while local_cap % (tile * 2) == 0 and tile < 2048:
                tile *= 2

            produce = self._make_local_producer(
                q.shape[0], tile, use_fused, k_local,
                self._kf_local(k_local, local_cap),
            )
            merge = self._merge_gathered

            def local_topk(q, emb, valid, sqnorm, *extra):
                s, idx = produce(q, emb, valid, sqnorm, extra)
                offset = jax.lax.axis_index(axis) * local_cap
                return s[None], (idx + offset)[None]

            @partial(jax.jit, static_argnames=())
            def run(q, emb, valid, sqnorm, *extra_in):
                s_all, p_all = jax.shard_map(
                    local_topk,
                    mesh=mesh,
                    in_specs=(P(), P(axis, None), P(axis), P(axis), *extra_specs),
                    out_specs=(P(axis, None, None), P(axis, None, None)),
                    # pallas_call outputs carry no varying-mesh-axis
                    # metadata; out_specs state the sharding explicitly
                    check_vma=False,
                )(q, emb, valid, sqnorm, *extra_in)
                return merge(s_all, p_all, q.shape[0], k)

            self._mesh_jit_cache[self._mesh_jit_key("data", q, k)] = run

        return run(q, self.emb, self.valid, self.sqnorm, *extra_args)

    def _search_sliced(self, q: jax.Array, k: int, k_local: int, local_cap: int):
        """("slice", "replica", "data") mesh: hierarchical top-k merge.

        Each chip answers over its local rows; the per-shard (B, k)
        candidates all-gather over the intra-slice "data" axis (ICI) and
        reduce to the slice's top-k; only those (B, k) candidates cross
        the inter-slice "slice" axis (DCN) for the final merge — the
        expensive hop carries k floats+ints per query per slice, never
        corpus-proportional traffic. Replicas within a slice split the
        query batch exactly like _search_replicated."""
        mesh, axis = self.mesh, self.axis_name
        q_spec = P(REPLICA_AXIS, None) if self.n_replicas > 1 else P()
        extra_args, extra_specs = self._refine_shard_args(
            P((SLICE_AXIS, axis), None), P((SLICE_AXIS, axis))
        )
        run = self._mesh_jit_cache.get(self._mesh_jit_key("slice", q, k))
        if run is None:
            n_data = self.n_shards // self.n_slices
            use_fused = (
                jax.default_backend() in ("tpu", "axon")
                and 4 * (q.shape[0] // self.n_replicas) * local_cap
                > self.SCORE_BYTES_BUDGET
            )
            tile = ADD_BLOCK
            while local_cap % (tile * 2) == 0 and tile < 2048:
                tile *= 2

            merge = self._merge_gathered

            def merge_axis(s, p, b, axis_name, k_out):
                return merge(
                    jax.lax.all_gather(s, axis_name),
                    jax.lax.all_gather(p, axis_name),
                    b, k_out,
                )

            produce = self._make_local_producer(
                q.shape[0] // self.n_replicas, tile, use_fused, k_local,
                self._kf_local(k_local, local_cap),
            )

            def local_fn(q_local, emb, valid, sqnorm, *extra):
                s, idx = produce(q_local, emb, valid, sqnorm, extra)
                shard_idx = (
                    jax.lax.axis_index(SLICE_AXIS) * n_data
                    + jax.lax.axis_index(axis)
                )
                idx = idx + shard_idx * local_cap
                b = q_local.shape[0]
                # ICI: merge shards within the slice
                s, idx = merge_axis(s, idx, b, axis, k)
                # DCN: merge slice winners
                return merge_axis(s, idx, b, SLICE_AXIS, k)

            run = jax.jit(
                jax.shard_map(
                    local_fn,
                    mesh=mesh,
                    in_specs=(
                        q_spec,
                        P((SLICE_AXIS, axis), None),
                        P((SLICE_AXIS, axis)),
                        P((SLICE_AXIS, axis)),
                        *extra_specs,
                    ),
                    out_specs=(q_spec, q_spec),
                    check_vma=False,
                )
            )
            self._mesh_jit_cache[self._mesh_jit_key("slice", q, k)] = run
        return run(q, self.emb, self.valid, self.sqnorm, *extra_args)

    def _search_replicated(self, q: jax.Array, k: int, k_local: int, local_cap: int):
        """("replica", "data") mesh: each replica group answers its slice of
        the query batch against the corpus (sharded over "data" within the
        group). The per-shard top-k all-gathers and merges *inside* the
        group over ICI; query slices never leave their replica."""
        mesh, axis = self.mesh, self.axis_name
        extra_args, extra_specs = self._refine_shard_args(P(axis, None), P(axis))
        run = self._mesh_jit_cache.get(self._mesh_jit_key("replica", q, k))
        if run is None:
            use_fused = (
                jax.default_backend() in ("tpu", "axon")
                and 4 * (q.shape[0] // self.n_replicas) * local_cap
                > self.SCORE_BYTES_BUDGET
            )
            tile = ADD_BLOCK
            while local_cap % (tile * 2) == 0 and tile < 2048:
                tile *= 2

            produce = self._make_local_producer(
                q.shape[0] // self.n_replicas, tile, use_fused, k_local,
                self._kf_local(k_local, local_cap),
            )
            merge = self._merge_gathered

            def local_fn(q_local, emb, valid, sqnorm, *extra):
                s, idx = produce(q_local, emb, valid, sqnorm, extra)
                idx = idx + jax.lax.axis_index(axis) * local_cap
                return merge(
                    jax.lax.all_gather(s, axis),   # (S, b_r, k_local)
                    jax.lax.all_gather(idx, axis),
                    q_local.shape[0], k,
                )

            run = jax.jit(
                jax.shard_map(
                    local_fn,
                    mesh=mesh,
                    in_specs=(
                        P(REPLICA_AXIS, None), P(axis, None), P(axis), P(axis),
                        *extra_specs,
                    ),
                    out_specs=(P(REPLICA_AXIS, None), P(REPLICA_AXIS, None)),
                    check_vma=False,
                )
            )
            self._mesh_jit_cache[self._mesh_jit_key("replica", q, k)] = run
        return run(q, self.emb, self.valid, self.sqnorm, *extra_args)

    def take(self, positions: np.ndarray) -> np.ndarray:
        """Fetch vectors at positions (host np.float32). Used by MMR.
        Int8 rows dequantize through their per-row scale."""
        positions = np.asarray(positions, dtype=np.int64)
        idx = jnp.asarray(positions)
        # ONE device_get for every gathered piece: each fetch pays a full
        # host round trip (~35 ms through this box's tunnel), and MMR calls
        # take() per query
        pieces = [jnp.take(self.emb, idx, axis=0)]
        if self.quantized:
            pieces.append(jnp.take(self.sqnorm, idx))
            if self.refine:
                pieces.append(jnp.take(self.res, idx, axis=0))
                pieces.append(jnp.take(self.res_scale, idx))
        fetched = jax.device_get(pieces)
        out = np.asarray(fetched[0], dtype=np.float32)
        if self.quantized:
            out = out * np.asarray(fetched[1])[:, None]
            if self.refine:
                res = np.asarray(fetched[2])
                rs = np.asarray(fetched[3])
                out = out + _decode_residual_np(res, self.refine) * rs[:, None]
        return out

    # -- introspection ----------------------------------------------------

    @property
    def n_active(self) -> int:
        return self.size - self.n_deleted - self._gap_rows

    def stats(self) -> Dict[str, object]:
        out = {
            "kind": "flat",
            "dim": self.dim,
            "metric": self.metric,
            "capacity": self.capacity,
            "size": self.size,
            "active": self.n_active,
            "deleted": self.n_deleted,
            "dtype": str(self.dtype),
            "gap_rows": self._gap_rows,
            "shards": self.n_shards,
            "refine": self.refine,
            "hbm_bytes": self.capacity * self.dim * jnp.dtype(self.dtype).itemsize
            + (
                self.capacity * (self.res.shape[1] + 4)
                if self.refine
                else 0
            ),
        }
        if self._last_certified is not None:
            # True: the LAST search ran the certified stream without the
            # masked-grid fallback; False: the in-program fallback ran.
            # Absent entirely when the last search took a non-stream path
            # (search_device resets the flag per call — no stale reads)
            out["stream_certified"] = bool(jax.device_get(self._last_certified))
        return out


# -- jitted helpers (module-level so the compile cache is shared) ---------


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _add_block(emb, valid, sqnorm, block, block_sq, start, count):
    emb = jax.lax.dynamic_update_slice(emb, block, (start, 0))
    sqnorm = jax.lax.dynamic_update_slice(sqnorm, block_sq, (start,))
    rows = jnp.arange(valid.shape[0], dtype=jnp.int32)
    valid = valid | ((rows >= start) & (rows < start + count))
    return emb, valid, sqnorm


@partial(jax.jit, donate_argnums=(0, 1))
def _clear_rows(valid, emb, positions):
    valid = valid.at[positions].set(False)
    emb = emb.at[positions, :].set(jnp.zeros((), dtype=emb.dtype))
    return valid, emb


@partial(jax.jit, donate_argnums=(0,))
def _clear_res_scale(res_scale, positions):
    # a zero residual SCALE silences the whole residual term for the row;
    # the packed residual codes themselves can stay (decode(res)·0 = 0)
    return res_scale.at[positions].set(0.0)


@partial(jax.jit, static_argnames=("k", "metric"))
def _search_single(emb, valid, sqnorm, q, k, metric):
    scores = pairwise_scores(q, emb, metric, sqnorm)
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    return jax.lax.top_k(scores, k)


def _encode_residual(resid: np.ndarray, kind: str):
    """Per-row residual codes: int4 packs two codes/byte (offset-8
    nibbles, even dims low / odd dims high), int8 is plain."""
    amax = np.abs(resid).max(axis=1)
    if kind == "int4":
        scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
        c = (
            np.clip(np.rint(resid / scale[:, None]), -7, 7).astype(np.int8)
            + 8
        ).astype(np.uint8)
        return (c[:, 0::2] | (c[:, 1::2] << 4)).astype(np.uint8), scale
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    codes = np.clip(np.rint(resid / scale[:, None]), -127, 127).astype(np.int8)
    return codes, scale


def _decode_residual(rows, kind: str):
    """Device-side residual decode of gathered rows (..., cols)."""
    if kind == "int4":
        lo = (rows & 15).astype(jnp.float32) - 8.0
        hi = (rows >> 4).astype(jnp.float32) - 8.0
        return jnp.stack([lo, hi], axis=-1).reshape(*rows.shape[:-1], -1)
    return rows.astype(jnp.float32)


def _decode_residual_np(rows: np.ndarray, kind: str) -> np.ndarray:
    if kind == "int4":
        lo = (rows & 15).astype(np.float32) - 8.0
        hi = (rows >> 4).astype(np.float32) - 8.0
        return np.stack([lo, hi], axis=-1).reshape(*rows.shape[:-1], -1)
    return rows.astype(np.float32)


def _i8_rescore_refined_body(
    q, emb_i8, row_scale, res, res_scale, s, p, k, refine
):
    """Residual-refined candidate rescore: f32 query against
    (codes·scale + residual·res_scale) — effectively 12/16-bit rows for
    the gathered candidates only; the scan stays pure int8."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    qn = q / jnp.maximum(norm, 1e-12)
    safe = jnp.maximum(p, 0)
    rows = jnp.take(emb_i8, safe, axis=0).astype(jnp.float32) * jnp.take(
        row_scale, safe
    )[..., None]
    rows = rows + _decode_residual(
        jnp.take(res, safe, axis=0), refine
    ) * jnp.take(res_scale, safe)[..., None]
    exact = jnp.einsum(
        "bd,bkd->bk", qn, rows, precision=jax.lax.Precision.HIGHEST
    )
    exact = jnp.where((p >= 0) & (s > NEG_INF / 2), exact, NEG_INF)
    s2, sel = jax.lax.top_k(exact, k)
    return s2, jnp.take_along_axis(p, sel, axis=1)


@partial(jax.jit, static_argnames=("k", "refine"))
def _i8_rescore_refined(q, emb_i8, row_scale, res, res_scale, s, p, k, refine):
    return _i8_rescore_refined_body(
        q, emb_i8, row_scale, res, res_scale, s, p, k, refine
    )


@partial(jax.jit, donate_argnums=(0, 1))
def _add_res_block(res, res_scale, block, block_scale, start):
    res = jax.lax.dynamic_update_slice(res, block, (start, 0))
    res_scale = jax.lax.dynamic_update_slice(res_scale, block_scale, (start,))
    return res, res_scale


def _i8_rescore_body(q, emb_i8, row_scale, s, p, k):
    """Exact-rescore of int8 candidates (VERDICT r2 #3): the scan's
    quantized metric int8(q)·int8(x) caps recall (~0.979 at 10M — the
    proven quantized-metric ceiling); rescoring the top candidates with
    the FULL-PRECISION query against the dequantized rows removes the
    query-side quantization error for one tiny gather + batched dot.
    Un-jitted so shard_map bodies can call it."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    qn = q / jnp.maximum(norm, 1e-12)
    safe = jnp.maximum(p, 0)
    rows = jnp.take(emb_i8, safe, axis=0).astype(jnp.float32)  # (B, kf, d)
    sc = jnp.take(row_scale, safe)                             # (B, kf)
    exact = (
        jnp.einsum(
            "bd,bkd->bk", qn, rows, precision=jax.lax.Precision.HIGHEST
        )
        * sc
    )
    exact = jnp.where((p >= 0) & (s > NEG_INF / 2), exact, NEG_INF)
    s2, sel = jax.lax.top_k(exact, k)
    return s2, jnp.take_along_axis(p, sel, axis=1)


def _i8_topk_body(emb_i8, row_scale, valid, q, k):
    """int8 top-k body (quantized-metric scores, identical arithmetic to
    the TPU kernels). Un-jitted so shard_map bodies can call it; the
    single-device wrapper below jits it."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    qn = q / jnp.maximum(norm, 1e-12)
    qmax = jnp.max(jnp.abs(qn), axis=-1, keepdims=True)
    qscale = jnp.maximum(qmax, 1e-12) / 127.0
    q_i8 = jnp.clip(jnp.round(qn / qscale), -127, 127)
    scores = jnp.dot(
        q_i8.astype(jnp.float32),
        emb_i8.astype(jnp.float32).T,
        precision=jax.lax.Precision.HIGHEST,
    ) * row_scale[None, :]
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    s, p = jax.lax.top_k(scores, k)
    return s * qscale, p


@partial(jax.jit, static_argnames=("k",))
def _search_single_i8(emb_i8, row_scale, valid, q, k):
    """Small-corpus int8 path, same quantized metric as the TPU kernel."""
    return _i8_topk_body(emb_i8, row_scale, valid, q, k)


@partial(jax.jit, static_argnames=("k", "chunk"))
def _i8_topk_chunked(emb_i8, row_scale, valid, q, k, chunk):
    """Memory-bounded int8 top-k for non-TPU backends (the Mosaic kernels
    can't lower there): same quantized metric as ``_i8_topk_body``, corpus
    streamed in row chunks via ``lax.scan`` with a running (B, k) merge —
    peak memory O(B·chunk) instead of O(B·N)."""
    n = emb_i8.shape[0]
    n_chunks = n // chunk  # chunk = _tile_n() divides capacity by construction
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    qn = q / jnp.maximum(norm, 1e-12)
    qmax = jnp.max(jnp.abs(qn), axis=-1, keepdims=True)
    qscale = jnp.maximum(qmax, 1e-12) / 127.0
    q_i8 = jnp.clip(jnp.round(qn / qscale), -127, 127).astype(jnp.float32)
    b = q.shape[0]
    init = (
        jnp.full((b, k), NEG_INF, dtype=jnp.float32),
        jnp.full((b, k), -1, dtype=jnp.int32),
    )

    def step(carry, inputs):
        run_s, run_p = carry
        idx, c_emb, c_scale, c_valid = inputs
        scores = jnp.dot(
            q_i8, c_emb.astype(jnp.float32).T,
            precision=jax.lax.Precision.HIGHEST,
        ) * c_scale[None, :]
        scores = jnp.where(c_valid[None, :], scores, NEG_INF)
        s, local = jax.lax.top_k(scores, k)
        p = (idx * chunk + local).astype(jnp.int32)
        cat_s = jnp.concatenate([run_s, s], axis=1)
        cat_p = jnp.concatenate([run_p, p], axis=1)
        ms, sel = jax.lax.top_k(cat_s, k)
        return (ms, jnp.take_along_axis(cat_p, sel, axis=1)), None

    (s, p), _ = jax.lax.scan(
        step,
        init,
        (
            jnp.arange(n_chunks, dtype=jnp.int32),
            emb_i8.reshape(n_chunks, chunk, emb_i8.shape[1]),
            row_scale.reshape(n_chunks, chunk),
            valid.reshape(n_chunks, chunk),
        ),
    )
    return s * qscale, p


@partial(jax.jit, static_argnames=("k",))
def _i8_rescore(q, emb_i8, row_scale, s, p, k):
    return _i8_rescore_body(q, emb_i8, row_scale, s, p, k)


@jax.jit
def _paste(new, old):
    return jax.lax.dynamic_update_slice(new, old, (0, 0))


@jax.jit
def _paste_1d(new, old):
    return jax.lax.dynamic_update_slice(new, old, (0,))

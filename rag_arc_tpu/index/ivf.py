"""HBM-resident IVF (inverted-file) index.

TPU replacement for FAISS ``IndexIVFFlat`` (``VectorStore_Faiss.py:110-148``,
nlist=100 default, auto-train semantics). Layout: cluster lists are a
*padded dense tensor* ``lists (nlist, Lmax, dim)`` with validity mask and
global-position tensor — no variable-length postings, so probing is pure
gather + einsum + top-k with static shapes:

  centroid scores (B, nlist) → top-nprobe clusters → gather
  (B, nprobe, Lmax, dim) → score → masked top-k over the probed slots.

Trade-off notes (measured on v5e, tools/ivf_bench.py):
- At large query batch the flat matmul amortizes corpus reads across the
  batch and is usually *faster* than IVF's per-query gathers on TPU — IVF
  wins for small-batch/low-latency traffic and for corpora whose flat
  scan exceeds the compute budget.
- Recall follows nprobe/nlist AND the data's cluster structure, exactly
  as in FAISS: on a 1M uniform-random corpus (no structure) recall@10 was
  0.04-0.11 at nprobe 8-32 — structureless corpora are the worst case and
  belong on the flat index; clustered corpora (real embedding spaces)
  behave per the nprobe curve.
- Spilled assignment (``spill=2..4``) stores each row in its ``spill``
  nearest lists. On the uniform worst case it doubles recall at equal
  nprobe (spill=4: 0.08/0.13/0.21/0.33 at nprobe 8/16/32/64,
  bench_results/ivf_spill_r04_1M_uniform.txt) but recall tracks the
  scanned fraction (nprobe·spill/nlist) almost exactly there — no
  probing scheme beats scan-fraction without structure, so recall 0.8
  would need ~80% scanned and flat is strictly better. Decision: spill
  is a recall lever for low-margin CLUSTERED corpora;
  ``index_type="auto"`` keeps choosing flat.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag_arc_tpu.ops.kmeans import kmeans
from rag_arc_tpu.ops.scoring import NEG_INF, l2_normalize
from rag_arc_tpu.parallel.mesh import CORPUS_AXIS, round_up, shard_count

logger = logging.getLogger(__name__)

SUB_BATCH = 32  # max query sub-batch per dispatch
GATHER_BUDGET_BYTES = 1 << 30  # cap on the probe gather materialization


class DeviceIVFIndex:
    def __init__(
        self,
        dim: int,
        nlist: int = 100,
        nprobe: int = 8,
        metric: str = "cosine",
        dtype=jnp.float32,
        mesh: Optional[Mesh] = None,
        axis_name: str = CORPUS_AXIS,
        spill: int = 1,
        spill_cap: float = 1.25,
    ):
        self.dim = dim
        # spilled assignment (SOAR-style multi-assign, simplified to
        # plain top-``spill`` centroids): each row is stored in its
        # ``spill`` nearest lists, so a query whose perturbation flips
        # the centroid ranking still probes a list holding the neighbor.
        # Costs ×spill list memory; search dedupes positions on device.
        # Measured (1M×768 uniform — the worst case, tools/ivf_bench.py):
        # recall@10 at nprobe 32 roughly doubles for spill=2.
        if not 1 <= int(spill) <= 4:
            raise ValueError("spill must be 1..4")
        self.spill = int(spill)
        # bulk-build bound on any ONE list's length, as a multiple of the
        # mean (spill·n/nlist). Spill assignments skew hard on structure-
        # less corpora — every row's 2nd..kth centroid crowds the same
        # "central" lists, and the padded (nlist, lmax, dim) layout pays
        # the LONGEST list's length for all lists (measured: 1M×768
        # uniform spill=4 hit lmax 7984 vs mean 1953 — a 25 GB slab that
        # can't fit one chip). Primary copies are never dropped; spill
        # copies past the cap are.
        self.spill_cap = float(spill_cap)
        self.mesh = mesh
        self.axis_name = axis_name
        if mesh is not None and "slice" in mesh.axis_names:
            raise ValueError(
                "DeviceIVFIndex shards clusters over a single-slice mesh; "
                "for DCN multi-slice use DeviceFlatIndex (hierarchical "
                "merge) or one IVF per slice"
            )
        # int8 mode stores RESIDUALS (row − assigned centroid) as per-row
        # scaled int8: 4x less HBM per row than f32 and half the probe
        # gather bytes of bf16. Residuals are small (≈ cluster radius), so
        # the quantization grid is ~5-20x finer than quantizing raw rows —
        # scoring adds the exact centroid dot back:  q·x = q·c + q·r.
        self.quantized = jnp.dtype(dtype) == jnp.int8
        if self.quantized and metric == "l2":
            raise ValueError("int8 IVF storage supports cosine/ip, not l2")
        if self.quantized and mesh is not None:
            raise NotImplementedError(
                "int8 IVF storage is single-device for now; use bf16 on meshes"
            )
        self.n_shards = shard_count(mesh, axis_name) if mesh is not None else 1
        # clusters shard across devices: each shard probes its own clusters
        # and the small candidate sets merge — so nlist pads to a multiple
        # of the shard count (padded clusters carry cluster_valid=False)
        self.nlist = nlist
        self.nlist_pad = round_up(nlist, self.n_shards)
        self.nprobe = min(nprobe, nlist)
        self.metric = metric
        self.dtype = dtype
        self.size = 0
        self.n_deleted = 0
        self.lmax = 0
        self._sharded_jit: dict = {}
        self.centroids: Optional[jax.Array] = None
        self.lists: Optional[jax.Array] = None
        self.sqnorm: Optional[jax.Array] = None
        self.valid: Optional[jax.Array] = None
        self.pos: Optional[jax.Array] = None
        self.cluster_valid: Optional[jax.Array] = None
        # host-side slot bookkeeping: per-cluster fill counts plus two flat
        # arrays mapping global position -> (cluster, slot). Arrays, not a
        # dict: at 2M rows a python dict of tuples costs ~100x the memory
        # and every lookup is interpreter work.
        self._fill = np.zeros(nlist, dtype=np.int64)
        self._pos_cluster = np.empty(0, dtype=np.int32)
        self._pos_slot = np.empty(0, dtype=np.int32)
        # spill copies 2..spill: (n, spill-1) maps, same indexing
        self._pos_xcluster = np.empty((0, self.spill - 1), dtype=np.int32)
        self._pos_xslot = np.empty((0, self.spill - 1), dtype=np.int32)
        # host mirror of tombstoned positions: keeps n_deleted exact under
        # duplicate/repeated deletes (n_active drives MMR emptiness and the
        # compaction threshold, so overcounting has behavioral fallout)
        self._deleted_pos: set = set()

    def _place(self, lists, sqnorm, valid, pos, centroids, cluster_valid):
        """Device placement: shard the cluster axis when a mesh is set."""
        arrays = dict(
            lists=jnp.asarray(lists, dtype=self.dtype),
            sqnorm=jnp.asarray(sqnorm),
            valid=jnp.asarray(valid),
            pos=jnp.asarray(pos),
            centroids=jnp.asarray(centroids),
            cluster_valid=jnp.asarray(cluster_valid),
        )
        if self.mesh is not None:
            ax = self.axis_name
            specs = dict(
                lists=P(ax, None, None), sqnorm=P(ax, None), valid=P(ax, None),
                pos=P(ax, None), centroids=P(ax, None), cluster_valid=P(ax),
            )
            arrays = {
                k: jax.device_put(v, NamedSharding(self.mesh, specs[k]))
                for k, v in arrays.items()
            }
        self.lists = arrays["lists"]
        self.sqnorm = arrays["sqnorm"]
        self.valid = arrays["valid"]
        self.pos = arrays["pos"]
        self.centroids = arrays["centroids"]
        self.cluster_valid = arrays["cluster_valid"]

    # -- build -------------------------------------------------------------

    @classmethod
    def from_vectors(
        cls,
        vectors: np.ndarray,
        nlist: int = 100,
        nprobe: int = 8,
        metric: str = "cosine",
        dtype=jnp.float32,
        train_iters: int = 10,
        seed: int = 0,
        mesh: Optional[Mesh] = None,
        spill: int = 1,
        spill_cap: float = 1.25,
    ) -> "DeviceIVFIndex":
        vectors = np.asarray(vectors, dtype=np.float32)
        index = cls(
            dim=vectors.shape[1], nlist=nlist, nprobe=nprobe, metric=metric,
            dtype=dtype, mesh=mesh, spill=spill, spill_cap=spill_cap,
        )
        index._train_and_fill(vectors, train_iters, seed)
        return index

    def _assign_spill(self, vectors: np.ndarray, chunk: int = 1 << 15) -> np.ndarray:
        """(n, spill) nearest-centroid assignments, score-descending
        (column 0 = the primary copy). On DEVICE, chunked and pipelined:
        the host numpy version was the 1M-build bottleneck (a 1M×768 @
        768×nlist matmul ≈ 1.6 TFLOP on one slow core — VERDICT r4 #7);
        on the MXU it's milliseconds, and dispatching every chunk before
        the first fetch amortizes the tunnel round trip. Exact: f32
        scores at HIGHEST precision; the primary copy (column 0) keeps
        np.argmax's lowest-index tie order. Spill-copy order on exact
        score ties may differ from the old host path — copies of one row
        are interchangeable (search dedupes by row id)."""
        c = jnp.asarray(self._centroids_np)
        c_sq = jnp.asarray((self._centroids_np * self._centroids_np).sum(1))
        pend = []
        for s0 in range(0, len(vectors), chunk):
            pend.append(
                _assign_spill_chunk(
                    jnp.asarray(vectors[s0 : s0 + chunk]), c, c_sq,
                    self.spill, self.metric == "l2",
                )
            )
        out = np.concatenate(
            [np.asarray(p) for p in jax.device_get(pend)]
        ).astype(np.int64)
        return out

    def _prep(self, vectors: np.ndarray) -> np.ndarray:
        vectors = np.asarray(vectors, dtype=np.float32)
        if self.metric == "cosine":
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12
            )
        return vectors

    @staticmethod
    def _quantize_residuals(vectors, assigned_centroids):
        """Per-row symmetric int8 over residuals (row − its centroid)."""
        from rag_arc_tpu.ops.two_level import quantize_rows

        return quantize_rows(vectors - assigned_centroids)

    @staticmethod
    def _pack_by_cluster(
        assign: np.ndarray, base_fill: np.ndarray, nlist: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized slot assignment: for each row, its cluster and the
        slot it lands in (base_fill[c] + within-batch rank). Returns
        (order, clusters_sorted, slots_sorted) where ``order`` sorts rows
        by cluster — one numpy pass instead of a per-row python loop."""
        order = np.argsort(assign, kind="stable")
        sa = assign[order].astype(np.int64)
        first = np.searchsorted(sa, np.arange(nlist))
        slots = np.arange(len(sa), dtype=np.int64) - first[sa] + base_fill[sa]
        return order, sa, slots

    def _record_locs(self, order, clusters_sorted, slots_sorted, n: int) -> None:
        """Append position->(cluster, slot) entries for n new rows.
        With spill the packed entries are copy-major (first n entries =
        primary copies, next n = second copies, …): column 0 feeds the
        primary maps, the rest the extra maps. Spill copies dropped by the
        spill_cap never appear in ``order`` and stay -1 (the delete path
        skips the sentinel)."""
        total = n * self.spill
        pcf = np.full(total, -1, dtype=np.int32)
        psf = np.full(total, -1, dtype=np.int32)
        pcf[order] = clusters_sorted.astype(np.int32)
        psf[order] = slots_sorted.astype(np.int32)
        pc = pcf.reshape(self.spill, n).T  # (n, spill)
        ps = psf.reshape(self.spill, n).T
        self._pos_cluster = np.concatenate([self._pos_cluster, pc[:, 0]])
        self._pos_slot = np.concatenate([self._pos_slot, ps[:, 0]])
        if self.spill > 1:
            self._pos_xcluster = np.concatenate(
                [self._pos_xcluster, pc[:, 1:]]
            )
            self._pos_xslot = np.concatenate([self._pos_xslot, ps[:, 1:]])

    def _train_and_fill(self, vectors: np.ndarray, train_iters: int, seed: int) -> None:
        vectors = self._prep(vectors)
        n = vectors.shape[0]
        if n < self.nlist:
            raise ValueError(
                f"IVF needs >= nlist ({self.nlist}) training vectors, got {n}"
            )
        centroids, assign = kmeans(
            vectors, self.nlist, n_iters=train_iters, seed=seed
        )
        self._centroids_np = centroids  # true-nlist copy for add() assignment
        if self.spill > 1:
            assign_mat = self._assign_spill(vectors)  # (n, spill)
        else:
            assign_mat = assign.astype(np.int64)[:, None]
        # copy-major flat layout: entry i + c·n is copy c of row i
        flat_assign = assign_mat.T.reshape(-1)
        rows_idx = np.tile(np.arange(n, dtype=np.int64), self.spill)
        order, sa, slots = self._pack_by_cluster(
            flat_assign, np.zeros(self.nlist, dtype=np.int64), self.nlist
        )
        if self.spill > 1:
            # cap per-list length at spill_cap × mean (see __init__ note).
            # _pack_by_cluster's stable sort over the copy-major layout
            # gives copy-0 (primary) entries the lowest slots in every
            # list, so dropping slots ≥ cap can only shed SPILL copies —
            # unless a list holds > cap primaries, which the copy guard
            # keeps (every row must stay findable through its primary).
            cap = max(
                int(np.ceil(self.spill * n / self.nlist * self.spill_cap)), 8
            )
            keep = (slots < cap) | (order < n)  # flat entry < n == copy 0
            if not keep.all():
                order, sa, slots = order[keep], sa[keep], slots[keep]
        # per-list fill = max kept slot + 1 (a primary kept above the cap
        # must not collide with later adds), and lmax from kept slots with
        # 1.25x add headroom — adds past it grow lmax on device. (The 2x
        # this used to reserve made a spill=4 1M bulk build upload a 36 GB
        # host array (OOM on a 16 GB chip) for rows that never existed.)
        fill = np.zeros(self.nlist, dtype=np.int64)
        np.maximum.at(fill, sa, slots + 1)
        self.lmax = round_up(max(int(slots.max()) + 1, 8) * 5 // 4, 8)
        # allocate in the DEVICE dtype: jnp.asarray casts after upload, so a
        # f32 staging array doubles (bf16) the transfer + peak HBM for the
        # argument buffer
        lists = np.zeros(
            (self.nlist_pad, self.lmax, self.dim), dtype=np.dtype(self.dtype)
        )
        sqnorm = np.zeros((self.nlist_pad, self.lmax), dtype=np.float32)
        valid = np.zeros((self.nlist_pad, self.lmax), dtype=bool)
        pos = np.full((self.nlist_pad, self.lmax), -1, dtype=np.int32)
        sorted_vecs = vectors[rows_idx[order]]
        if self.quantized:
            codes, scales = self._quantize_residuals(sorted_vecs, centroids[sa])
            lists[sa, slots] = codes  # int8 values survive the _place cast
            sqnorm[sa, slots] = scales
        else:
            lists[sa, slots] = sorted_vecs
            sqnorm[sa, slots] = (sorted_vecs * sorted_vecs).sum(axis=1)
        valid[sa, slots] = True
        pos[sa, slots] = rows_idx[order]
        self._fill = fill
        self._pos_cluster = np.empty(0, dtype=np.int32)
        self._pos_slot = np.empty(0, dtype=np.int32)
        self._pos_xcluster = np.empty((0, self.spill - 1), dtype=np.int32)
        self._pos_xslot = np.empty((0, self.spill - 1), dtype=np.int32)
        self._record_locs(order, sa, slots, n)
        centroids_pad = np.zeros((self.nlist_pad, self.dim), dtype=np.float32)
        centroids_pad[: self.nlist] = centroids
        cluster_valid = np.zeros(self.nlist_pad, dtype=bool)
        cluster_valid[: self.nlist] = True
        self._place(lists, sqnorm, valid, pos, centroids_pad, cluster_valid)
        self.size = n

    # -- mutation ------------------------------------------------------------

    def add(self, vectors: np.ndarray) -> np.ndarray:
        """Append rows. One jitted device scatter per call (buffers donated,
        no host mirror, no full-tensor round trip) — the r1 implementation
        ``device_get``-ed every tensor and looped row-by-row in python,
        which is unusable at the 2M-row scale this index targets."""
        if self.centroids is None:
            raise RuntimeError("IVF index is untrained; build with from_vectors")
        vectors = self._prep(vectors)
        n = vectors.shape[0]
        if n == 0:
            return np.empty((0,), dtype=np.int64)
        c = self._centroids_np
        assign_mat = self._assign_spill(vectors)  # (n, spill)
        flat_assign = assign_mat.T.reshape(-1)
        rows_idx = np.tile(np.arange(n, dtype=np.int64), self.spill)
        order, sa, slots = self._pack_by_cluster(
            flat_assign, self._fill, self.nlist
        )
        if self.spill > 1:
            # same per-list cap as the bulk build — without it, compact()
            # (which re-inserts everything through add) regrows lmax back
            # to the uncapped skewed worst case the cap exists to prevent.
            # Primaries (flat entry < n) are always kept.
            cap = max(
                int(
                    np.ceil(
                        self.spill * (self.size + n) / self.nlist
                        * self.spill_cap
                    )
                ),
                8,
            )
            keep = (slots < cap) | (order < n)
            if not keep.all():
                order, sa, slots = order[keep], sa[keep], slots[keep]
        while int(slots.max()) + 1 > self.lmax:
            self._grow_lmax()
        positions = np.arange(self.size, self.size + n, dtype=np.int64)
        sorted_vecs = vectors[rows_idx[order]]
        if self.quantized:
            rows, aux = self._quantize_residuals(sorted_vecs, c[sa])
        else:
            rows = sorted_vecs
            aux = (sorted_vecs * sorted_vecs).sum(axis=1).astype(np.float32)
        self.lists, self.sqnorm, self.valid, self.pos = _scatter_rows(
            self.lists,
            self.sqnorm,
            self.valid,
            self.pos,
            jnp.asarray(rows, dtype=self.dtype),
            jnp.asarray(aux),
            jnp.asarray(sa, dtype=jnp.int32),
            jnp.asarray(slots, dtype=jnp.int32),
            jnp.asarray(positions[rows_idx[order]], dtype=jnp.int32),
        )
        self._record_locs(order, sa, slots, n)
        np.maximum.at(self._fill, sa, slots + 1)
        self.size += n
        return positions

    def _grow_lmax(self) -> None:
        new_lmax = self.lmax * 2
        logger.info("growing IVF list capacity %d → %d", self.lmax, new_lmax)
        pad = new_lmax - self.lmax
        self.lists, self.sqnorm, self.valid, self.pos = _pad_slots(
            self.lists, self.sqnorm, self.valid, self.pos, pad
        )
        self.lmax = new_lmax
        # closures compiled for the old lists shape can never be hit again
        self._sharded_jit.clear()

    def compact(self) -> Dict[int, int]:
        """Drop tombstoned rows by re-packing active vectors into fresh
        lists (keeping the trained centroids); returns old→new position
        mapping for docstore remap. One device_get of the live tensors
        (explicit maintenance operation), vectorized re-pack."""
        lists = np.asarray(jax.device_get(self.lists), dtype=np.float32)
        valid = np.asarray(jax.device_get(self.valid))
        pos = np.asarray(jax.device_get(self.pos))
        mask = valid & (pos >= 0)
        cl, sl = np.nonzero(mask)
        old_pos = pos[cl, sl]
        order = np.argsort(old_pos, kind="stable")
        old_sorted = old_pos[order]
        if self.spill > 1:
            # every live row appears once per spill copy — keep ONE
            # (re-add below re-spills it)
            keep = np.ones(len(old_sorted), dtype=bool)
            keep[1:] = old_sorted[1:] != old_sorted[:-1]
            order = order[keep]
            old_sorted = old_sorted[keep]
        vectors = lists[cl[order], sl[order]]
        if self.quantized:
            # reconstruct rows: centroid + dequantized residual (re-add
            # below re-quantizes against the same centroids)
            scales = np.asarray(jax.device_get(self.sqnorm))[cl[order], sl[order]]
            vectors = self._centroids_np[cl[order]] + vectors * scales[:, None]
        mapping = {int(old): new for new, old in enumerate(old_sorted)}
        # reuse the trained centroids: reset bookkeeping and re-add (add
        # assigns by nearest centroid, which matches the original layout)
        self.size = 0
        self.n_deleted = 0
        self._deleted_pos.clear()
        self._fill = np.zeros(self.nlist, dtype=np.int64)
        self._pos_cluster = np.empty(0, dtype=np.int32)
        self._pos_slot = np.empty(0, dtype=np.int32)
        self._pos_xcluster = np.empty((0, self.spill - 1), dtype=np.int32)
        self._pos_xslot = np.empty((0, self.spill - 1), dtype=np.int32)
        shape = (self.nlist_pad, self.lmax)
        centroids = np.asarray(jax.device_get(self.centroids))
        cluster_valid = np.asarray(jax.device_get(self.cluster_valid))
        self._place(
            np.zeros((*shape, self.dim), dtype=np.dtype(self.dtype)),
            np.zeros(shape, dtype=np.float32),
            np.zeros(shape, dtype=bool),
            np.full(shape, -1, dtype=np.int32),
            centroids,
            cluster_valid,
        )
        if len(vectors):
            self.add(vectors)
        return mapping

    def mark_deleted(self, positions: np.ndarray) -> None:
        positions = np.asarray(positions, dtype=np.int64)
        positions = np.unique(positions[(positions >= 0) & (positions < self.size)])
        positions = np.asarray(
            [p for p in positions if int(p) not in self._deleted_pos],
            dtype=positions.dtype,
        )
        if positions.size == 0:
            return
        self._deleted_pos.update(int(p) for p in positions)
        clusters = self._pos_cluster[positions]
        slots = self._pos_slot[positions]
        if self.spill > 1:
            # every spill copy dies with the row, or deleted docs stay
            # findable through their secondary lists
            clusters = np.concatenate(
                [clusters, self._pos_xcluster[positions].reshape(-1)]
            )
            slots = np.concatenate(
                [slots, self._pos_xslot[positions].reshape(-1)]
            )
            live = clusters >= 0  # -1 = spill copy dropped by spill_cap
            clusters, slots = clusters[live], slots[live]
        self.valid = self.valid.at[jnp.asarray(clusters), jnp.asarray(slots)].set(
            False
        )
        self.n_deleted += int(positions.size)

    # -- search --------------------------------------------------------------

    def search(
        self, queries: np.ndarray, k: int, nprobe: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self.centroids is None or self.size == 0:
            b = np.atleast_2d(queries).shape[0]
            return (
                np.full((b, k), -np.inf, dtype=np.float32),
                np.full((b, k), -1, dtype=np.int64),
            )
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if queries.shape[1] != self.dim:
            raise ValueError(f"query dim {queries.shape[1]} != {self.dim}")
        if k <= 0:
            raise ValueError("k must be positive")
        nprobe = min(nprobe or self.nprobe, self.nlist)
        k_eff = min(k, nprobe * self.lmax)
        # the probe gathers (sub, nprobe, Lmax, dim) per dispatch; bound
        # that materialization so large nprobe x Lmax doesn't OOM HBM
        per_q = nprobe * self.lmax * self.dim * jnp.dtype(self.dtype).itemsize
        sub_batch = max(1, min(SUB_BATCH, GATHER_BUDGET_BYTES // max(per_q, 1)))
        sub_batch = 1 << (sub_batch.bit_length() - 1)  # pow2: stable compiles
        all_scores, all_pos = [], []
        for start in range(0, queries.shape[0], sub_batch):
            sub = queries[start : start + sub_batch]
            pad = sub_batch - sub.shape[0]
            if pad:
                sub = np.pad(sub, ((0, pad), (0, 0)))
            if self.mesh is not None:
                s, p = self._search_sharded(jnp.asarray(sub), k_eff, nprobe)
            else:
                s, p = _ivf_search(
                    self.centroids,
                    self.lists,
                    self.sqnorm,
                    self.valid,
                    self.pos,
                    self.cluster_valid,
                    jnp.asarray(sub),
                    k_eff,
                    nprobe,
                    self.metric,
                    self.spill if self.spill > 1 else 0,
                )
            s, p = jax.device_get((s, p))
            s = np.asarray(s)
            p = np.asarray(p).astype(np.int64)
            if pad:
                s, p = s[:-pad], p[:-pad]
            all_scores.append(s)
            all_pos.append(p)
        scores = np.concatenate(all_scores)
        positions = np.concatenate(all_pos)
        positions = np.where(np.isneginf(scores), -1, positions)
        if k_eff < k:
            scores = np.pad(
                scores, ((0, 0), (0, k - k_eff)), constant_values=-np.inf
            )
            positions = np.pad(
                positions, ((0, 0), (0, k - k_eff)), constant_values=-1
            )
        return scores, positions

    def _search_sharded(self, q: jax.Array, k: int, nprobe: int):
        """Each shard probes its own clusters (top-nprobe *per shard* —
        strictly more clusters than single-device probing, so recall is ≥)
        and the per-shard candidate sets merge, like the flat index."""
        mesh, axis = self.mesh, self.axis_name
        metric = self.metric
        nlist_local = self.nlist_pad // self.n_shards
        nprobe_local = min(nprobe, nlist_local)
        k_local = min(k, nprobe_local * self.lmax)

        # cache the jitted shard_map closure per (shapes, k, nprobe):
        # rebuilding it per call defeats the trace cache (measured on the
        # flat index: executable reload cost 20x the kernel on a 1-device
        # chip mesh)
        key = (q.shape, jnp.dtype(q.dtype).name, k, nprobe,
               self.lists.shape, self.nlist_pad, self.spill)
        run = self._sharded_jit.get(key)
        if run is None:
            # spill copies of one row can all land in the SAME shard's
            # probed clusters; without per-shard dedupe they occupy several
            # of the k_local slots and evict unique candidates before the
            # merge-level dedupe ever sees them (reproduced: exhaustive
            # probe at spill 2-3 returned wrong top-10 for 2-3/64 queries
            # vs the flat oracle on an 8-device mesh). Mirror the
            # single-device path: dedupe inside the shard.
            spill = self.spill

            def local_fn(centroids, lists, sqnorm, valid, pos, cluster_valid, q):
                return _ivf_search_body(
                    centroids, lists, sqnorm, valid, pos, cluster_valid, q,
                    k_local, nprobe_local, metric,
                    dedupe=spill if spill > 1 else 0,
                )

            run = jax.jit(
                jax.shard_map(
                    lambda c, l, sq, v, p, cv, q: tuple(
                        x[None] for x in local_fn(c, l, sq, v, p, cv, q)
                    ),
                    mesh=mesh,
                    in_specs=(
                        P(axis, None), P(axis, None, None), P(axis, None),
                        P(axis, None), P(axis, None), P(axis), P(),
                    ),
                    out_specs=(P(axis, None, None), P(axis, None, None)),
                    check_vma=False,
                ),
                static_argnums=(),
            )
            self._sharded_jit[key] = run
        s_all, p_all = run(
            self.centroids, self.lists, self.sqnorm, self.valid, self.pos,
            self.cluster_valid, q,
        )
        b = q.shape[0]
        s_flat = jnp.transpose(s_all, (1, 0, 2)).reshape(b, -1)
        p_flat = jnp.transpose(p_all, (1, 0, 2)).reshape(b, -1)
        if self.spill > 1:
            # spill copies can land on different shards, so duplicates
            # survive the per-shard top-k — dedupe at the merge. Window
            # must be spill·k: each position appears ≤ spill times, so a
            # 2k window holds ≥ k uniques only for spill ≤ 2 (at spill 3-4
            # it returned FEWER than k rows on dense-duplicate top ranks).
            kk = min(self.spill * k, s_flat.shape[1])
            s, sel = jax.lax.top_k(s_flat, kk)
            return _dedupe_candidates(
                s, jnp.take_along_axis(p_flat, sel, axis=-1), k
            )
        s, sel = jax.lax.top_k(s_flat, min(k, s_flat.shape[1]))
        return s, jnp.take_along_axis(p_flat, sel, axis=-1)

    def take(self, positions: np.ndarray) -> np.ndarray:
        positions = np.asarray(positions, dtype=np.int64)
        clusters = jnp.asarray(self._pos_cluster[positions])
        slots = jnp.asarray(self._pos_slot[positions])
        out = np.asarray(
            jax.device_get(self.lists[clusters, slots]), dtype=np.float32
        )
        if self.quantized:
            scales = np.asarray(jax.device_get(self.sqnorm[clusters, slots]))
            out = self._centroids_np[np.asarray(clusters)] + out * scales[:, None]
        return out

    # -- introspection ----------------------------------------------------------

    @property
    def n_active(self) -> int:
        return self.size - self.n_deleted

    def stats(self) -> Dict[str, object]:
        fill = self._fill
        return {
            "kind": "ivf",
            "dim": self.dim,
            "metric": self.metric,
            "nlist": self.nlist,
            "nprobe": self.nprobe,
            "spill": self.spill,
            "lmax": self.lmax,
            "size": self.size,
            "active": self.n_active,
            "deleted": self.n_deleted,
            "list_fill_mean": float(fill.mean()) if self.size else 0.0,
            "list_fill_max": int(fill.max()) if self.size else 0,
            "dtype": str(jnp.dtype(self.dtype)),
            "quantized": self.quantized,
            "hbm_bytes": 0
            if self.lists is None
            else self.nlist_pad * self.lmax * self.dim * jnp.dtype(self.dtype).itemsize,
            "shards": self.n_shards,
        }


@partial(jax.jit, static_argnames=("spill", "l2"))
def _assign_spill_chunk(v, c, c_sq, spill, l2):
    """Top-``spill`` centroid assignment for one row chunk, on device."""
    scores = jnp.dot(
        v, c.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if l2:
        scores = 2.0 * scores - c_sq[None, :]
    _, idx = jax.lax.top_k(scores, spill)
    return idx.astype(jnp.int32)


@partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _scatter_rows(lists, sqnorm, valid, pos, vecs, vec_sq, clusters, slots, positions):
    """Scatter n new rows into their (cluster, slot) cells in place.

    Donated buffers: XLA updates the sharded tensors without a second copy;
    with a mesh the scatter partitions along the cluster axis (each shard
    applies the updates that land in its range)."""
    lists = lists.at[clusters, slots].set(vecs.astype(lists.dtype))
    sqnorm = sqnorm.at[clusters, slots].set(vec_sq)
    valid = valid.at[clusters, slots].set(True)
    pos = pos.at[clusters, slots].set(positions)
    return lists, sqnorm, valid, pos


@partial(jax.jit, static_argnames=("pad",))
def _pad_slots(lists, sqnorm, valid, pos, pad):
    """Grow the slot axis by ``pad`` on device (sharding preserved — the
    cluster axis is untouched; output shapes differ so donation can't
    alias, inputs are freed after the copy)."""
    return (
        jnp.pad(lists, ((0, 0), (0, pad), (0, 0))),
        jnp.pad(sqnorm, ((0, 0), (0, pad))),
        jnp.pad(valid, ((0, 0), (0, pad))),
        jnp.pad(pos, ((0, 0), (0, pad)), constant_values=-1),
    )


def _dedupe_candidates(s, p, k):
    """Top-k over score-desc candidates (B, K) with duplicate POSITIONS
    masked (spilled assignment stores a row in several lists, so the same
    position can reach the candidate set once per probed copy). An entry
    is a duplicate when an earlier (higher-ranked) entry carries the same
    non-negative position; K² compare at K ≤ spill·k is trivial. Exact
    when callers pass a spill·k window: duplicates come at most ``spill``
    per position, so spill·k slots hold ≥ k unique positions."""
    kk = s.shape[1]
    tri = jnp.tril(jnp.ones((kk, kk), dtype=bool), -1)  # [j, l] = l < j
    dup = (p[:, :, None] == p[:, None, :]) & tri[None]
    isdup = jnp.any(dup, axis=2) & (p >= 0)
    s = jnp.where(isdup, NEG_INF, s)
    s2, sel = jax.lax.top_k(s, min(k, kk))
    return s2, jnp.take_along_axis(p, sel, axis=1)


@partial(jax.jit, static_argnames=("k", "nprobe", "metric", "dedupe"))
def _ivf_search(
    centroids, lists, sqnorm, valid, pos, cluster_valid, q, k, nprobe, metric,
    dedupe=0,  # spill factor; 0 = no duplicate positions possible
):
    return _ivf_search_body(
        centroids, lists, sqnorm, valid, pos, cluster_valid, q, k, nprobe,
        metric, dedupe,
    )


def _ivf_search_body(
    centroids, lists, sqnorm, valid, pos, cluster_valid, q, k, nprobe, metric,
    dedupe=0,  # spill factor; 0 = no duplicate positions possible
):
    quantized = lists.dtype == jnp.int8
    if metric == "cosine":
        q = l2_normalize(q)
    # quantized mode reuses q·c as the DOMINANT score term, so it must be
    # a true f32 product — TPU default precision runs bf16 passes, which
    # would swamp the fine residual grid (CLAUDE.md precision rule). The
    # unquantized path only ranks clusters with it; default is fine there.
    cross = jnp.dot(
        q,
        centroids.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if lists.dtype == jnp.int8 else None,
    )
    if metric == "l2":
        c_sq = jnp.sum(centroids * centroids, axis=1)
        c_scores = 2.0 * cross - c_sq[None, :]
    else:
        c_scores = cross
    c_scores = jnp.where(cluster_valid[None, :], c_scores, NEG_INF)
    _, probe = jax.lax.top_k(c_scores, nprobe)  # (B, nprobe)

    # probe gather as vmapped dynamic_slice over the FLATTENED list buffer
    # (the BM25 tail-slab pattern): `lists[probe]` lowers to an XLA gather
    # that stages a full chunked COPY of the operand (measured: 7 live
    # 1.12 GB kLoop temps = 7.9 GB at 1M×768 spill=4 — compile OOM on top
    # of the 9.6 GB resident array). dynamic_slice reads the rows in
    # place; the reshape is layout-free.
    b0, lmax, d = lists.shape[0], lists.shape[1], lists.shape[2]
    flat_rows = lists.reshape(b0 * lmax, d)

    def _grab(c):
        return jax.lax.dynamic_slice(flat_rows, (c * lmax, 0), (lmax, d))

    sub_lists = jax.vmap(_grab)(probe.reshape(-1)).reshape(
        probe.shape[0], probe.shape[1], lmax, d
    )  # (B, nprobe, Lmax, d)
    sub_valid = valid[probe]
    sub_pos = pos[probe]
    if quantized:
        # rows are int8 residuals (r = x − c, per-row scale in sqnorm):
        # q·x = q·c (exact, from the centroid pass) + scale · q·r.
        # bf16 is exact on the ±127 codes; q loses <0.4% there, applied
        # to the *small* residual term only.
        resid = jnp.einsum(
            "bd,bpld->bpl",
            q.astype(jnp.bfloat16),
            sub_lists.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        c_probe = jnp.take_along_axis(cross, probe, axis=1)  # (B, nprobe)
        scores = c_probe[:, :, None] + resid * sqnorm[probe]
    else:
        scores = jnp.einsum(
            "bd,bpld->bpl",
            q.astype(lists.dtype),
            sub_lists,
            preferred_element_type=jnp.float32,
        )
        if metric == "l2":
            sub_sq = sqnorm[probe]
            q_sq = jnp.sum(q * q, axis=1)
            scores = -(q_sq[:, None, None] - 2.0 * scores + sub_sq)
    scores = jnp.where(sub_valid, scores, NEG_INF)
    b = q.shape[0]
    flat = scores.reshape(b, -1)
    if dedupe:
        # dedupe carries the SPILL FACTOR: each position appears at most
        # `dedupe` times among the candidates, so a dedupe·k window is the
        # smallest that guarantees ≥ k unique survivors (a fixed 2k window
        # returned fewer than k rows at spill 3-4).
        kk = min(int(dedupe) * k, flat.shape[1])
        s, idx = jax.lax.top_k(flat, kk)
        p = jnp.take_along_axis(sub_pos.reshape(b, -1), idx, axis=-1)
        return _dedupe_candidates(s, p, k)
    s, idx = jax.lax.top_k(flat, k)
    p = jnp.take_along_axis(sub_pos.reshape(b, -1), idx, axis=-1)
    return s, p

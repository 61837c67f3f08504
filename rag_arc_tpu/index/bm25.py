"""Device-resident BM25 index.

Host side builds vocabulary, doc frequencies and the document-major term
arrays (see ``rag_arc_tpu.ops.bm25``); device side answers batched queries
with one fused scan + top-k. With a mesh, rows shard across chips exactly
like the dense index (per-shard top-k inside ``shard_map``, ICI merge).

Mutation model matches the reference's (``bm25.py:390-399``): BM25's global
statistics (idf, avgdl) make incremental updates incorrect, so adds and
deletes rebuild — but a rebuild here is re-tokenization + one device_put,
not a Python re-index.
"""

from __future__ import annotations

import math
import threading
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from rag_arc_tpu.ops.bm25 import (
    DOC_PAD,
    QUERY_PAD,
    bm25_scores_kernel,
    bm25_topk,
    compute_doc_weights,
    compute_idf,
)
from rag_arc_tpu.parallel.mesh import CORPUS_AXIS, corpus_sharding, round_up, row_sharding, shard_count
from rag_arc_tpu.utils.locks import RWLock

Tokenizer = Callable[[str], List[str]]


@partial(jax.jit, donate_argnums=(0,))
def _paste_head_rows(buf, rows_f32, start):
    """Write a block of head-matrix rows into the device buffer in place
    (donated) — the chunked hybrid build's way of materializing the
    (H, N_pad) head without ever holding it fully on host."""
    return jax.lax.dynamic_update_slice(
        buf, rows_f32.astype(buf.dtype), (start, jnp.int32(0))
    )


class PendingSearch:
    """Handle for an in-flight query batch. ``result()`` blocks until the
    (scores, positions) arrays are on the host. Device-backed batches
    (hybrid / dense kernel) are ASYNC until then, so a caller streaming
    batches can overlap the next batch's host encode + upload with the
    current batch's device program — through a high-latency link that
    turns serial RTT-bound latency into device-bound throughput."""

    __slots__ = ("_fetch", "_out", "_prime")

    def __init__(
        self,
        fetch: Callable[[], Tuple[np.ndarray, np.ndarray]],
        prime: Optional[Callable[[], None]] = None,
    ):
        self._fetch = fetch
        self._prime = prime
        self._out: Optional[Tuple[np.ndarray, np.ndarray]] = None

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._out is None:
            self._out = self._fetch()
        return self._out

    def prime(self) -> None:
        """Force any lazy device launch NOW (without blocking on results)
        — the coalescer merges queued queries into one kernel at first
        demand; a streaming driver primes every handle before its first
        ``result()`` so all launches land in the active TransferPool and
        the whole stream reads back in one round trip."""
        if self._out is None and self._prime is not None:
            self._prime()


class DeviceBM25Index:
    """Immutable-once-built BM25 scoring structure.

    Two scoring backends behind one interface:

    - ``device``: the dense document-major kernel (``ops/bm25.py``) —
      shards across chips with the mesh; pays O(N·Dmax) VPU work per
      query term, so it scales with corpus size regardless of term
      selectivity, and truncates queries to ``qmax`` unique terms.
    - ``host``: term-major CSR postings in C++ (``native/bm25host.cpp``) —
      term-at-a-time accumulation touches only ~df(t) entries per term
      (the classic inverted-index engine the reference delegated to
      rank_bm25/tantivy), no qmax truncation, threads across the batch.

    ``backend="auto"`` resolves to host on a single chip and device when a
    mesh shards the corpus. Measured at 1M docs, B=32 (tools/bm25_bench.py,
    v5e + 16-core host): host CSR answers selective queries (tail terms,
    df << 1%) in 1.4 ms/batch (22.4k QPS) — 97x the device kernel's 135 ms,
    which is selectivity-blind. Only degenerate all-stopword queries favor
    the device path (376 ms host vs 136 ms device); real queries are
    selective, so host wins the single-chip default and the device kernel
    remains the mesh-sharded option.
    """

    def __init__(
        self,
        k1: float = 1.5,
        b: float = 0.75,
        epsilon: float = 0.25,
        qmax: int = 32,
        mesh: Optional[Mesh] = None,
        axis_name: str = CORPUS_AXIS,
        backend: str = "auto",
        head_terms: int = 256,
        head_dtype=jnp.float32,
        host_budget: Optional[int] = None,
    ):
        if backend not in ("auto", "device", "host", "hybrid"):
            raise ValueError(
                f"backend must be auto/device/host/hybrid, got {backend!r}"
            )
        self.k1, self.b, self.epsilon = k1, b, epsilon
        self.qmax = qmax
        # hybrid backend (VERDICT r2 #8): the H highest-df ("head") terms
        # score ALL docs via one dense (B,H)x(H,N) MXU matmul; every
        # other ("tail") term ships its postings slice to the device as
        # pre-gathered (doc id, weight) candidates. Selective queries
        # still dispatch to the host CSR scorer; queries whose total
        # postings volume exceeds host_budget go to the device, where
        # head cost is O(B·H·N /MXU) instead of the host's O(Σ df).
        self.head_terms = int(head_terms)
        self.head_dtype = head_dtype
        # byte cap on the dense (H, N_pad) head matrix; _build_hybrid
        # halves H until it fits (10M docs x 256 head terms x f32 would
        # be ~10 GB of HBM before the score array and tail postings)
        self.HEAD_BYTES_BUDGET = 6 << 30
        # host-RAM bound per build chunk: the head materializes on device
        # in row blocks of ~this many f32 bytes instead of one full-size
        # host array (10 GB at 10M docs)
        self.HEAD_CHUNK_BYTES = 1 << 28
        # max padded candidate-window (slab slots per query) the tail-only
        # sort/segment-sum kernel accepts; wider batches fall back to the
        # dense hybrid kernel (sorting very wide windows stops paying)
        self.TAIL_ONLY_WINDOW = 1 << 16
        # per-QUERY router boundary (Σ df of the query's indexed terms):
        # ≤ budget → host CSR scorer, > budget → device hybrid kernel.
        # None = auto-scale with the corpus: the host scorer costs
        # ~10 ns/posting on this box (measured: 2.4M postings = 24 ms)
        # while the device's marginal per-query cost scales with N (the
        # (B, N) score array + head-matrix read) — ~0.34 ms at 1M,
        # ~3 ms at 10M per query inside a B=32 batch. Equal-cost Σ df is
        # therefore ≈ N/32; n_docs//16 biases toward the host because
        # the device program also carries a per-dispatch fixed cost.
        # A fixed budget can't serve both 1M and 10M: the old 1<<18
        # sent 350k-posting selective queries to the device at 10M
        # (405 QPS where the host does 2,824) and 150k-posting queries
        # to the host at 1M (2.6 ms each where the device batch does
        # 0.34 ms marginal).
        self.host_budget = None if host_budget is None else int(host_budget)
        self._w_head = None       # (H, N_pad) device
        self._hvalid = None       # (N_pad,) device
        self._head_slot = None    # (V,) int32: term id -> head slot or -1
        self._tail_docs = None    # flat int32 postings (term-major)
        self._tail_w = None       # flat f32 weights
        self._tail_off = None     # (V+1,) int64
        self._df = None           # (V,) int64
        self.mesh = mesh
        self.axis_name = axis_name
        if mesh is not None and "slice" in mesh.axis_names:
            raise ValueError(
                "DeviceBM25Index shards rows over a single-slice mesh; for "
                "DCN multi-slice prefer the host backend per slice"
            )
        self.n_shards = shard_count(mesh, axis_name) if mesh is not None else 1
        if backend == "hybrid" and mesh is not None:
            raise ValueError("hybrid backend is single-chip; meshes use device")
        self.backend = backend
        self._use_host = backend in ("host", "hybrid") or (
            backend == "auto" and mesh is None
        )
        # device-query coalescer: the hybrid kernel's cost is N-bound
        # (head-matrix read + (B, N) score ops), nearly independent of B
        # (measured 1M: B=1 and B=32 both ~11-14 ms) — so a mixed stream
        # whose per-batch device subsets are small pays the full kernel
        # per batch. Device-bound queries therefore QUEUE at dispatch and
        # flush as ONE merged kernel at first fetch (or in chunks of
        # DEV_COALESCE_MAX). A lone query's fetch flushes immediately, so
        # single-request latency is unchanged.
        self._dev_queue: List[dict] = []
        self._dev_qlock = threading.Lock()    # guards the list ONLY
        self._dev_flush_mutex = threading.Lock()  # serializes flushes
        self.DEV_COALESCE_MAX = 64
        self.n_docs = 0
        self.vocab: Dict[str, int] = {}
        self.avgdl = 0.0
        self.doc_terms: Optional[jax.Array] = None
        self.doc_weights: Optional[jax.Array] = None
        self.valid: Optional[jax.Array] = None
        self._host_handle = None
        self._host_lib = None
        self._sharded_jit: Dict = {}
        # rebuilds free the C++ postings handle and swap the device/hybrid
        # arrays; searches read them — RW lock so a rebuild never lands
        # under an in-flight search (use-after-free on the host path)
        self._rw = RWLock()

    def __del__(self):
        self._free_host()

    def _free_host(self) -> None:
        if getattr(self, "_host_handle", None):
            self._host_lib.bm25host_free(self._host_handle)
            self._host_handle = None

    def _build_host(
        self,
        row_offsets: np.ndarray,
        term_ids: np.ndarray,
        tfs: np.ndarray,
        doc_len: np.ndarray,
        df: np.ndarray,
    ) -> None:
        import ctypes

        from rag_arc_tpu.native.build import load_library

        lib = load_library("bm25host")
        lib.bm25host_build.restype = ctypes.c_void_p
        lib.bm25host_build.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ]
        lib.bm25host_free.argtypes = [ctypes.c_void_p]
        lib.bm25host_scores.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.bm25host_search.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
        ]
        self._free_host()
        row_offsets = np.ascontiguousarray(row_offsets, dtype=np.int64)
        term_ids = np.ascontiguousarray(term_ids, dtype=np.int32)
        tfs = np.ascontiguousarray(tfs, dtype=np.float32)
        doc_len = np.ascontiguousarray(doc_len, dtype=np.int64)
        df = np.ascontiguousarray(df, dtype=np.int64)
        self._host_lib = lib
        self._host_handle = lib.bm25host_build(
            row_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            term_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tfs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            doc_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            df.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.n_docs,
            # id-space size, NOT len(vocab): build_from_csr accepts partial
            # vocab dicts; a too-small size is an out-of-bounds write in
            # the C++ postings build (observed segfault)
            len(df),
            self.k1,
            self.b,
            self.epsilon,
        )

    def _build_hybrid(
        self,
        row_offsets: np.ndarray,
        term_ids: np.ndarray,
        tfs: np.ndarray,
        doc_len: np.ndarray,
        df: np.ndarray,
    ) -> None:
        """Head-dense / tail-sparse structures from the CSR arrays."""
        # size the id space from df, not len(vocab): build_from_csr accepts
        # sparse/partial vocab dicts whose max id exceeds the entry count
        n, v = self.n_docs, len(df)
        idf = compute_idf(df.astype(np.float64), n, self.epsilon)
        counts = np.diff(row_offsets)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        norm = self.k1 * (
            1.0 - self.b + self.b * doc_len[doc_of].astype(np.float64)
            / max(self.avgdl, 1e-9)
        )
        w = (
            idf[term_ids] * tfs * (self.k1 + 1.0) / (tfs + norm)
        ).astype(np.float32)

        # head = highest-df terms worth densifying (df >= n/256 floor)
        df_min = max(4, n // 256)
        order = np.argsort(-df, kind="stable")
        head = order[: self.head_terms]
        head = head[df[head] >= df_min]
        h = len(head)
        # 1024-multiple pad: lets the kernel's coarse top-k reduce clean
        # 512/256-column groups (ops/bm25.py::_coarse_topk); pad columns
        # are hvalid=False -> -inf, never selected
        n_pad = round_up(max(n, 1024), 1024)
        # cap the dense head by BYTES, not term count: at 10M docs a
        # 256-row f32 head is ~10 GB of HBM — more than the score array,
        # tail postings, and workspace leave free. Shrinking H moves the
        # overflow terms to the tail postings (slower for those terms,
        # but the index fits)
        itemsize = jnp.dtype(self.head_dtype).itemsize
        while h > 1 and h * n_pad * itemsize > self.HEAD_BYTES_BUDGET:
            h //= 2
        if h < len(head):
            import warnings

            warnings.warn(
                f"hybrid head shrunk {len(head)} -> {h} terms to fit the "
                f"{self.HEAD_BYTES_BUDGET >> 30} GiB head budget at "
                f"{n} docs (dtype {jnp.dtype(self.head_dtype).name}); "
                "overflow terms score via tail postings"
            )
            head = head[:h]
        head_slot = np.full(v, -1, dtype=np.int32)
        head_slot[head] = np.arange(h, dtype=np.int32)
        is_head = head_slot[term_ids] >= 0
        slots = head_slot[term_ids[is_head]]
        docs_h = doc_of[is_head]
        vals_h = w[is_head]
        hvalid = np.zeros(n_pad, dtype=bool)
        hvalid[:n] = True

        # materialize the (H, N_pad) head on DEVICE in row chunks: one
        # full-size f32 host array would be another ~10 GB of host RAM at
        # 10M docs on top of the device copy
        row_bytes = n_pad * 4
        chunk_rows = max(1, min(max(h, 1), int(self.HEAD_CHUNK_BYTES // row_bytes)))
        if chunk_rows >= max(h, 1):
            w_head = np.zeros((max(h, 1), n_pad), dtype=np.float32)
            w_head[slots, docs_h] = vals_h
            w_head_dev = jnp.asarray(w_head, dtype=self.head_dtype)
        else:
            by_slot = np.argsort(slots, kind="stable")
            slots_s = slots[by_slot]
            docs_s = docs_h[by_slot]
            vals_s = vals_h[by_slot]
            w_head_dev = jnp.zeros((h, n_pad), dtype=self.head_dtype)
            for s0 in range(0, h, chunk_rows):
                e0 = min(s0 + chunk_rows, h)
                lo, hi_ = np.searchsorted(slots_s, [s0, e0])
                arr = np.zeros((e0 - s0, n_pad), dtype=np.float32)
                arr[slots_s[lo:hi_] - s0, docs_s[lo:hi_]] = vals_s[lo:hi_]
                w_head_dev = _paste_head_rows(
                    w_head_dev, jnp.asarray(arr), jnp.int32(s0)
                )

        # tail postings, term-major, RESIDENT IN HBM — query time ships
        # only (start, len, count) per tail term; the device gathers the
        # postings slices itself (O(B·T) host→device traffic, which is
        # what makes this fast through a slow host link)
        # head postings never ride the tail gather (the dense matmul owns
        # them), and under Zipf they are a third or more of all postings —
        # keep them OUT of the device tail arrays (GBs of HBM at 10M docs)
        tail_mask = head_slot[term_ids] < 0
        t_ids = term_ids[tail_mask]
        sort_idx = np.argsort(t_ids, kind="stable")
        self._tail_docs = np.ascontiguousarray(
            doc_of[tail_mask][sort_idx].astype(np.int32)
        )
        self._tail_w = np.ascontiguousarray(w[tail_mask][sort_idx])
        off = np.zeros(v + 1, dtype=np.int64)
        np.cumsum(np.bincount(t_ids, minlength=v), out=off[1:])
        if off[-1] >= (1 << 31):
            # start offsets pack into the int32 device operand
            raise ValueError(
                f"hybrid tail postings ({int(off[-1])}) exceed the int32 "
                "offset space of the packed device operands; shard the "
                "corpus over a mesh or use backend='host'"
            )
        self._tail_off = off
        self._df = df.astype(np.int64)
        self._head_slot = head_slot
        self._w_head = w_head_dev
        self._hvalid = jnp.asarray(hvalid)
        # static slab width: posting lists split into segments of this
        # width at query time (long mid-frequency lists just occupy more
        # slots). Narrow slabs keep the padded candidate width ≈ 2× the
        # actual entry count (pow2 T bucket), and the post-slab work —
        # the head-score gather at candidates — is the measured cost
        # driver (~0.55 µs/element on v5e), so width ≈ entries matters
        # more than slab count
        self._max_tail_df = int(max(64, n // 1024))
        # slab WIDTH BUCKETS: the kernel's scatter-add costs per slot,
        # padding included, so a df=300 list must not pay a 9,766-wide
        # slab (97% padding at 10M docs). Terms go to the smallest
        # bucket that fits; long lists split into max-width slabs.
        self._tail_widths = tuple(
            sorted({w for w in (128, 1024) if w < self._max_tail_df}
                   | {self._max_tail_df})
        )
        # device copies carry a max_df zero-pad so the kernel's
        # dynamic_slice never clamp-shifts a start near the array end
        pad = self._max_tail_df
        self._tail_docs_dev = jnp.asarray(
            np.concatenate([self._tail_docs, np.zeros(pad, np.int32)])
        )
        self._tail_w_dev = jnp.asarray(
            np.concatenate([self._tail_w, np.zeros(pad, np.float32)])
        )
        # query time reads only _tail_off + the device copies; the host
        # postings would double host RAM for exactly the 10M-scale builds
        # this backend exists for (~4.8 GB at 600M postings)
        self._tail_docs = self._tail_w = None

    def _count_terms(
        self, tokenized_queries: Sequence[Sequence[str]]
    ) -> List[Dict[int, int]]:
        """Per-query indexed-term-id → count maps. The ONE tokenize-count
        pass shared by the dispatch signal, both encoders, and the hybrid
        path — search_dispatch used to walk every token twice (estimate,
        then encode) on the hot serving path."""
        out: List[Dict[int, int]] = []
        vocab_get = self.vocab.get
        for toks in tokenized_queries:
            counts: Dict[int, int] = {}
            for tok in toks:
                tid = vocab_get(tok)
                if tid is not None:
                    counts[tid] = counts.get(tid, 0) + 1
            out.append(counts)
        return out

    def _estimated_entries(self, counts: Sequence[Dict[int, int]]) -> int:
        """Σ df over the batch's indexed query terms — the host scorer's
        work; the dispatch signal between host CSR and the device."""
        return int(sum(self._df[tid] for c in counts for tid in c))

    def _enqueue_device(
        self, tokenized_queries: Sequence[Sequence[str]], k: int
    ) -> "PendingSearch":
        """Queue device-bound queries for a coalesced kernel launch.

        The returned handle's ``result()`` flushes the queue (everything
        enqueued so far merges into one kernel, chunked at
        ``DEV_COALESCE_MAX`` queries) and slices out this entry's rows.
        Scores are identical to a solo dispatch — the kernel scores each
        query independently; merging only changes the batch padding."""
        entry: dict = {
            "tokens": [list(t) for t in tokenized_queries],
            "k": int(k),
            "pending": None,
            "lo": 0,
        }
        with self._dev_qlock:
            self._dev_queue.append(entry)

        def launch() -> None:
            while entry["pending"] is None:
                # the mutex both serializes flushes and makes a fetch
                # BLOCK while another thread's flush (holding our entry)
                # is mid-dispatch, instead of spinning
                with self._dev_flush_mutex:
                    if entry["pending"] is None:
                        self._flush_device()

        def fetch() -> Tuple[np.ndarray, np.ndarray]:
            launch()
            s, p = entry["pending"].result()
            lo, b = entry["lo"], len(entry["tokens"])
            s, p = s[lo : lo + b], p[lo : lo + b]
            if s.shape[1] > entry["k"]:
                # the merged batch ran at the queue's max k; every row's
                # prefix is its own exact top-k (incl. the zero-fill tie
                # order, which assigns ascending doc ids in rank order)
                s, p = s[:, : entry["k"]], p[:, : entry["k"]]
            return s, p

        return PendingSearch(fetch, prime=launch)

    def _flush_device(self) -> None:
        """Dispatch every queued device-bound entry (caller holds
        ``_dev_flush_mutex``). ``_dev_qlock`` guards only the list swap —
        holding it across ``_rw.read()`` would invert lock order with
        ``search_dispatch`` (read → qlock) and deadlock under a waiting
        writer (the RW lock is writer-preferring)."""
        with self._dev_qlock:
            queue, self._dev_queue = self._dev_queue, []
        if not queue:
            return

        def dispatch(chunk: List[dict]) -> None:
            toks = [t for e in chunk for t in e["tokens"]]
            k_max = max(e["k"] for e in chunk)
            # term counts recompute at flush time so a rebuild that
            # landed between enqueue and flush can't feed stale term
            # ids into the new postings layout
            with self._rw.read():
                pending = self._hybrid_dispatch(
                    toks, k_max, self._count_terms(toks)
                )
            lo = 0
            for e in chunk:
                e["lo"] = lo
                e["pending"] = pending
                lo += len(e["tokens"])

        chunk: List[dict] = []
        n = 0
        for e in queue:
            if chunk and n + len(e["tokens"]) > self.DEV_COALESCE_MAX:
                dispatch(chunk)
                chunk, n = [], 0
            chunk.append(e)
            n += len(e["tokens"])
        if chunk:
            dispatch(chunk)

    def _hybrid_dispatch(
        self,
        tokenized_queries: Sequence[Sequence[str]],
        k: int,
        term_counts: Optional[Sequence[Dict[int, int]]] = None,
    ) -> "PendingSearch":
        """Host-encode + enqueue one hybrid batch; does NOT block on the
        device. Every operand travels as ONE packed int32 array — through
        a high-latency host link (the dev tunnel pays ~35 ms RTT) the
        transfer count, not the bytes, is what shows up in e2e latency.
        Head-carrying batches use the batch-FLAT layout
        [q_head (b·h) | per bucket: starts(s) lens(s) counts(s) qids(s)]
        (slabs pooled across queries, see ``bm25_hybrid_topk_flat``);
        tail-only batches keep per-query slab windows
        [b0 starts | b0 lens | b0 counts | b1 …] for the sort/segment
        kernel."""
        from rag_arc_tpu.ops.bm25 import bm25_hybrid_topk_flat

        b = len(tokenized_queries)
        h = self._w_head.shape[0]
        max_df = self._max_tail_df
        widths = self._tail_widths
        # per-bucket slab rows: each query's tail terms land in the
        # smallest width bucket that fits their df (long lists split into
        # max-width segments) — the scatter-add pays per slab SLOT, so
        # width ≈ df is the whole game
        rows: List[Dict[int, List[Tuple[int, int, float]]]] = []
        head_rows: List[Dict[int, int]] = []
        t_max = {w: 0 for w in widths}
        if term_counts is None:
            term_counts = self._count_terms(tokenized_queries)
        for counts in term_counts:
            row: Dict[int, List[Tuple[int, int, float]]] = {
                w: [] for w in widths
            }
            hrow: Dict[int, int] = {}
            for tid, c in counts.items():
                slot = self._head_slot[tid]
                if slot >= 0:
                    hrow[int(slot)] = hrow.get(int(slot), 0) + c
                else:
                    start = int(self._tail_off[tid])
                    remaining = int(self._tail_off[tid + 1]) - start
                    while remaining > max_df:
                        row[max_df].append((start, max_df, float(c)))
                        start += max_df
                        remaining -= max_df
                    if remaining > 0:
                        w = next(w for w in widths if w >= remaining)
                        row[w].append((start, remaining, float(c)))
            rows.append(row)
            head_rows.append(hrow)
            for w in widths:
                t_max[w] = max(t_max[w], len(row[w]))

        # only buckets the batch actually uses enter the (static) kernel
        # signature; slot counts pad to pow2 (min 4) to bound recompiles
        used = tuple(w for w in widths if t_max[w] > 0) or (widths[0],)
        ts = tuple(
            max(4, 1 << math.ceil(math.log2(max(t_max[w], 1)))) for w in used
        )
        b_pad = max(1, 1 << math.ceil(math.log2(b)))
        # HEAD-FREE batch on a bounded candidate window → the tail-only
        # sort/segment-sum kernel skips the (B, N) score array entirely
        # (~32 ms of materialize+top-k at 10M, the dense path's floor —
        # bench_results/bm25_hybrid_probe_r04_10M.txt). Realistic
        # selective traffic (post-stopword queries) is exactly this case.
        cand_window = sum(w * t for w, t in zip(used, ts))
        tail_only = (
            not any(head_rows) and cand_window <= self.TAIL_ONLY_WINDOW
        )
        k_eff = min(k, self.n_docs)
        if tail_only:
            packed = np.zeros((b_pad, 3 * sum(ts)), dtype=np.int32)
            for i, row in enumerate(rows):
                o = 0
                for w, t_pad in zip(used, ts):
                    for j, (s, ln, c) in enumerate(row[w]):
                        packed[i, o + j] = s
                        packed[i, o + t_pad + j] = ln
                        packed[i, o + 2 * t_pad + j] = int(c)
                    o += 3 * t_pad
        else:
            # batch-FLAT slab layout: slabs pool across queries with a
            # per-slab owner row id, so the padded slab count scales with
            # Σ live slabs instead of b × per-query max (a 32-query zipf
            # batch at 10M paid 16 max-width slabs × 32 rows ≈ 5.1M
            # scatter slots for ~70 live slabs — the scatter pays per
            # slot, live or padding)
            flat: Dict[int, List[Tuple[int, int, int, int]]] = {
                w: [] for w in used
            }
            for i, row in enumerate(rows):
                for w in used:
                    for s, ln, c in row[w]:
                        flat[w].append((s, ln, int(c), i))
            ss = tuple(
                max(8, 1 << math.ceil(math.log2(max(len(flat[w]), 1))))
                for w in used
            )
            packed_flat = np.zeros(
                b_pad * h + 4 * sum(ss), dtype=np.int32
            )
            qh = np.zeros((b_pad, h), dtype=np.int32)
            for i, hrow in enumerate(head_rows):
                for slot, c in hrow.items():
                    qh[i, slot] = c
            packed_flat[: b_pad * h] = qh.reshape(-1)
            o = b_pad * h
            for w, s_pad in zip(used, ss):
                for j, (s, ln, c, qi) in enumerate(flat[w]):
                    packed_flat[o + j] = s
                    packed_flat[o + s_pad + j] = ln
                    packed_flat[o + 2 * s_pad + j] = c
                    packed_flat[o + 3 * s_pad + j] = qi
                o += 4 * s_pad

        if tail_only:
            from rag_arc_tpu.ops.bm25 import bm25_tail_only_topk

            sk, ik = bm25_tail_only_topk(
                self._tail_docs_dev, self._tail_w_dev,
                jnp.asarray(packed),
                k_eff, used, ts,
            )
        else:
            sk, ik = bm25_hybrid_topk_flat(
                self._w_head, self._hvalid,
                self._tail_docs_dev, self._tail_w_dev,
                jnp.asarray(packed_flat),
                k_eff, b_pad, h, used, ss,
            )

        from rag_arc_tpu.utils.transfers import current_pool

        pool = current_pool()
        handle = pool.register((sk, ik)) if pool is not None else None

        def fetch() -> Tuple[np.ndarray, np.ndarray]:
            # the kernel's scatter-add/segment totals are exact and its
            # ids unique — no host-side dedupe/merge, just shape to (b, k)
            # ONE device_get for both arrays: separate gets are two
            # SEQUENTIAL tunnel round trips (~28 ms each on the dev box) —
            # they serialized the dispatch stream at ~50 ms/batch while
            # the device program itself runs ~11 ms. Under an active
            # TransferPool the pair rides the stream's single pooled get.
            if handle is not None:
                sk_h, ik_h = pool.result(handle)
            else:
                sk_h, ik_h = jax.device_get((sk, ik))
            s = np.asarray(sk_h)[:b]
            p = np.asarray(ik_h)[:b]
            out_s = np.full((b, k), -np.inf, dtype=np.float32)
            out_p = np.full((b, k), -1, dtype=np.int64)
            out_s[:, :k_eff] = s
            out_p[:, :k_eff] = p
            if tail_only:
                # rank_bm25 argsort semantics: unmatched docs score 0 and
                # rank ABOVE nothing (the dense path materializes those
                # zeros; here they're implicit). Tail term weights are
                # strictly positive (df < n/256 ⇒ idf > 0), so every
                # candidate the kernel returned outranks the zeros and
                # the remaining slots fill with the smallest doc ids not
                # already returned — exactly the dense path's tie order.
                n_docs = self.n_docs
                for i in range(b):
                    got = set(
                        int(x) for x in out_p[i][out_p[i] >= 0].tolist()
                    )
                    nxt = 0
                    for j in range(k_eff):
                        if out_p[i, j] >= 0:
                            continue
                        while nxt in got and nxt < n_docs:
                            nxt += 1
                        if nxt >= n_docs:
                            break
                        out_p[i, j] = nxt
                        out_s[i, j] = 0.0
                        nxt += 1
            return out_s, out_p

        return PendingSearch(fetch)

    def _hybrid_search(
        self, tokenized_queries: Sequence[Sequence[str]], k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        return self._hybrid_dispatch(tokenized_queries, k).result()

    def build(self, tokenized_docs: Sequence[Sequence[str]]) -> None:
        with self._rw.write():
            self._build_unlocked(tokenized_docs)

    def _build_unlocked(self, tokenized_docs: Sequence[Sequence[str]]) -> None:
        n = len(tokenized_docs)
        self.n_docs = n
        self.vocab = {}
        if n == 0:
            self.doc_terms = None
            self.doc_weights = None
            self.valid = None
            self.avgdl = 0.0
            self._free_host()
            # drop the previous corpus's hybrid structures too — stale
            # device copies are GBs of pinned HBM at 10M scale, and
            # stats() would keep reporting the old head terms
            self._w_head = self._hvalid = None
            self._tail_docs_dev = self._tail_w_dev = None
            self._tail_off = self._df = self._head_slot = None
            return
        doc_tfs: List[Dict[int, int]] = []
        doc_len = np.zeros(n, dtype=np.float64)
        for i, doc in enumerate(tokenized_docs):
            tf: Dict[int, int] = {}
            for tok in doc:
                tid = self.vocab.setdefault(tok, len(self.vocab))
                tf[tid] = tf.get(tid, 0) + 1
            doc_tfs.append(tf)
            doc_len[i] = len(doc)
        self.avgdl = float(doc_len.mean())
        v = len(self.vocab)
        df = np.zeros(v, dtype=np.float64)
        for tf in doc_tfs:
            for tid in tf:
                df[tid] += 1
        if self._use_host:
            nnz = sum(len(tf) for tf in doc_tfs)
            row_offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum([len(tf) for tf in doc_tfs], out=row_offsets[1:])
            term_ids = np.fromiter(
                (t for tf in doc_tfs for t in tf), dtype=np.int32, count=nnz
            )
            tf_vals = np.fromiter(
                (c for tf in doc_tfs for c in tf.values()),
                dtype=np.float32,
                count=nnz,
            )
            self._build_host(
                row_offsets, term_ids, tf_vals,
                doc_len.astype(np.int64), df.astype(np.int64),
            )
            if self.backend == "hybrid":
                self._build_hybrid(
                    row_offsets, term_ids, tf_vals, doc_len, df
                )
            return
        idf = compute_idf(df, n, self.epsilon)  # (V,)

        dmax = max((len(tf) for tf in doc_tfs), default=1)
        dmax = round_up(max(dmax, 8), 8)
        n_pad = round_up(n, max(8, 8 * self.n_shards))

        terms = np.full((n_pad, dmax), DOC_PAD, dtype=np.int32)
        tfs = np.zeros((n_pad, dmax), dtype=np.float32)
        idf_slot = np.zeros((n_pad, dmax), dtype=np.float32)
        for i, tf in enumerate(doc_tfs):
            tids = np.fromiter(tf.keys(), dtype=np.int32, count=len(tf))
            terms[i, : len(tf)] = tids
            tfs[i, : len(tf)] = np.fromiter(tf.values(), dtype=np.float32, count=len(tf))
            idf_slot[i, : len(tf)] = idf[tids]
        doc_len_pad = np.zeros(n_pad, dtype=np.float64)
        doc_len_pad[:n] = doc_len
        weights = compute_doc_weights(
            tfs, idf_slot, doc_len_pad, self.avgdl, self.k1, self.b
        )
        valid = np.zeros(n_pad, dtype=bool)
        valid[:n] = True

        self.doc_terms = jnp.asarray(terms)
        self.doc_weights = jnp.asarray(weights)
        self.valid = jnp.asarray(valid)
        if self.mesh is not None:
            emb_s = corpus_sharding(self.mesh, self.axis_name)
            row_s = row_sharding(self.mesh, self.axis_name)
            self.doc_terms = jax.device_put(self.doc_terms, emb_s)
            self.doc_weights = jax.device_put(self.doc_weights, emb_s)
            self.valid = jax.device_put(self.valid, row_s)

    def build_from_csr(
        self,
        row_offsets: np.ndarray,
        term_ids: np.ndarray,
        tfs: np.ndarray,
        doc_len: np.ndarray,
        vocab: Optional[Dict[str, int]] = None,
    ) -> None:
        with self._rw.write():
            self._build_from_csr_unlocked(
                row_offsets, term_ids, tfs, doc_len, vocab
            )

    def _build_from_csr_unlocked(
        self,
        row_offsets: np.ndarray,
        term_ids: np.ndarray,
        tfs: np.ndarray,
        doc_len: np.ndarray,
        vocab: Optional[Dict[str, int]] = None,
    ) -> None:
        """Build directly from CSR term-frequency arrays.

        Ingest fast path for corpora that are already tokenized to integer
        term ids (and the only practical way to build a 10M-doc index on a
        single host core — no Python string handling at all). ``term_ids``
        must be unique within each row (one entry per distinct term, its
        count in ``tfs``), matching what :meth:`build` derives from token
        lists. ``vocab`` maps token -> id for query encoding; defaults to
        ``{"w{i}": i}`` (the synthetic-corpus naming used by the benches).

        Host/hybrid backends only (the dense-device backend materializes a
        padded (N, dmax) layout that is pointless at CSR scale).
        """
        if not self._use_host:
            raise ValueError("build_from_csr requires the host/hybrid backend")
        n = int(len(row_offsets)) - 1
        self.n_docs = n
        v = int(term_ids.max()) + 1 if len(term_ids) else 0
        self.vocab = (
            vocab if vocab is not None else {f"w{i}": i for i in range(v)}
        )
        if n == 0:
            self._build_unlocked([])
            return
        doc_len = np.asarray(doc_len, dtype=np.float64)
        self.avgdl = float(doc_len.mean())
        # size the id space by the LARGEST id anywhere — a sparse vocab
        # whose max id exceeds both the corpus max and the dict length
        # would otherwise index past _df/_head_slot/_tail_off at query time
        if self.vocab:
            v = max(v, max(self.vocab.values()) + 1)
        v = max(v, len(self.vocab))
        # CSR rows hold one entry per distinct (doc, term): df is a bincount
        df = np.bincount(
            np.asarray(term_ids, dtype=np.int64), minlength=v
        ).astype(np.int64)
        self._build_host(
            np.asarray(row_offsets, dtype=np.int64),
            np.asarray(term_ids, dtype=np.int32),
            np.asarray(tfs, dtype=np.float32),
            doc_len.astype(np.int64),
            df,
        )
        if self.backend == "hybrid":
            self._build_hybrid(
                np.asarray(row_offsets, dtype=np.int64),
                np.asarray(term_ids, dtype=np.int32),
                np.asarray(tfs, dtype=np.float32),
                doc_len,
                df.astype(np.float64),
            )

    def build_from_texts_native(self, contents: Sequence[str]) -> None:
        with self._rw.write():
            self._build_from_texts_native_unlocked(contents)

    def _build_from_texts_native_unlocked(self, contents: Sequence[str]) -> None:
        """Fast build path: tokenization + term statistics in C++
        (native/textproc.cpp), byte-exact with ``text.lower().split()`` for
        ASCII corpora. The caller is responsible for checking
        ``str.isascii()`` and falling back to :meth:`build` otherwise."""
        import ctypes

        from rag_arc_tpu.native.build import load_library

        n = len(contents)
        self.n_docs = n
        if n == 0:
            self._build_unlocked([])
            return
        lib = load_library("textproc")
        lib.textproc_build.restype = ctypes.c_void_p
        lib.textproc_build.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        for name, restype in (
            ("textproc_n_vocab", ctypes.c_int64),
            ("textproc_dmax", ctypes.c_int64),
            ("textproc_nnz", ctypes.c_int64),
            ("textproc_vocab_bytes", ctypes.c_int64),
        ):
            fn = getattr(lib, name)
            fn.restype = restype
            fn.argtypes = [ctypes.c_void_p]
        lib.textproc_free.argtypes = [ctypes.c_void_p]
        lib.textproc_export.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.textproc_vocab_export.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        blobs = [c.encode("ascii") for c in contents]
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(b) for b in blobs], out=offsets[1:])
        buffer = b"".join(blobs)
        handle = lib.textproc_build(
            buffer, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n
        )
        try:
            v = lib.textproc_n_vocab(handle)
            nnz = lib.textproc_nnz(handle)
            dmax = max(int(lib.textproc_dmax(handle)), 8)
            row_offsets = np.empty(n + 1, dtype=np.int64)
            term_ids = np.empty(max(nnz, 1), dtype=np.int32)
            tfs = np.empty(max(nnz, 1), dtype=np.float32)
            doc_len = np.empty(n, dtype=np.int64)
            df = np.empty(max(v, 1), dtype=np.int64)
            lib.textproc_export(
                handle,
                row_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                term_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                tfs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                doc_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                df.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            vocab_bytes = ctypes.create_string_buffer(
                int(lib.textproc_vocab_bytes(handle))
            )
            lib.textproc_vocab_export(handle, vocab_bytes)
        finally:
            lib.textproc_free(handle)
        terms_list = vocab_bytes.raw.decode("ascii").split("\n")[:-1]
        self.vocab = {t: i for i, t in enumerate(terms_list)}
        self.avgdl = float(doc_len.mean()) if n else 0.0
        if self._use_host:
            self._build_host(
                row_offsets, term_ids[:nnz], tfs[:nnz], doc_len, df
            )
            if self.backend == "hybrid":
                self._build_hybrid(
                    row_offsets, term_ids[:nnz], tfs[:nnz],
                    doc_len.astype(np.float64), df,
                )
            return
        idf = compute_idf(df.astype(np.float64), n, self.epsilon)

        from rag_arc_tpu.parallel.mesh import round_up as _round_up

        dmax = _round_up(dmax, 8)
        n_pad = _round_up(n, max(8, 8 * self.n_shards))
        terms = np.full((n_pad, dmax), DOC_PAD, dtype=np.int32)
        tf_arr = np.zeros((n_pad, dmax), dtype=np.float32)
        idf_slot = np.zeros((n_pad, dmax), dtype=np.float32)
        # vectorized CSR → padded scatter
        counts = np.diff(row_offsets)
        doc_of = np.repeat(np.arange(n), counts)
        col_of = np.arange(nnz, dtype=np.int64) - np.repeat(row_offsets[:-1], counts)
        terms[doc_of, col_of] = term_ids[:nnz]
        tf_arr[doc_of, col_of] = tfs[:nnz]
        idf_slot[doc_of, col_of] = idf[term_ids[:nnz]]
        doc_len_pad = np.zeros(n_pad, dtype=np.float64)
        doc_len_pad[:n] = doc_len
        weights = compute_doc_weights(
            tf_arr, idf_slot, doc_len_pad, self.avgdl, self.k1, self.b
        )
        valid = np.zeros(n_pad, dtype=bool)
        valid[:n] = True
        self.doc_terms = jnp.asarray(terms)
        self.doc_weights = jnp.asarray(weights)
        self.valid = jnp.asarray(valid)
        if self.mesh is not None:
            emb_s = corpus_sharding(self.mesh, self.axis_name)
            row_s = row_sharding(self.mesh, self.axis_name)
            self.doc_terms = jax.device_put(self.doc_terms, emb_s)
            self.doc_weights = jax.device_put(self.doc_weights, emb_s)
            self.valid = jax.device_put(self.valid, row_s)

    # -- query encoding ---------------------------------------------------

    def encode_queries(
        self, tokenized_queries: Sequence[Sequence[str]]
    ) -> Tuple[np.ndarray, np.ndarray]:
        b = len(tokenized_queries)
        qt = np.full((b, self.qmax), QUERY_PAD, dtype=np.int32)
        qc = np.zeros((b, self.qmax), dtype=np.float32)
        warned = False
        for i, counts in enumerate(self._count_terms(tokenized_queries)):
            if len(counts) > self.qmax and not warned:
                warned = True
                import warnings

                warnings.warn(
                    f"query has {len(counts)} unique indexed terms; only the "
                    f"{self.qmax} most frequent are scored (raise qmax for "
                    "long queries)"
                )
            # keep highest-count terms when over budget
            items = sorted(counts.items(), key=lambda kv: -kv[1])[: self.qmax]
            for j, (tid, c) in enumerate(items):
                qt[i, j] = tid
                qc[i, j] = c
        return qt, qc

    # -- search -----------------------------------------------------------

    def search(
        self, tokenized_queries: Sequence[Sequence[str]], k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores (B, k), positions (B, k)); empty slots score -inf / -1."""
        return self.search_dispatch(tokenized_queries, k).result()

    def search_dispatch(
        self, tokenized_queries: Sequence[Sequence[str]], k: int
    ) -> PendingSearch:
        """Enqueue a query batch; returns a :class:`PendingSearch`.

        Device-backed batches (hybrid / dense kernel) return before the
        device program finishes — dispatch the next batch while this one
        computes to amortize host↔device latency over the stream. The host
        CSR backend computes eagerly (it IS host work)."""
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        b = len(tokenized_queries)
        # read lock: a concurrent rebuild (add/delete fan-out) frees the
        # C++ postings handle and swaps the device arrays — dispatching
        # against half-replaced state is a use-after-free on the host path
        with self._rw.read():
            if (self.doc_terms is None and self._host_handle is None) or b == 0:
                out = (
                    np.full((b, k), -np.inf, dtype=np.float32),
                    np.full((b, k), -1, dtype=np.int64),
                )
                return PendingSearch(lambda: out)
            if self._host_handle is not None:
                term_counts = self._count_terms(tokenized_queries)
                if self._w_head is None:
                    host_out = self._host_search(
                        tokenized_queries, k, term_counts
                    )
                    return PendingSearch(lambda: host_out)
                # PER-QUERY df router (ref core/retrieval/bm25.py:306-313
                # has one code path with no query-shape cliffs; here each
                # query gets the path that is fastest for its shape):
                # a query whose postings volume (Σ df) exceeds host_budget
                # would drown the host CSR scorer in accumulations — the
                # device pays one MXU matmul for head terms instead.
                # Selective queries stay on the host scorer (measured at
                # 10M: host CSR 2.8k QPS selective vs 0.4k device; device
                # 314 QPS head-heavy vs 4.7 host). Mixed batches split:
                # the device subset dispatches FIRST (async) so host CSR
                # scoring overlaps the device program.
                budget = (
                    self.host_budget if self.host_budget is not None
                    else max(1 << 15, self.n_docs // 16)
                )
                dev_idx = [
                    i for i, tc in enumerate(term_counts)
                    if self._estimated_entries([tc]) > budget
                ]
                if not dev_idx:
                    host_out = self._host_search(
                        tokenized_queries, k, term_counts
                    )
                    return PendingSearch(lambda: host_out)
                if len(dev_idx) == b:
                    return self._enqueue_device(tokenized_queries, k)
                host_idx = [i for i in range(b) if i not in set(dev_idx)]
                pending_dev = self._enqueue_device(
                    [tokenized_queries[i] for i in dev_idx], k
                )
                host_out = self._host_search(
                    [tokenized_queries[i] for i in host_idx], k,
                    [term_counts[i] for i in host_idx],
                )

                def fetch_mixed() -> Tuple[np.ndarray, np.ndarray]:
                    ds, dp = pending_dev.result()
                    s = np.full((b, k), -np.inf, dtype=np.float32)
                    p = np.full((b, k), -1, dtype=np.int64)
                    s[dev_idx], p[dev_idx] = ds, dp
                    s[host_idx], p[host_idx] = host_out
                    return s, p

                return PendingSearch(fetch_mixed, prime=pending_dev.prime)
            qt, qc = self.encode_queries(tokenized_queries)
            b_pad = max(1, 1 << math.ceil(math.log2(b)))
            if b_pad > b:
                qt = np.pad(
                    qt, ((0, b_pad - b), (0, 0)), constant_values=QUERY_PAD
                )
                qc = np.pad(qc, ((0, b_pad - b), (0, 0)))
            n_pad = self.doc_terms.shape[0]
            k_eff = min(k, n_pad)
            if self.mesh is not None:
                scores, positions = self._search_sharded(
                    jnp.asarray(qt), jnp.asarray(qc), k_eff
                )
            else:
                scores, positions = bm25_topk(
                    self.doc_terms, self.doc_weights, self.valid,
                    jnp.asarray(qt), jnp.asarray(qc), k_eff,
                )

        from rag_arc_tpu.utils.transfers import current_pool

        pool = current_pool()
        handle = (
            pool.register((scores, positions)) if pool is not None else None
        )

        def fetch() -> Tuple[np.ndarray, np.ndarray]:
            if handle is not None:
                s_h, p_h = pool.result(handle)
            else:
                # ONE round trip for the pair
                s_h, p_h = jax.device_get((scores, positions))
            s = np.asarray(s_h)[:b]
            p = np.asarray(p_h)[:b].astype(np.int64)
            p = np.where(np.isneginf(s), -1, p)
            if k_eff < k:
                pad = k - k_eff
                s = np.pad(s, ((0, 0), (0, pad)), constant_values=-np.inf)
                p = np.pad(p, ((0, 0), (0, pad)), constant_values=-1)
            return s, p

        return PendingSearch(fetch)

    def _search_sharded(self, qt: jax.Array, qc: jax.Array, k: int):
        mesh, axis = self.mesh, self.axis_name
        # building the jitted shard_map closure fresh per call defeats the
        # trace cache (measured on the dense index: 20x the per-batch cost
        # on a 1-device chip mesh) — cache it per (shapes, k)
        key = (qt.shape, k, self.doc_terms.shape)
        run = self._sharded_jit.get(key)
        if run is None:
            local_n = self.doc_terms.shape[0] // self.n_shards

            def local_topk(qt, qc, terms, weights, valid):
                from rag_arc_tpu.ops.bm25 import select_topk

                scores = bm25_scores_kernel(terms, weights, qt, qc)
                scores = jnp.where(valid[None, :], scores, -jnp.inf)
                # never lax.top_k over the shard width (full sort; 9-min
                # compiles at 2M width through the tunnel) — tournament
                s, idx = select_topk(scores, min(k, local_n))
                offset = jax.lax.axis_index(axis) * local_n
                return s[None], (idx + offset)[None]

            @partial(jax.jit)
            def run(qt, qc, terms, weights, valid):
                s_all, p_all = jax.shard_map(
                    local_topk,
                    mesh=mesh,
                    in_specs=(P(), P(), P(axis, None), P(axis, None), P(axis)),
                    out_specs=(P(axis, None, None), P(axis, None, None)),
                )(qt, qc, terms, weights, valid)
                b = qt.shape[0]
                s_flat = jnp.transpose(s_all, (1, 0, 2)).reshape(b, -1)
                p_flat = jnp.transpose(p_all, (1, 0, 2)).reshape(b, -1)
                s, sel = jax.lax.top_k(s_flat, k)
                return s, jnp.take_along_axis(p_flat, sel, axis=-1)

            self._sharded_jit[key] = run
        return run(qt, qc, self.doc_terms, self.doc_weights, self.valid)

    def _encode_flat(
        self, term_counts: Sequence[Dict[int, int]]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Variable-length query encoding for the host scorer — no ``qmax``
        truncation (the host path scores every indexed query term)."""
        terms: List[int] = []
        counts: List[float] = []
        offsets = np.zeros(len(term_counts) + 1, dtype=np.int64)
        for i, c in enumerate(term_counts):
            terms.extend(c.keys())
            counts.extend(float(v) for v in c.values())
            offsets[i + 1] = len(terms)
        return (
            np.asarray(terms, dtype=np.int32),
            np.asarray(counts, dtype=np.float32),
            offsets,
        )

    def _host_search(
        self,
        tokenized_queries: Sequence[Sequence[str]],
        k: int,
        term_counts: Optional[Sequence[Dict[int, int]]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        import ctypes
        import os

        if term_counts is None:
            term_counts = self._count_terms(tokenized_queries)
        terms, counts, offsets = self._encode_flat(term_counts)
        b = len(tokenized_queries)
        out_scores = np.empty((b, k), dtype=np.float32)
        out_pos = np.empty((b, k), dtype=np.int64)
        if terms.size == 0:
            terms = np.zeros(1, dtype=np.int32)
            counts = np.zeros(1, dtype=np.float32)
        self._host_lib.bm25host_search(
            self._host_handle,
            terms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            b,
            k,
            None,
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            min(os.cpu_count() or 1, 16),
        )
        return out_scores, out_pos

    def get_scores(self, tokenized_query: Sequence[str]) -> np.ndarray:
        """Full dense score vector for one query (reference bm25.py
        ``get_scores`` parity)."""
        with self._rw.read():
            if self._host_handle is not None:
                import ctypes

                terms, counts, _ = self._encode_flat(
                    self._count_terms([tokenized_query])
                )
                out = np.zeros(self.n_docs, dtype=np.float32)
                if terms.size:
                    self._host_lib.bm25host_scores(
                        self._host_handle,
                        terms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        terms.size,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    )
                return out
            if self.doc_terms is None:
                return np.zeros(0, dtype=np.float32)
            qt, qc = self.encode_queries([tokenized_query])
            scores = bm25_scores_kernel(
                self.doc_terms, self.doc_weights, jnp.asarray(qt), jnp.asarray(qc)
            )
            return np.asarray(jax.device_get(scores))[0][: self.n_docs]

    def stats(self) -> Dict[str, object]:
        return {
            "kind": "bm25",
            "backend": (
                "hybrid"
                if self._w_head is not None
                else ("host-csr" if self._host_handle is not None else "device")
            ),
            "head_terms": (
                0 if self._w_head is None else int(self._w_head.shape[0])
            ),
            "num_docs": self.n_docs,
            "vocab_size": len(self.vocab),
            "avgdl": self.avgdl,
            "k1": self.k1,
            "b": self.b,
            "epsilon": self.epsilon,
            "qmax": self.qmax,
            "shards": self.n_shards,
            "dmax": 0 if self.doc_terms is None else int(self.doc_terms.shape[1]),
        }

"""Vector store API surface + TPU-backed implementation.

Surface parity with the reference's ``VectorStore`` ABC
(``encapsulation/database/vector_db/VectorStoreBase.py:45``): add / delete /
get_by_ids, ``search(query, search_type)``, the ``similarity_search*``
family, MMR search, ``from_texts``/``from_documents``, ``as_retriever``,
relevance-score normalization with out-of-range warnings
(``VectorStoreBase.py:258-273, 372-392``), and score-threshold filtering.

``TPUVectorStore`` replaces ``FaissVectorStore`` (``VectorStore_Faiss.py:65``):
embeddings come from any ``Embeddings`` impl, vectors live in a
``DeviceFlatIndex`` (or IVF index) in HBM — optionally sharded across a
device mesh — and documents stay in a host ``Docstore``. Deletes tombstone
instead of rebuilding; ``compact()`` reclaims space explicitly.
"""

from __future__ import annotations

import asyncio
import logging
import warnings
from abc import ABC, abstractmethod
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
from jax.sharding import Mesh

from rag_arc_tpu.index.docstore import Docstore
from rag_arc_tpu.index.flat import DeviceFlatIndex
from rag_arc_tpu.models.embeddings import Embeddings
from rag_arc_tpu.ops.mmr import mmr_select
from rag_arc_tpu.utils.data_model import Document
from rag_arc_tpu.utils.locks import RWLock

logger = logging.getLogger(__name__)

_EXECUTOR: Optional[ThreadPoolExecutor] = None


def _executor() -> ThreadPoolExecutor:
    global _EXECUTOR
    if _EXECUTOR is None:
        _EXECUTOR = ThreadPoolExecutor(max_workers=4, thread_name_prefix="vstore")
    return _EXECUTOR


class VectorStore(ABC):
    """Abstract vector store: the retriever-facing contract."""

    # -- abstract primitives ---------------------------------------------

    @abstractmethod
    def add_documents(
        self, documents: Sequence[Document], ids: Optional[Sequence[str]] = None
    ) -> List[str]: ...

    @abstractmethod
    def delete(self, ids: Sequence[str]) -> bool: ...

    @abstractmethod
    def get_by_ids(self, ids: Sequence[str]) -> List[Document]: ...

    @abstractmethod
    def similarity_search_with_score(
        self, query: str, k: int = 4, **kwargs: Any
    ) -> List[Tuple[Document, float]]: ...

    @abstractmethod
    def similarity_search_by_vector_with_score(
        self, embedding: Sequence[float], k: int = 4, **kwargs: Any
    ) -> List[Tuple[Document, float]]: ...

    @abstractmethod
    def max_marginal_relevance_search(
        self,
        query: str,
        k: int = 4,
        fetch_k: int = 20,
        lambda_mult: float = 0.5,
        **kwargs: Any,
    ) -> List[Document]: ...

    # -- derived surface --------------------------------------------------

    def add_texts(
        self,
        texts: Sequence[str],
        metadatas: Optional[Sequence[dict]] = None,
        ids: Optional[Sequence[str]] = None,
    ) -> List[str]:
        metadatas = metadatas or [{} for _ in texts]
        if len(metadatas) != len(texts):
            raise ValueError("texts and metadatas length mismatch")
        docs = [
            Document(content=t, metadata=dict(m)) for t, m in zip(texts, metadatas)
        ]
        return self.add_documents(docs, ids=ids)

    def similarity_search(self, query: str, k: int = 4, **kwargs: Any) -> List[Document]:
        return [doc for doc, _ in self.similarity_search_with_score(query, k, **kwargs)]

    def similarity_search_by_vector(
        self, embedding: Sequence[float], k: int = 4, **kwargs: Any
    ) -> List[Document]:
        return [
            doc
            for doc, _ in self.similarity_search_by_vector_with_score(
                embedding, k, **kwargs
            )
        ]

    def similarity_search_with_relevance_scores(
        self,
        query: str,
        k: int = 4,
        score_threshold: Optional[float] = None,
        **kwargs: Any,
    ) -> List[Tuple[Document, float]]:
        """Scores normalized to [0, 1]; optionally filtered by threshold.

        Mirrors VectorStoreBase.py:347-392 incl. the out-of-range warning
        and the empty-result warning on threshold filtering.
        """
        norm = self._relevance_score_fn()
        raw = self.similarity_search_with_score(query, k, **kwargs)
        scored = [(doc, norm(score)) for doc, score in raw]
        eps = 1e-5  # float32 rounding can nudge a perfect match past 1.0
        if scored and any(s < -eps or s > 1.0 + eps for _, s in scored):
            warnings.warn(
                "relevance scores outside [0, 1]; check the metric/normalizer "
                f"pairing (got {[round(s, 4) for _, s in scored]})"
            )
        if getattr(self, "metric", "cosine") in ("cosine", "l2"):
            scored = [(d, min(max(s, 0.0), 1.0)) for d, s in scored]
        if score_threshold is not None:
            scored = [(d, s) for d, s in scored if s >= score_threshold]
            if not scored:
                warnings.warn(
                    f"no documents with relevance >= {score_threshold} for query"
                )
        return scored

    def search(self, query: str, search_type: str = "similarity", **kwargs: Any):
        if search_type == "similarity":
            return self.similarity_search(query, **kwargs)
        if search_type == "similarity_score_threshold":
            return [d for d, _ in self.similarity_search_with_relevance_scores(query, **kwargs)]
        if search_type == "mmr":
            return self.max_marginal_relevance_search(query, **kwargs)
        raise ValueError(
            f"search_type must be 'similarity', 'similarity_score_threshold' "
            f"or 'mmr', got {search_type!r}"
        )

    def as_retriever(self, **kwargs: Any):
        from rag_arc_tpu.retrieval.dense import VectorStoreRetriever

        return VectorStoreRetriever(vectorstore=self, **kwargs)

    # -- async shims ------------------------------------------------------

    async def aadd_documents(self, documents, ids=None):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            _executor(), lambda: self.add_documents(documents, ids)
        )

    async def aadd_texts(self, texts, metadatas=None, ids=None):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            _executor(), lambda: self.add_texts(texts, metadatas, ids)
        )

    async def asimilarity_search(self, query: str, k: int = 4, **kwargs: Any):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            _executor(), lambda: self.similarity_search(query, k, **kwargs)
        )

    async def asimilarity_search_with_score(self, query: str, k: int = 4, **kwargs: Any):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            _executor(), lambda: self.similarity_search_with_score(query, k, **kwargs)
        )

    # -- classmethod constructors ----------------------------------------

    @classmethod
    def from_texts(
        cls,
        texts: Sequence[str],
        embedding: Embeddings,
        metadatas: Optional[Sequence[dict]] = None,
        **kwargs: Any,
    ) -> "VectorStore":
        store = cls(embedding=embedding, **kwargs)  # type: ignore[call-arg]
        store.add_texts(texts, metadatas=metadatas)
        return store

    @classmethod
    def from_documents(
        cls, documents: Sequence[Document], embedding: Embeddings, **kwargs: Any
    ) -> "VectorStore":
        store = cls(embedding=embedding, **kwargs)  # type: ignore[call-arg]
        store.add_documents(documents)
        return store

    # -- relevance normalization ------------------------------------------

    def _relevance_score_fn(self) -> Callable[[float], float]:
        """Map raw metric scores to [0, 1] relevance (VectorStoreBase.py:258-273)."""
        metric = getattr(self, "metric", "cosine")
        if metric == "cosine":
            return lambda s: (s + 1.0) / 2.0
        if metric == "l2":
            # index returns negative squared distance
            return lambda s: 1.0 / (1.0 + max(0.0, -s))
        # inner product has no bounded normalization
        return lambda s: s


class TPUVectorStore(VectorStore):
    """HBM-resident vector store over a DeviceFlatIndex / IVF index."""

    def __init__(
        self,
        embedding: Embeddings,
        dim: Optional[int] = None,
        metric: str = "cosine",
        capacity: int = 4096,
        mesh: Optional[Mesh] = None,
        dtype: Any = None,
        index: Optional[DeviceFlatIndex] = None,
        compact_threshold: float = 0.5,
        index_type: str = "flat",
        nlist: int = 100,
        nprobe: int = 8,
        ivf_spill: int = 1,
        ivf_spill_cap: float = 1.25,
        train_threshold: Optional[int] = None,
        docstore_path: Optional[str] = None,
        hnsw_pq_m: int = 0,
        hnsw_pq_refine: bool = False,
        refine: Any = "default",
        kf_mult: int = 2,
    ):
        if index_type == "auto":
            # Official auto-select policy (VERDICT r2 #4): FLAT. Measured
            # on this hardware (tools/ivf_bench.py, 1M×768 clustered —
            # IVF's home turf): flat 244.8 QPS vs IVF's best 147.3 at
            # B=8, and IVF build cost 397 s/1M rows. The flat scan rides
            # the MXU and amortizes the corpus read across the batch;
            # IVF's gathered-list probe pays padded-HBM gathers that the
            # TPU hates, so it only has a niche at tiny batch × huge
            # corpus × clustered data — opt in explicitly with
            # index_type='ivf' if that's your workload and measure.
            # Memory-bound hosts pick 'hnsw' (+pq) explicitly.
            index_type = "flat"
        if index_type not in ("flat", "ivf", "hnsw"):
            raise ValueError(
                f"index_type must be 'auto', 'flat', 'ivf' or 'hnsw', "
                f"got {index_type!r}"
            )
        self.embedding = embedding
        self.metric = metric
        self.mesh = mesh
        # index mutation donates device buffers; searches must not overlap
        # a donation (utils/locks.py) — readers run concurrently
        self._rw = RWLock()
        self._init_capacity = capacity
        self._dtype = dtype
        # validate IVF dtype constraints NOW: the DeviceIVFIndex is only
        # constructed mid-add at auto-train time, and failing there leaves
        # the caller with recorded docs and an add() that re-raises forever
        if (
            index_type == "ivf"
            and dtype is not None
            and np.dtype(dtype) == np.int8
        ):
            if metric == "l2":
                raise ValueError("int8 IVF storage supports cosine/ip, not l2")
            if mesh is not None:
                raise NotImplementedError(
                    "int8 IVF storage is single-device for now; use bf16 on meshes"
                )
        # docstore_path selects the disk-backed store (content in an
        # append-only blob, mmap reads, bounded host RAM) for 10M-doc
        # corpora; default keeps documents in host RAM
        self.docstore_path = docstore_path
        if docstore_path is not None:
            from rag_arc_tpu.index.blob_docstore import BlobDocstore

            self.docstore = BlobDocstore(docstore_path)
        else:
            self.docstore = Docstore()
        self.index: Optional[DeviceFlatIndex] = index
        self.compact_threshold = compact_threshold
        self.index_type = index_type
        self.nlist = nlist
        self.nprobe = nprobe
        # IVF spilled assignment (DeviceIVFIndex.spill): store each row in
        # its `spill` nearest lists — a recall lever for hard/low-margin
        # corpora at ×spill list memory
        self.ivf_spill = int(ivf_spill)
        # per-list length bound as a multiple of the mean (see
        # DeviceIVFIndex.spill_cap — spill skew can 3x the padded slab)
        self.ivf_spill_cap = float(ivf_spill_cap)
        # FAISS-parity auto-train point (VectorStore_Faiss.py:181-184):
        # rows accumulate in a flat index until the IVF can be trained
        self.train_threshold = train_threshold or max(100, nlist)
        # hnsw_pq_m > 0 selects product-quantized HNSW storage (m bytes
        # per vector, FAISS IndexHNSWPQ parity); 0 keeps f32/sq8
        self.hnsw_pq_m = int(hnsw_pq_m)
        # hnsw_pq_refine keeps an SQ8 copy for exact candidate rescore
        # (FAISS IndexRefine parity) — guards the PQ recall cliff
        self.hnsw_pq_refine = bool(hnsw_pq_refine)
        # int8 residual-refinement ladder (None | 'int4' | 'int8'):
        # 'default' keeps DeviceFlatIndex's default ('int4', +50% HBM,
        # recall 0.74→0.95 on near-tie corpora); None disables the sidecar
        self.refine = refine
        # quantized-rescore over-fetch multiplier (search-time knob, see
        # DeviceFlatIndex.kf_mult for the measured QPS/recall curve):
        # default 2 is the knee — raising to 4 measured zero recall gain
        # at 10M and on the near-tie corpus, for ~17% QPS
        self.kf_mult = int(kf_mult)
        self._dim = dim or getattr(embedding, "dim", None)
        if index is None and self._dim is not None:
            self._create_index(self._dim)

    def _create_index(self, dim: int) -> None:
        """Lazy index creation at first add (VectorStore_Faiss.py:172-175).

        'flat' and (pre-train) 'ivf' start as a DeviceFlatIndex in HBM;
        'hnsw' uses the native C++ host index (graph ANN doesn't map to
        the TPU's vector units — same placement the reference had via
        FAISS C++)."""
        # the residual-refine ladder exists only on the int8 flat device
        # index; an explicitly-requested refine that can't apply must warn
        # (a recall knob silently no-opping is worse than an error)
        refine_requested = self.refine not in ("default", None)
        if refine_requested:
            is_int8 = self._dtype is not None and np.dtype(self._dtype) == np.int8
            if self.index_type != "flat" or not is_int8:
                logger.warning(
                    "refine=%r has no effect on index_type=%r dtype=%r — the "
                    "residual ladder needs index_type='flat' and dtype=int8 "
                    "(hnsw recall guard is hnsw_pq_refine)",
                    self.refine, self.index_type, self._dtype,
                )
        if self.index_type == "hnsw":
            import numpy as _np

            from rag_arc_tpu.index.hnsw import HNSWIndex

            # dtype=int8 selects SQ8 storage inside the C++ engine (4x less
            # host RAM), the same knob that selects the quantized device
            # kernel for index_type='flat'
            quantize = (
                self.hnsw_pq_m == 0
                and self._dtype is not None
                and _np.dtype(self._dtype) == _np.int8
            )
            self.index = HNSWIndex(
                dim=dim,
                metric=self.metric,
                quantize=quantize,
                pq_m=self.hnsw_pq_m,
                pq_refine=self.hnsw_pq_refine,
            )
            self._dim = dim
            return
        import jax.numpy as jnp

        kw = {} if self.refine == "default" else {"refine": self.refine}
        self.index = DeviceFlatIndex(
            dim=dim,
            metric=self.metric,
            capacity=self._init_capacity,
            dtype=self._dtype or jnp.float32,
            mesh=self.mesh,
            kf_mult=self.kf_mult,
            **kw,
        )
        self._dim = dim

    # -- mutation ---------------------------------------------------------

    def add_documents(
        self, documents: Sequence[Document], ids: Optional[Sequence[str]] = None
    ) -> List[str]:
        documents = list(documents)
        if ids is not None:
            if len(ids) != len(documents):
                raise ValueError("ids and documents length mismatch")
            for doc, doc_id in zip(documents, ids):
                doc.id = doc_id
        if not documents:
            return []
        # embed in bounded chunks so a 100k-doc ingest doesn't materialize
        # one giant activation batch
        contents = [d.content for d in documents]
        chunk = 4096
        if len(contents) <= chunk:
            vectors = self.embedding.encode(contents)
        else:
            vectors = np.concatenate(
                [
                    self.embedding.encode(contents[i : i + chunk])
                    for i in range(0, len(contents), chunk)
                ]
            )
        # embedding happens outside the write lock so a slow encoder
        # doesn't block in-flight queries; only the index/docstore
        # mutation needs exclusivity
        with self._rw.write():
            if self.index is None:
                self._create_index(vectors.shape[1])
            # within-batch duplicate ids: keep the LAST occurrence
            # (overwrite semantics). The stale check below only sees ids
            # already in the docstore, so an earlier same-id copy in THIS
            # batch would leave an orphaned live row — searchable forever,
            # unresolvable, and invisible to compaction.
            last = {d.id: i for i, d in enumerate(documents) if d.id is not None}
            if any(
                d.id is not None and last[d.id] != i
                for i, d in enumerate(documents)
            ):
                keep = [
                    i for i, d in enumerate(documents)
                    if d.id is None or last[d.id] == i
                ]
                documents = [documents[i] for i in keep]
                vectors = vectors[keep]
            # overwrite semantics for duplicate ids: tombstone the old rows
            stale = [
                p
                for d in documents
                if d.id is not None
                and (p := self.docstore.position_of(d.id)) is not None
            ]
            if stale:
                self.index.mark_deleted(np.asarray(stale))
            positions = self.index.add(vectors)
            # record BEFORE auto-train: training may compact the index,
            # and the docstore must hold these rows' positions when the
            # compaction remap is applied (else fresh docs keep stale
            # pre-compaction positions)
            ids = self.docstore.add(documents, positions.tolist())
            self._maybe_train_ivf()
            return ids

    def _maybe_train_ivf(self) -> None:
        """Convert the staging flat index to IVF once enough rows exist
        (auto-train semantics). Positions are preserved 1:1, so the
        docstore mapping carries over; tombstones re-apply."""
        if (
            self.index_type != "ivf"
            or not isinstance(self.index, DeviceFlatIndex)
            or self.index.size < self.train_threshold
        ):
            return
        import jax

        from rag_arc_tpu.index.ivf import DeviceIVFIndex

        flat = self.index
        if flat.n_deleted or flat._gap_rows:
            # compact first so k-means never trains on tombstoned or
            # int8 block-alignment gap rows (zero vectors drag a centroid
            # toward the origin) and the IVF accounting starts clean;
            # positions remap through the docstore like any compaction
            self.docstore.reassign(flat.compact())
        # compaction leaves live rows as a contiguous prefix (int8 mode
        # re-creates at most one tail gap block), so the slice below holds
        # exactly the live vectors at their final positions
        n_live = flat.size - flat._gap_rows
        vectors = np.asarray(
            jax.device_get(flat.emb[:n_live]), dtype=np.float32
        )
        if flat.quantized:
            # staging rows are int8 codes; dequantize through the per-row
            # scale (sqnorm doubles as the scale in int8 mode)
            scale = np.asarray(jax.device_get(flat.sqnorm[:n_live]))
            vectors = vectors * scale[:, None]
        logger.info(
            "training IVF (nlist=%d) over %d rows", self.nlist, n_live
        )
        import jax.numpy as jnp

        ivf = DeviceIVFIndex.from_vectors(
            vectors,
            nlist=self.nlist,
            nprobe=self.nprobe,
            metric=self.metric,
            dtype=self._dtype or jnp.float32,
            mesh=self.mesh,
            spill=self.ivf_spill,
            spill_cap=self.ivf_spill_cap,
        )
        self.index = ivf

    def delete(self, ids: Sequence[str]) -> bool:
        with self._rw.write():
            freed = self.docstore.delete(ids)
            if not freed:
                return False
            self.index.mark_deleted(np.asarray(freed))
            if (
                hasattr(self.index, "compact")
                and self.index.size > 0
                and self.index.n_deleted / self.index.size > self.compact_threshold
            ):
                self._compact_locked()
            return True

    def compact(self) -> None:
        with self._rw.write():
            self._compact_locked()

    def _compact_locked(self) -> None:
        mapping = self.index.compact()
        self.docstore.reassign(mapping)

    def get_by_ids(self, ids: Sequence[str]) -> List[Document]:
        return self.docstore.get_by_ids(ids)

    # -- search -----------------------------------------------------------

    def _resolve(
        self, scores: np.ndarray, positions: np.ndarray
    ) -> List[Tuple[Document, float]]:
        out: List[Tuple[Document, float]] = []
        for score, pos in zip(scores, positions):
            if pos < 0:
                continue
            doc = self.docstore.get_by_position(int(pos))
            if doc is not None:
                out.append((doc, float(score)))
        return out

    def similarity_search_with_score(
        self, query: str, k: int = 4, **kwargs: Any
    ) -> List[Tuple[Document, float]]:
        vec = self.embedding.encode([query])[0]
        return self.similarity_search_by_vector_with_score(vec, k, **kwargs)

    def similarity_search_by_vector_with_score(
        self, embedding: Sequence[float], k: int = 4, **kwargs: Any
    ) -> List[Tuple[Document, float]]:
        if self.index is None or self.index.n_active == 0:
            return []
        q = np.asarray(embedding, dtype=np.float32).reshape(1, -1)
        with self._rw.read():
            scores, positions = self.index.search(q, k)
            return self._resolve(scores[0], positions[0])

    def batch_similarity_search_with_score(
        self, queries: Sequence[str], k: int = 4
    ) -> List[List[Tuple[Document, float]]]:
        """Batched entry: one device dispatch for many queries — the shape
        the serving layer and multi-query rewrite feed (not in the
        reference, which is strictly one-query-at-a-time).

        When the embedder exposes a device path (``encode_device``) and the
        index is device-resident, the encoder forward chains straight into
        index search without the embeddings ever visiting the host — only
        token ids go up and (score, position) pairs come back.
        """
        if self.index is None or self.index.n_active == 0 or not queries:
            return [[] for _ in queries]
        with self._rw.read():
            scores, positions = self._batch_search_raw(list(queries), k)
            return [self._resolve(s, p) for s, p in zip(scores, positions)]

    def dispatch_batch_search(
        self, queries: Sequence[str], k: int = 4
    ) -> Callable[[], List[List[Tuple[Document, float]]]]:
        """Async variant of :meth:`batch_similarity_search_with_score`:
        embeds + enqueues the device search and returns a ``fetch``
        callable that blocks on the single result readback. A caller
        streaming batches dispatches them all, then fetches in order —
        the ~35 ms tunnel round trip amortizes over the stream instead
        of serializing it (the composed pipeline measured 50.7 ms per
        32-query batch when each batch paid its own round trip)."""
        if self.index is None or self.index.n_active == 0 or not queries:
            empty = [[] for _ in queries]
            return lambda: empty
        with self._rw.read():
            fetch_raw = self._dispatch_search_raw(list(queries), k)

        def fetch() -> List[List[Tuple[Document, float]]]:
            scores, positions = fetch_raw()
            return [self._resolve(s, p) for s, p in zip(scores, positions)]

        return fetch

    def dispatch_search_raw(
        self, queries: Sequence[str], k: int = 4
    ) -> Callable[[], Tuple[np.ndarray, np.ndarray]]:
        """Raw-positions async search: enqueue now, fetch returns
        ``(scores (B, k), positions (B, k))`` with -inf/-1 padding and NO
        Document materialization — the shared-id-space fusion path
        (``MultiPathRetriever(shared_id_space=True)``) fuses on positions
        and resolves only the final fused top-k."""
        if self.index is None or self.index.n_active == 0 or not queries:
            b = len(queries)
            out = (
                np.full((b, k), -np.inf, dtype=np.float32),
                np.full((b, k), -1, dtype=np.int64),
            )
            return lambda: out
        with self._rw.read():
            return self._dispatch_search_raw(list(queries), k)

    def resolve_positions(
        self, rows: np.ndarray
    ) -> List[List[Optional[Document]]]:
        """Slot-aligned Document lookup for raw position rows: one entry
        per slot, ``None`` for -1 / missing positions (callers keep their
        score alignment and skip the Nones)."""
        return [
            [
                self.docstore.get_by_position(int(p)) if p >= 0 else None
                for p in row
            ]
            for row in rows
        ]

    @property
    def position_space_size(self) -> int:
        return len(self.docstore)

    def _batch_search_raw(
        self, queries: List[str], k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        return self._dispatch_search_raw(queries, k)()

    def _dispatch_search_raw(
        self, queries: List[str], k: int
    ) -> Callable[[], Tuple[np.ndarray, np.ndarray]]:
        encode_device = getattr(self.embedding, "encode_device", None)
        search_device = getattr(self.index, "search_device", None)
        tokenizer = getattr(self.embedding, "tokenizer", None)
        if encode_device is None or search_device is None or tokenizer is None:
            vecs = self.embedding.encode(queries)
            dispatch = getattr(self.index, "search_dispatch", None)
            if dispatch is not None:
                # host embedder + device index: enqueue the device
                # program now, defer the single readback
                return dispatch(np.asarray(vecs), k)
            out = self.index.search(vecs, k)
            return lambda: out
        import jax
        import jax.numpy as jnp
        import math

        from rag_arc_tpu.utils.tracing import stage

        # chained hot path, exactly three host<->device boundary events:
        # upload (ids, mask), dispatch encode->search device-to-device,
        # one fetch of the final (scores, positions) pair
        with stage("store.tokenize"):
            cleaned = [t.replace("\n", " ") for t in queries]
            ids, mask = tokenizer.batch_encode(cleaned)
            length = self.embedding._bucket_len(ids.shape[1])
            if length > ids.shape[1]:
                pad = length - ids.shape[1]
                ids = np.pad(ids, ((0, 0), (0, pad)))
                mask = np.pad(mask, ((0, 0), (0, pad)))
            elif length < ids.shape[1]:
                ids, mask = ids[:, :length], mask[:, :length]
            b = len(queries)
            b_pad = 1 << math.ceil(math.log2(max(b, 1)))
            if b_pad > b:
                ids = np.pad(ids, ((0, b_pad - b), (0, 0)))
                mask = np.pad(mask, ((0, b_pad - b), (0, 0)))
        k_eff = min(k, self.index.capacity)
        with stage("store.dispatch"):
            q_dev = encode_device(jnp.asarray(ids), jnp.asarray(mask))
            s_dev, p_dev = search_device(q_dev, k_eff)

        from rag_arc_tpu.utils.transfers import current_pool

        pool = current_pool()
        handle = pool.register((s_dev, p_dev)) if pool is not None else None

        def fetch_chained() -> Tuple[np.ndarray, np.ndarray]:
            # the ONLY readback on the chained path: one device_get of
            # the final (scores, positions) pair — pooled across the
            # stream when a TransferPool is active
            with stage("store.fetch"):
                if handle is not None:
                    s_host, p_host = pool.result(handle)
                else:
                    s_host, p_host = jax.device_get((s_dev, p_dev))
            return self._normalize_raw(
                np.asarray(s_host), np.asarray(p_host), b, k, k_eff
            )

        return fetch_chained

    @staticmethod
    def _normalize_raw(
        scores: np.ndarray, positions: np.ndarray, b: int, k: int, k_eff: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        scores = scores[:b]
        positions = positions[:b].astype(np.int64)
        # normalize both device sentinels (-inf from the direct path,
        # finite NEG=-3e38 from the Pallas paths) to the -inf/-1 contract
        positions = np.where(
            np.isneginf(scores) | (scores <= -1.0e38), -1, positions
        )
        scores = np.where(positions < 0, -np.inf, scores)
        if k_eff < k:
            pad = k - k_eff
            scores = np.pad(scores, ((0, 0), (0, pad)), constant_values=-np.inf)
            positions = np.pad(positions, ((0, 0), (0, pad)), constant_values=-1)
        return scores, positions

    def multi_query_search(
        self,
        variants_per_query: Sequence[Sequence[str]],
        k: int = 10,
        k_per_variant: int = 20,
        rrf_k: int = 60,
    ) -> List[List[Tuple[Document, float]]]:
        """Fused multi-query fan-out (BASELINE config 4): every variant of
        every query answers in ONE batched dispatch, and the per-variant
        rankings fuse on device with RRF (ops.fusion_kernel) — candidates
        only resolve to Documents after fusion."""
        import jax
        import jax.numpy as jnp

        from rag_arc_tpu.ops.fusion_kernel import rrf_fuse_positions

        if self.index is None or self.index.n_active == 0:
            return [[] for _ in variants_per_query]
        flat_queries = [v for vs in variants_per_query for v in vs]
        if not flat_queries:
            return [[] for _ in variants_per_query]
        with self._rw.read():
            # resolution must stay under the read lock: a concurrent
            # delete can cross compact_threshold and remap positions, and
            # pre-compaction positions would resolve to the WRONG documents
            _, positions = self._batch_search_raw(flat_queries, k_per_variant)
            b = len(variants_per_query)
            p_max = max(len(vs) for vs in variants_per_query)
            grouped = np.full((b, p_max, k_per_variant), -1, dtype=np.int32)
            row = 0
            for qi, vs in enumerate(variants_per_query):
                for pi in range(len(vs)):
                    grouped[qi, pi] = positions[row]
                    row += 1
            scores, fused = rrf_fuse_positions(
                jnp.asarray(grouped), k_out=k, rrf_k=rrf_k
            )
            scores, fused = (
                np.asarray(a) for a in jax.device_get((scores, fused))
            )
            return [self._resolve(s, p) for s, p in zip(scores, fused)]

    def max_marginal_relevance_search(
        self,
        query: str,
        k: int = 4,
        fetch_k: int = 20,
        lambda_mult: float = 0.5,
        **kwargs: Any,
    ) -> List[Document]:
        vec = np.asarray(self.embedding.encode([query])[0])
        return self.max_marginal_relevance_search_by_vector(
            vec, k=k, fetch_k=fetch_k, lambda_mult=lambda_mult
        )

    def max_marginal_relevance_search_by_vector(
        self,
        embedding: Sequence[float],
        k: int = 4,
        fetch_k: int = 20,
        lambda_mult: float = 0.5,
    ) -> List[Document]:
        if self.index is None or self.index.n_active == 0:
            return []
        q = np.asarray(embedding, dtype=np.float32).reshape(1, -1)
        with self._rw.read():
            _, positions = self.index.search(q, fetch_k)
            cand_pos = positions[0][positions[0] >= 0]
            if cand_pos.size == 0:
                return []
            cand_vecs = self.index.take(cand_pos)
            # select AND resolve under the lock — a concurrent compaction
            # would remap positions out from under cand_pos
            chosen = mmr_select(q[0], cand_vecs, k=k, lambda_mult=lambda_mult)
            docs = []
            for i in chosen:
                doc = self.docstore.get_by_position(int(cand_pos[i]))
                if doc is not None:
                    docs.append(doc)
            return docs

    # -- introspection ----------------------------------------------------

    def get_vectorstore_info(self) -> Dict[str, Any]:
        info: Dict[str, Any] = {
            "type": type(self).__name__,
            "metric": self.metric,
            "num_documents": len(self.docstore),
            "embedding": type(self.embedding).__name__,
        }
        if self.index is not None:
            info["index"] = self.index.stats()
        return info

    def __len__(self) -> int:
        return len(self.docstore)

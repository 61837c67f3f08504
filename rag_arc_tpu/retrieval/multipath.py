"""Multi-path retrieval with rank fusion.

Parity with the reference's ``MultiPathRetriever``
(``core/retrieval/mutipath.py:8``): fan a query out to N retrievers
(``top_k_per_retriever`` each, default 50), convert hits to
``RetrievalResult``, fuse with a ``FusionMethod`` (default RRF), return the
fused top-k; a failing path contributes an empty list and the query
continues (``mutipath.py:78-80``). ``add_retriever`` / ``remove_retriever``
/ ``set_fusion_method`` management included.

TPU refinement: the batched entry fans out *batches* — each path answers
all queries in one device dispatch (``invoke_batch``), so a hybrid
dense+BM25 configuration costs two XLA dispatches total rather than
2·B sequential searches.
"""

from __future__ import annotations

import logging
import threading
from typing import Any, Callable, List, Optional, Sequence

from rag_arc_tpu.retrieval.base import BaseRetriever
from rag_arc_tpu.utils.data_model import Document, RetrievalResult
from rag_arc_tpu.utils.fusion import FusionMethod, RRFusion, results_from_ranked_docs

logger = logging.getLogger(__name__)


class MultiPathRetriever(BaseRetriever):
    def __init__(
        self,
        retrievers: Sequence[BaseRetriever],
        fusion_method: Optional[FusionMethod] = None,
        top_k: int = 10,
        top_k_per_retriever: int = 50,
        name: Optional[str] = None,
    ):
        super().__init__(name=name)
        if not retrievers:
            raise ValueError("MultiPathRetriever needs at least one retriever")
        self.retrievers: List[BaseRetriever] = list(retrievers)
        self.fusion_method = fusion_method or RRFusion()
        self.top_k = top_k
        self.top_k_per_retriever = top_k_per_retriever
        self._pool = None
        self._pool_lock = threading.Lock()

    def _path_pool(self):
        """Lazy per-instance fan-out pool, grown if paths are added.

        Thread-safety contract (serving handles concurrent requests): the
        lock makes create/grow atomic, and an outgrown pool is NEVER shut
        down — a concurrent invoke may already hold it, and shutdown()
        would fail its map() with "cannot schedule new futures". Dropping
        the reference is enough: executor workers hold only a weakref to
        their executor, so GC of the old pool wakes and exits its idle
        threads (no leak), while in-flight work completes normally.
        """
        from concurrent.futures import ThreadPoolExecutor

        n = max(2, len(self.retrievers))
        with self._pool_lock:
            if self._pool is None or self._pool._max_workers < n:
                self._pool = ThreadPoolExecutor(
                    max_workers=n, thread_name_prefix="multipath"
                )
            return self._pool

    # -- mutation ---------------------------------------------------------

    def add_documents(self, documents: Sequence[Document], **kwargs: Any) -> List[str]:
        """Fan a corpus mutation out to every path that supports it.

        The reference's multipath has no mutation surface, but a hybrid
        serving deployment (dense + BM25 behind one endpoint) needs /add
        and /delete to hit ALL paths. Ids are assigned up front so every
        path stores the SAME id — each leaf would otherwise mint its own
        and a later delete would only reach one index. Paths without
        add_documents are skipped with a warning (a read-only path in the
        fan-out should not reject writes for the others).
        """
        import uuid

        docs = list(documents)
        for doc in docs:
            if not doc.id:
                doc.id = uuid.uuid4().hex
        ids = [doc.id for doc in docs]
        supported = 0
        for retriever in self.retrievers:
            add = getattr(retriever, "add_documents", None)
            if add is None:
                logger.warning(
                    "path %r does not support add_documents; skipping",
                    retriever.name,
                )
                continue
            add(docs, **kwargs)
            supported += 1
        if not supported:
            raise TypeError("no retrieval path supports add_documents")
        return ids

    def delete(self, ids: Sequence[str]) -> bool:
        """Delete ids from every path that supports deletes; True if any
        path deleted anything."""
        deleted = False
        for retriever in self.retrievers:
            delete = getattr(retriever, "delete", None)
            if delete is not None:
                deleted = bool(delete(ids)) or deleted
        return deleted

    # -- management -------------------------------------------------------

    def add_retriever(self, retriever: BaseRetriever) -> None:
        self.retrievers.append(retriever)

    def remove_retriever(self, name: str) -> bool:
        before = len(self.retrievers)
        self.retrievers = [r for r in self.retrievers if r.name != name]
        return len(self.retrievers) < before

    def set_fusion_method(self, fusion_method: FusionMethod) -> None:
        self.fusion_method = fusion_method

    # -- retrieval --------------------------------------------------------

    def _path_results(
        self, retriever: BaseRetriever, queries: Sequence[str], k: int
    ) -> List[List[RetrievalResult]]:
        """One path's per-query ranked results; failures → empty lists."""
        try:
            per_query = retriever.invoke_batch(queries, k=k)
        except Exception as exc:  # noqa: BLE001 — path isolation by contract
            logger.warning(
                "retrieval path %r failed (%s); continuing without it",
                retriever.name,
                exc,
            )
            return [[] for _ in queries]
        return [
            results_from_ranked_docs(docs, source=retriever.name)
            for docs in per_query
        ]

    def _get_relevant_documents(self, query: str, **kwargs: Any) -> List[Document]:
        return self._get_relevant_documents_batch([query], **kwargs)[0]

    def dispatch_batch(
        self, queries: Sequence[str], **kwargs: Any
    ) -> Optional["Callable[[], List[List[Document]]]"]:
        """Async fan-out: every async-capable path dispatches NOW (device
        programs overlap each other and any host-side path work); fetch
        resolves all paths and fuses. Fusion uses ``RRFusion.fuse_ranked``
        when available — identical math to ``fuse`` without allocating
        2·B·k ``RetrievalResult`` wrappers per batch. Falls back to
        ``None`` (caller uses the sync path) only when NO path supports
        dispatch; a sync path inside a mixed fan-out computes at fetch
        time, after every async dispatch is already in flight."""
        top_k = int(kwargs.get("k", self.top_k))
        per_path_k = int(
            kwargs.get("top_k_per_retriever", self.top_k_per_retriever)
        )
        _FAILED = object()  # dispatch-time failure → empty at fetch
        fetches: List[Any] = []
        any_async = False
        for r in self.retrievers:
            dispatch = getattr(r, "dispatch_batch", None)
            try:
                f = (
                    dispatch(queries, k=per_path_k)
                    if dispatch is not None else None
                )
            except Exception as exc:  # noqa: BLE001 — path isolation
                logger.warning(
                    "retrieval path %r failed at dispatch (%s); continuing "
                    "without it", r.name, exc,
                )
                f = _FAILED
            if f is not None and f is not _FAILED:
                any_async = True
            fetches.append(f)
        if not any_async:
            return None
        fuse_ranked = getattr(self.fusion_method, "fuse_ranked", None)

        def fetch() -> List[List[Document]]:
            all_paths: List[List[List[Document]]] = []
            for r, f in zip(self.retrievers, fetches):
                try:
                    if f is _FAILED:
                        all_paths.append([[] for _ in queries])
                    elif f is not None:
                        all_paths.append(f())
                    else:
                        all_paths.append(
                            r.invoke_batch(queries, k=per_path_k)
                        )
                except Exception as exc:  # noqa: BLE001 — path isolation
                    logger.warning(
                        "retrieval path %r failed (%s); continuing "
                        "without it", r.name, exc,
                    )
                    all_paths.append([[] for _ in queries])
            fused: List[List[Document]] = []
            for qi in range(len(queries)):
                per_query = [path[qi] for path in all_paths]
                if fuse_ranked is not None:
                    fused.append(fuse_ranked(per_query, top_k))
                else:
                    fused.append(
                        self.fusion_method.fuse(
                            [
                                results_from_ranked_docs(
                                    docs, source=r.name
                                )
                                for r, docs in zip(self.retrievers, per_query)
                            ],
                            top_k,
                        )
                    )
            return fused

        return fetch

    def _get_relevant_documents_batch(
        self, queries: Sequence[str], **kwargs: Any
    ) -> List[List[Document]]:
        top_k = int(kwargs.get("k", self.top_k))
        per_path_k = int(kwargs.get("top_k_per_retriever", self.top_k_per_retriever))
        if len(self.retrievers) <= 1:
            all_paths = [
                self._path_results(r, queries, per_path_k)
                for r in self.retrievers
            ]
        else:
            # paths overlap: a dense path is a device dispatch that mostly
            # *waits* (XLA program + result fetch) while a BM25 path is host
            # CPU work — fanning out makes a hybrid query cost max(paths),
            # not sum(paths). A lazy per-instance pool avoids per-request
            # thread spawn AND the deadlock a shared pool invites when
            # ainvoke (which runs on that shared pool) calls into here.
            # _path_results isolates per-path failures.
            all_paths = list(
                self._path_pool().map(
                    lambda r: self._path_results(r, queries, per_path_k),
                    self.retrievers,
                )
            )
        fused: List[List[Document]] = []
        for qi in range(len(queries)):
            per_query_paths = [path[qi] for path in all_paths]
            fused.append(self.fusion_method.fuse(per_query_paths, top_k))
        return fused

    # -- introspection -----------------------------------------------------

    def get_info(self) -> dict:
        return {
            "retrievers": [r.name for r in self.retrievers],
            "fusion": self.fusion_method.name(),
            "top_k": self.top_k,
            "top_k_per_retriever": self.top_k_per_retriever,
        }

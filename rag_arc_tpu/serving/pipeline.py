"""End-to-end RAG query pipeline.

Composes the stages the reference wires manually in examples: optional
multi-query rewrite → (batched) retrieval → optional cross-encoder rerank →
top-k documents. All concurrent callers share a ``QueryBatcher`` so the
device sees few large dispatches. This is the object the HTTP app serves
and the registry builds from a ``PipelineConfig``.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Any, Dict, List, Optional, Sequence

from rag_arc_tpu.rerank.base import RerankerBase
from rag_arc_tpu.retrieval.base import BaseRetriever
from rag_arc_tpu.retrieval.rewrite import MultiQueryRewriter
from rag_arc_tpu.serving.batcher import QueryBatcher
from rag_arc_tpu.utils.data_model import Document, RetrievalResult
from rag_arc_tpu.utils.fusion import RRFusion, results_from_ranked_docs
from rag_arc_tpu.utils.tracing import get_tracer, stage

logger = logging.getLogger(__name__)


class RagPipeline:
    def __init__(
        self,
        retriever: BaseRetriever,
        reranker: Optional[RerankerBase] = None,
        rewriter: Optional[MultiQueryRewriter] = None,
        top_k: int = 10,
        recall_k: int = 100,
        batch_max: int = 128,
        batch_wait_ms: float = 3.0,
    ):
        self.retriever = retriever
        self.reranker = reranker
        self.rewriter = rewriter
        self.top_k = top_k
        self.recall_k = recall_k
        self.fusion = RRFusion()
        self.batcher = QueryBatcher(
            self._answer_batch, max_batch=batch_max, max_wait_ms=batch_wait_ms
        )
        self.metrics: Dict[str, float] = {"queries": 0, "total_ms": 0.0}
        self._metrics_lock = threading.Lock()

    # -- core --------------------------------------------------------------

    def _answer_batch(self, queries: Sequence[str], k: Optional[int] = None) -> List[List[Document]]:
        k = self.top_k if k is None else int(k)
        t0 = time.time()
        if self.rewriter is not None:
            # expand every query, answer ALL variants in one dispatch, fuse
            # per original query
            expanded: List[str] = []
            spans: List[tuple[int, int]] = []
            with stage("pipeline.rewrite"):
                for q in queries:
                    variants = [q] + self.rewriter.rewrite(q)
                    spans.append((len(expanded), len(expanded) + len(variants)))
                    expanded.extend(variants)
            with stage("pipeline.retrieve"):
                per_variant = self.retriever.invoke_batch(
                    expanded, k=self.recall_k if self.reranker else k
                )
            candidates = []
            for lo, hi in spans:
                paths = [
                    results_from_ranked_docs(per_variant[i], source=f"v{i}")
                    for i in range(lo, hi)
                ]
                candidates.append(
                    self.fusion.fuse(paths, self.recall_k if self.reranker else k)
                )
        else:
            with stage("pipeline.retrieve"):
                candidates = self.retriever.invoke_batch(
                    queries, k=self.recall_k if self.reranker else k
                )
        if self.reranker is not None:
            with stage("pipeline.rerank"):
                batch_rerank = getattr(self.reranker, "rerank_batch", None)
                if batch_rerank is not None:
                    candidates = batch_rerank(queries, candidates, k=k)
                else:
                    candidates = [
                        self.reranker.rerank(q, docs, k=k)
                        for q, docs in zip(queries, candidates)
                    ]
        out = [docs[:k] for docs in candidates]
        elapsed = (time.time() - t0) * 1e3
        with self._metrics_lock:
            # several batcher threads can finish at once (continuous
            # batching) — unlocked += loses updates
            self.metrics["queries"] += len(queries)
            self.metrics["total_ms"] += elapsed
        return out

    # -- public API ----------------------------------------------------------

    def query(self, query: str, k: Optional[int] = None) -> List[Document]:
        """Single query through the shared batcher (thread-safe)."""
        return self.batcher.submit(query, k=k)

    def query_batch(self, queries: Sequence[str], k: Optional[int] = None) -> List[List[Document]]:
        """Direct batched entry (bypasses the micro-batcher)."""
        return self._answer_batch(queries, k=k)

    def query_batch_shared(
        self, queries: Sequence[str], k: Optional[int] = None
    ) -> List[List[Document]]:
        """Batched entry through the SHARED micro-batcher: concurrent
        requests' queries coalesce into device batches up to batch_max.
        The r5 serving trace showed each 64-query HTTP request running as
        its own B=64 device search costing nearly a full B=512 batch; the
        serving app routes /batch through here so load turns into fewer,
        fatter device dispatches. A lone request takes the batcher's idle
        fast path (no coalescing wait)."""
        return self.batcher.submit_many(queries, k=k)

    def query_batches(
        self, batches: Sequence[Sequence[str]], k: Optional[int] = None
    ) -> List[List[List[Document]]]:
        """Streamed batched entry: dispatch every batch's retrieval
        BEFORE fetching any result, so device programs pipeline and the
        host↔device round trip amortizes over the stream instead of
        gating each batch (measured: the composed retrieve+RRF paid
        ~35 ms of tunnel RTT per 32-query batch when driven one batch at
        a time). Falls back to sequential ``query_batch`` when the
        retriever has no async path or a rewriter is configured."""
        k = self.top_k if k is None else int(k)
        dispatch = getattr(self.retriever, "dispatch_batch", None)
        if self.rewriter is not None or dispatch is None:
            return [self._answer_batch(b, k=k) for b in batches]
        recall = self.recall_k if self.reranker else k
        t0 = time.time()
        from rag_arc_tpu.utils.transfers import transfer_pool

        with stage("pipeline.retrieve"), transfer_pool():
            fetches = [dispatch(b, k=recall) for b in batches]
            if any(f is None for f in fetches):
                return [self._answer_batch(b, k=k) for b in batches]
            # force every lazy device launch (BM25 coalescer) into the
            # pool BEFORE the first fetch: the whole stream's readbacks
            # then collapse to ONE device_get round trip
            for f in fetches:
                p = getattr(f, "prime", None)
                if p is not None:
                    p()
            candidates = [f() for f in fetches]
        out: List[List[List[Document]]] = []
        for queries, cands in zip(batches, candidates):
            if self.reranker is not None:
                with stage("pipeline.rerank"):
                    batch_rerank = getattr(self.reranker, "rerank_batch", None)
                    if batch_rerank is not None:
                        cands = batch_rerank(queries, cands, k=k)
                    else:
                        cands = [
                            self.reranker.rerank(q, docs, k=k)
                            for q, docs in zip(queries, cands)
                        ]
            out.append([docs[:k] for docs in cands])
        elapsed = (time.time() - t0) * 1e3
        with self._metrics_lock:
            self.metrics["queries"] += sum(len(b) for b in batches)
            self.metrics["total_ms"] += elapsed
        return out

    def warmup(self, batch_sizes: Sequence[int] = (1, 8, 32)) -> None:
        """Trigger compiles for the common batch buckets at startup so the
        first real queries don't pay compile latency."""
        for bs in batch_sizes:
            try:
                self._answer_batch([f"warmup query {i}" for i in range(bs)])
            except Exception as exc:  # noqa: BLE001 — warmup is best-effort
                logger.warning("warmup batch %d failed: %s", bs, exc)

    def stats(self) -> Dict[str, Any]:
        q = max(self.metrics["queries"], 1)
        return {
            "queries": self.metrics["queries"],
            "mean_ms_per_query": self.metrics["total_ms"] / q,
            "batcher": dict(self.batcher.stats),
            "stages": {
                "rewrite": self.rewriter is not None,
                "rerank": self.reranker is not None,
                "retriever": self.retriever.name,
            },
            "stage_timings": get_tracer().summary(),
        }

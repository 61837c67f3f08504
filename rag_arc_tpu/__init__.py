"""rag_arc_tpu — a TPU-native retrieval-augmented-generation framework.

A from-scratch rebuild of the capabilities of DataArcTech/RAG-ARC
(reference mounted read-only at /root/reference) designed for TPU hardware:
the corpus lives as sharded HBM-resident device arrays, and every scoring
operation (dense MIPS, BM25, RRF fusion, MMR, cross-encoder rerank) is a
JAX/XLA/Pallas program over those arrays. Documents and metadata stay on
host in id-indexed stores; only ids and scores cross the host/device
boundary.

Layer map (mirrors the reference's layering, reference SURVEY.md §1):

  utils/      Document / RetrievalResult data model, fusion
  framework/  tagged-union config system + registry (ref framework/)
  ops/        Pallas + XLA kernels: MIPS top-k, BM25 scoring, MMR, k-means
  parallel/   mesh construction and sharding helpers
  index/      HBM-resident flat & IVF vector indexes, docstore, persistence
  retrieval/  dense / BM25 / multi-path retrievers (ref core/retrieval/)
  models/     Flax encoder + embeddings API (ref core/file_management/embeddings/)
  rerank/     cross-encoder reranker (ref core/rerank/)
  chunking/   markdown / token / recursive / semantic splitters
  parsing/    docx / xlsx / pptx / html / pdf-OCR parsers (ref .../parser/)
  llm/        LLM adapter: OpenAI-compatible client + deterministic fake
  graph/      GraphRAG: LLM extractor + array-backed graph store
  serving/    registry-driven app assembly, query batching frontend
"""

__version__ = "0.1.0"

from rag_arc_tpu.utils.data_model import Document, RetrievalResult

__all__ = ["Document", "RetrievalResult", "__version__"]

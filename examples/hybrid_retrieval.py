"""Hybrid dense+BM25 retrieval with RRF fusion and cross-encoder rerank.

CPU-runnable end to end (deterministic fake embedder + tiny reranker);
swap ``HashEmbeddings`` for ``FlaxEncoderEmbeddings`` to run the real
encoder on TPU.

    python examples/hybrid_retrieval.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rag_arc_tpu.index.vector_store import TPUVectorStore
from rag_arc_tpu.models.embeddings import HashEmbeddings
from rag_arc_tpu.models.encoder import TransformerConfig
from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker
from rag_arc_tpu.retrieval.bm25 import BM25Retriever
from rag_arc_tpu.retrieval.multipath import MultiPathRetriever

CORPUS = [
    "TPU v5e pods connect chips over a high-bandwidth ICI mesh.",
    "Reciprocal rank fusion merges rankings from multiple retrievers.",
    "BM25 scores documents by term frequency and inverse document frequency.",
    "The MXU is a 128x128 systolic array for matrix multiplication.",
    "Cross-encoder rerankers read the query and document jointly.",
    "Chocolate cake requires cocoa, flour, and patience.",
]


def main() -> None:
    embeddings = HashEmbeddings(dim=64)
    dense = TPUVectorStore.from_texts(CORPUS, embeddings).as_retriever()
    sparse = BM25Retriever.from_texts(CORPUS)
    hybrid = MultiPathRetriever([dense, sparse], top_k=4, top_k_per_retriever=6)

    query = "how do rankings from different retrievers get combined?"
    candidates = hybrid.invoke(query)
    print("fused candidates:")
    for doc in candidates:
        print(f"  {doc.metadata['fusion_score']:.4f}  {doc.content}")

    reranker = CrossEncoderReranker(cfg=TransformerConfig.tiny(causal=True))
    final = reranker.rerank(query, candidates, k=2)
    print("\nafter cross-encoder rerank:")
    for doc in final:
        print(f"  {doc.metadata['rerank_score']:.4f}  {doc.content}")


if __name__ == "__main__":
    main()

from rag_arc_tpu.retrieval.base import BaseRetriever
from rag_arc_tpu.retrieval.bm25 import BM25Retriever
from rag_arc_tpu.retrieval.dense import VectorStoreRetriever
from rag_arc_tpu.retrieval.multipath import MultiPathRetriever

__all__ = [
    "BaseRetriever",
    "BM25Retriever",
    "VectorStoreRetriever",
    "MultiPathRetriever",
]

from rag_arc_tpu.retrieval.base import BaseRetriever
from rag_arc_tpu.retrieval.dense import VectorStoreRetriever

__all__ = ["BaseRetriever", "VectorStoreRetriever"]

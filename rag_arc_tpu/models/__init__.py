from rag_arc_tpu.models.embeddings import Embeddings, HashEmbeddings

__all__ = ["Embeddings", "HashEmbeddings"]

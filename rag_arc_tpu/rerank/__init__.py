from rag_arc_tpu.rerank.base import RerankerBase
from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker

__all__ = ["RerankerBase", "CrossEncoderReranker"]

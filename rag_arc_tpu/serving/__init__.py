from rag_arc_tpu.serving.batcher import QueryBatcher
from rag_arc_tpu.serving.pipeline import RagPipeline
from rag_arc_tpu.serving.configs import PipelineConfig

__all__ = ["QueryBatcher", "RagPipeline", "PipelineConfig"]

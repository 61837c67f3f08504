from rag_arc_tpu.utils.data_model import Document, RetrievalResult
from rag_arc_tpu.utils.fusion import FusionMethod, RRFusion, WeightedScoreFusion

__all__ = [
    "Document",
    "RetrievalResult",
    "FusionMethod",
    "RRFusion",
    "WeightedScoreFusion",
]

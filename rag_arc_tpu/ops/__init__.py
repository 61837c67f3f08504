from rag_arc_tpu.ops.scoring import l2_normalize, pairwise_scores
from rag_arc_tpu.ops.topk import masked_topk
from rag_arc_tpu.ops.two_level import two_level_topk

__all__ = ["l2_normalize", "pairwise_scores", "masked_topk", "two_level_topk"]

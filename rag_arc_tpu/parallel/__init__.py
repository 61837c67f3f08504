from rag_arc_tpu.parallel.mesh import (
    corpus_sharding,
    default_mesh,
    replicated_sharding,
)

__all__ = ["default_mesh", "corpus_sharding", "replicated_sharding"]

from rag_arc_tpu.graph.extractor import GraphExtractorBase
from rag_arc_tpu.graph.hyperrag import HyperRAGGraphExtractor
from rag_arc_tpu.graph.schema import (
    Entity,
    EntityRelation,
    Event,
    EventRelation,
    KnowledgeStructure,
)
from rag_arc_tpu.graph.store import ArrayGraphStore

__all__ = [
    "Event",
    "Entity",
    "EventRelation",
    "EntityRelation",
    "KnowledgeStructure",
    "GraphExtractorBase",
    "HyperRAGGraphExtractor",
    "ArrayGraphStore",
]

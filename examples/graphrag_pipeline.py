"""GraphRAG end to end: extract events/entities with an LLM, store the
graph with device-kernel entity merge + event disambiguation, query by
entity-linked chunks.

Runs CPU-only with the deterministic FakeLLM. Point ``OPENAI_BASE_URL`` /
``OPENAI_MODEL`` env vars at an OpenAI-compatible endpoint to extract with
a real model instead (same code path as the reference's
examples/graph_extract drivers).

    python examples/graphrag_pipeline.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rag_arc_tpu.graph import (
    ArrayGraphStore,
    Entity,
    Event,
    HyperRAGGraphExtractor,
    KnowledgeStructure,
)
from rag_arc_tpu.graph.schema import EntityReview
from rag_arc_tpu.llm import FakeLLM, OpenAICompatLLM
from rag_arc_tpu.models.embeddings import HashEmbeddings
from rag_arc_tpu.utils.data_model import Document

DOCS = [
    Document(
        content=(
            "The cooling pump failed during the night shift. Engineers "
            "replaced the pump seal and restarted the reactor."
        ),
        id="incident-1",
    ),
    Document(
        content=(
            "Routine inspection found corrosion on the pump housing. "
            "The maintenance team scheduled a seal replacement."
        ),
        id="incident-2",
    ),
]

# canned structured outputs so the example is deterministic without a model
FAKE_RESPONSES = [
    KnowledgeStructure(
        events=[
            Event(id="E1", content="cooling pump failed during night shift",
                  participants=["cooling pump"]),
            Event(id="E2", content="engineers replaced the pump seal",
                  participants=["pump seal"]),
        ],
        entities=[
            Entity(entity_name="cooling pump", entity_type="object",
                   description="primary cooling pump"),
            Entity(entity_name="pump seal", entity_type="object"),
        ],
    ),
    KnowledgeStructure(),
    KnowledgeStructure(
        events=[
            Event(id="E1", content="inspection found corrosion on pump housing",
                  participants=["pump housing"]),
        ],
        entities=[
            Entity(entity_name="pump housing", entity_type="object"),
            Entity(entity_name="maintenance team", entity_type="organization"),
        ],
    ),
    KnowledgeStructure(),
    EntityReview(keep=["cooling pump", "pump seal"]),
    EntityReview(keep=["pump housing", "maintenance team"]),
]


def main() -> None:
    base_url = os.environ.get("OPENAI_BASE_URL")
    if base_url:
        llm = OpenAICompatLLM(
            model=os.environ.get("OPENAI_MODEL", "gpt-4o-mini"),
            base_url=base_url,
            api_key=os.environ.get("OPENAI_API_KEY", "EMPTY"),
        )
    else:
        llm = FakeLLM(responses=list(FAKE_RESPONSES))

    extractor = HyperRAGGraphExtractor(llm, max_concurrent=1)
    results = extractor(DOCS)
    for r in results:
        print(f"{r.document.id}: {len(r.knowledge.events)} events, "
              f"{len(r.knowledge.entities)} entities in {r.rounds} rounds")

    store = ArrayGraphStore(HashEmbeddings(dim=64), knn_cutoff=0.6)
    stats = store.store_hyperrag_graph(results)
    print("\ngraph statistics:")
    for key, value in stats.items():
        if value:
            print(f"  {key}: {value}")

    print("\nentity-linked chunk retrieval for 'pump seal problems':")
    for doc in store.entity_linked_chunks("pump seal problems", k=2):
        print(f"  [{doc.metadata['graph_score']:.3f}] {doc.content[:70]}")


if __name__ == "__main__":
    main()

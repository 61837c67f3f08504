"""GraphRAG tests: schema validation, multi-round extraction with FakeLLM,
cleaning passes, and the array graph store pipeline (incl. entity merge and
event disambiguation on device kernels)."""

import pytest

from rag_arc_tpu.graph import (
    ArrayGraphStore,
    Entity,
    EntityRelation,
    Event,
    EventRelation,
    HyperRAGGraphExtractor,
    KnowledgeStructure,
)
from rag_arc_tpu.graph.schema import EntityReview, GraphEdge, GraphNode
from rag_arc_tpu.llm import FakeLLM
from rag_arc_tpu.models.embeddings import HashEmbeddings
from rag_arc_tpu.utils.data_model import Document


def ks(events=(), entities=(), ev_rels=(), en_rels=()):
    return KnowledgeStructure(
        events=list(events),
        entities=list(entities),
        event_relations=list(ev_rels),
        entity_relations=list(en_rels),
    )


E1 = Event(id="E1", content="the reactor was started", participants=["reactor"])
E2 = Event(id="E2", content="pressure rose sharply", participants=[])
ENT_R = Entity(entity_name="reactor", entity_type="object", description="main reactor")
ENT_P = Entity(entity_name="pressure sensor", entity_type="object")


class TestSchema:
    def test_event_id_pattern(self):
        with pytest.raises(Exception):
            Event(id="X1", content="bad id")

    def test_entity_name_required_nonempty(self):
        with pytest.raises(Exception):
            Entity(entity_name="   ")

    def test_edge_type_validated(self):
        with pytest.raises(Exception):
            GraphEdge(src="a", dst="b", edge_type="BOGUS")


class TestExtractor:
    def test_multi_round_until_empty(self):
        # round 1 yields E1+entity; round 2 yields nothing new → stops at 2
        llm = FakeLLM(
            responses=[ks(events=[E1], entities=[ENT_R]), ks()]
        )
        ex = HyperRAGGraphExtractor(llm, max_rounds=3, clean=False)
        results = ex([Document(content="reactor startup log")])
        assert results[0].rounds == 2
        assert len(results[0].knowledge.events) == 1
        # metadata carries a JSON-serializable DUMP (documents flow into
        # docstores/snapshots that json.dumps metadata)
        assert results[0].document.metadata["knowledge"] == results[0].knowledge.model_dump()
        import json as _json

        _json.dumps(results[0].document.metadata)

    def test_dedup_by_event_id_and_entity_name(self):
        llm = FakeLLM(
            responses=[
                ks(events=[E1], entities=[ENT_R]),
                ks(events=[E1, E2], entities=[Entity(entity_name="Reactor")]),
                ks(),
            ]
        )
        ex = HyperRAGGraphExtractor(llm, max_rounds=3, clean=False)
        k = ex([Document(content="log")])[0].knowledge
        assert [e.id for e in k.events] == ["E1", "E2"]
        assert len(k.entities) == 1  # "Reactor" dedups case-insensitively

    def test_duplicate_event_relations_remap_to_kept_id(self):
        # round 2 re-emits E1's CONTENT under its own numbering ("E7") and
        # relates it to a new event; the relation must land on the KEPT
        # event, not dangle on the round-local id
        dup = Event(id="E7", content="the reactor was started", participants=[])
        e2 = Event(id="E2", content="pressure rose sharply", participants=[])
        rel = EventRelation(head_event="E7", tail_event="E2", relation_type="CAUSES")
        llm = FakeLLM(
            responses=[
                ks(events=[E1]),
                ks(events=[dup, e2], ev_rels=[rel]),
                ks(),
            ]
        )
        ex = HyperRAGGraphExtractor(llm, max_rounds=3, clean=False)
        k = ex([Document(content="log")])[0].knowledge
        assert [e.id for e in k.events] == ["E1", "E2"]
        assert len(k.event_relations) == 1
        assert k.event_relations[0].head_event == "E1"
        assert k.event_relations[0].tail_event == "E2"

    def test_llm_failure_isolated_per_document(self):
        class Flaky(FakeLLM):
            def __init__(self):
                super().__init__()
                self.n = 0

            def parse_chat(self, messages, response_format, **kw):
                self.n += 1
                if "bad" in messages[-1]["content"]:
                    raise RuntimeError("boom")
                return ks(events=[E1]) if self.n < 3 else ks()

        ex = HyperRAGGraphExtractor(Flaky(), clean=False, max_concurrent=1)
        results = ex([Document(content="good text"), Document(content="bad text")])
        assert len(results) == 2
        ok = [r for r in results if "good" in r.document.content][0]
        bad = [r for r in results if "bad" in r.document.content][0]
        assert ok.knowledge.events and not bad.knowledge.events

    def test_clean_regex_prefilter(self):
        junk = [
            Entity(entity_name="42"),
            Entity(entity_name="it"),
            Entity(entity_name="the"),
            Entity(entity_name="x"),
        ]
        llm = FakeLLM(
            responses=[
                ks(events=[E1], entities=[ENT_R] + junk),
                ks(),
                EntityReview(keep=["reactor"]),
            ]
        )
        ex = HyperRAGGraphExtractor(llm, clean=True)
        k = ex([Document(content="log")])[0].knowledge
        assert [e.entity_name for e in k.entities] == ["reactor"]

    def test_clean_resolves_event_relations_and_drops_dangling(self):
        rels = [
            EventRelation(head_event="E1", tail_event="E2", relation_type="CAUSES"),
            EventRelation(head_event="E1", tail_event="E9", relation_type="CAUSES"),
            EventRelation(head_event="E1", tail_event="E1", relation_type="SELF"),
        ]
        llm = FakeLLM(
            responses=[
                ks(events=[E1, E2], entities=[ENT_R], ev_rels=rels),
                ks(),
                EntityReview(keep=["reactor"]),
            ]
        )
        k = HyperRAGGraphExtractor(llm)([Document(content="t")])[0].knowledge
        assert len(k.event_relations) == 1
        assert k.event_relations[0].head_event == E1.content  # id → content

    def test_clean_entity_relations_dropped_when_entity_dropped(self):
        rels = [
            EntityRelation(head_entity="reactor", tail_entity="42"),
            EntityRelation(head_entity="reactor", tail_entity="reactor"),
        ]
        llm = FakeLLM(
            responses=[
                ks(events=[], entities=[ENT_R, Entity(entity_name="42")], en_rels=rels),
                ks(),
                EntityReview(keep=["reactor"]),
            ]
        )
        k = HyperRAGGraphExtractor(llm)([Document(content="t")])[0].knowledge
        assert k.entity_relations == []

    def test_review_failure_keeps_prefiltered(self):
        class ReviewBoom(FakeLLM):
            def __init__(self, responses):
                super().__init__(responses=responses)

            def parse_chat(self, messages, response_format, **kw):
                if response_format is EntityReview:
                    raise RuntimeError("review down")
                return super().parse_chat(messages, response_format, **kw)

        llm = ReviewBoom([ks(events=[E1], entities=[ENT_R, ENT_P]), ks()])
        k = HyperRAGGraphExtractor(llm)([Document(content="t")])[0].knowledge
        assert {e.entity_name for e in k.entities} == {"reactor", "pressure sensor"}


@pytest.fixture
def extracted():
    doc1 = Document(content="reactor startup procedure log", id="d1")
    doc2 = Document(content="pressure sensor calibration log", id="d2")
    k1 = ks(
        events=[E1, E2],
        entities=[ENT_R, ENT_P],
        ev_rels=[
            EventRelation(
                head_event=E1.content, tail_event=E2.content, relation_type="CAUSES"
            )
        ],
        en_rels=[
            EntityRelation(
                head_entity="reactor", tail_entity="pressure sensor",
                relation_type="MONITORED_BY",
            )
        ],
    )
    k2 = ks(entities=[Entity(entity_name="pressure sensor", description="dup")])
    from rag_arc_tpu.graph.extractor import ExtractionResult

    return [
        ExtractionResult(document=doc1, knowledge=k1),
        ExtractionResult(document=doc2, knowledge=k2),
    ]


class TestStore:
    def test_pipeline_and_statistics(self, extracted):
        store = ArrayGraphStore(HashEmbeddings(dim=32))
        stats = store.store_hyperrag_graph(extracted)
        assert stats["chunks"] == 2
        assert stats["events"] == 2
        assert stats["entities"] == 2
        assert stats["contains_edges"] == 2
        assert stats["participates_edges"] == 1
        assert stats["entity_relation_edges"] == 1
        assert stats["event_relation_edges"] >= 1
        assert stats["entities_with_embeddings"] == 2
        assert len(stats) >= 13

    def test_idempotent_restore(self, extracted):
        store = ArrayGraphStore(HashEmbeddings(dim=32))
        store.store_hyperrag_graph(extracted)
        s1 = store.get_graph_statistics()
        fresh = store.filter_existing_chunks([r.document for r in extracted])
        assert fresh == []
        store.store_hyperrag_graph(extracted)  # re-store: merges, no dupes
        s2 = store.get_graph_statistics()
        assert s1 == s2

    def test_entity_merge_near_duplicates(self):
        from rag_arc_tpu.graph.extractor import ExtractionResult

        doc = Document(content="chunk", id="c")
        k = ks(
            entities=[
                Entity(entity_name="tpu chip accelerator unit", description="long detailed description"),
                Entity(entity_name="the tpu chip accelerator unit"),  # near-dup
                Entity(entity_name="banana bread"),
            ]
        )
        store = ArrayGraphStore(HashEmbeddings(dim=64), merge_threshold=0.8)
        stats = store.store_hyperrag_graph([ExtractionResult(document=doc, knowledge=k)])
        assert stats["entities_merged"] >= 1
        assert "banana bread" in store.nodes["entity"]
        # winner keeps loser as mention
        survivors = [n for n in store.nodes["entity"].values() if "tpu" in n.key]
        assert len(survivors) == 1

    def test_event_disambiguation_adds_similar_edges(self):
        from rag_arc_tpu.graph.extractor import ExtractionResult

        doc = Document(content="c", id="c")
        k = ks(
            events=[
                Event(id="E1", content="the pump failed at noon"),
                Event(id="E2", content="the pump failed at noon today"),
                Event(id="E3", content="lunch was served in the cafeteria"),
            ]
        )
        store = ArrayGraphStore(HashEmbeddings(dim=64), knn_cutoff=0.7)
        stats = store.store_hyperrag_graph([ExtractionResult(document=doc, knowledge=k)])
        assert stats["similar_event_pairs"] >= 1
        similar = [
            e
            for e in store.edges
            if e.edge_type == "EVENT_RELATION"
            and e.properties.get("relation_type") == "SIMILAR_TO"
        ]
        assert similar and all("score" in e.properties for e in similar)

    def test_entity_linked_chunk_retrieval(self, extracted):
        store = ArrayGraphStore(HashEmbeddings(dim=32))
        store.store_hyperrag_graph(extracted)
        docs = store.entity_linked_chunks("reactor", k=2)
        assert docs
        assert docs[0].content == "reactor startup procedure log"

    def test_search_nodes(self, extracted):
        store = ArrayGraphStore(HashEmbeddings(dim=32))
        store.store_hyperrag_graph(extracted)
        hits = store.search_nodes("event", "pressure rise", k=2)
        assert hits and "pressure" in hits[0][0].content

    def test_persistence_roundtrip(self, extracted, tmp_path):
        store = ArrayGraphStore(HashEmbeddings(dim=32))
        store.store_hyperrag_graph(extracted)
        p = tmp_path / "graph.json"
        store.save(p)
        class CountingEmbeddings(HashEmbeddings):
            calls = 0

            def encode(self, texts):
                CountingEmbeddings.calls += 1
                return super().encode(texts)

        store2 = ArrayGraphStore(CountingEmbeddings(dim=32))
        store2.load(p)
        # the snapshot carries the vectors: load must NOT re-encode the
        # whole graph (hours of encoder work at 1M nodes)
        assert CountingEmbeddings.calls == 0
        assert store2.get_graph_statistics() == store.get_graph_statistics()
        assert store2.entity_linked_chunks("reactor", k=1)

    def test_load_with_different_embedder_dim_reencodes(self, extracted, tmp_path):
        """A sidecar saved at dim 32 must not restore into a store whose
        embedder produces dim 16 — that deferred the crash to the first
        search/add; instead load falls back to re-encoding."""
        store = ArrayGraphStore(HashEmbeddings(dim=32))
        store.store_hyperrag_graph(extracted)
        p = tmp_path / "graph.json"
        store.save(p)
        store2 = ArrayGraphStore(HashEmbeddings(dim=16))
        store2.load(p)
        assert store2.get_graph_statistics() == store.get_graph_statistics()
        # searching at the new dim works — index was rebuilt, not restored
        assert store2.search_nodes("event", "pressure rise", k=1)

    def test_delete_and_health(self, extracted):
        store = ArrayGraphStore(HashEmbeddings(dim=32))
        store.store_hyperrag_graph(extracted)
        assert store.health_check()["status"] == "ok"
        store.delete_graph_data()
        assert store.get_graph_statistics()["total_nodes"] == 0


class TestGraphScale:
    def test_moderate_scale_store_and_mesh(self, rng):
        """BASELINE config 5 shape at test scale: entity-linked chunk index
        with the embedding indexes sharded over the 8-device mesh."""
        from rag_arc_tpu.graph.extractor import ExtractionResult
        from rag_arc_tpu.parallel.mesh import default_mesh

        mesh = default_mesh()
        store = ArrayGraphStore(HashEmbeddings(dim=32), mesh=mesh)
        results = []
        for c in range(40):
            doc = Document(content=f"chunk {c} covers area {c % 8} details", id=f"c{c}")
            k = ks(
                events=[
                    Event(
                        id="E1",
                        content=f"event in chunk {c} about area {c % 8}",
                        participants=[f"area {c % 8}"],
                    )
                ],
                entities=[
                    Entity(entity_name=f"area {c % 8}", entity_type="concept"),
                    Entity(entity_name=f"unique entity {c}"),
                ],
            )
            results.append(ExtractionResult(document=doc, knowledge=k))
        stats = store.store_hyperrag_graph(results)
        assert stats["chunks"] == 40
        assert stats["entities"] == 8 + 40  # 8 shared areas + 40 unique
        docs = store.entity_linked_chunks("area 3 details", k=5)
        assert docs and all("area 3" in d.content for d in docs)

    def test_100k_nodes_1M_edges_adjacency(self):
        """VERDICT r1 #7: neighbors/degree/entity-chunk walks must be
        O(degree) via the adjacency index, and entity merges must rebuild
        the edge list once per merge batch — not once per merged entity."""
        import time

        from rag_arc_tpu.graph.schema import GraphEdge, GraphNode

        store = ArrayGraphStore(HashEmbeddings(dim=16))
        n_nodes, n_edges = 100_000, 1_000_000
        t0 = time.time()
        for i in range(n_nodes):
            store.nodes["entity"][f"e{i}"] = GraphNode(
                key=f"e{i}", kind="entity", content=f"entity {i}"
            )
        # ring + random chords, batch-constructed
        for i in range(n_edges):
            src = f"e{i % n_nodes}"
            dst = f"e{(i * 131 + 7) % n_nodes}"
            if src != dst:
                store.add_edge(
                    GraphEdge(
                        src=src, dst=dst, edge_type="ENTITY_RELATION",
                        properties={"relation_type": f"r{i % 97}"},
                    )
                )
        build_s = time.time() - t0
        assert len(store.edges) > 0.9 * n_edges

        # O(deg) neighbor queries: 2000 lookups must be near-instant
        t0 = time.time()
        total = sum(len(store.neighbors("entity", f"e{i}")) for i in range(2000))
        lookup_s = time.time() - t0
        assert total > 0
        assert lookup_s < 2.0, f"2000 neighbor lookups took {lookup_s:.2f}s"

        # batched merge: 500 losers fold into winners in ONE edge rebuild
        redirect = {f"e{i}": f"e{i + 50_000}" for i in range(500)}
        t0 = time.time()
        merged = store._apply_entity_merges(redirect)
        merge_s = time.time() - t0
        assert merged == 500
        # generous bound: one pass over 1M edges, not 500 passes
        assert merge_s < 30.0, f"batch merge took {merge_s:.2f}s"
        assert all(f"e{i}" not in store.nodes["entity"] for i in range(500))
        # adjacency stayed consistent with the rebuilt edge list
        assert store.degree("e0") == 0
        nb = store.neighbors("entity", "e50000")
        assert all(
            e.src == "e50000" or e.dst == "e50000" for _, e in nb
        )
        assert build_s < 120.0, f"graph build took {build_s:.1f}s"

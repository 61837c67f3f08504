"""Neo4j mirror adapter behavior tests against a protocol-level fake
driver (no neo4j package or server exists in this environment — r1 only
checked import gating, leaving the adapter's Cypher/retry behavior
unpinned). r3 pins the batched UNWIND write path, vector-index schema,
and embedding mirroring too."""

import pytest

from rag_arc_tpu.graph.neo4j_store import Neo4jGraphStore
from rag_arc_tpu.graph.schema import GraphEdge, GraphNode
from rag_arc_tpu.models.embeddings import HashEmbeddings


class FakeSession:
    def __init__(self, driver):
        self.driver = driver

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def run(self, query, **params):
        if self.driver.fail_next > 0:
            self.driver.fail_next -= 1
            raise ConnectionError("transient blip")
        self.driver.queries.append((query, params))
        if query.startswith("RETURN 1"):
            return [{"ok": 1}]
        return []


class FakeDriver:
    def __init__(self):
        self.queries = []
        self.databases = []
        self.fail_next = 0
        self.closed = False

    def session(self, database=None):
        self.databases.append(database)
        return FakeSession(self)

    def close(self):
        self.closed = True


@pytest.fixture
def store():
    driver = FakeDriver()
    s = Neo4jGraphStore(
        HashEmbeddings(dim=16),
        driver=driver,
        database="graphdb",
        retry_wait_base=0.0,
        batch_size=1,  # immediate flush: each mutation is one UNWIND
    )
    return s, driver


class TestMirror:
    def test_schema_constraints_and_vector_indexes_up_front(self, store):
        _, driver = store
        constraints = [q for q, _ in driver.queries if "CONSTRAINT" in q]
        assert len(constraints) == 3
        assert all("IF NOT EXISTS" in c for c in constraints)
        # 768-dim-cosine-style vector indexes per label (ref parity:
        # event_graphrag_neo4j.py:266-300), dim from the embedder
        vector = [(q, p) for q, p in driver.queries if "VECTOR INDEX" in q]
        assert len(vector) == 3
        # dim is INLINED, not a $parameter — Neo4j rejects parameters in
        # schema commands, so a parameterized form fails on a real server
        assert all("`vector.dimensions`: 16" in q for q, _ in vector)
        assert all(not p for _, p in vector)
        assert any(":Entity" in q for q, _ in vector)
        assert set(driver.databases) == {"graphdb"}

    def test_upsert_mirrors_unwind_merge_cypher(self, store):
        s, driver = store
        driver.queries.clear()
        s.upsert_node(
            GraphNode(
                key="paris", kind="entity", content="Paris",
                properties={"mentions": ["paris"], "blob": {"not": "scalar"}},
            )
        )
        (query, params), = driver.queries
        assert query.startswith("UNWIND $rows AS row MERGE (n:Entity {key: row.key})")
        (row,) = params["rows"]
        assert row["key"] == "paris"
        assert row["props"] == {"mentions": ["paris"]}  # non-scalars dropped
        # array store also holds the node (mirror, not replacement)
        assert "paris" in s.nodes["entity"]

    def test_edge_mirrored_once(self, store):
        s, driver = store
        for key in ("a", "b"):
            s.upsert_node(GraphNode(key=key, kind="entity", content=key))
        driver.queries.clear()
        edge = GraphEdge(src="a", dst="b", edge_type="ENTITY_RELATION",
                         properties={"relation_type": "rel"})
        assert s.add_edge(edge) is True
        assert s.add_edge(edge) is False  # dedup: no second Cypher
        assert len(driver.queries) == 1
        query, params = driver.queries[0]
        assert "MERGE (a)-[r:ENTITY_RELATION]->(b)" in query
        (row,) = params["rows"]
        assert row == {"src": "a", "dst": "b", "props": {"relation_type": "rel"}}

    def test_batched_writes_coalesce_into_one_unwind(self):
        driver = FakeDriver()
        s = Neo4jGraphStore(
            HashEmbeddings(dim=16), driver=driver, retry_wait_base=0.0,
            batch_size=100,
        )
        driver.queries.clear()
        for i in range(10):
            s.upsert_node(GraphNode(key=f"n{i}", kind="entity", content=f"c{i}"))
        assert driver.queries == []  # buffered, below batch_size
        s.flush()
        (query, params), = driver.queries
        assert query.startswith("UNWIND $rows AS row MERGE (n:Entity")
        assert len(params["rows"]) == 10

    def test_batch_size_triggers_auto_flush(self):
        driver = FakeDriver()
        s = Neo4jGraphStore(
            HashEmbeddings(dim=16), driver=driver, retry_wait_base=0.0,
            batch_size=5,
        )
        driver.queries.clear()
        for i in range(5):
            s.upsert_node(GraphNode(key=f"n{i}", kind="chunk", content=f"c{i}"))
        assert len(driver.queries) == 1  # auto-flushed at the batch size
        assert len(driver.queries[0][1]["rows"]) == 5

    def test_failed_flush_requeues_rows(self):
        """An outage past the retry budget must NOT drop buffered mirror
        rows: flush re-queues the unwritten remainder and re-raises; the
        next flush writes everything."""
        driver = FakeDriver()
        s = Neo4jGraphStore(
            HashEmbeddings(dim=16), driver=driver, retry_wait_base=0.0,
            batch_size=100, max_retries=2,
        )
        driver.queries.clear()
        for i in range(4):
            s.upsert_node(GraphNode(key=f"n{i}", kind="entity", content=f"c{i}"))
        driver.fail_next = 2  # exhaust both retries of the first UNWIND
        with pytest.raises(ConnectionError):
            s.flush()
        assert driver.queries == []  # nothing written
        assert s._pending == 4  # ...but nothing lost either
        # a fresh upsert joins the survivors; the retry writes all 5
        s.upsert_node(GraphNode(key="n4", kind="entity", content="c4"))
        s.flush()
        (query, params), = driver.queries
        assert query.startswith("UNWIND")
        assert {r["key"] for r in params["rows"]} == {f"n{i}" for i in range(5)}
        assert s._pending == 0
        driver = FakeDriver()
        s = Neo4jGraphStore(
            HashEmbeddings(dim=16), driver=driver, retry_wait_base=0.0,
            batch_size=100,
        )
        s.upsert_node(GraphNode(key="a", kind="entity", content="a"))
        s.upsert_node(GraphNode(key="b", kind="entity", content="b"))
        s.add_edge(GraphEdge(src="a", dst="b", edge_type="ENTITY_RELATION"))
        driver.queries.clear()
        s.flush()
        kinds = ["node" if "MERGE (n:" in q else "edge" for q, _ in driver.queries]
        assert kinds == ["node", "edge"]

    def test_generate_embeddings_mirrors_vectors(self):
        driver = FakeDriver()
        s = Neo4jGraphStore(
            HashEmbeddings(dim=16), driver=driver, retry_wait_base=0.0,
            batch_size=100,
        )
        s.upsert_node(GraphNode(key="e1", kind="entity", content="first entity"))
        s.upsert_node(GraphNode(key="e2", kind="entity", content="second entity"))
        driver.queries.clear()
        n = s.generate_embeddings()
        assert n == 2
        embeds = [
            (q, p) for q, p in driver.queries if "SET n.embedding" in q
        ]
        (query, params), = embeds
        assert "MATCH (n:Entity {key: row.key})" in query
        assert len(params["rows"]) == 2
        assert len(params["rows"][0]["embedding"]) == 16

    def test_transient_failure_retries_then_succeeds(self, store):
        s, driver = store
        driver.queries.clear()
        driver.fail_next = 2  # two blips, third attempt lands
        s.upsert_node(GraphNode(key="x", kind="chunk", content="x"))
        assert len(driver.queries) == 1

    def test_retries_exhausted_raises(self, store):
        s, driver = store
        driver.fail_next = 99
        with pytest.raises(ConnectionError, match="unreachable"):
            s.upsert_node(GraphNode(key="y", kind="chunk", content="y"))

    def test_delete_graph_data_detach_deletes(self, store):
        s, driver = store
        s.upsert_node(GraphNode(key="z", kind="event", content="z"))
        driver.queries.clear()
        s.delete_graph_data()
        assert driver.queries[-1][0] == "MATCH (n) DETACH DELETE n"
        assert not s.nodes["event"]

    def test_health_check_ok_and_degraded(self, store):
        s, driver = store
        assert s.health_check()["neo4j"] == "ok"
        assert s.health_check()["backend"] == "array+neo4j"
        driver.fail_next = 99
        degraded = s.health_check()
        assert degraded["status"] == "degraded"
        assert "unreachable" in degraded["neo4j"]

    def test_close_flushes_then_closes(self):
        driver = FakeDriver()
        s = Neo4jGraphStore(
            HashEmbeddings(dim=16), driver=driver, retry_wait_base=0.0,
            batch_size=100,
        )
        s.upsert_node(GraphNode(key="w", kind="chunk", content="w"))
        driver.queries.clear()
        s.close()
        assert driver.closed
        assert any("MERGE (n:Chunk" in q for q, _ in driver.queries)

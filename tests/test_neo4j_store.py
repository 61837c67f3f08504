"""Neo4j mirror adapter behavior tests against a protocol-level fake
driver (no neo4j package or server exists in this environment — r1 only
checked import gating, leaving the adapter's Cypher/retry behavior
unpinned)."""

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
    )
    return s, driver


class TestMirror:
    def test_schema_constraints_created_up_front(self, store):
        _, driver = store
        constraints = [q for q, _ in driver.queries if "CONSTRAINT" in q]
        assert len(constraints) == 3
        assert all("IF NOT EXISTS" in c for c in constraints)
        assert set(driver.databases) == {"graphdb"}

    def test_upsert_mirrors_merge_cypher(self, store):
        s, driver = store
        driver.queries.clear()
        s.upsert_node(
            GraphNode(
                key="paris", kind="entity", content="Paris",
                properties={"mentions": ["paris"], "blob": {"not": "scalar"}},
            )
        )
        (query, params), = driver.queries
        assert query.startswith("MERGE (n:Entity {key: $key})")
        assert params["key"] == "paris"
        assert params["props"] == {"mentions": ["paris"]}  # non-scalars dropped
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
        assert params == {"src": "a", "dst": "b", "props": {"relation_type": "rel"}}

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

    def test_close(self, store):
        s, driver = store
        s.close()
        assert driver.closed

"""Neo4j-backed graph store (optional adapter).

Parity with the reference's ``GraphStoreBaseNeo4j`` / ``HyperRAGNeo4jStore``
(``encapsulation/database/graph_db/``), inverted: the reference pushed
graph ML *into* the database (GDS Louvain/KNN, APOC merges); here Neo4j is
pure persistence behind the array store — entity merge and event
disambiguation still run on the TPU top-k kernels, and the resulting
nodes/edges are mirrored to Neo4j with MERGE-idempotent Cypher
(constraints + indexes created up front, retry with exponential backoff on
transient errors, Base_Neo4j.py:27-32 parity).

Gated: requires the ``neo4j`` driver and a reachable server; everything
else in the framework uses ``ArrayGraphStore``.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, Optional

from rag_arc_tpu.graph.schema import GraphEdge, GraphNode
from rag_arc_tpu.graph.store import ArrayGraphStore
from rag_arc_tpu.models.embeddings import Embeddings

logger = logging.getLogger(__name__)

_LABELS = {"chunk": "Chunk", "event": "Event", "entity": "Entity"}

_CONSTRAINTS = [
    "CREATE CONSTRAINT chunk_key IF NOT EXISTS FOR (n:Chunk) REQUIRE n.key IS UNIQUE",
    "CREATE CONSTRAINT event_key IF NOT EXISTS FOR (n:Event) REQUIRE n.key IS UNIQUE",
    "CREATE CONSTRAINT entity_key IF NOT EXISTS FOR (n:Entity) REQUIRE n.key IS UNIQUE",
]


class Neo4jGraphStore(ArrayGraphStore):
    """ArrayGraphStore that mirrors every upsert to a Neo4j server."""

    def __init__(
        self,
        embeddings: Embeddings,
        uri: str = "bolt://localhost:7687",
        user: str = "neo4j",
        password: str = "neo4j",
        database: str = "neo4j",
        max_retries: int = 3,
        driver: Optional[Any] = None,
        retry_wait_base: float = 2.0,
        **kwargs: Any,
    ):
        """``driver`` injects any object with
        ``session(database=...) -> ctx`` yielding ``run(query, **params)``
        — the real ``neo4j.GraphDatabase.driver`` by default, a fake in
        tests (no server exists in this environment, so the adapter's
        behavior is pinned against a protocol-level double)."""
        if driver is None:
            try:
                import neo4j
            except ImportError as exc:
                raise ImportError(
                    "the neo4j driver is not installed; use ArrayGraphStore "
                    "(rag_arc_tpu.graph.store) instead"
                ) from exc
            driver = neo4j.GraphDatabase.driver(uri, auth=(user, password))
        super().__init__(embeddings, **kwargs)
        self._driver = driver
        self._database = database
        self.max_retries = max_retries
        self._retry_wait_base = retry_wait_base
        self._ensure_schema()

    # -- transport ----------------------------------------------------------

    @staticmethod
    def _retryable_exceptions() -> tuple:
        try:
            import neo4j.exceptions as nx

            return (nx.ServiceUnavailable, nx.TransientError, ConnectionError)
        except ImportError:
            return (ConnectionError,)

    def _run(self, query: str, **params: Any):
        retryable = self._retryable_exceptions()
        last: Optional[Exception] = None
        for attempt in range(self.max_retries):
            try:
                with self._driver.session(database=self._database) as session:
                    return list(session.run(query, **params))
            except retryable as exc:
                last = exc
                wait = min(self._retry_wait_base * (2.0**attempt), 10.0)
                logger.warning(
                    "neo4j transient failure (attempt %d/%d): %s; retry in %.1fs",
                    attempt + 1,
                    self.max_retries,
                    exc,
                    wait,
                )
                time.sleep(wait)
        raise ConnectionError(
            f"neo4j unreachable after {self.max_retries} tries"
        ) from last

    def _ensure_schema(self) -> None:
        for stmt in _CONSTRAINTS:
            self._run(stmt)

    # -- mirrored mutations ---------------------------------------------------

    def upsert_node(self, node: GraphNode) -> GraphNode:
        merged = super().upsert_node(node)
        label = _LABELS[merged.kind]
        self._run(
            f"MERGE (n:{label} {{key: $key}}) "
            "SET n.content = $content, n += $props",
            key=merged.key,
            content=merged.content,
            props={
                k: v
                for k, v in merged.properties.items()
                if isinstance(v, (str, int, float, bool, list))
            },
        )
        return merged

    def add_edge(self, edge: GraphEdge) -> bool:
        added = super().add_edge(edge)
        if added:
            self._run(
                "MATCH (a {key: $src}), (b {key: $dst}) "
                f"MERGE (a)-[r:{edge.edge_type}]->(b) SET r += $props",
                src=edge.src,
                dst=edge.dst,
                props={
                    k: v
                    for k, v in edge.properties.items()
                    if isinstance(v, (str, int, float, bool))
                },
            )
        return added

    def delete_graph_data(self) -> None:
        super().delete_graph_data()
        self._run("MATCH (n) DETACH DELETE n")

    # -- ops ---------------------------------------------------------------------

    def health_check(self) -> Dict[str, Any]:
        base = super().health_check()
        try:
            record = self._run("RETURN 1 AS ok")[0]
            base["neo4j"] = "ok" if record["ok"] == 1 else "degraded"
        except Exception as exc:  # noqa: BLE001 — health check must not raise
            base["neo4j"] = f"unreachable: {exc}"
            base["status"] = "degraded"
        base["backend"] = "array+neo4j"
        return base

    def close(self) -> None:
        self._driver.close()

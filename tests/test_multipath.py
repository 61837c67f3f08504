"""Multi-path (hybrid dense+BM25) retrieval tests — BASELINE config 2."""

import pytest

from rag_arc_tpu.index.vector_store import TPUVectorStore
from rag_arc_tpu.models.embeddings import HashEmbeddings
from rag_arc_tpu.retrieval.base import BaseRetriever
from rag_arc_tpu.retrieval.bm25 import BM25Retriever
from rag_arc_tpu.retrieval.multipath import MultiPathRetriever
from rag_arc_tpu.utils.fusion import WeightedScoreFusion

CORPUS = [
    "the cat sat on the mat",
    "dogs chase cats around the yard",
    "quantum computing uses qubits",
    "stock market rallies on earnings",
    "chocolate cake recipe with cocoa",
    "tpu chips accelerate neural networks",
]


class FailingRetriever(BaseRetriever):
    def _get_relevant_documents(self, query, **kwargs):
        raise RuntimeError("path down")


@pytest.fixture
def hybrid():
    dense = TPUVectorStore.from_texts(CORPUS, HashEmbeddings(dim=64)).as_retriever()
    sparse = BM25Retriever.from_texts(CORPUS)
    return MultiPathRetriever([dense, sparse], top_k=3, top_k_per_retriever=5)


def test_hybrid_fuses_paths(hybrid):
    docs = hybrid.invoke("cat on the mat")
    assert docs[0].content == CORPUS[0]
    assert "fusion_score" in docs[0].metadata


def test_batch_hybrid(hybrid):
    out = hybrid.invoke_batch(["qubits", "chocolate cake"])
    assert out[0][0].content == CORPUS[2]
    assert out[1][0].content == CORPUS[4]


def test_failing_path_isolated(hybrid):
    hybrid.add_retriever(FailingRetriever(name="broken"))
    docs = hybrid.invoke("cat on the mat")
    assert docs[0].content == CORPUS[0]  # still answers


def test_management(hybrid):
    assert hybrid.remove_retriever("BM25Retriever") is True
    assert hybrid.remove_retriever("BM25Retriever") is False
    hybrid.set_fusion_method(WeightedScoreFusion())
    assert hybrid.get_info()["fusion"] == "WeightedScoreFusion"
    assert hybrid.invoke("cat")  # still works with one path


def test_requires_a_retriever():
    with pytest.raises(ValueError):
        MultiPathRetriever([])


def test_k_override(hybrid):
    assert len(hybrid.invoke("the cat dogs market", k=5)) == 5


def test_emptied_retriever_list_returns_empty(hybrid):
    """remove_retriever can empty the list post-construction; queries must
    degrade to empty results, not crash the fan-out pool."""
    for name in list(r.name for r in hybrid.retrievers):
        hybrid.remove_retriever(name)
    assert hybrid.retrievers == []
    assert hybrid.invoke("anything") == []
    assert hybrid.invoke_batch(["a", "b"]) == [[], []]


def test_concurrent_paths_reuse_pool(hybrid):
    """The fan-out pool is per-instance and persistent across calls."""
    hybrid.invoke("cat")
    pool1 = hybrid._pool
    hybrid.invoke("dog")
    assert hybrid._pool is pool1
    hybrid.add_retriever(FailingRetriever(name="extra1"))
    hybrid.add_retriever(FailingRetriever(name="extra2"))
    assert hybrid.invoke("cat")  # pool resized, still answers
    assert hybrid._pool._max_workers >= 3


def test_mutation_fans_out_to_all_paths():
    """add_documents assigns ONE id per doc and writes it to every path,
    so a later delete reaches both indexes (ids minted per-path would
    strand the copies)."""
    from rag_arc_tpu.index.vector_store import TPUVectorStore
    from rag_arc_tpu.models.embeddings import HashEmbeddings
    from rag_arc_tpu.retrieval.bm25 import BM25Retriever
    from rag_arc_tpu.utils.data_model import Document

    texts = [f"filler document {i}" for i in range(20)]
    dense = TPUVectorStore.from_texts(texts, HashEmbeddings(dim=32)).as_retriever(
        search_kwargs={"k": 3}
    )
    sparse = BM25Retriever.from_texts(texts)
    mp = MultiPathRetriever([dense, sparse], top_k=3)

    ids = mp.add_documents([Document(content="zanzibar spice markets")])
    assert len(ids) == 1 and ids[0]
    # both paths can now retrieve it
    assert any("zanzibar" in d.content for d in dense.invoke("zanzibar spice"))
    assert any("zanzibar" in d.content for d in sparse.invoke("zanzibar spice"))
    assert any("zanzibar" in d.content for d in mp.invoke("zanzibar spice"))

    assert mp.delete(ids) is True
    assert not any("zanzibar" in d.content for d in mp.invoke("zanzibar spice"))


def test_add_requires_a_supporting_path(hybrid):
    """All-read-only fan-outs must raise, not silently drop writes."""
    import pytest

    from rag_arc_tpu.utils.data_model import Document

    mp = MultiPathRetriever([FailingRetriever(name="ro")], top_k=2)
    with pytest.raises(TypeError, match="add_documents"):
        mp.add_documents([Document(content="x")])


def test_outgrown_pool_stays_usable(hybrid):
    """A request that grabbed the pool just before add_retriever grew it
    must still be able to schedule work: growth REPLACES the pool
    reference, it never shuts the old one down (a shut-down executor
    raises 'cannot schedule new futures' on the in-flight request)."""
    hybrid.invoke("cat")
    old_pool = hybrid._path_pool()
    for i in range(4):
        hybrid.add_retriever(FailingRetriever(name=f"extra{i}"))
    new_pool = hybrid._path_pool()
    assert new_pool is not old_pool
    # the concurrent request that still holds old_pool can submit work
    assert list(old_pool.map(lambda x: x + 1, [1, 2])) == [2, 3]
    assert hybrid.invoke("cat")


def test_dispatch_batch_matches_sync(hybrid):
    """The async fan-out (dispatch all paths, fetch+fuse later) must
    return exactly what the sync path returns — same ids, same order,
    same fusion scores."""
    queries = ["cat on the mat", "qubits", "chocolate cake"]
    fetch = hybrid.dispatch_batch(queries, k=3)
    assert fetch is not None
    got = fetch()
    want = hybrid.invoke_batch(queries, k=3)
    assert [[d.id for d in row] for row in got] == [
        [d.id for d in row] for row in want
    ]
    for g_row, w_row in zip(got, want):
        for g, w in zip(g_row, w_row):
            assert g.metadata["fusion_score"] == pytest.approx(
                w.metadata["fusion_score"]
            )


def test_dispatch_batch_isolates_failing_path(hybrid):
    """A path that raises at dispatch or fetch contributes an empty list,
    exactly like the sync fan-out."""

    class FailsAtDispatch(BaseRetriever):
        def _get_relevant_documents(self, query, **kwargs):
            return []

        def dispatch_batch(self, queries, **kwargs):
            raise RuntimeError("dispatch down")

    class FailsAtFetch(BaseRetriever):
        def _get_relevant_documents(self, query, **kwargs):
            return []

        def dispatch_batch(self, queries, **kwargs):
            def fetch():
                raise RuntimeError("fetch down")

            return fetch

    hybrid.add_retriever(FailsAtDispatch(name="d-down"))
    hybrid.add_retriever(FailsAtFetch(name="f-down"))
    queries = ["cat on the mat"]
    got = hybrid.dispatch_batch(queries, k=3)()
    assert got[0][0].content == CORPUS[0]


def test_dispatch_batch_none_when_no_async_path():
    mp = MultiPathRetriever([FailingRetriever(name="sync-only")], top_k=2)
    assert mp.dispatch_batch(["q"], k=2) is None


# -- shared-id-space position fusion -------------------------------------


def _shared_pair(texts, k=5):
    dense = TPUVectorStore.from_texts(texts, HashEmbeddings(dim=64)).as_retriever(
        search_kwargs={"k": k}
    )
    sparse = BM25Retriever.from_texts(texts, k=k)
    return dense, sparse


class TestSharedIdSpace:
    def test_matches_content_fusion(self):
        """Position fusion must return the same documents, order, and
        fusion scores as the content-keyed RRFusion path when every
        content is unique (identity coincides)."""
        texts = [f"topic {i % 5} word{i} document number {i}" for i in range(40)]
        dense, sparse = _shared_pair(texts)
        fast = MultiPathRetriever(
            [dense, sparse], top_k=4, top_k_per_retriever=5,
            shared_id_space=True,
        )
        slow = MultiPathRetriever(
            [dense, sparse], top_k=4, top_k_per_retriever=5,
        )
        queries = ["topic 1 document", "word7 number", "document number 39"]
        got = fast.invoke_batch(queries)
        want = slow.invoke_batch(queries)
        # compare CONTENT: the fast path resolves every fused position via
        # path 0's resolver (the canonical document for that position);
        # the content path keeps whichever path surfaced it first — same
        # text, possibly a different auto-generated Document id
        assert [[d.content for d in row] for row in got] == [
            [d.content for d in row] for row in want
        ]
        for g_row, w_row in zip(got, want):
            for g, w in zip(g_row, w_row):
                assert g.metadata["fusion_score"] == w.metadata["fusion_score"]
        assert fast._shared_ok is True

    def test_dispatch_batch_matches_sync(self):
        texts = [f"subject {i % 3} item{i}" for i in range(30)]
        dense, sparse = _shared_pair(texts)
        mp = MultiPathRetriever(
            [dense, sparse], top_k=3, top_k_per_retriever=5,
            shared_id_space=True,
        )
        queries = ["subject 1 item4", "item22"]
        fetch = mp.dispatch_batch(queries, k=3)
        assert fetch is not None
        got = fetch()
        want = mp.invoke_batch(queries, k=3)
        assert [[d.id for d in r] for r in got] == [
            [d.id for d in r] for r in want
        ]

    def test_misaligned_corpora_fall_back(self, caplog):
        """Different doc sets in the two paths: validation must refuse the
        position path and the content path must still answer."""
        import logging

        texts_a = [f"alpha document {i}" for i in range(10)]
        texts_b = [f"beta document {i}" for i in range(10)]
        dense = TPUVectorStore.from_texts(
            texts_a, HashEmbeddings(dim=64)
        ).as_retriever(search_kwargs={"k": 3})
        sparse = BM25Retriever.from_texts(texts_b, k=3)
        mp = MultiPathRetriever(
            [dense, sparse], top_k=3, shared_id_space=True,
        )
        with caplog.at_level(logging.WARNING):
            out = mp.invoke_batch(["alpha document 3"])
        assert mp._shared_ok is False
        assert out[0]  # content-keyed fallback still answers
        assert any("shared_id_space" in r.message for r in caplog.records)

    def test_size_mismatch_falls_back(self):
        texts = [f"gamma document {i}" for i in range(12)]
        dense = TPUVectorStore.from_texts(
            texts, HashEmbeddings(dim=64)
        ).as_retriever(search_kwargs={"k": 3})
        sparse = BM25Retriever.from_texts(texts[:8], k=3)
        mp = MultiPathRetriever([dense, sparse], top_k=3, shared_id_space=True)
        assert mp.invoke("gamma document 5")
        assert mp._shared_ok is False

    def test_failing_path_contributes_nothing(self):
        texts = [f"delta item {i}" for i in range(10)]
        dense, sparse = _shared_pair(texts, k=4)

        class BrokenPositions(BaseRetriever):
            position_space_size = len(texts)

            def _get_relevant_documents(self, query, **kwargs):
                return []

            def dispatch_positions(self, queries, k):
                raise RuntimeError("positions down")

            def resolve_positions(self, rows):
                return [[None for _ in row] for row in rows]

        # broken path last so the sampled-id check passes via real paths
        mp = MultiPathRetriever(
            [dense, sparse], top_k=3, shared_id_space=True,
        )
        mp.retrievers.append(BrokenPositions(name="broken"))
        out = mp.invoke_batch(["delta item 2"])
        assert out[0][0].content == texts[2]

"""Multi-query rewrite tests (BASELINE config 4) with FakeLLM."""

import pytest

from rag_arc_tpu.index.vector_store import TPUVectorStore
from rag_arc_tpu.llm import FakeLLM
from rag_arc_tpu.models.embeddings import HashEmbeddings
from rag_arc_tpu.retrieval.rewrite import (
    MultiQueryRewriter,
    QueryVariants,
    RewriteRetriever,
)

CORPUS = [
    "felines purr when content",
    "the cat sat on the mat",
    "automobiles require regular maintenance",
    "cars need oil changes",
    "tpu pods scale to thousands of chips",
]


def canned(queries):
    return QueryVariants(queries=queries)


@pytest.fixture
def base_retriever():
    return TPUVectorStore.from_texts(CORPUS, HashEmbeddings(dim=64)).as_retriever()


def test_rewriter_dedups_and_limits():
    llm = FakeLLM(responses=[canned(["cats", "Cats", "felines", "kittens", "more"])])
    rw = MultiQueryRewriter(llm, n_variants=3)
    out = rw.rewrite("cats")
    assert out == ["felines", "kittens", "more"][: len(out)]
    assert len(out) <= 3
    assert "cats" not in [q.lower() for q in out]


def test_rewriter_failure_degrades():
    class Boom(FakeLLM):
        def parse_chat(self, *a, **k):
            raise RuntimeError("llm down")

    assert MultiQueryRewriter(Boom()).rewrite("q") == []


def test_rewrite_retriever_fuses_variants(base_retriever):
    # variant "felines purr" surfaces a doc the original phrasing misses
    llm = FakeLLM(responses=[canned(["felines purr"])])
    rr = RewriteRetriever(
        base_retriever, MultiQueryRewriter(llm), top_k=3, k_per_query=2
    )
    docs = rr.invoke("cat mat")
    contents = [d.content for d in docs]
    assert "the cat sat on the mat" in contents
    assert "felines purr when content" in contents


def test_rewrite_retriever_single_dispatch(base_retriever):
    llm = FakeLLM(responses=[canned(["cars maintenance", "oil changes"])])
    calls = []
    store = base_retriever.vectorstore
    orig = store.multi_query_search

    def spy(variants, **kw):
        calls.append([list(vs) for vs in variants])
        return orig(variants, **kw)

    store.multi_query_search = spy
    rr = RewriteRetriever(base_retriever, MultiQueryRewriter(llm), top_k=2)
    rr.invoke("automobile upkeep")
    assert len(calls) == 1  # one fused dispatch for original + variants
    assert len(calls[0][0]) == 3


def test_llm_down_still_answers(base_retriever):
    class Boom(FakeLLM):
        def parse_chat(self, *a, **k):
            raise RuntimeError("down")

    rr = RewriteRetriever(base_retriever, MultiQueryRewriter(Boom()), top_k=1)
    docs = rr.invoke("cat mat")
    assert docs[0].content == "the cat sat on the mat"


class TestDeviceFusion:
    def test_rrf_kernel_matches_host_oracle(self):
        """Device RRF over shared-id paths == host RRFusion on the same
        candidate lists."""
        import numpy as np
        import jax.numpy as jnp

        from rag_arc_tpu.ops.fusion_kernel import rrf_fuse_positions
        from rag_arc_tpu.utils.data_model import Document, RetrievalResult
        from rag_arc_tpu.utils.fusion import RRFusion

        paths = np.array([[[3, 1, 7, -1], [1, 9, 3, 5]]], dtype=np.int32)  # (1,2,4)
        scores, fused = rrf_fuse_positions(jnp.asarray(paths), k_out=5)
        # host oracle over the same ids (content == str(id) so content-dedup
        # equals id-dedup)
        host_paths = [
            [
                RetrievalResult(Document(content=str(pid), id=str(pid)), 0.0, r)
                for r, pid in enumerate(path, start=1)
                if pid >= 0
            ]
            for path in paths[0]
        ]
        want = RRFusion().fuse(host_paths, top_k=5)
        got_ids = [int(p) for p in np.asarray(fused[0]) if p >= 0]
        assert got_ids == [int(d.content) for d in want]
        for score, doc in zip(np.asarray(scores[0]), want):
            assert abs(float(score) - doc.metadata["fusion_score"]) < 1e-6

    def test_rewrite_retriever_device_path(self, base_retriever):
        llm = FakeLLM(responses=[canned(["felines purr"])])
        rr = RewriteRetriever(
            base_retriever, MultiQueryRewriter(llm), top_k=3, k_per_query=3
        )
        docs = rr.invoke("cat mat")
        contents = [d.content for d in docs]
        assert "the cat sat on the mat" in contents
        assert "felines purr when content" in contents
        assert all("fusion_score" in d.metadata for d in docs)

    def test_device_and_host_paths_agree(self, base_retriever):
        def run(retr):
            llm = FakeLLM(responses=[canned(["cars maintenance"])])
            rr = RewriteRetriever(
                retr, MultiQueryRewriter(llm), top_k=3, k_per_query=4
            )
            return [d.content for d in rr.invoke("automobile upkeep")]

        device = run(base_retriever)
        # force host path by hiding multi_query_search
        class Opaque:
            def __init__(self, r):
                self._r = r
            def invoke_batch(self, queries, **kw):
                return self._r.invoke_batch(queries, **kw)
            name = "opaque"
        host = run(Opaque(base_retriever))
        assert device == host

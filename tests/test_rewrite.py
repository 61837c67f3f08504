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
    orig = base_retriever._get_relevant_documents_batch

    def spy(queries, **kw):
        calls.append(list(queries))
        return orig(queries, **kw)

    base_retriever._get_relevant_documents_batch = spy
    rr = RewriteRetriever(base_retriever, MultiQueryRewriter(llm), top_k=2)
    rr.invoke("automobile upkeep")
    assert len(calls) == 1  # one batched dispatch for original + variants
    assert len(calls[0]) == 3


def test_llm_down_still_answers(base_retriever):
    class Boom(FakeLLM):
        def parse_chat(self, *a, **k):
            raise RuntimeError("down")

    rr = RewriteRetriever(base_retriever, MultiQueryRewriter(Boom()), top_k=1)
    docs = rr.invoke("cat mat")
    assert docs[0].content == "the cat sat on the mat"

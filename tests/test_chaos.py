"""Fault-injection tests: the framework's degradation paths must actually
engage under injected failures."""

import pytest

from rag_arc_tpu.index.vector_store import TPUVectorStore
from rag_arc_tpu.llm import FakeLLM
from rag_arc_tpu.models.embeddings import HashEmbeddings
from rag_arc_tpu.retrieval.bm25 import BM25Retriever
from rag_arc_tpu.retrieval.multipath import MultiPathRetriever
from rag_arc_tpu.retrieval.rewrite import MultiQueryRewriter, RewriteRetriever
from rag_arc_tpu.utils.chaos import InjectedFault, flaky

CORPUS = ["the cat sat", "bonds rallied", "tpus are fast", "cake is sweet"]


def test_flaky_schedule():
    llm = flaky(FakeLLM(responses=["a", "b", "c"]), ["chat"], failures=[1])
    msg = [{"role": "user", "content": "x"}]
    assert llm.chat(msg) == "a"
    with pytest.raises(InjectedFault):
        llm.chat(msg)
    assert llm.chat(msg) == "b"
    assert llm.fault_counts()["chat"] == 3


def test_multipath_survives_injected_path_failure():
    dense = TPUVectorStore.from_texts(CORPUS, HashEmbeddings(dim=32)).as_retriever()
    sparse = BM25Retriever.from_texts(CORPUS)
    flaky_sparse = flaky(sparse, ["invoke_batch"], every=1)  # always fails
    hybrid = MultiPathRetriever([dense, flaky_sparse], top_k=2)
    docs = hybrid.invoke("cat sat")
    assert docs[0].content == "the cat sat"  # dense path carried the query


def test_rewrite_survives_injected_llm_failure():
    store = TPUVectorStore.from_texts(CORPUS, HashEmbeddings(dim=32))
    llm = flaky(FakeLLM(), ["parse_chat"], every=1)
    rr = RewriteRetriever(store.as_retriever(), MultiQueryRewriter(llm), top_k=1)
    docs = rr.invoke("tpus fast")
    assert docs[0].content == "tpus are fast"  # degraded to original query


def test_extractor_isolates_injected_failures():
    from rag_arc_tpu.graph import HyperRAGGraphExtractor, KnowledgeStructure
    from rag_arc_tpu.utils.data_model import Document

    llm = flaky(
        FakeLLM(responses=[KnowledgeStructure(), KnowledgeStructure()]),
        ["aparse_chat"],
        failures=[0],
    )
    ex = HyperRAGGraphExtractor(llm, clean=False, max_concurrent=1)
    results = ex([Document(content="doc a"), Document(content="doc b")])
    assert len(results) == 2  # the failed doc yields empty knowledge, no crash

"""Optional real-checkpoint integration tests (VERDICT r1 #9).

This image has no network egress, so these tests are skipped unless real
HF checkpoints exist on disk. Point the env vars at local checkpoint
directories to run them:

  RAG_ARC_TPU_BERT_CKPT=/path/to/sentence-transformer-or-bert
  RAG_ARC_TPU_QWEN3_CKPT=/path/to/qwen3-reranker

They exercise the full load_hf_* → FlaxEncoderEmbeddings /
CrossEncoderReranker plumbing with the REAL HF tokenizer — the unit the
random-init parity tests can't cover.
"""

import os

import numpy as np
import pytest

BERT_CKPT = os.environ.get("RAG_ARC_TPU_BERT_CKPT")
QWEN3_CKPT = os.environ.get("RAG_ARC_TPU_QWEN3_CKPT")


@pytest.mark.skipif(
    not (BERT_CKPT and os.path.isdir(BERT_CKPT)),
    reason="set RAG_ARC_TPU_BERT_CKPT to a local BERT checkpoint dir",
)
def test_real_bert_embeddings_topk_sanity():
    from rag_arc_tpu.index.vector_store import TPUVectorStore
    from rag_arc_tpu.models.bert import BertEmbeddings, load_hf_bert

    model, params, hf_tok = load_hf_bert(BERT_CKPT)
    emb = BertEmbeddings(model, params, hf_tok)
    corpus = [
        "the cat sat on the mat",
        "stock markets rallied on earnings",
        "a recipe for chocolate cake",
        "tpu chips accelerate neural networks",
    ]
    store = TPUVectorStore.from_texts(corpus, emb)
    hits = store.similarity_search("feline on a rug", k=2)
    assert hits[0].content == "the cat sat on the mat"
    hits = store.similarity_search("dessert baking instructions", k=2)
    assert hits[0].content == "a recipe for chocolate cake"


@pytest.mark.skipif(
    not (QWEN3_CKPT and os.path.isdir(QWEN3_CKPT)),
    reason="set RAG_ARC_TPU_QWEN3_CKPT to a local Qwen3 checkpoint dir",
)
def test_real_qwen3_reranker_orders_by_relevance():
    from rag_arc_tpu.models.qwen3 import load_hf_qwen3
    from rag_arc_tpu.models.tokenizer import HFTokenizerAdapter
    from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker
    from rag_arc_tpu.utils.data_model import Document

    model, params, hf_tok = load_hf_qwen3(QWEN3_CKPT)
    rr = CrossEncoderReranker.from_causal_lm(
        model, params, HFTokenizerAdapter(hf_tok)
    )
    docs = [
        Document(content="Paris is the capital of France."),
        Document(content="Bananas are rich in potassium."),
        Document(content="The Eiffel Tower is in Paris."),
    ]
    out = rr.rerank("What is the capital of France?", docs, k=3)
    assert out[0].content == "Paris is the capital of France."
    scores = [d.metadata["rerank_score"] for d in out]
    assert scores == sorted(scores, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_reranker_tokenizes_once():
    """The r1 implementation encoded every batch twice (once to size the
    length bucket, once to pad); _encode_bucketed must tokenize once."""
    from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker
    from rag_arc_tpu.models.encoder import TransformerConfig
    from rag_arc_tpu.utils.data_model import Document

    rr = CrossEncoderReranker(cfg=TransformerConfig.tiny(causal=True))
    calls = {"n": 0}
    orig = rr.tokenizer.batch_encode

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    rr.tokenizer.batch_encode = spy
    docs = [Document(content=f"doc {i} text") for i in range(5)]
    out = rr.rerank("query text", docs, k=3)
    assert len(out) == 3
    assert calls["n"] == 1, f"tokenized {calls['n']} times, want 1"

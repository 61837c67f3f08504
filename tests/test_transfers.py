"""TransferPool: pooled device→host readbacks for streamed dispatch."""

import threading
import types

import jax.numpy as jnp
import numpy as np
import pytest

from rag_arc_tpu.utils import transfers
from rag_arc_tpu.utils.transfers import TransferPool, current_pool, transfer_pool


class CountingJax(types.SimpleNamespace):
    """Shim standing in for the ``jax`` module inside transfers.py."""

    def __init__(self):
        super().__init__()
        self.calls = 0

    def device_get(self, trees):
        self.calls += 1
        import jax

        return jax.device_get(trees)


@pytest.fixture()
def counting(monkeypatch):
    shim = CountingJax()
    monkeypatch.setattr(transfers, "jax", shim)
    return shim


def test_one_flush_for_many_handles(counting):
    pool = TransferPool()
    handles = [pool.register((jnp.arange(3) + i, jnp.ones(2) * i)) for i in range(5)]
    outs = [pool.result(h) for h in handles]
    assert counting.calls == 1  # first demand flushed ALL pending trees
    for i, (a, b) in enumerate(outs):
        np.testing.assert_array_equal(np.asarray(a), np.arange(3) + i)
        np.testing.assert_array_equal(np.asarray(b), np.ones(2) * i)


def test_late_registration_triggers_second_flush(counting):
    pool = TransferPool()
    h0 = pool.register(jnp.zeros(2))
    pool.result(h0)
    h1 = pool.register(jnp.ones(2))
    np.testing.assert_array_equal(np.asarray(pool.result(h1)), np.ones(2))
    assert counting.calls == 2


def test_unknown_handle_raises():
    pool = TransferPool()
    with pytest.raises(KeyError):
        pool.result(99)


def test_result_is_single_claim(counting):
    pool = TransferPool()
    h = pool.register(jnp.zeros(1))
    pool.result(h)
    with pytest.raises(KeyError):
        pool.result(h)


def test_context_manager_scoping():
    assert current_pool() is None
    with transfer_pool() as pool:
        assert current_pool() is pool
        h = pool.register(jnp.arange(4))
    assert current_pool() is None
    # fetch closures capture the pool; results stay reachable after exit
    np.testing.assert_array_equal(np.asarray(pool.result(h)), np.arange(4))


def test_concurrent_demands_share_one_flush(counting):
    pool = TransferPool()
    handles = [pool.register(jnp.full(2, i)) for i in range(8)]
    outs = {}
    errs = []

    def claim(h):
        try:
            outs[h] = np.asarray(pool.result(h))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=claim, args=(h,)) for h in handles]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert counting.calls == 1
    for i, h in enumerate(handles):
        np.testing.assert_array_equal(outs[h], np.full(2, i))


def test_streamed_pipeline_single_flush(monkeypatch):
    """End-to-end: query_batches over dense+bm25 multipath must read back
    the whole stream in ONE pooled device_get and match the sync path."""
    from rag_arc_tpu.index.vector_store import TPUVectorStore
    from rag_arc_tpu.models.embeddings import HashEmbeddings
    from rag_arc_tpu.retrieval.bm25 import BM25Retriever
    from rag_arc_tpu.retrieval.multipath import MultiPathRetriever
    from rag_arc_tpu.serving.pipeline import RagPipeline

    shim = CountingJax()
    monkeypatch.setattr(transfers, "jax", shim)

    texts = [f"topic {i % 7} document number {i}" for i in range(80)]
    dense = TPUVectorStore.from_texts(texts, HashEmbeddings(dim=32)).as_retriever(
        search_kwargs={"k": 5}
    )
    sparse = BM25Retriever.from_texts(texts, k=5)
    multi = MultiPathRetriever([dense, sparse], top_k=3)
    pipe = RagPipeline(retriever=multi, top_k=3, recall_k=5)
    batches = [
        ["topic 1 document", "document number 42"],
        ["topic 3", "number 7 topic"],
        ["topic 5 number", "document 9"],
    ]
    shim.calls = 0
    streamed = pipe.query_batches(batches)
    # every device readback in the stream rode the pool: at most one
    # pooled flush (host-scored BM25 contributes no device_get at all)
    assert shim.calls <= 1
    for batch, got in zip(batches, streamed):
        want = pipe.query_batch(batch)
        assert [[d.id for d in r] for r in got] == [
            [d.id for d in r] for r in want
        ]

"""TPUVectorStore + VectorStoreRetriever end-to-end tests (CPU, fake
embedder) — the reference's BASELINE config 1 slice."""

import asyncio

import numpy as np
import pytest

from rag_arc_tpu.index.vector_store import TPUVectorStore
from rag_arc_tpu.models.embeddings import HashEmbeddings
from rag_arc_tpu.retrieval.dense import VectorStoreRetriever
from rag_arc_tpu.utils.data_model import Document

CORPUS = [
    "the cat sat on the mat",
    "dogs chase cats around the yard",
    "quantum computing uses qubits for parallel computation",
    "the stock market rallied on tech earnings",
    "a recipe for chocolate cake with dark cocoa",
    "tpu chips accelerate matrix multiplication for neural networks",
    "the cat chased a mouse through the kitchen",
    "interest rates affect bond prices inversely",
]


@pytest.fixture
def store():
    return TPUVectorStore.from_texts(CORPUS, HashEmbeddings(dim=64), capacity=64)


class TestStore:
    def test_similarity_search_topical(self, store):
        docs = store.similarity_search("cat on a mat", k=2)
        assert docs[0].content == CORPUS[0]

    def test_scores_descending(self, store):
        hits = store.similarity_search_with_score("cats and dogs", k=5)
        scores = [s for _, s in hits]
        assert scores == sorted(scores, reverse=True)

    def test_by_vector(self, store):
        vec = HashEmbeddings(dim=64).encode([CORPUS[3]])[0]
        docs = store.similarity_search_by_vector(vec, k=1)
        assert docs[0].content == CORPUS[3]

    def test_relevance_scores_in_unit_range(self, store):
        hits = store.similarity_search_with_relevance_scores("cat", k=4)
        assert all(0.0 <= s <= 1.0 for _, s in hits)

    def test_score_threshold_filters(self, store):
        hits = store.similarity_search_with_relevance_scores(
            "the cat sat on the mat", k=8, score_threshold=0.9
        )
        assert len(hits) >= 1
        assert all(s >= 0.9 for _, s in hits)

    def test_threshold_no_results_warns(self, store):
        with pytest.warns(UserWarning, match="no documents"):
            hits = store.similarity_search_with_relevance_scores(
                "zzz qqq xxx", k=3, score_threshold=0.999
            )
        assert hits == []

    def test_mmr_diversifies(self, store):
        # near-duplicate corpus entries: MMR should not return both cats
        # docs before an unrelated one when lambda is low
        docs = store.max_marginal_relevance_search(
            "cat", k=3, fetch_k=8, lambda_mult=0.1
        )
        assert len(docs) == 3
        assert len({d.content for d in docs}) == 3

    def test_search_dispatch(self, store):
        assert store.search("cat", search_type="similarity", k=1)
        assert store.search("cat", search_type="mmr", k=1)
        assert store.search(
            "cat", search_type="similarity_score_threshold", k=2, score_threshold=0.0
        )
        with pytest.raises(ValueError):
            store.search("cat", search_type="bogus")

    def test_add_delete_get(self, store):
        ids = store.add_texts(["new doc about zebras"], metadatas=[{"src": "t"}])
        assert len(store.get_by_ids(ids)) == 1
        docs = store.similarity_search("zebras", k=1)
        assert docs[0].content == "new doc about zebras"
        assert store.delete(ids) is True
        assert store.get_by_ids(ids) == []
        docs = store.similarity_search("zebras", k=1)
        assert docs[0].content != "new doc about zebras"
        assert store.delete(["missing"]) is False

    def test_duplicate_id_overwrites(self, store):
        store.add_documents([Document(content="version one", id="dup")])
        store.add_documents([Document(content="version two", id="dup")])
        docs = store.get_by_ids(["dup"])
        assert [d.content for d in docs] == ["version two"]
        hits = store.similarity_search("version", k=8)
        contents = [d.content for d in hits]
        assert "version one" not in contents
        assert "version two" in contents

    def test_compaction_triggered(self):
        store = TPUVectorStore(HashEmbeddings(dim=16), compact_threshold=0.4)
        ids = store.add_texts([f"doc number {i}" for i in range(10)])
        store.delete(ids[:6])
        assert store.index.n_deleted == 0  # compaction ran
        assert store.index.n_active == 4
        assert len(store.similarity_search("doc", k=10)) == 4

    def test_batch_search(self, store):
        results = store.batch_similarity_search_with_score(
            ["cat mat", "qubits", "chocolate cake"], k=2
        )
        assert len(results) == 3
        assert results[1][0][0].content == CORPUS[2]
        assert results[2][0][0].content == CORPUS[4]

    def test_info(self, store):
        info = store.get_vectorstore_info()
        assert info["num_documents"] == len(CORPUS)
        assert info["index"]["active"] == len(CORPUS)

    def test_async_shims(self, store):
        async def go():
            docs = await store.asimilarity_search("cat", k=1)
            ids = await store.aadd_texts(["async doc"])
            return docs, ids

        docs, ids = asyncio.run(go())
        assert docs and len(ids) == 1


class TestRetriever:
    def test_invoke(self, store):
        r = store.as_retriever(search_kwargs={"k": 2})
        docs = r.invoke("cat on mat")
        assert len(docs) == 2
        assert docs[0].content == CORPUS[0]

    def test_batch_invoke_single_dispatch(self, store):
        r = VectorStoreRetriever(store, search_kwargs={"k": 1})
        out = r.invoke_batch(["qubits computation", "chocolate cake"])
        assert out[0][0].content == CORPUS[2]
        assert out[1][0].content == CORPUS[4]

    def test_threshold_validation(self, store):
        with pytest.raises(ValueError, match="score_threshold"):
            VectorStoreRetriever(store, search_type="similarity_score_threshold")
        with pytest.raises(ValueError, match="0, 1"):
            VectorStoreRetriever(
                store,
                search_type="similarity_score_threshold",
                search_kwargs={"score_threshold": 1.5},
            )

    def test_bad_search_type(self, store):
        with pytest.raises(ValueError):
            VectorStoreRetriever(store, search_type="bm42")

    def test_empty_query_rejected(self, store):
        r = store.as_retriever()
        with pytest.raises(ValueError):
            r.invoke("  ")

    def test_kwargs_merge_and_truncate(self, store):
        r = VectorStoreRetriever(store, search_kwargs={"k": 5})
        assert len(r.invoke("cat")) == 5
        assert len(r.invoke("cat", k=2)) == 2

    def test_mmr_retriever(self, store):
        r = VectorStoreRetriever(
            store, search_type="mmr", search_kwargs={"k": 2, "fetch_k": 6}
        )
        assert len(r.invoke("cat")) == 2

    def test_async(self, store):
        r = store.as_retriever(search_kwargs={"k": 1})
        docs = asyncio.run(r.ainvoke("tpu chips"))
        assert docs[0].content == CORPUS[5]


class TestDeviceChainedQuery:
    def test_flax_embedder_chains_on_device(self):
        """encode_device -> search_device without embeddings visiting host."""
        from rag_arc_tpu.models.encoder import TransformerConfig
        from rag_arc_tpu.models.flax_embeddings import FlaxEncoderEmbeddings

        emb = FlaxEncoderEmbeddings(cfg=TransformerConfig.tiny())
        store = TPUVectorStore.from_texts(
            ["alpha beta gamma", "delta epsilon", "alpha beta"], emb
        )
        calls = {"encode": 0}
        orig = emb.encode

        def spy(texts):
            calls["encode"] += 1
            return orig(texts)

        emb.encode = spy
        results = store.batch_similarity_search_with_score(
            ["alpha beta gamma", "delta epsilon"], k=1
        )
        assert calls["encode"] == 0  # host encode path bypassed
        assert results[0][0][0].content == "alpha beta gamma"
        assert results[1][0][0].content == "delta epsilon"

    def test_hash_embedder_falls_back_to_host_path(self):
        store = TPUVectorStore.from_texts(["a b", "c d"], HashEmbeddings(dim=16))
        results = store.batch_similarity_search_with_score(["a b"], k=1)
        assert results[0][0][0].content == "a b"


class TestConcurrency:
    def test_concurrent_add_and_query(self):
        """ADVICE r1 (medium): index.add donates device buffers, so a
        search overlapping an add hit use-after-donate; the store's RW
        lock must serialize mutation against search."""
        import threading

        store = TPUVectorStore.from_texts(CORPUS, HashEmbeddings(dim=64), capacity=64)
        errors = []
        stop = threading.Event()

        def reader():
            while not stop.is_set():
                try:
                    store.similarity_search("cat on the mat", k=2)
                    store.batch_similarity_search_with_score(["dogs", "tpu"], k=2)
                except Exception as exc:  # noqa: BLE001
                    errors.append(exc)
                    return

        def writer():
            try:
                for i in range(20):
                    ids = store.add_texts([f"new doc {i} about felines"])
                    if i % 5 == 4:
                        store.delete(ids)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)
            finally:
                stop.set()

        readers = [threading.Thread(target=reader) for _ in range(3)]
        w = threading.Thread(target=writer)
        for t in readers:
            t.start()
        w.start()
        w.join(timeout=60)
        stop.set()
        for t in readers:
            t.join(timeout=60)
        assert not errors, errors
        assert len(store) == len(CORPUS) + 16

    def test_rwlock_semantics(self):
        import threading
        import time

        from rag_arc_tpu.utils.locks import RWLock

        lock = RWLock()
        log = []
        with lock.read():
            # concurrent readers proceed
            ok = []

            def second_reader():
                with lock.read():
                    ok.append(True)

            t = threading.Thread(target=second_reader)
            t.start()
            t.join(timeout=5)
            assert ok == [True]

            # a writer blocks while a reader holds the lock
            def writer():
                with lock.write():
                    log.append("write")

            wt = threading.Thread(target=writer)
            wt.start()
            time.sleep(0.05)
            assert log == []
        wt.join(timeout=5)
        assert log == ["write"]


class TestAutoTrainIVFMesh:
    def test_auto_train_preserves_mesh_and_dtype(self):
        """ADVICE r1 (medium): auto-train used to drop mesh/dtype, silently
        collapsing a sharded store to single-device f32."""
        import jax.numpy as jnp

        from rag_arc_tpu.parallel.mesh import default_mesh

        mesh = default_mesh()
        store = TPUVectorStore(
            HashEmbeddings(dim=32),
            index_type="ivf",
            nlist=8,
            train_threshold=16,
            mesh=mesh,
            dtype=jnp.bfloat16,
        )
        store.add_texts([f"doc {i} cluster {i % 4}" for i in range(32)])
        assert store.index.stats()["kind"] == "ivf"
        assert store.index.mesh is mesh
        assert store.index.n_shards == mesh.devices.size
        assert store.index.dtype == jnp.bfloat16
        hits = store.similarity_search("doc 7 cluster 3", k=1)
        assert hits[0].content == "doc 7 cluster 3"


class TestHostDeviceHops:
    def test_chained_path_single_fetch(self):
        """VERDICT r1 #10: the batcher -> encode_device -> search_device
        chain must read back exactly once — the final (scores, positions)
        pair. Counts jax.device_get calls and checks the trace stages."""
        import jax

        from rag_arc_tpu.models.encoder import TransformerConfig
        from rag_arc_tpu.models.flax_embeddings import FlaxEncoderEmbeddings
        from rag_arc_tpu.utils.tracing import get_tracer

        emb = FlaxEncoderEmbeddings(cfg=TransformerConfig.tiny())
        store = TPUVectorStore.from_texts(
            [f"doc {i} about theme {i % 4}" for i in range(32)], emb
        )
        get_tracer().reset()
        calls = []
        orig = jax.device_get

        def spy(x):
            calls.append(x)
            return orig(x)

        jax.device_get = spy
        try:
            out = store.batch_similarity_search_with_score(
                ["doc 3 about theme 3", "doc 8 about theme 0"], k=2
            )
        finally:
            jax.device_get = orig
        assert out[0][0][0].content == "doc 3 about theme 3"
        assert len(calls) == 1, f"expected 1 readback, saw {len(calls)}"
        stages = get_tracer().summary()
        assert {"store.tokenize", "store.dispatch", "store.fetch"} <= set(stages)


class TestReviewRegressions:
    def test_batched_mmr_and_threshold_retrieval(self):
        """The serving path always passes k inside kwargs; the per-query
        fallback for mmr/score-threshold retrievers used to re-pass k
        explicitly too — TypeError: multiple values for 'k' (every such
        pipeline 500'd)."""
        store = TPUVectorStore.from_texts(
            [f"document number {i}" for i in range(50)], HashEmbeddings(dim=32)
        )
        for st, extra in (
            ("mmr", {}),
            ("similarity_score_threshold", {"score_threshold": 0.0}),
        ):
            r = store.as_retriever(
                search_type=st, search_kwargs={"k": 2, **extra}
            )
            out = r.invoke_batch(["document number 7", "document number 9"], k=2)
            assert len(out) == 2 and all(len(hits) <= 2 for hits in out)
            assert any("7" in d.content for d in out[0])

    def test_duplicate_ids_within_one_add_batch(self):
        """Two docs with the same id in ONE add_documents call must not
        orphan a live index row: the docstore keeps the later doc, and the
        earlier copy's row must not remain silently searchable."""
        store = TPUVectorStore(HashEmbeddings(dim=32), dim=32)
        store.add_documents(
            [
                Document(content="first version", id="x"),
                Document(content="second version", id="x"),
            ]
        )
        assert len(store) == 1
        assert store.get_by_ids(["x"])[0].content == "second version"
        # every searchable row resolves (no ghost): k over-asks on purpose
        hits = store.similarity_search("version", k=4)
        assert [d.content for d in hits] == ["second version"]
        idx = store.index
        assert idx.n_active == 1, (idx.size, idx.n_deleted)

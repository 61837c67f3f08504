"""Serving layer tests: batcher coalescing, persistence round-trips,
registry-built pipelines, and the HTTP app end-to-end."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from rag_arc_tpu.index.persistence import load_store, save_store
from rag_arc_tpu.index.vector_store import TPUVectorStore
from rag_arc_tpu.models.embeddings import HashEmbeddings
from rag_arc_tpu.serving.app import make_server
from rag_arc_tpu.serving.batcher import QueryBatcher
from rag_arc_tpu.serving.configs import PipelineConfig
from rag_arc_tpu.serving.pipeline import RagPipeline

CORPUS = [
    "the cat sat on the mat",
    "dogs chase cats in yards",
    "qubits power quantum computing",
    "bond yields rose on inflation",
    "chocolate cake with dark cocoa",
    "tpus multiply matrices quickly",
]


class TestBatcher:
    def test_coalesces_concurrent_requests(self):
        batches = []

        def batch_fn(queries, **kw):
            batches.append(len(queries))
            time.sleep(0.02)  # occupy the "device" so arrivals coalesce
            return [q.upper() for q in queries]

        b = QueryBatcher(batch_fn, max_batch=64, max_wait_ms=30.0)
        results = {}

        def worker(q):
            results[q] = b.submit(q)

        threads = [threading.Thread(target=worker, args=(f"q{i}",)) for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results["q3"] == "Q3"
        assert sum(batches) == 10
        assert max(batches) > 1  # at least some coalescing happened

    def test_submit_many_coalesces_across_requests(self):
        """Two concurrent multi-query requests share device batches
        instead of each becoming its own (the r5 serving fix)."""
        batches = []

        def batch_fn(queries, **kw):
            batches.append(len(queries))
            time.sleep(0.02)
            return [q.upper() for q in queries]

        b = QueryBatcher(batch_fn, max_batch=64, max_wait_ms=30.0)
        out = {}

        def worker(cid):
            qs = [f"c{cid}_q{i}" for i in range(16)]
            out[cid] = b.submit_many(qs)

        threads = [threading.Thread(target=worker, args=(c,)) for c in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for cid in range(4):
            assert out[cid] == [f"C{cid}_Q{i}" for i in range(16)]  # order kept
        assert sum(batches) == 64
        assert max(batches) > 16  # cross-request coalescing happened

    def test_submit_many_slices_at_max_batch(self):
        batches = []

        def batch_fn(queries, **kw):
            batches.append(len(queries))
            return list(queries)

        b = QueryBatcher(batch_fn, max_batch=8, max_wait_ms=5.0)
        res = b.submit_many([f"q{i}" for i in range(21)])
        assert res == [f"q{i}" for i in range(21)]
        assert max(batches) <= 8 and sum(batches) == 21

    def test_submit_many_empty_and_error(self):
        def batch_fn(queries, **kw):
            raise RuntimeError("boom")

        b = QueryBatcher(batch_fn, max_batch=8, max_wait_ms=5.0)
        assert b.submit_many([]) == []
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="boom"):
            b.submit_many(["a", "b"])

    def test_unhashable_kwargs_rejected_at_submit(self):
        """Unhashable kwargs (e.g. JSON \"k\": [10]) must fail THE
        offending request at submit — inside the worker they killed the
        thread before any event was set, hanging the whole batch and
        leaking _in_flight (idle fast path disabled forever)."""
        b = QueryBatcher(lambda qs, **kw: list(qs), max_batch=4, max_wait_ms=1.0)
        with pytest.raises(TypeError, match="hashable"):
            b.submit("q", k=[10])
        # the batcher is still healthy
        assert b.submit("ok") == "ok"

    def test_short_batch_fn_result_errors_not_truncates(self):
        """batch_fn returning fewer results than queries must raise for
        the batch, not silently hand trailing callers None."""
        from rag_arc_tpu.serving.batcher import _Pending

        b = QueryBatcher(lambda qs, **kw: [qs[0]], max_batch=8, max_wait_ms=1.0)
        p1, p2 = _Pending(query="a", kwargs=()), _Pending(query="b", kwargs=())
        b._in_flight += 1  # _run_batch decrements on its way out
        b._run_batch([p1, p2])
        assert p1.event.is_set() and p2.event.is_set()
        assert isinstance(p1.error, RuntimeError) and "results" in str(p1.error)
        assert b._in_flight == 0  # fast path stays armed

    def test_idle_fast_path_no_window_wait(self):
        """A lone request on an idle device must dispatch immediately —
        NOT pay the coalescing window (here set absurdly high)."""
        sizes = []

        def batch_fn(queries, **kw):
            sizes.append(len(queries))
            return list(queries)

        b = QueryBatcher(batch_fn, max_batch=64, max_wait_ms=10_000.0)
        t0 = time.time()
        assert b.submit("solo") == "solo"
        assert time.time() - t0 < 1.0  # far under the 10 s window
        assert sizes == [1]

    def test_max_batch_flush(self):
        sizes = []
        release = threading.Event()

        def batch_fn(queries, **kw):
            sizes.append(len(queries))
            if len(sizes) == 1:
                release.wait(5.0)  # first (fast-path) batch holds the device
            return list(queries)

        b = QueryBatcher(batch_fn, max_batch=2, max_wait_ms=10_000.0)
        t0 = threading.Thread(target=b.submit, args=("hold",))
        t0.start()
        time.sleep(0.05)  # ensure "hold" is in flight
        t1 = threading.Thread(target=b.submit, args=("a",))
        t1.start()
        time.sleep(0.05)
        t2 = threading.Thread(target=b.submit, args=("b",))
        t2.start()
        t1.join(5.0)  # a+b hit max_batch=2 -> flush without the window
        t2.join(5.0)
        assert not t1.is_alive() and not t2.is_alive()
        release.set()
        t0.join(5.0)
        assert sizes[0] == 1 and 2 in sizes

    def test_continuous_batching_drains_queue_on_completion(self):
        """Requests arriving mid-batch dispatch as soon as the running
        batch returns — not after the wait window."""
        sizes = []
        release = threading.Event()

        def batch_fn(queries, **kw):
            sizes.append(len(queries))
            if len(sizes) == 1:
                release.wait(5.0)
            return list(queries)

        b = QueryBatcher(batch_fn, max_batch=64, max_wait_ms=10_000.0)
        threads = [threading.Thread(target=b.submit, args=("first",))]
        threads[0].start()
        time.sleep(0.05)
        for i in range(3):
            t = threading.Thread(target=b.submit, args=(f"q{i}",))
            t.start()
            threads.append(t)
        time.sleep(0.05)
        t0 = time.time()
        release.set()
        for t in threads:
            t.join(5.0)
            assert not t.is_alive()
        assert time.time() - t0 < 2.0  # drained on completion, no window
        assert sizes == [1, 3]

    def test_error_propagates(self):
        def batch_fn(queries, **kw):
            raise RuntimeError("engine down")

        b = QueryBatcher(batch_fn, max_wait_ms=1.0)
        with pytest.raises(RuntimeError, match="engine down"):
            b.submit("q")

    def test_kwargs_grouping(self):
        calls = []

        def batch_fn(queries, k=1):
            calls.append((len(queries), k))
            return [k] * len(queries)

        b = QueryBatcher(batch_fn, max_batch=4, max_wait_ms=20.0)
        out = []
        threads = [
            threading.Thread(target=lambda kk=kk: out.append(b.submit("q", k=kk)))
            for kk in (1, 1, 2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(out) == [1, 1, 2]


class TestPersistence:
    def test_flat_roundtrip(self, tmp_path):
        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore.from_texts(CORPUS, emb)
        ids = store.add_texts(["to be deleted"])
        store.delete(ids)
        save_store(store, tmp_path / "snap")
        loaded = load_store(tmp_path / "snap", emb)
        assert len(loaded) == len(store)
        q = "cat on the mat"
        got = [d.content for d in loaded.similarity_search(q, k=3)]
        want = [d.content for d in store.similarity_search(q, k=3)]
        assert got == want
        assert "to be deleted" not in [
            d.content for d in loaded.similarity_search("deleted", k=10)
        ]

    def test_quantized_snapshot_rejects_float_dtype(self, tmp_path):
        """An int8 snapshot holds RAW codes; pasting them into a float
        index silently scores garbage — load must refuse."""
        import jax.numpy as jnp
        import pytest

        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore.from_texts(CORPUS, emb, dtype=jnp.int8)
        save_store(store, tmp_path / "snap")
        with pytest.raises(ValueError, match="int8 codes"):
            load_store(tmp_path / "snap", emb, dtype=jnp.bfloat16)
        loaded = load_store(tmp_path / "snap", emb)  # dtype=None restores int8
        assert loaded.index.quantized

    def test_load_sizes_capacity_from_snapshot(self, tmp_path):
        """Restore must size capacity from the manifest: default-capacity
        growth DOUBLES, landing a 10M-row snapshot on 16.8M rows (2x HBM,
        an OOM for the flagship corpus)."""
        emb = HashEmbeddings(dim=16)
        store = TPUVectorStore(emb, dim=16, capacity=4096)
        store.add_texts([f"doc {i}" for i in range(3000)])
        save_store(store, tmp_path / "snap")
        loaded = load_store(tmp_path / "snap", emb)
        # 3000 rows should restore near round_up(3000, block), NOT into a
        # doubling ladder from 4096 (which would land on 8192+)
        assert loaded.index.capacity <= 4096, loaded.index.capacity
        assert len(loaded) == 3000

    def test_legacy_snapshot_defaults_kf_mult_4(self, tmp_path):
        """ADVICE r4: snapshots written before the kf_mult manifest key
        were built and validated under the historical effective kf_mult=4.
        Restores must keep that operating point; only newly-saved stores
        get the r4 default (=2)."""
        import json

        emb = HashEmbeddings(dim=16)
        store = TPUVectorStore.from_texts(CORPUS, emb)
        save_store(store, tmp_path / "snap")
        mpath = tmp_path / "snap" / "manifest.json"
        manifest = json.loads(mpath.read_text())
        assert manifest["kf_mult"] == store.kf_mult  # new snapshots record it
        del manifest["kf_mult"]  # simulate a pre-r4 snapshot
        mpath.write_text(json.dumps(manifest))
        loaded = load_store(tmp_path / "snap", emb)
        assert loaded.kf_mult == 4

    def test_storage_dtype_survives_snapshot(self, tmp_path):
        """A bf16 store must reload as bf16 (f32 would double HBM)."""
        import jax.numpy as jnp

        emb = HashEmbeddings(dim=16)
        store = TPUVectorStore.from_texts(CORPUS, emb, dtype=jnp.bfloat16)
        save_store(store, tmp_path / "snap")
        loaded = load_store(tmp_path / "snap", emb)
        assert jnp.dtype(loaded.index.dtype) == jnp.bfloat16

    def test_load_warns_on_embedder_kind_mismatch(self, tmp_path, caplog):
        """The snapshot records which embedder produced the rows; loading
        with a different kind must at least warn (same-dim garbage scores
        are otherwise silent)."""
        import logging

        class OtherEmbeddings(HashEmbeddings):
            def describe(self):
                return {"kind": "other", "dim": self.dim, "reproducible": False}

        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore.from_texts(CORPUS, emb)
        save_store(store, tmp_path / "snap")
        with caplog.at_level(logging.WARNING):
            load_store(tmp_path / "snap", OtherEmbeddings(dim=32))
        assert any("embedded with" in r.message for r in caplog.records)
        import pytest

        class WrongDim(HashEmbeddings):
            pass

        with pytest.raises(ValueError, match="dim"):
            load_store(tmp_path / "snap", WrongDim(dim=64))

    def test_ivf_roundtrip(self, tmp_path):
        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore(emb, index_type="ivf", nlist=4, train_threshold=8)
        store.add_texts([f"document {i} topic {i % 3}" for i in range(20)])
        assert store.index.stats()["kind"] == "ivf"
        save_store(store, tmp_path / "snap")
        loaded = load_store(tmp_path / "snap", emb)
        assert loaded.index.stats()["kind"] == "ivf"
        q = "document 7 topic 1"
        got = [d.content for d in loaded.similarity_search(q, k=2)]
        want = [d.content for d in store.similarity_search(q, k=2)]
        assert got == want
        # adds still work after restore
        loaded.add_texts(["brand new document"])
        assert loaded.similarity_search("brand new document", k=1)[0].content == (
            "brand new document"
        )

    def test_hnsw_roundtrip(self, tmp_path):
        # ADVICE r1 (high): hnsw snapshots used to silently drop all vectors
        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore(emb, index_type="hnsw")
        store.add_texts(CORPUS)
        ids = store.add_texts(["to be deleted"])
        store.delete(ids)
        save_store(store, tmp_path / "snap")
        loaded = load_store(tmp_path / "snap", emb)
        assert loaded.index.stats()["kind"] == "hnsw"
        # deleted flags and their count survive the round-trip
        assert loaded.index.n_deleted == store.index.n_deleted == 1
        assert loaded.index.n_active == store.index.n_active
        q = "cat on the mat"
        got = [d.content for d in loaded.similarity_search(q, k=3)]
        want = [d.content for d in store.similarity_search(q, k=3)]
        assert got == want
        assert "to be deleted" not in [
            d.content for d in loaded.similarity_search("deleted", k=10)
        ]

    def test_bad_format(self, tmp_path):
        (tmp_path / "manifest.json").write_text('{"format": "nope"}')
        with pytest.raises(ValueError, match="format"):
            load_store(tmp_path, HashEmbeddings(dim=8))


@pytest.fixture
def pipeline_cfg_json(tmp_path):
    cfg = {
        "type": "PIPELINE",
        "retriever": {
            "type": "DENSE",
            "embeddings": {"type": "HASH_EMBEDDINGS", "dim": 32},
            "k": 3,
        },
        "top_k": 3,
        "batch_wait_ms": 1.0,
    }
    p = tmp_path / "pipeline.json"
    p.write_text(json.dumps(cfg))
    return p


class TestPipeline:
    def test_registry_build_and_query(self, pipeline_cfg_json):
        cfg = PipelineConfig.model_validate(
            json.loads(pipeline_cfg_json.read_text())
        )
        pipeline = cfg.build()
        pipeline.retriever.add_documents(
            [__import__("rag_arc_tpu").Document(content=c) for c in CORPUS]
        )
        docs = pipeline.query("cat mat")
        assert docs[0].content == CORPUS[0]
        stats = pipeline.stats()
        assert stats["queries"] == 1

    def test_hybrid_with_rerank_config(self):
        cfg = PipelineConfig.model_validate(
            {
                "type": "PIPELINE",
                "retriever": {
                    "type": "MULTIPATH",
                    "retrievers": [
                        {
                            "type": "DENSE",
                            "embeddings": {"type": "HASH_EMBEDDINGS", "dim": 32},
                        },
                        {"type": "BM25"},
                    ],
                },
                "reranker": {
                    "type": "CROSS_ENCODER",
                    "dim": 64,
                    "depth": 2,
                    "heads": 4,
                    "vocab_size": 512,
                    "max_length": 64,
                },
                "recall_k": 5,
                "top_k": 2,
            }
        )
        pipeline = cfg.build()
        from rag_arc_tpu.utils.data_model import Document

        for r in pipeline.retriever.retrievers:
            r.add_documents([Document(content=c) for c in CORPUS])
        docs = pipeline.query_batch(["quantum qubits"])[0]
        assert len(docs) == 2
        assert all("rerank_score" in d.metadata for d in docs)


class TestHTTPApp:
    @pytest.fixture
    def server(self, pipeline_cfg_json):
        cfg = PipelineConfig.model_validate(
            json.loads(pipeline_cfg_json.read_text())
        )
        pipeline = cfg.build()
        srv = make_server(pipeline, port=0)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{srv.server_port}"
        srv.shutdown()

    def _post(self, url, payload):
        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read())

    def test_add_query_health_stats(self, server):
        out = self._post(f"{server}/add", {"texts": CORPUS})
        assert len(out["ids"]) == len(CORPUS)
        out = self._post(f"{server}/query", {"query": "chocolate cake", "k": 1})
        assert out["documents"][0]["content"] == CORPUS[4]
        out = self._post(
            f"{server}/batch", {"queries": ["cat mat", "bond yields"], "k": 1}
        )
        assert out["results"][0][0]["content"] == CORPUS[0]
        with urllib.request.urlopen(f"{server}/health", timeout=10) as resp:
            assert json.loads(resp.read())["status"] == "ok"
        with urllib.request.urlopen(f"{server}/stats", timeout=10) as resp:
            assert json.loads(resp.read())["queries"] >= 3

    def test_ids_response_mode(self, server):
        """response='ids' returns id+score only (no content/metadata) and
        the ids match the full response, query and batch both."""
        self._post(f"{server}/add", {"texts": CORPUS})
        full = self._post(f"{server}/query", {"query": "chocolate cake", "k": 2})
        slim = self._post(
            f"{server}/query",
            {"query": "chocolate cake", "k": 2, "response": "ids"},
        )
        assert [d["id"] for d in slim["documents"]] == [
            d["id"] for d in full["documents"]
        ]
        assert set(slim["documents"][0]) == {"id", "score"}
        # plain dense retrieval attaches no fusion/rerank score metadata;
        # score is null here and populated for multipath/rerank pipelines
        # (covered by the shared-id-space pipeline tests)
        b_full = self._post(f"{server}/batch", {"queries": ["cat mat"], "k": 2})
        b_slim = self._post(
            f"{server}/batch",
            {"queries": ["cat mat"], "k": 2, "response": "ids"},
        )
        assert [d["id"] for d in b_slim["results"][0]] == [
            d["id"] for d in b_full["results"][0]
        ]
        # unknown mode is a 400, not a 500
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(
                f"{server}/query", {"query": "x", "response": "bogus"}
            )
        assert ei.value.code == 400

    def test_delete_endpoint(self, server):
        out = self._post(f"{server}/add", {"texts": ["ephemeral zebra doc"]})
        assert self._post(f"{server}/delete", {"ids": out["ids"]})["deleted"]
        hits = self._post(f"{server}/query", {"query": "ephemeral zebra", "k": 3})
        assert all(d["content"] != "ephemeral zebra doc" for d in hits["documents"])
        assert not self._post(f"{server}/delete", {"ids": ["missing"]})["deleted"]

    def test_malformed_requests_get_400_not_batch_poison(self, server):
        """Per-request validation happens BEFORE coalescing: an empty
        query or mismatched metadatas 400s its own request instead of
        failing the whole coalesced batch (or silently dropping docs)."""
        for payload in ({}, {"query": "   "}, {"query": 7}):
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                self._post(f"{server}/query", payload)
            assert exc_info.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            self._post(
                f"{server}/add", {"texts": ["a", "b", "c"], "metadatas": [{}]}
            )
        assert exc_info.value.code == 400
        # a bare string iterates char-by-char through the element checks:
        # {"queries": "hello"} must 400, not run 5 one-char searches
        for url, payload in (
            (f"{server}/batch", {"queries": "hello"}),
            (f"{server}/add", {"texts": "abc"}),
        ):
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                self._post(url, payload)
            assert exc_info.value.code == 400
        # healthy request still works afterwards
        assert self._post(f"{server}/add", {"texts": ["recovery doc"]})["ids"]

    def test_error_handling(self, server):
        req = urllib.request.Request(
            f"{server}/query", data=b"{not json", headers={}
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=10)
        assert exc_info.value.code == 500


class TestRerankBatchAndWarmup:
    def test_rerank_batch_matches_per_query(self):
        from rag_arc_tpu.models.encoder import TransformerConfig
        from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker
        from rag_arc_tpu.utils.data_model import Document

        rr = CrossEncoderReranker(cfg=TransformerConfig.tiny(causal=True))
        queries = ["query one", "query two"]
        cand = [
            [Document(content=f"doc {i} for q1") for i in range(4)],
            [Document(content=f"doc {i} for q2") for i in range(3)],
        ]
        batched = rr.rerank_batch(queries, cand, k=2)
        singles = [rr.rerank(q, c, k=2) for q, c in zip(queries, cand)]
        for got, want in zip(batched, singles):
            assert [d.content for d in got] == [d.content for d in want]

    def test_rerank_batch_empty(self):
        from rag_arc_tpu.models.encoder import TransformerConfig
        from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker

        rr = CrossEncoderReranker(cfg=TransformerConfig.tiny(causal=True))
        assert rr.rerank_batch(["q"], [[]]) == [[]]

    def test_pipeline_uses_batch_rerank_and_warmup(self):
        from rag_arc_tpu.models.encoder import TransformerConfig
        from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker

        store = TPUVectorStore.from_texts(CORPUS, HashEmbeddings(dim=32))
        pipe = RagPipeline(
            store.as_retriever(),
            reranker=CrossEncoderReranker(cfg=TransformerConfig.tiny(causal=True)),
            recall_k=4,
            top_k=2,
        )
        pipe.warmup(batch_sizes=(1, 2))
        out = pipe.query_batch(["cat mat", "qubits"], k=2)
        assert all(len(docs) == 2 for docs in out)
        assert all("rerank_score" in d.metadata for docs in out for d in docs)


class TestFullStack:
    def test_rewrite_hybrid_rerank_over_http(self, tmp_path):
        """Every pipeline stage at once, through the real socket."""
        import urllib.request

        from rag_arc_tpu.llm import FakeLLM
        from rag_arc_tpu.retrieval.rewrite import MultiQueryRewriter, QueryVariants
        from rag_arc_tpu.models.encoder import TransformerConfig
        from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker
        from rag_arc_tpu.retrieval.bm25 import BM25Retriever
        from rag_arc_tpu.retrieval.multipath import MultiPathRetriever
        from rag_arc_tpu.utils.data_model import Document

        store = TPUVectorStore.from_texts(CORPUS, HashEmbeddings(dim=32))
        sparse = BM25Retriever.from_texts(CORPUS)
        hybrid = MultiPathRetriever([store.as_retriever(), sparse])
        llm = FakeLLM(responder=lambda m, f: QueryVariants(queries=["felines"]))
        pipeline = RagPipeline(
            hybrid,
            reranker=CrossEncoderReranker(cfg=TransformerConfig.tiny(causal=True)),
            rewriter=MultiQueryRewriter(llm),
            top_k=2,
            recall_k=4,
            batch_wait_ms=1.0,
        )
        srv = make_server(pipeline, port=0)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.server_port}/query",
                data=json.dumps({"query": "cats on mats"}).encode(),
            )
            with urllib.request.urlopen(req, timeout=60) as resp:
                docs = json.loads(resp.read())["documents"]
            assert len(docs) == 2
            assert all("rerank_score" in d["metadata"] for d in docs)
            stats = pipeline.stats()["stage_timings"]
            assert {"pipeline.rewrite", "pipeline.retrieve", "pipeline.rerank"} <= set(stats)
        finally:
            srv.shutdown()


class TestIngestServe:
    def test_ingest_cli_to_store_serving(self, tmp_path):
        """tools/ingest.py output serves via --store's pipeline builder:
        the two-command README flow, end to end over a real socket."""
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "rag_arc_tpu_test_root_ingest",
            Path(__file__).parents[1] / "tools" / "ingest.py",
        )
        ingest = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ingest)

        from rag_arc_tpu.serving.app import _pipeline_from_store

        docs = tmp_path / "docs"
        docs.mkdir()
        (docs / "a.md").write_text(
            "# Alpha\nAlpha covers installation.\n\n## Beta\nBeta is tuning."
        )
        (docs / "b.html").write_text(
            "<html><body><p>Gamma explains deployment.</p></body></html>"
        )
        out = tmp_path / "index"
        assert ingest.main([str(docs), "--out", str(out), "--dim", "32"]) == 0

        pipeline = _pipeline_from_store(str(out), None, 2)
        srv = make_server(pipeline, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.server_port}/query",
                data=json.dumps({"query": "gamma deployment"}).encode(),
            )
            with urllib.request.urlopen(req, timeout=60) as resp:
                got = json.loads(resp.read())["documents"]
            assert got and "amma" in got[0]["content"]
        finally:
            srv.shutdown()

    def test_ingest_bm25_twin_serves_hybrid(self, tmp_path):
        """--bm25 at ingest time upgrades --store serving to hybrid
        (dense + BM25 under MultiPath RRF) with no extra config."""
        from rag_arc_tpu.retrieval.multipath import MultiPathRetriever
        from rag_arc_tpu.serving.app import _pipeline_from_store
        from rag_arc_tpu.tools.ingest import main as ingest_main

        docs = tmp_path / "docs"
        docs.mkdir()
        (docs / "a.md").write_text("zephyr is a rare keyword for sparse hits")
        (docs / "b.md").write_text("other content about installation steps")
        out = tmp_path / "index"
        rc = ingest_main(
            [str(docs), "--out", str(out), "--dim", "32", "--bm25"]
        )
        assert rc == 0 and (out / "bm25.json").exists()

        pipeline = _pipeline_from_store(str(out), None, 2)
        assert isinstance(pipeline.retriever, MultiPathRetriever)
        hits = pipeline.query("zephyr keyword", k=1)
        assert hits and "zephyr" in hits[0].content

    def test_store_rebuilds_flax_embedder_from_manifest(self, tmp_path):
        """A flax-embedded snapshot must be served with an IDENTICAL
        query embedder (same cfg + seed), not silently with hash
        embeddings — scores would be random otherwise."""
        from rag_arc_tpu.models.encoder import TransformerConfig
        from rag_arc_tpu.models.flax_embeddings import FlaxEncoderEmbeddings
        from rag_arc_tpu.index.persistence import save_store
        from rag_arc_tpu.index.vector_store import TPUVectorStore
        from rag_arc_tpu.serving.app import _pipeline_from_store

        emb = FlaxEncoderEmbeddings(cfg=TransformerConfig.tiny())
        store = TPUVectorStore.from_texts(
            ["alpha installation", "beta tuning", "gamma deployment"], emb
        )
        save_store(store, tmp_path / "snap")
        pipeline = _pipeline_from_store(str(tmp_path / "snap"), None, 1)
        served = pipeline.retriever.vectorstore.embedding
        assert isinstance(served, FlaxEncoderEmbeddings)
        import numpy as np

        np.testing.assert_allclose(
            served.encode(["gamma deployment"]),
            emb.encode(["gamma deployment"]),
            atol=1e-5,
        )

    def test_store_refuses_irreproducible_embedder(self, tmp_path):
        """Custom-weight embedders can't be rebuilt from a manifest;
        --store must refuse loudly instead of serving garbage scores."""
        import pytest

        from rag_arc_tpu.models.encoder import TransformerConfig, init_encoder
        from rag_arc_tpu.models.flax_embeddings import FlaxEncoderEmbeddings
        from rag_arc_tpu.index.persistence import save_store
        from rag_arc_tpu.index.vector_store import TPUVectorStore
        from rag_arc_tpu.serving.app import _pipeline_from_store

        cfg = TransformerConfig.tiny()
        _, params = init_encoder(cfg, seed=7)
        emb = FlaxEncoderEmbeddings(cfg=cfg, params=params)  # explicit weights
        store = TPUVectorStore.from_texts(["alpha", "beta"], emb)
        save_store(store, tmp_path / "snap")
        with pytest.raises(ValueError, match="cannot be rebuilt"):
            _pipeline_from_store(str(tmp_path / "snap"), None, 1)


class TestGraphConfigs:
    def test_registry_builds_graphrag(self, tmp_path):
        import json as _json

        from rag_arc_tpu.framework.registry import Register
        from rag_arc_tpu.serving.configs import GraphExtractorConfig, GraphStoreConfig

        ex_cfg = tmp_path / "extractor.json"
        ex_cfg.write_text(_json.dumps({
            "type": "HYPERRAG_EXTRACTOR",
            "llm": {"type": "FAKE_LLM"},
            "max_rounds": 2,
            "event_types": ["incident"],
        }))
        store_cfg = tmp_path / "store.json"
        store_cfg.write_text(_json.dumps({
            "type": "ARRAY_GRAPH_STORE",
            "embeddings": {"type": "HASH_EMBEDDINGS", "dim": 32},
            "knn_cutoff": 0.7,
        }))
        r = Register()
        extractor = r.register(ex_cfg, "extractor", GraphExtractorConfig)
        store = r.register(store_cfg, "graph", GraphStoreConfig)
        assert extractor is not None and store is not None
        assert extractor.max_rounds == 2
        assert "incident" in extractor.prompt.event_types
        from rag_arc_tpu.utils.data_model import Document

        results = extractor([Document(content="a short text")])
        stats = store.store_hyperrag_graph(results)
        assert stats["chunks"] == 1


class TestQueryBatches:
    def test_streamed_matches_sequential(self):
        """query_batches (dispatch-all-then-fetch) must return exactly
        what per-batch query_batch returns."""
        from rag_arc_tpu.retrieval.bm25 import BM25Retriever
        from rag_arc_tpu.retrieval.multipath import MultiPathRetriever

        texts = [f"topic {i % 7} document number {i}" for i in range(60)]
        dense = TPUVectorStore.from_texts(
            texts, HashEmbeddings(dim=32)
        ).as_retriever(search_kwargs={"k": 5})
        sparse = BM25Retriever.from_texts(texts, k=5)
        multi = MultiPathRetriever([dense, sparse], top_k=3)
        pipe = RagPipeline(retriever=multi, top_k=3, recall_k=5)
        batches = [
            ["topic 1 document", "document number 42"],
            ["topic 3", "number 7 topic"],
        ]
        streamed = pipe.query_batches(batches)
        for batch, got in zip(batches, streamed):
            want = pipe.query_batch(batch)
            assert [[d.id for d in row] for row in got] == [
                [d.id for d in row] for row in want
            ]

    def test_streamed_falls_back_without_async_path(self):
        from rag_arc_tpu.retrieval.base import BaseRetriever

        class SyncOnly(BaseRetriever):
            def _get_relevant_documents(self, query, **kwargs):
                from rag_arc_tpu.utils.data_model import Document

                return [Document(content=f"hit for {query}", id="x")]

        pipe = RagPipeline(retriever=SyncOnly(), top_k=1)
        out = pipe.query_batches([["a"], ["b"]])
        assert out[0][0][0].content == "hit for a"
        assert out[1][0][0].content == "hit for b"

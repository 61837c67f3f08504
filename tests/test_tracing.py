"""Tracing/observability tests."""

import threading
import time

from rag_arc_tpu.utils.tracing import StageTracer, get_tracer, stage, traced


def test_stage_and_summary():
    tracer = StageTracer()
    with tracer.stage("work"):
        time.sleep(0.01)
    s = tracer.summary()["work"]
    assert s["count"] == 1
    assert s["p50_ms"] >= 5


def test_decorator():
    tracer = StageTracer()

    @tracer.traced("fn")
    def fn(x):
        return x + 1

    assert fn(1) == 2
    assert tracer.summary()["fn"]["count"] == 1


def test_thread_safety():
    tracer = StageTracer()

    def worker():
        for _ in range(50):
            with tracer.stage("t"):
                pass

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert tracer.summary()["t"]["count"] == 200


def test_sample_cap():
    tracer = StageTracer(max_samples_per_stage=10)
    for _ in range(25):
        tracer.record("s", 0.001)
    assert tracer.summary()["s"]["count"] == 10


def test_global_tracer_and_reset():
    get_tracer().reset()
    with stage("global_stage"):
        pass
    assert "global_stage" in get_tracer().summary()
    get_tracer().reset()
    assert get_tracer().summary() == {}


def test_pipeline_emits_stage_timings():
    from rag_arc_tpu.index.vector_store import TPUVectorStore
    from rag_arc_tpu.models.embeddings import HashEmbeddings
    from rag_arc_tpu.serving.pipeline import RagPipeline

    get_tracer().reset()
    store = TPUVectorStore.from_texts(["a doc", "b doc"], HashEmbeddings(dim=16))
    pipe = RagPipeline(store.as_retriever())
    pipe.query_batch(["a"])
    assert "pipeline.retrieve" in pipe.stats()["stage_timings"]

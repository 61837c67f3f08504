"""Stage-level profile of RagPipeline.query_batch (VERDICT r4 #2).

Times each host-side stage of the retrieve+RRF path separately so the
50 ms/32-query batch (bench_results/pipeline_r04_100k.txt) decomposes:
dense path, BM25 path, per-path Document materialization, RetrievalResult
wrapping, RRF fusion dicts. Run on chip or CPU (--cpu): the host-side
costs are the suspects.

Usage: python tools/pipeline_profile.py [--n 100000] [--b 32] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402


def timeit(fn, reps=5):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts) * 1e3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--recall-k", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"# device={jax.devices()[0]}", flush=True)

    from rag_arc_tpu.index.vector_store import TPUVectorStore
    from rag_arc_tpu.models.embeddings import HashEmbeddings
    from rag_arc_tpu.retrieval.bm25 import BM25Retriever
    from rag_arc_tpu.retrieval.multipath import MultiPathRetriever
    from rag_arc_tpu.serving.pipeline import RagPipeline
    from rag_arc_tpu.utils.data_model import Document
    from rag_arc_tpu.utils.fusion import results_from_ranked_docs

    rng = np.random.default_rng(0)
    n = args.n
    lens = rng.integers(30, 90, size=n)
    ids = rng.zipf(1.3, size=int(lens.sum())) % 50_000
    texts, off = [], 0
    for ln in lens:
        texts.append(" ".join(f"w{t}" for t in ids[off : off + ln]))
        off += ln

    emb = HashEmbeddings(dim=args.d)
    store = TPUVectorStore(
        emb, dim=args.d, metric="cosine", capacity=n, dtype=jnp.bfloat16
    )
    docs = [Document(content=t, id=f"d{i}") for i, t in enumerate(texts)]
    vecs = rng.random((n, args.d), dtype=np.float32) - 0.5
    pos = store.index.add(vecs)
    store.docstore.add(docs, pos.tolist())
    dense_ret = store.as_retriever(search_kwargs={"k": args.recall_k})
    bm25_ret = BM25Retriever.from_documents(docs, k=args.recall_k)
    multi = MultiPathRetriever([dense_ret, bm25_ret], top_k=args.recall_k)
    pipe = RagPipeline(retriever=multi, top_k=args.k, recall_k=args.recall_k)
    print("# corpus built", flush=True)

    queries = [
        " ".join(f"w{t}" for t in rng.integers(1_000, 50_000, size=8))
        for _ in range(args.b)
    ]

    print(f"full query_batch        : "
          f"{timeit(lambda: pipe.query_batch(queries)):8.2f} ms")
    print(f"dense invoke_batch      : "
          f"{timeit(lambda: dense_ret.invoke_batch(queries, k=args.recall_k)):8.2f} ms")
    print(f"bm25  invoke_batch      : "
          f"{timeit(lambda: bm25_ret.invoke_batch(queries, k=args.recall_k)):8.2f} ms")

    # sub-stages of the dense path
    qv = np.asarray(emb.embed_documents(queries), dtype=np.float32)
    print(f"  embed queries         : "
          f"{timeit(lambda: emb.embed_documents(queries)):8.2f} ms")
    qj = jnp.asarray(qv)

    def dense_search_only():
        s, p = store.index.search(qj, args.recall_k)
        np.asarray(p)

    print(f"  dense index search    : {timeit(dense_search_only):8.2f} ms")
    s, p = store.index.search(qj, args.recall_k)
    p_np = np.asarray(p)

    def materialize():
        for row in p_np:
            for x in row:
                store.docstore.get_by_position(int(x))

    print(f"  docstore materialize  : {timeit(materialize):8.2f} ms")

    # sub-stages of the bm25 path
    tok = [q.split() for q in queries]
    print(f"  bm25 tokenize         : "
          f"{timeit(lambda: [q.split() for q in queries]):8.2f} ms")
    idx = bm25_ret.index
    print(f"  bm25 index search     : "
          f"{timeit(lambda: idx.search(tok, args.recall_k)):8.2f} ms")

    # fusion stage alone
    per_dense = dense_ret.invoke_batch(queries, k=args.recall_k)
    per_bm25 = bm25_ret.invoke_batch(queries, k=args.recall_k)
    paths_dense = [results_from_ranked_docs(d, source="dense") for d in per_dense]
    paths_bm25 = [results_from_ranked_docs(d, source="bm25") for d in per_bm25]

    def wrap():
        [results_from_ranked_docs(d, source="dense") for d in per_dense]

    print(f"  RetrievalResult wrap  : {timeit(wrap):8.2f} ms (one path)")

    def fuse():
        for a, b in zip(paths_dense, paths_bm25):
            pipe.fusion.fuse([a, b], args.k)

    print(f"  RRF fuse (host dicts) : {timeit(fuse):8.2f} ms")


if __name__ == "__main__":
    main()

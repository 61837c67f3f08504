"""3-stage pipeline bench: retrieve (dense+BM25 multipath) → RRF fuse →
cross-encoder rerank, through the REAL serving object
(serving/pipeline.py::RagPipeline.query_batch) on chip.

The reference's flagship flow is mutipath.py:37-93 + Reranker_Qwen3.py:57-75
run object-at-a-time on GPU; here the whole batch fans out as one dense
dispatch + one BM25 dispatch, fuses, and reranks every (query, candidate)
pair in ONE fused last-logits dispatch. Three operating points:

  none      — retrieval+fusion only (the pipeline floor)
  flagship  — in-house 768x12 causal LM reranker (bf16)
  qwen3     — Qwen3-0.6B-shape reranker (random bf16 weights, real FLOPs)

Usage: python tools/pipeline_bench.py [--n 100000] [--b 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--recall-k", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--no-rerank", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"# device={jax.devices()[0]}", flush=True)

    from rag_arc_tpu.index.vector_store import TPUVectorStore
    from rag_arc_tpu.models.embeddings import HashEmbeddings
    from rag_arc_tpu.models.encoder import TransformerConfig
    from rag_arc_tpu.models.qwen3 import FlaxQwen3LM, Qwen3Config
    from rag_arc_tpu.models.tokenizer import HashTokenizer
    from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker
    from rag_arc_tpu.retrieval.bm25 import BM25Retriever
    from rag_arc_tpu.retrieval.multipath import MultiPathRetriever
    from rag_arc_tpu.serving.pipeline import RagPipeline
    from rag_arc_tpu.utils.data_model import Document

    rng = np.random.default_rng(0)
    n = args.n
    # synthetic zipf word corpus shared by BOTH retrieval paths
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
    t0 = time.time()
    docs = [Document(content=t, id=f"d{i}") for i, t in enumerate(texts)]
    # inject vectors directly (bench isolates the pipeline, not bulk embed)
    vecs = rng.random((n, args.d), dtype=np.float32) - 0.5
    pos = store.index.add(vecs)
    store.docstore.add(docs, pos.tolist())
    dense_ret = store.as_retriever(search_kwargs={"k": args.recall_k})
    bm25_ret = BM25Retriever.from_documents(docs, k=args.recall_k)
    # both paths index the SAME docs list in insertion order → position
    # fusion (bit-exact RRF parity, only fused top-k docs materialize)
    multi = MultiPathRetriever(
        [dense_ret, bm25_ret], top_k=args.recall_k, shared_id_space=True
    )
    print(f"# corpus built: {time.time()-t0:.0f}s", flush=True)

    queries = [
        " ".join(f"w{t}" for t in rng.integers(1_000, 50_000, size=8))
        for _ in range(args.b * 4)
    ]

    def bench(pipeline, tag):
        pipeline.query_batch(queries[: args.b])  # warm/compile
        times = []
        for r in range(args.reps):
            qs = queries[(r % 4) * args.b : (r % 4 + 1) * args.b]
            t0 = time.time()
            out = pipeline.query_batch(qs)
            assert len(out) == args.b and len(out[0]) <= args.k
            times.append(time.time() - t0)
        ms = float(np.median(times) * 1e3)
        print(
            json.dumps(
                {
                    "pipeline": tag,
                    "n_docs": n,
                    "batch": args.b,
                    "recall_k": args.recall_k,
                    "ms_per_batch": round(ms, 1),
                    "qps": round(args.b / ms * 1e3, 1),
                    "ms_per_query_amortized": round(ms / args.b, 2),
                }
            ),
            flush=True,
        )

    def bench_streamed(pipeline, tag, n_batches=4):
        batches = [
            queries[(i % 4) * args.b : (i % 4 + 1) * args.b]
            for i in range(n_batches)
        ]
        pipeline.query_batches(batches[:1])  # warm/compile
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            outs = pipeline.query_batches(batches)
            assert len(outs) == n_batches and len(outs[0]) == args.b
            times.append((time.time() - t0) / n_batches)
        ms = float(np.median(times) * 1e3)
        print(
            json.dumps(
                {
                    "pipeline": tag,
                    "n_docs": n,
                    "batch": args.b,
                    "stream": n_batches,
                    "recall_k": args.recall_k,
                    "ms_per_batch": round(ms, 1),
                    "qps": round(args.b / ms * 1e3, 1),
                    "ms_per_query_amortized": round(ms / args.b, 2),
                }
            ),
            flush=True,
        )

    plain = RagPipeline(retriever=multi, top_k=args.k, recall_k=args.recall_k)
    bench(plain, "retrieve+rrf (no rerank)")
    bench_streamed(plain, "retrieve+rrf STREAMED (no rerank)")
    bench_streamed(plain, "retrieve+rrf STREAMED x8 (no rerank)", n_batches=8)
    if args.no_rerank:
        return

    flag = CrossEncoderReranker(
        cfg=TransformerConfig(
            vocab_size=32768, dim=768, depth=12, heads=12, max_len=512,
            causal=True,
        )
    )
    flag.params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), flag.params
    )
    bench(
        RagPipeline(
            retriever=multi, reranker=flag, top_k=args.k,
            recall_k=args.recall_k,
        ),
        "retrieve+rrf+rerank (768x12 flagship)",
    )

    cfg = Qwen3Config(dtype=jnp.bfloat16)
    model = FlaxQwen3LM(cfg)
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        model.init, key, jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), bool)
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [
            jax.device_put(jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02)
            for k, l in zip(keys, leaves)
        ],
    )
    qwen = CrossEncoderReranker.from_causal_lm(
        model, params, HashTokenizer(vocab_size=cfg.vocab_size, max_len=512),
    )
    bench(
        RagPipeline(
            retriever=multi, reranker=qwen, top_k=args.k,
            recall_k=args.recall_k,
        ),
        "retrieve+rrf+rerank (qwen3-0.6b shape)",
    )


if __name__ == "__main__":
    main()

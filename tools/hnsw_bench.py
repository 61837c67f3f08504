"""HNSW storage-mode bench: f32 vs SQ8 vs PQ on the host C++ engine.

Measures build time, single-thread and batch search QPS, recall@10 vs an
exact numpy oracle, and resident vector bytes for each storage mode.
Host-only (no TPU): HNSW is the latency-path index (ARCHITECTURE.md §index
table); this tool backs the SQ8/PQ memory/recall tradeoff numbers.

Usage: python tools/hnsw_bench.py [--n 100000] [--d 768] [--q 512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--q", type=int, default=512)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--ef", type=int, default=64)
    ap.add_argument("--pq-m", type=int, default=0, help="0 = d//8")
    args = ap.parse_args()
    pq_m = args.pq_m or args.d // 8

    from rag_arc_tpu.index.hnsw import HNSWIndex

    rng = np.random.default_rng(0)
    # clustered corpus (PQ/SQ8 behave differently on structureless data;
    # embeddings in the wild are clustered)
    n_clusters = 256
    centers = rng.standard_normal((n_clusters, args.d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, args.n)
    data = centers[assign] + 0.3 * rng.standard_normal(
        (args.n, args.d)
    ).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    q_idx = rng.integers(0, args.n, args.q)
    queries = data[q_idx] + 0.05 * rng.standard_normal(
        (args.q, args.d)
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    exact = np.argsort(-(queries @ data.T), axis=1, kind="stable")[:, : args.k]

    modes = [
        ("f32", {}),
        ("sq8", {"quantize": True}),
        ("pq", {"pq_m": pq_m, "pq_train_threshold": min(args.n, 4096)}),
    ]
    for name, kw in modes:
        index = HNSWIndex(dim=args.d, metric="cosine", M=32, **kw)
        t0 = time.time()
        index.add(data)
        build_s = time.time() - t0
        t0 = time.time()
        _, got = index.search(queries, args.k, ef=args.ef)
        batch_s = time.time() - t0
        recall = float(
            np.mean(
                [
                    len(set(got[i].tolist()) & set(exact[i].tolist())) / args.k
                    for i in range(args.q)
                ]
            )
        )
        # single-query latency (the regime HNSW exists for)
        t0 = time.time()
        for i in range(min(64, args.q)):
            index.search(queries[i : i + 1], args.k, ef=args.ef)
        single_ms = (time.time() - t0) / min(64, args.q) * 1e3
        print(
            json.dumps(
                {
                    "mode": name,
                    "n": args.n,
                    "d": args.d,
                    "build_s": round(build_s, 1),
                    "batch_qps": round(args.q / batch_s, 0),
                    "single_query_ms": round(single_ms, 3),
                    "recall_at_10": round(recall, 4),
                    "vector_bytes": index.stats()["vector_bytes"],
                    "bytes_per_vector": round(
                        index.stats()["vector_bytes"] / args.n, 1
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

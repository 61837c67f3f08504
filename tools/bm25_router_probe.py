"""Probe the hybrid BM25 device path's cost structure (r5 #1).

Questions:
  1. Does the device dispatch cost scale with B, or is there a fixed
     floor (smoke: B=8 mixed batch ~= B=32 head batch at 1M)?
  2. Head-only vs head+tail-slab queries: which side carries the cost?
  3. Where do the mixed-stream agreement misses (0.9969) come from —
     bf16 head near-ties or real rank errors?

Usage: python tools/bm25_router_probe.py [--n 1000000]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"# device={jax.devices()[0]}", flush=True)

    sys.path.insert(0, str(REPO / "tools"))
    from bm25_bench import synth_csr

    from rag_arc_tpu.index.bm25 import DeviceBM25Index

    cache = REPO / ".jax_cache" / f"bm25_csr_{args.n}_v50000_l60_s0.npz"
    if cache.exists():
        z = np.load(cache)
        csr = z["off"], z["tid"], z["cnt"], z["lens"]
    else:
        csr = synth_csr(np.random.default_rng(0), args.n, 50_000, 60)

    index = DeviceBM25Index(backend="hybrid", head_dtype=jnp.bfloat16)
    t0 = time.time()
    index.build_from_csr(*csr)
    print(f"# build: {time.time()-t0:.0f}s  head_terms={index.stats()['head_terms']}")

    # which term ids are head?
    head_tids = np.nonzero(index._head_slot >= 0)[0]
    df = index._df
    # tail terms with moderate df (slab-worthy)
    tail_tids = np.nonzero((index._head_slot < 0) & (df > 200) & (df < 3000))[0]
    print(f"# head terms: {len(head_tids)}, moderate tail terms: {len(tail_tids)}")
    rng = np.random.default_rng(3)

    def tok(tids):
        return [f"w{t}" for t in tids]

    def time_dispatch(queries, label, reps=5):
        index.search(queries, args.k)  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.time()
            pend = index.search_dispatch(queries, args.k)
            pend.result()
            ts.append(time.time() - t0)
        ms = float(np.median(ts) * 1e3)
        print(f"{label:40s}: {ms:8.2f} ms  ({len(queries)/ms*1e3:8.1f} qps)")
        return ms

    # 1. pure-head queries (every term in a head slot, no tail slabs)
    for b in (1, 4, 8, 16, 32):
        qs = [tok(rng.choice(head_tids, size=8)) for _ in range(b)]
        time_dispatch(qs, f"pure-head B={b}")

    # 2. head + tail slabs (zipf-like: 5 head + 3 moderate-tail terms)
    for b in (8, 32):
        qs = [
            tok(np.concatenate([rng.choice(head_tids, size=5),
                                rng.choice(tail_tids, size=3)]))
            for _ in range(b)
        ]
        time_dispatch(qs, f"head+tailslabs B={b}")

    # 3. agreement misses: mixed profile vs host oracle with score deltas
    host = DeviceBM25Index(backend="host")
    host.build_from_csr(*csr)
    head_q = [[f"w{t}" for t in (rng.zipf(1.3, size=8) % 50_000)] for _ in range(16)]
    sel_q = [[f"w{t}" for t in rng.integers(1_000, 50_000, size=8)] for _ in range(16)]
    for label, qs in (("head", head_q), ("selective", sel_q)):
        hs, hp = host.search(qs, args.k)
        # force the device path regardless of budget
        tc = index._count_terms(qs)
        ds, dp = index._hybrid_dispatch(qs, args.k, tc).result()
        miss = 0
        for i in range(len(qs)):
            a, b2 = set(dp[i].tolist()), set(hp[i].tolist())
            if a != b2:
                miss += 1
                only_dev = a - b2
                only_host = b2 - a
                # score deltas at the boundary
                kth = hs[i][args.k - 1]
                print(f"  [{label} q{i}] dev-only={sorted(only_dev)[:3]} "
                      f"host-only={sorted(only_host)[:3]} "
                      f"host_kth={kth:.6f} "
                      f"dev_scores={[round(float(x),6) for x in ds[i][-3:]]} "
                      f"host_scores={[round(float(x),6) for x in hs[i][-3:]]}")
        print(f"{label}: {miss}/16 queries disagree")


if __name__ == "__main__":
    main()

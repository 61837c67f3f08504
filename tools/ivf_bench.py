"""IVF vs flat on the real chip: QPS + recall@10 across nprobe at small
batch — the regime IVF claims to win (index/ivf.py trade-off note).

Prints one JSON line per (index, batch, nprobe) config, fetch-verified
timing per CLAUDE.md.

Usage: python tools/ivf_bench.py [--n 1000000] [--nlist 2048]
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--nlist", type=int, default=2048)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--stream", type=int, default=16)
    ap.add_argument("--batches", type=str, default="1,8")
    ap.add_argument("--nprobes", type=str, default="8,16,32,64")
    ap.add_argument("--spill", type=int, default=1,
                    help="IVF spilled assignment (rows per list copy)")
    ap.add_argument("--uniform", action="store_true",
                    help="uniform-random corpus (the structureless worst case)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from rag_arc_tpu.index.flat import DeviceFlatIndex
    from rag_arc_tpu.index.ivf import DeviceIVFIndex

    rng = np.random.default_rng(0)
    # clustered corpus (mixture of Gaussians): real embedding spaces have
    # cluster structure — that's the regime IVF exists for. Uniform-random
    # corpora have none and IVF recall collapses to ~nprobe/nlist there
    # (measured: 0.04-0.11 at nprobe 8-32 over 1M uniform rows), which is
    # exactly why flat is the default index.
    if args.uniform:
        corpus = rng.random((args.n, args.d), dtype=np.float32) - 0.5
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        print(f"# device={jax.devices()[0]} uniform corpus", flush=True)
    else:
        n_centers = max(args.nlist, 256)
        centers = rng.standard_normal((n_centers, args.d)).astype(np.float32)
        assign = rng.integers(0, n_centers, args.n)
        corpus = centers[assign] + 0.3 * (
            rng.random((args.n, args.d), dtype=np.float32) - 0.5
        )
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        del assign
        print(f"# device={jax.devices()[0]} clustered corpus ({n_centers} centers)", flush=True)

    flat = DeviceFlatIndex(
        dim=args.d, metric="cosine", capacity=args.n, dtype=jnp.bfloat16
    )
    step = 1 << 17
    for s in range(0, args.n, step):
        flat.add(corpus[s : s + step])

    t0 = time.time()
    ivf = DeviceIVFIndex.from_vectors(
        corpus, nlist=args.nlist, metric="cosine", dtype=jnp.bfloat16,
        spill=args.spill,
    )
    build_s = time.time() - t0
    print(
        json.dumps(
            {"event": "ivf_built", "build_s": round(build_s, 1),
             "lmax": ivf.lmax, "nlist": args.nlist, "spill": args.spill}
        ),
        flush=True,
    )

    batches = [int(x) for x in args.batches.split(",")]
    nprobes = [int(x) for x in args.nprobes.split(",")]
    q_all = corpus[rng.integers(0, args.n, 512)] + 0.1 * rng.standard_normal(
        (512, args.d)
    ).astype(np.float32)
    q_all /= np.linalg.norm(q_all, axis=1, keepdims=True)
    _, exact = flat.search(q_all[:128], args.k)

    def recall(index, nprobe=None):
        kw = {} if nprobe is None else {"nprobe": nprobe}
        _, got = index.search(q_all[:128], args.k, **kw)
        return float(
            np.mean(
                [
                    len(set(got[i].tolist()) & set(exact[i].tolist())) / args.k
                    for i in range(128)
                ]
            )
        )

    def bench(search_fn, b):
        qs = [q_all[(i * b) % 500 : (i * b) % 500 + b] for i in range(args.stream)]
        search_fn(qs[0])  # warm/compile
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            for q in qs:
                search_fn(q)
            times.append((time.time() - t0) / args.stream)
        ms = np.asarray(times) * 1e3
        return round(float(ms.min()), 2), round(float(np.median(ms)), 2)

    for b in batches:
        mn, md = bench(lambda q: flat.search(q, args.k), b)
        print(
            json.dumps(
                {"index": "flat", "batch": b, "ms_min": mn, "ms_median": md,
                 "qps_at_median": round(b / md * 1e3, 1), "recall": 1.0}
            ),
            flush=True,
        )
        for nprobe in nprobes:
            mn, md = bench(lambda q: ivf.search(q, args.k, nprobe=nprobe), b)
            print(
                json.dumps(
                    {"index": "ivf", "batch": b, "nprobe": nprobe,
                     "ms_min": mn, "ms_median": md,
                     "qps_at_median": round(b / md * 1e3, 1),
                     "recall": round(recall(ivf, nprobe), 4)}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()

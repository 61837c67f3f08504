"""BM25 backend bench: device dense kernel vs host CSR at ≥1M docs.

Synthesizes a Zipf-ish corpus (realistic df skew), builds both backends,
and times batched top-k with the fetch-verified methodology. Prints one
JSON line per backend.

Usage: python tools/bm25_bench.py [--n 1000000] [--b 32] [--reps 5]
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


def synth_corpus(rng, n_docs: int, vocab: int = 50_000, mean_len: int = 60):
    """Zipf-distributed token ids; returns texts of space-joined pseudo-words."""
    lens = rng.integers(mean_len // 2, mean_len * 3 // 2, size=n_docs)
    total = int(lens.sum())
    ids = rng.zipf(1.3, size=total) % vocab
    texts = []
    off = 0
    for ln in lens:
        texts.append(" ".join(f"w{t}" for t in ids[off : off + ln]))
        off += ln
    return texts


def synth_csr(rng, n_docs: int, vocab: int = 50_000, mean_len: int = 60):
    """Zipf corpus directly as CSR term-frequency arrays — no Python
    strings, so a 10M-doc corpus synthesizes in minutes on one core
    (the text path would take ~an hour just formatting tokens)."""
    lens = rng.integers(
        mean_len // 2, mean_len * 3 // 2, size=n_docs
    ).astype(np.int64)
    total = int(lens.sum())
    ids = (rng.zipf(1.3, size=total) % vocab).astype(np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    key = doc_of * vocab + ids  # sortable (doc, term) pair
    del ids, doc_of
    uniq, counts = np.unique(key, return_counts=True)
    del key
    term_ids = (uniq % vocab).astype(np.int32)
    row_counts = np.bincount(uniq // vocab, minlength=n_docs)
    del uniq
    row_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(row_counts, out=row_offsets[1:])
    return row_offsets, term_ids, counts.astype(np.float32), lens


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--stream", type=int, default=4)
    ap.add_argument("--backends", type=str, default="host,device")
    ap.add_argument("--csr", action="store_true",
                    help="synthesize CSR directly (host/hybrid backends only)")
    ap.add_argument("--head-dtype", type=str, default="float32",
                    help="hybrid head matrix dtype (bfloat16 fits 10M docs)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from rag_arc_tpu.index.bm25 import DeviceBM25Index

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    t0 = time.time()
    if args.csr:
        # disk cache: 10M-doc synthesis costs minutes of single-core sort;
        # reuse across runs. The key carries EVERY synthesis parameter
        # (n, vocab, mean_len, seed) so a changed generator can never
        # silently serve a stale corpus to a published bench.
        cache = REPO / ".jax_cache" / f"bm25_csr_{args.n}_v50000_l60_s0.npz"
        legacy = REPO / ".jax_cache" / f"bm25_csr_{args.n}.npz"
        if not cache.exists() and legacy.exists():
            # pre-key-change artifact, synthesized with exactly these params
            legacy.rename(cache)
        if cache.exists():
            z = np.load(cache)
            csr = (z["off"], z["tid"], z["cnt"], z["lens"])
        else:
            csr = synth_csr(rng, args.n)
            cache.parent.mkdir(exist_ok=True)
            np.savez(cache, off=csr[0], tid=csr[1], cnt=csr[2], lens=csr[3])
        texts = None
    else:
        texts = synth_corpus(rng, args.n)
    print(f"# corpus synth: {time.time()-t0:.1f}s, device={jax.devices()[0]}", flush=True)

    # two query profiles: "head" draws terms by corpus frequency (stopword-
    # heavy — postings of ~10^5 entries, the term-at-a-time worst case);
    # "selective" draws informative tail terms (df << 1%), which is what
    # real retrieval queries look like after any stopword handling
    profiles = {
        "head": [
            [f"w{t}" for t in (rng.zipf(1.3, size=8) % 50_000)]
            for _ in range(args.b * args.stream)
        ],
        "selective": [
            [f"w{t}" for t in rng.integers(1_000, 50_000, size=8)]
            for _ in range(args.b * args.stream)
        ],
    }

    for backend in args.backends.split(","):
        index = DeviceBM25Index(
            backend=backend, head_dtype=jnp.dtype(args.head_dtype)
        )
        t0 = time.time()
        if args.csr:
            index.build_from_csr(*csr)
        else:
            index.build_from_texts_native(texts)
        build_s = time.time() - t0
        for profile, queries in profiles.items():
            q_batches = [
                queries[i * args.b : (i + 1) * args.b] for i in range(args.stream)
            ]
            # warmup (compiles the device kernel / faults in postings)
            s, p = index.search(q_batches[0], args.k)
            times = []
            for _ in range(args.reps):
                # streamed: enqueue every batch, then drain results — device
                # batches overlap the next batch's host encode (the serial
                # loop paid one tunnel RTT per batch on this box)
                t0 = time.time()
                pend = [index.search_dispatch(qb, args.k) for qb in q_batches]
                for pd in pend:
                    s, p = pd.result()
                times.append((time.time() - t0) / args.stream)
            ms = np.asarray(times) * 1e3
            print(
                json.dumps(
                    {
                        "backend": backend,
                        "profile": profile,
                        "n_docs": args.n,
                        "batch": args.b,
                        "build_s": round(build_s, 1),
                        "ms_per_batch_min": round(float(ms.min()), 2),
                        "ms_per_batch_median": round(float(np.median(ms)), 2),
                        "qps_at_median": round(args.b / np.median(ms) * 1e3, 1),
                    }
                ),
                flush=True,
            )
        del index


if __name__ == "__main__":
    main()

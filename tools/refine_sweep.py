"""Same-session sweep of the 10M int8 refine operating points (VERDICT r3 #2).

The r2 "no-refine 11.5k QPS" vs r3 "refine 9.6k QPS" numbers came from
DIFFERENT sessions on a shared chip with 1.5-2x session variance — this
script builds the 10M index ONCE and A/Bs every knob in-session:

  - kf_mult (candidate over-fetch): 4 (historic) vs 2 vs 1 — the stage-2
    gather of kf*g rows/query is the refine ladder's dominant cost
  - refine int4 vs off (pure f32-query rescore)
  - sub-tile g 16 vs 32

Each point reports sustained QPS (fetch-terminated stream) + recall@10
vs the exact f32 oracle on 128 queries (bench.py methodology).

Usage: BENCH_CORPUS_N=10000000 python tools/refine_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402

CORPUS_N = int(os.environ.get("BENCH_CORPUS_N", 10_000_000))
DIM = 768
BATCH = 512
K = 10
N_BATCHES = int(os.environ.get("BENCH_BATCHES", 20))
ORACLE_QUERIES = 128


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"device: {jax.devices()[0]}", flush=True)

    from rag_arc_tpu.index.flat import DeviceFlatIndex

    rng = np.random.default_rng(0)
    cache = Path("/tmp") / f"bench_corpus_{CORPUS_N}x{DIM}.f16.npy"
    assert cache.exists(), f"corpus cache missing: {cache} (run bench.py first)"
    corpus = np.load(cache, mmap_mode="r")  # f16, sliced lazily

    t0 = time.time()
    index = DeviceFlatIndex(
        dim=DIM, metric="cosine", capacity=CORPUS_N, dtype=jnp.int8,
        refine="int4",
    )
    step = 1 << 17
    for start in range(0, CORPUS_N, step):
        index.add(np.asarray(corpus[start : start + step], dtype=np.float32))
    jax.block_until_ready(index.emb)
    print(f"build: {time.time()-t0:.0f}s", flush=True)

    q_idx = rng.integers(0, CORPUS_N, size=BATCH * N_BATCHES)
    queries = np.asarray(corpus[q_idx], dtype=np.float32) + 0.1 * (
        rng.standard_normal((BATCH * N_BATCHES, DIM), dtype=np.float32)
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    batches = queries.reshape(N_BATCHES, BATCH, DIM)
    dev_batches = [jax.device_put(jnp.asarray(b)) for b in batches]
    jax.block_until_ready(dev_batches)

    # exact f32 oracle (cached: ~2 TFLOP of single-core numpy). The key
    # must carry BATCH*N_BATCHES: the oracle queries are the first 128 of
    # the noise draw, and the rng stream POSITION of that draw shifts with
    # the total query count — a stale cache would silently score the
    # sweep against the wrong oracle.
    sub = queries[:ORACLE_QUERIES]
    okey = Path("/tmp") / (
        f"refine_sweep_oracle_{CORPUS_N}x{DIM}_q{BATCH * N_BATCHES}.npy"
    )
    if okey.exists():
        exact_top = np.load(okey)
    else:
        t0 = time.time()
        exact_top = np.empty((ORACLE_QUERIES, K), dtype=np.int64)
        best = np.full((ORACLE_QUERIES, K), -np.inf, dtype=np.float32)
        chunk = 1 << 18
        for s0 in range(0, CORPUS_N, chunk):
            sc = sub @ np.asarray(
                corpus[s0 : s0 + chunk], dtype=np.float32
            ).T
            top = np.argpartition(-sc, K, axis=1)[:, :K]
            ts = np.take_along_axis(sc, top, axis=1)
            alls = np.concatenate([best, ts], axis=1)
            alli = np.concatenate([exact_top, top + s0], axis=1)
            sel = np.argpartition(-alls, K, axis=1)[:, :K]
            best = np.take_along_axis(alls, sel, axis=1)
            exact_top = np.take_along_axis(alli, sel, axis=1)
        np.save(okey, exact_top)
        print(f"oracle: {time.time()-t0:.0f}s", flush=True)

    def measure(tag: str):
        warm = index.search_device(dev_batches[0], K)
        _ = np.asarray(warm[1])
        t0 = time.time()
        outs = [index.search_device(b, K) for b in dev_batches]
        jax.device_get([o[1] for o in outs])
        dt = time.time() - t0
        qps = BATCH * N_BATCHES / dt
        _, got = index.search(sub, K)
        recall = float(
            np.mean(
                [
                    len(set(got[i].tolist()) & set(exact_top[i].tolist())) / K
                    for i in range(ORACLE_QUERIES)
                ]
            )
        )
        print(
            json.dumps(
                {
                    "config": tag,
                    "qps": round(qps, 1),
                    "ms_per_batch": round(dt / N_BATCHES * 1e3, 2),
                    "recall_at_10": round(recall, 4),
                    "kf": index._kf_local(K, index.capacity),
                    "g": index.SUBTILE_G,
                    "refine": index.refine,
                }
            ),
            flush=True,
        )

    # sweep: every point same-session, same data, same query stream
    for tag, g, kf_mult, refine in [
        ("g16_kf4_int4 (default)", 16, 4, "int4"),
        ("g16_kf2_int4", 16, 2, "int4"),
        ("g16_kf3_int4", 16, 3, "int4"),
        ("g16_kf1_int4", 16, 1, "int4"),
        ("g16_kf4_norefine", 16, 4, None),
        ("g16_kf2_norefine", 16, 2, None),
        ("g32_kf4_int4", 32, 4, "int4"),
    ]:
        index.SUBTILE_G = g
        index.kf_mult = kf_mult
        index.refine = refine
        measure(tag)


if __name__ == "__main__":
    main()

"""Benchmark harness: dense retrieval QPS on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ...}

Headline: batched cosine top-10 queries over a 2M x 768 bf16 corpus
resident in HBM on a single chip (the north-star configuration is 10M x
768 sharded over a v5e-8; 2M/chip is the same per-chip working set).
``vs_baseline`` is measured QPS / 10_000 — the north-star target from
BASELINE.md (the reference publishes no numbers of its own, BASELINE.md:3).

Also reported inside the same JSON object: p50 batch latency, per-query
amortized latency, recall@10 vs an exact f32 numpy oracle on a query
subsample, and encoder embedding throughput.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402

CORPUS_N = int(os.environ.get("BENCH_CORPUS_N", 2_000_000))
DIM = int(os.environ.get("BENCH_DIM", 768))
BATCH = int(os.environ.get("BENCH_BATCH", 512))
K = 10
N_BATCHES = int(os.environ.get("BENCH_BATCHES", 30))
ORACLE_QUERIES = 128
# bfloat16 (default) | int8 (2x rows/chip, quantized metric) | float32.
# BENCH_DTYPE=int8 BENCH_CORPUS_N=10000000 runs the north-star corpus on
# ONE chip (10M x 768 = 7.7 GB HBM as int8).
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")


def _wait_for_backend() -> None:
    """Fail fast (bounded retry) instead of hanging when the TPU tunnel is dead.

    On this box the axon tunnel occasionally drops; when it does, the first
    backend init (``jax.devices()``) hangs indefinitely with zero CPU — which
    would turn a bench run into a silent multi-hour stall. Probe backend init
    in a subprocess (the hang is unkillable in-process), retry for a bounded
    window to absorb transient blips, then exit non-zero with a clear message.
    """
    deadline = time.time() + float(os.environ.get("BENCH_TUNNEL_WAIT_S", 900))
    # a clean axon-init failure falls back to CPU and jax.devices() still
    # succeeds — but CPU "bench" numbers are garbage. Require a real
    # accelerator backend (BENCH_ALLOW_CPU=1 opts into smoke-testing).
    probe = (
        "import jax, sys; "
        "sys.exit(0 if jax.default_backend() in ('tpu', 'axon') else 3)"
    )
    if os.environ.get("BENCH_ALLOW_CPU") == "1":
        probe = "import jax; jax.devices()"
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=120,
                capture_output=True,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print(
                "# bench: JAX backend init hung/failed past BENCH_TUNNEL_WAIT_S"
                " — TPU tunnel down? Aborting instead of hanging.",
                file=sys.stderr,
                flush=True,
            )
            sys.exit(2)
        print("# bench: backend not up yet, retrying...", file=sys.stderr, flush=True)
        time.sleep(60)


def main() -> None:
    _wait_for_backend()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from rag_arc_tpu.index.flat import DeviceFlatIndex

    rng = np.random.default_rng(0)
    t0 = time.time()
    # uniform instead of gaussian: ~4x faster host datagen and identical
    # workload characteristics for cosine MIPS (directions on the sphere
    # are what matter, and queries are corpus-row perturbations anyway).
    # Large corpora cache to disk as f16 (the 10M datagen costs ~30 min
    # of single-core numpy; the f16 rounding applies identically to the
    # index and the oracle, so recall stays internally consistent)
    cache = Path(os.environ.get("BENCH_CORPUS_CACHE", "/tmp")) / (
        f"bench_corpus_{CORPUS_N}x{DIM}.f16.npy"
    )
    if CORPUS_N >= 4_000_000 and cache.exists():
        corpus = np.load(cache, mmap_mode="r").astype(np.float32)
    else:
        corpus = rng.random((CORPUS_N, DIM), dtype=np.float32)
        corpus -= 0.5
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        if CORPUS_N >= 4_000_000:
            np.save(cache, corpus.astype(np.float16))
            corpus = corpus.astype(np.float16).astype(np.float32)
    build_host_s = time.time() - t0

    # BENCH_G overrides the pass-1 sub-tile width: g=32 halves the
    # (N/g, B) sub-max slab — the lever that fits 10M int8 + the int4
    # residual sidecar (11.6 GB) beside the kernel temporaries in 16 GB
    if os.environ.get("BENCH_G"):
        DeviceFlatIndex.SUBTILE_G = int(os.environ["BENCH_G"])

    index = DeviceFlatIndex(
        dim=DIM, metric="cosine", capacity=CORPUS_N, dtype=jnp.dtype(DTYPE)
    )
    t0 = time.time()
    step = 1 << 17
    for start in range(0, CORPUS_N, step):
        index.add(corpus[start : start + step])
    jax.block_until_ready(index.emb)
    build_dev_s = time.time() - t0

    # queries: perturbed corpus rows → recall@10 is a meaningful check
    q_idx = rng.integers(0, CORPUS_N, size=BATCH * N_BATCHES)
    queries = corpus[q_idx] + 0.1 * rng.standard_normal(
        (BATCH * N_BATCHES, DIM), dtype=np.float32
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    batches = queries.reshape(N_BATCHES, BATCH, DIM)

    print(
        f"# build done: host {build_host_s:.0f}s dev {build_dev_s:.0f}s",
        file=sys.stderr, flush=True,
    )
    # stage query batches on device, dispatch the whole stream, then FETCH
    # every result — fetching is the only completion signal that can't lie
    # (on this box host<->device transfers ride a network tunnel where
    # block_until_ready can return at enqueue for pallas custom calls).
    dev_batches = [jax.device_put(jnp.asarray(b)) for b in batches]
    jax.block_until_ready(dev_batches)
    warm = index.search_device(dev_batches[0], K)
    _ = np.asarray(warm[0])  # forces full execution + readback

    t0 = time.time()
    outs = [index.search_device(b, K) for b in dev_batches]
    fetched = jax.device_get([o[1] for o in outs])
    sustained_s = time.time() - t0
    qps = float(BATCH * N_BATCHES / sustained_s)
    del fetched

    # per-batch latency including result readback
    times = []
    for b in dev_batches[: min(10, N_BATCHES)]:
        t0 = time.time()
        s, p = index.search_device(b, K)
        _ = np.asarray(p)
        times.append(time.time() - t0)
    p50_batch_ms = float(np.percentile(np.asarray(times), 50) * 1e3)

    # single-query latency (includes host<->device transfer; on this box
    # that transfer rides a network tunnel, so it overstates real-silicon
    # latency substantially)
    index.search(batches[0][:1], K)
    t_single = []
    for i in range(20):
        t0 = time.time()
        index.search(batches[i % N_BATCHES][:1], K)
        t_single.append(time.time() - t0)
    p50_single_ms = float(np.percentile(t_single, 50) * 1e3)

    # device-side B=1 latency, tunnel amortized out: dispatch 64
    # independent single-query searches back-to-back, fetch all results
    # once. Per-query device time = wall / 64 (the one tunnel round trip
    # spreads across the stream). This is the honest basis for the
    # p50 < 5 ms north-star check, which a 35 ms host RTT would otherwise
    # drown.
    singles = [
        jax.device_put(jnp.asarray(batches[i % N_BATCHES][:1]))
        for i in range(64)
    ]
    jax.block_until_ready(singles)
    _ = np.asarray(index.search_device(singles[0], K)[1])  # warm
    t0 = time.time()
    outs = [index.search_device(s, K) for s in singles]
    jax.device_get([o[1] for o in outs])
    b1_device_ms = float((time.time() - t0) / 64 * 1e3)

    print(f"# search sustained: {qps:.0f} qps", file=sys.stderr, flush=True)
    # recall@10 vs exact f32 oracle on a subsample
    sub = queries[:ORACLE_QUERIES]
    _, got = index.search(sub, K)
    exact_scores = np.empty((ORACLE_QUERIES, CORPUS_N), dtype=np.float32)
    chunk = 1 << 18
    for start in range(0, CORPUS_N, chunk):
        exact_scores[:, start : start + chunk] = sub @ corpus[start : start + chunk].T
    exact_top = np.argpartition(-exact_scores, K, axis=1)[:, :K]
    recall = float(
        np.mean(
            [
                len(set(got[i].tolist()) & set(exact_top[i].tolist())) / K
                for i in range(ORACLE_QUERIES)
            ]
        )
    )

    # encoder embedding throughput (flagship 768x12, bf16 params +
    # activations — the serving inference dtype). Docs are L=128; the
    # roofline: 21.7 GFLOP/doc means N docs/s costs N*21.7 GFLOP/s of
    # the chip's 197 TFLOP/s bf16 peak (9.1k docs/s IS the 100%-MFU
    # ceiling at this length; measured square-matmul ceiling ~87-114
    # TFLOP/s puts the practical wall at ~4-5k docs/s).
    from rag_arc_tpu.models.encoder import (
        PackedTextEncoder,
        TransformerConfig,
        init_encoder,
    )
    from rag_arc_tpu.models.packing import pack_token_lists

    cfg = TransformerConfig(vocab_size=32768, dim=768, depth=12, heads=12, max_len=512)
    model, params = init_encoder(cfg)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    fwd = jax.jit(model.apply)
    ids = jnp.asarray(rng.integers(4, 32768, (256, 128)), jnp.int32)
    mask = jnp.ones((256, 128), dtype=bool)
    jax.block_until_ready(fwd(params, ids, mask))
    t0 = time.time()
    outs_e = [fwd(params, ids, mask) for _ in range(8)]
    _ = jax.device_get(outs_e[-1][:1, :1])
    docs_per_s = float(256 * 8 / (time.time() - t0))
    del outs_e
    doc_mfu = docs_per_s * 128 * (24 * 768 * 768 * 12 + 4 * 128 * 768) / 197e12

    # query embedding throughput: realistic query lengths (8-24 tokens,
    # MSMARCO-ish) SEQUENCE-PACKED into 128-token rows (block-diagonal
    # attention) — short-query throughput scales with 1/length instead
    # of collapsing to tiny-matmul MFU (models/packing.py)
    packed = PackedTextEncoder(cfg, max_segments=8)
    pfwd = jax.jit(packed.apply)
    n_q = 4096
    qlists = [
        rng.integers(4, 32768, size=int(rng.integers(8, 25))).tolist()
        for _ in range(n_q)
    ]
    p_ids, p_pos, p_seg, mapping = pack_token_lists(
        qlists, row_len=128, max_segments=8
    )
    n_rows = p_ids.shape[0]
    r_pad = 1 << int(np.ceil(np.log2(max(n_rows, 1))))
    p_ids = np.pad(p_ids, ((0, r_pad - n_rows), (0, 0)))
    p_pos = np.pad(p_pos, ((0, r_pad - n_rows), (0, 0)))
    p_seg = np.pad(p_seg, ((0, r_pad - n_rows), (0, 0)), constant_values=-1)
    dp_ids, dp_pos, dp_seg = (
        jnp.asarray(p_ids), jnp.asarray(p_pos), jnp.asarray(p_seg)
    )
    jax.block_until_ready(pfwd(params, dp_ids, dp_pos, dp_seg))
    t0 = time.time()
    outs_q = [pfwd(params, dp_ids, dp_pos, dp_seg) for _ in range(5)]
    _ = jax.device_get(outs_q[-1][:1, :1, :1])
    queries_per_s = float(n_q * 5 / (time.time() - t0))
    del outs_q

    # end-to-end query path: tokenized realistic queries → packed encoder
    # → device gather → index search, chained on device, one fetch (the
    # serving hot path a user of the whole pipeline sees)
    rows_map = jnp.asarray(np.asarray([r for r, _ in mapping], np.int32))
    slots_map = jnp.asarray(np.asarray([s for _, s in mapping], np.int32))

    def e2e_packed(pi, pp, ps):
        out = pfwd(params, pi, pp, ps)
        q_dev = out[rows_map, slots_map]
        return [
            index.search_device(q_dev[s : s + BATCH], K)
            for s in range(0, n_q, BATCH)
        ]

    warm = e2e_packed(dp_ids, dp_pos, dp_seg)
    _ = np.asarray(warm[-1][1][:1])
    e2e_times = []
    for _ in range(3):
        t0 = time.time()
        outs = e2e_packed(dp_ids, dp_pos, dp_seg)
        jax.device_get([o[1] for o in outs])
        e2e_times.append(time.time() - t0)
    e2e_qps = float(n_q / np.median(e2e_times))

    # comparability: the r02-style fixed-L=128 e2e (every query padded to
    # 128 tokens — the worst case for the encoder)
    def e2e_l128(ids, mask):
        q_dev = fwd(params, ids, mask)
        return index.search_device(q_dev.astype(jnp.float32), K)

    q_ids = [
        jnp.asarray(rng.integers(4, 32768, (BATCH, 128)), jnp.int32)
        for _ in range(4)
    ]
    q_mask = jnp.ones((BATCH, 128), dtype=bool)
    _ = np.asarray(e2e_l128(q_ids[0], q_mask)[1][:1])  # warm/compile
    l128_times = []
    for _ in range(3):
        t0 = time.time()
        outs = [e2e_l128(qi, q_mask) for qi in q_ids]
        jax.device_get([o[1] for o in outs])
        l128_times.append((time.time() - t0) / len(q_ids))
    e2e_l128_qps = float(BATCH / np.median(l128_times))

    tag = {"bfloat16": "bf16", "int8": "int8", "float32": "f32"}[DTYPE]
    result = {
        "metric": (
            f"dense_retrieval_qps_top10_{CORPUS_N // 1_000_000}M"
            f"x{DIM}_{tag}_1chip"
        ),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 10_000.0, 3),
        "p50_batch_ms": round(p50_batch_ms, 2),
        "batch": BATCH,
        "amortized_ms_per_query": round(p50_batch_ms / BATCH, 4),
        "p50_single_query_ms_incl_tunnel": round(p50_single_ms, 2),
        "b1_device_ms_amortized": round(b1_device_ms, 3),
        "recall_at_10_vs_f32_exact": round(recall, 4),
        "corpus": CORPUS_N,
        "dim": DIM,
        "embed_docs_per_s_1chip": round(docs_per_s, 1),
        "embed_doc_mfu_pct": round(doc_mfu * 100, 1),
        "embed_queries_per_s_1chip_packed": round(queries_per_s, 1),
        "e2e_encode_search_qps": round(e2e_qps, 1),
        "e2e_query_tokens": "8-24 packed",
        "e2e_L128_qps": round(e2e_l128_qps, 1),
        "index_build_s": round(build_dev_s, 2),
        "host_datagen_s": round(build_host_s, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Benchmark harness: the framework's headline numbers on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ..., ...}

Headline: batched cosine top-10 queries over a 2M x 768 bf16 corpus
resident in HBM on a single chip (the north-star configuration is 10M x
768 sharded over a v5e-8; 2M/chip is the same per-chip working set).
``vs_baseline`` is measured QPS / 10_000 — the north-star target from
BASELINE.md (the reference publishes no numbers of its own, BASELINE.md:3).

Also reported inside the same JSON object:
- p50 batch latency, per-query amortized latency, recall@10 vs an exact
  f32 numpy oracle (``oracle_queries`` records the eval-sample size),
- encoder embedding throughput (padded docs + packed queries) and the
  chained encode→search e2e QPS with its serial roofline,
- cross-encoder rerank throughput at the Qwen3-0.6B shape (VERDICT r3 #3),
- BM25 hybrid QPS over a 10M-doc corpus with top-k parity vs the host
  C++ CSR backend (rank_bm25 semantics; VERDICT r3 #1),
- dense+BM25+RRF multipath e2e QPS at 2M with a host-oracle parity check.

Sections are independent: a failing section reports {"error": ...} under
its key instead of killing the headline. Env knobs: BENCH_CORPUS_N,
BENCH_BATCH, BENCH_BATCHES, BENCH_DTYPE, BENCH_G, BENCH_BM25_N,
BENCH_SKIP_RERANK/BM25/MULTIPATH/ENCODER=1.
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
# ONE chip (10M x 768 = 7.7 GB HBM as int8 + 3.9 GB int4 residuals).
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
BM25_N = int(os.environ.get("BENCH_BM25_N", 10_000_000))


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


def _log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _load_corpus(rng: np.random.Generator):
    """Unit-norm corpus rows; ≥4M cached to disk as f16 (identical
    rounding applies to index and oracle, so recall stays internally
    consistent). Uniform instead of gaussian: ~4x faster host datagen
    and identical workload characteristics for cosine MIPS."""
    cache = Path(os.environ.get("BENCH_CORPUS_CACHE", "/tmp")) / (
        f"bench_corpus_{CORPUS_N}x{DIM}.f16.npy"
    )
    if CORPUS_N >= 4_000_000 and cache.exists():
        return np.load(cache, mmap_mode="r").astype(np.float32)
    corpus = rng.random((CORPUS_N, DIM), dtype=np.float32)
    corpus -= 0.5
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    if CORPUS_N >= 4_000_000:
        np.save(cache, corpus.astype(np.float16))
        corpus = corpus.astype(np.float16).astype(np.float32)
    return corpus


def bench_dense(jax, jnp, rng, corpus, result: dict):
    """Headline: sustained dense retrieval QPS + recall vs exact oracle."""
    from rag_arc_tpu.index.flat import DeviceFlatIndex

    # BENCH_G overrides the pass-1 sub-tile width (the auto-widen loop in
    # search_device handles the 10M+refine HBM ceiling on its own now)
    if os.environ.get("BENCH_G"):
        DeviceFlatIndex.SUBTILE_G = int(os.environ["BENCH_G"])

    index = DeviceFlatIndex(
        dim=DIM, metric="cosine", capacity=CORPUS_N, dtype=jnp.dtype(DTYPE)
    )
    if os.environ.get("BENCH_KF_MULT"):
        index.kf_mult = int(os.environ["BENCH_KF_MULT"])
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
    _log(f"dense build done: dev {build_dev_s:.0f}s")

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

    _log(f"search sustained: {qps:.0f} qps")
    # recall@10 vs exact f32 oracle on a subsample
    sub = queries[:ORACLE_QUERIES]
    _, got = index.search(sub, K)
    exact_scores = np.empty((ORACLE_QUERIES, CORPUS_N), dtype=np.float32)
    chunk = 1 << 18
    for start in range(0, CORPUS_N, chunk):
        exact_scores[:, start : start + chunk] = sub @ corpus[start : start + chunk].T
    exact_top = np.argpartition(-exact_scores, K, axis=1)[:, :K]
    del exact_scores
    recall = float(
        np.mean(
            [
                len(set(got[i].tolist()) & set(exact_top[i].tolist())) / K
                for i in range(ORACLE_QUERIES)
            ]
        )
    )

    tag = {"bfloat16": "bf16", "int8": "int8", "float32": "f32"}[DTYPE]
    result.update(
        {
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
            "oracle_queries": ORACLE_QUERIES,
            "corpus": CORPUS_N,
            "dim": DIM,
            "kf_mult": index.kf_mult if index.quantized else None,
            "index_build_s": round(build_dev_s, 2),
        }
    )
    return index, queries, batches


def bench_encoder_and_e2e(jax, jnp, rng, index, result: dict):
    """Encoder throughput (padded docs + packed queries) and the chained
    encode→search e2e. On ONE chip both stages are device programs on the
    same core, so they serialize — the e2e ceiling is the serial roofline
    1/(1/enc + 1/search), and the measured e2e lands at 93-97% of it
    (2M: 11.8k vs 12.6k; 10M: 6.18k vs 6.36k). "Pipelining" encode of
    batch N+1 against search of batch N (VERDICT r3 #4) has nothing to
    overlap: the dispatch stream already queues both programs back to
    back and the core runs one program at a time. Raising e2e means
    making a STAGE cheaper (kf_mult, packing) or giving stages their own
    chips (mesh)."""
    from rag_arc_tpu.models.encoder import (
        PackedTextEncoder,
        TransformerConfig,
        init_encoder,
    )
    from rag_arc_tpu.models.packing import pack_token_lists

    # encoder embedding throughput (flagship 768x12, bf16 params +
    # activations — the serving inference dtype). Docs are L=128; the
    # roofline: 21.7 GFLOP/doc means N docs/s costs N*21.7 GFLOP/s of
    # the chip's 197 TFLOP/s bf16 peak.
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

    search_qps = result.get("value") or 1.0
    roofline = 1.0 / (1.0 / queries_per_s + 1.0 / search_qps)
    result.update(
        {
            "embed_docs_per_s_1chip": round(docs_per_s, 1),
            "embed_doc_mfu_pct": round(doc_mfu * 100, 1),
            "embed_queries_per_s_1chip_packed": round(queries_per_s, 1),
            "e2e_encode_search_qps": round(e2e_qps, 1),
            "e2e_query_tokens": "8-24 packed",
            "e2e_serial_roofline_qps": round(roofline, 1),
            "e2e_roofline_pct": round(100 * e2e_qps / roofline, 1),
            "e2e_L128_qps": round(e2e_l128_qps, 1),
        }
    )


def bench_rerank(jax, jnp, result: dict):
    """Cross-encoder rerank throughput at the reference's flagship shape:
    Qwen3-0.6B reranker semantics (Reranker_Qwen3.py:41-75), one fused
    dispatch over the padded candidate set, L=512, bf16 params. Random
    weights — identical FLOPs/memory to the real checkpoint, and the
    yes/no readout touches 2 logit columns either way."""
    from rag_arc_tpu.models.qwen3 import FlaxQwen3LM, Qwen3Config

    if os.environ.get("BENCH_RERANK_TINY") == "1":  # CPU smoke-test shape
        cfg = Qwen3Config.tiny(dtype=jnp.bfloat16)
    else:
        cfg = Qwen3Config(dtype=jnp.bfloat16)  # 0.6B: 28L x 1024H, V=152k
    model = FlaxQwen3LM(cfg)
    rng_key = jax.random.PRNGKey(0)
    t0 = time.time()
    ids1 = jnp.zeros((1, 8), jnp.int32)
    params = jax.eval_shape(model.init, rng_key, ids1, jnp.ones((1, 8), bool))
    # materialize small random params without a 0.6B f32 host init: bf16
    # normal(0, 0.02) per leaf directly on device
    leaves, treedef = jax.tree_util.tree_flatten(
        params, is_leaf=lambda x: hasattr(x, "shape")
    )
    keys = jax.random.split(rng_key, len(leaves))
    mats = [
        jax.device_put(
            jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02
        )
        for k, l in zip(keys, leaves)
    ]
    params = jax.tree_util.tree_unflatten(treedef, mats)
    _log(f"rerank params ready: {time.time()-t0:.0f}s")

    B, L = 64, min(512, cfg.max_position_embeddings)
    # 50-candidate rerank pads to 64 rows at max_length 512
    rng_np = np.random.default_rng(1)
    ids = jnp.asarray(rng_np.integers(4, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), dtype=bool)
    score = jax.jit(
        lambda p, i, m: model.apply(p, i, m, method=model.last_logits)
    )
    jax.block_until_ready(score(params, ids, mask))
    t0 = time.time()
    outs = [score(params, ids, mask) for _ in range(4)]
    _ = jax.device_get(outs[-1][:1, :1])
    dt = (time.time() - t0) / 4
    pairs_per_s = B / dt
    # non-embedding forward FLOPs/token (matmuls only): qkvo + swiglu mlp
    h, hd, nh, nkv, inter = (
        cfg.hidden_size, cfg.head_dim, cfg.num_attention_heads,
        cfg.num_key_value_heads, cfg.intermediate_size,
    )
    per_layer = 2 * h * hd * (2 * nh + 2 * nkv) + 6 * h * inter  # 2x params
    attn = 4 * L * nh * hd  # score+weighted-sum per token
    flops_per_pair = L * (cfg.num_hidden_layers * (per_layer + attn))
    mfu = pairs_per_s * flops_per_pair / 197e12
    shape = (
        "tiny" if os.environ.get("BENCH_RERANK_TINY") == "1"
        else "qwen3_0p6b"
    )
    result.update(
        {
            f"rerank_pairs_per_s_{shape}_L{L}": round(pairs_per_s, 1),
            "rerank_ms_per_50cand_query": round(1e3 * 50 / pairs_per_s, 1),
            "rerank_mfu_pct": round(mfu * 100, 1),
        }
    )
    _log(f"rerank: {pairs_per_s:.0f} pairs/s ({mfu*100:.0f}% MFU)")
    del params, mats


def _bm25_queries(rng, n, vocab=50_000):
    """Two realistic profiles: head (stopword-heavy zipf draws — the
    term-at-a-time worst case) and selective (informative tail terms,
    what real queries look like after stopword handling)."""
    head = [[f"w{t}" for t in (rng.zipf(1.3, size=8) % vocab)] for _ in range(n)]
    sel = [[f"w{t}" for t in rng.integers(1_000, vocab, size=8)] for _ in range(n)]
    return head, sel


def _bm25_csr(n_docs: int, vocab: int = 50_000, mean_len: int = 60, seed: int = 0):
    """Zipf CSR corpus (10M synthesizes in minutes; disk-cached — the key
    is DERIVED from the synthesis parameters so a changed generator can
    never silently serve a stale corpus)."""
    sys.path.insert(0, str(REPO / "tools"))
    from bm25_bench import synth_csr

    cache = (
        REPO / ".jax_cache"
        / f"bm25_csr_{n_docs}_v{vocab}_l{mean_len}_s{seed}.npz"
    )
    if cache.exists():
        z = np.load(cache)
        return z["off"], z["tid"], z["cnt"], z["lens"]
    csr = synth_csr(np.random.default_rng(seed), n_docs, vocab, mean_len)
    cache.parent.mkdir(exist_ok=True)
    np.savez(cache, off=csr[0], tid=csr[1], cnt=csr[2], lens=csr[3])
    return csr


def bench_bm25_hybrid(jax, jnp, result: dict):
    """BM25 hybrid backend at the north-star corpus size (VERDICT r3 #1):
    head terms as an MXU matmul + HBM tail-posting slab gather, streamed
    dispatch (search_dispatch overlaps host encode with the device
    program). Parity: top-k agreement vs the host C++ CSR backend — the
    rank_bm25-semantics oracle (tested term-exact in test_bm25.py) —
    on a query subsample."""
    from rag_arc_tpu.index.bm25 import DeviceBM25Index

    t0 = time.time()
    csr = _bm25_csr(BM25_N)
    _log(f"bm25 csr ready: {time.time()-t0:.0f}s (nnz={csr[1].size})")

    # f32 head (default): exact host-oracle parity — bf16 heads reorder
    # near-ties (~0.3%% of mixed queries); at 10M the 6 GiB byte budget
    # shrinks the f32 head to ~161 terms (demoted terms ride the exact
    # tail slabs)
    index = DeviceBM25Index(backend="hybrid")
    t0 = time.time()
    index.build_from_csr(*csr)
    build_s = time.time() - t0
    _log(f"bm25 hybrid build: {build_s:.0f}s")

    rng = np.random.default_rng(7)
    head, sel = _bm25_queries(rng, 32 * 4)
    # VERDICT r4 #1 headline: a realistic MIXED stream through the
    # per-query router (backend="hybrid" default): head-heavy queries go
    # to the device matmul, selective ones to the host CSR scorer,
    # zero-match to the host — each batch splits per query, the device
    # subset dispatches first so host scoring overlaps the device program
    zero = [[f"zz_unindexed_{i}_{j}" for j in range(4)] for i in range(32 * 4)]
    mixed = []
    for i in range(32 * 4):
        r = i % 8
        mixed.append(head[i] if r < 2 else (zero[i] if r == 7 else sel[i]))
    out = {"n_docs": BM25_N, "build_s": round(build_s, 1), "batch": 32}
    for profile, queries in (("head", head), ("selective", sel),
                             ("mixed_routed", mixed)):
        q_batches = [queries[i * 32 : (i + 1) * 32] for i in range(4)]
        index.search(q_batches[0], K)  # warm/compile
        times = []
        for _ in range(5):
            t0 = time.time()
            pend = [index.search_dispatch(qb, K) for qb in q_batches]
            for pd in pend:
                pd.result()
            times.append((time.time() - t0) / len(q_batches))
        ms = float(np.median(np.asarray(times)) * 1e3)
        out[f"qps_{profile}"] = round(32 / ms * 1e3, 1)
        out[f"ms_per_batch_{profile}"] = round(ms, 2)
    out["mixed_stream"] = "25% head-heavy / 62.5% selective / 12.5% zero-match"

    # parity vs the host CSR backend on the mixed stream (the host
    # term-at-a-time scorer is exact on every profile — head queries just
    # take ~seconds/batch at 10M, fine for one parity batch)
    host = DeviceBM25Index(backend="host")
    host.build_from_csr(*csr)
    hs, hp = host.search(mixed[:32], K)
    ds, dp = index.search(mixed[:32], K)
    agree = float(
        np.mean(
            [
                len(set(dp[i].tolist()) & set(hp[i].tolist())) / K
                for i in range(32)
            ]
        )
    )
    out["topk_agreement_vs_host_oracle"] = round(agree, 4)
    del host, index
    result[f"bm25_hybrid_{max(BM25_N // 1_000_000, 1)}M"] = out
    _log(f"bm25 hybrid: {out}")


def bench_multipath_e2e(jax, jnp, rng, dense_index, queries, result: dict):
    """Dense + BM25 + RRF hybrid e2e over ONE shared 2M doc-id space
    (mutipath.py:37-93 + Fusion.py:45-76 semantics, device dispatches
    overlapped). Parity: fused top-k vs a host-numpy RRF oracle over the
    two paths' exact results on a subsample."""
    from rag_arc_tpu.index.bm25 import DeviceBM25Index

    # synthesize at the size this section actually uses (it only needs
    # id-alignment with dense rows 0..n, any corpus realization works):
    # this section used to load the 10M CSR cache just to slice a ≤2M
    # prefix, paying the multi-minute synthesis + multi-GB npz load even
    # on small smoke runs and when the 10M BM25 section itself is skipped.
    n_want = min(CORPUS_N, 2_000_000, BM25_N)
    off, tid, cnt, lens = _bm25_csr(n_want)
    n = min(n_want, len(lens))
    e = int(off[n])
    bm25 = DeviceBM25Index(backend="hybrid")
    bm25.build_from_csr(off[: n + 1], tid[:e], cnt[:e], lens[:n])
    del off, tid, cnt, lens

    rng_q = np.random.default_rng(11)
    _, sel = _bm25_queries(rng_q, 32 * 4)
    B, reps = 32, 4
    dense_dev = [
        jax.device_put(jnp.asarray(queries[i * B : (i + 1) * B]))
        for i in range(reps)
    ]
    tok_batches = [sel[i * B : (i + 1) * B] for i in range(reps)]

    k_path = 50  # top_k_per_retriever=50, mutipath.py:24

    def rrf_fuse(dp, bp):
        """RRF 1/(60+rank), id-keyed, top-K — one fused numpy pass."""
        fused = []
        for i in range(dp.shape[0]):
            scores = {}
            for r, d in enumerate(dp[i]):
                if d >= 0:
                    scores[int(d)] = scores.get(int(d), 0.0) + 1.0 / (60 + r + 1)
            for r, d in enumerate(bp[i]):
                if d >= 0:
                    scores[int(d)] = scores.get(int(d), 0.0) + 1.0 / (60 + r + 1)
            top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
            fused.append([d for d, _ in top])
        return fused

    # warm both paths
    _ = np.asarray(dense_index.search_device(dense_dev[0], k_path)[1])
    bm25.search(tok_batches[0], k_path)
    times = []
    for _ in range(5):
        t0 = time.time()
        # dense device programs dispatch FIRST (async), then BM25 — the
        # router sends selective queries to the host CSR scorer, whose
        # work now overlaps the in-flight dense searches (VERDICT r4 #4)
        douts = [dense_index.search_device(db, k_path) for db in dense_dev]
        pend = [bm25.search_dispatch(tb, k_path) for tb in tok_batches]
        for pd, do in zip(pend, douts):
            _, bp = pd.result()
            dpos = np.asarray(do[1])
            rrf_fuse(dpos, bp)
        times.append((time.time() - t0) / reps)
    ms = float(np.median(np.asarray(times)) * 1e3)

    # parity oracle: the framework's own RRFusion (utils/fusion.py — the
    # implementation unit-tested against the reference's Fusion.py:45-76
    # formula) over the same two ranked lists, compared id-for-id with
    # the bench-local fused pass above
    from rag_arc_tpu.utils.data_model import Document
    from rag_arc_tpu.utils.fusion import RRFusion, results_from_ranked_docs

    _, dp = dense_index.search(queries[:B], k_path)
    _, bp = bm25.search(tok_batches[0], k_path)
    dp, bp = np.asarray(dp), np.asarray(bp)
    got = rrf_fuse(dp, bp)
    fusion = RRFusion()
    agree_n = 0
    for i in range(B):
        paths = [
            results_from_ranked_docs(
                [Document(content=f"d{d}", id=str(d)) for d in pos[i] if d >= 0],
                source=src,
            )
            for pos, src in ((dp, "dense"), (bp, "bm25"))
        ]
        want = [int(d.id) for d in fusion.fuse(paths, K)]
        agree_n += len(set(got[i]) & set(want))
    agree = agree_n / (B * K)
    key = f"multipath_hybrid_e2e_{max(n // 1_000_000, 1)}M"
    result[key] = {
        "qps": round(B / ms * 1e3, 1),
        "ms_per_batch": round(ms, 2),
        "batch": B,
        "paths": "dense_topk50 + bm25_hybrid_topk50 + rrf60",
        "rrf_parity_vs_host_oracle": round(agree, 4),
        "n_docs": n,
    }
    del bm25
    _log(f"multipath e2e: {result[key]}")


def main() -> None:
    _wait_for_backend()
    import jax

    if os.environ.get("BENCH_FORCE_CPU") == "1":
        # sitecustomize pins jax_platforms=axon,cpu on this box; smoke
        # tests must opt out in-process before backend init
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.default_rng(0)
    t_start = time.time()
    corpus = _load_corpus(rng)
    host_datagen_s = time.time() - t_start

    # wall budget: optional sections SKIP (recorded) rather than risk an
    # external timeout killing the run before the one JSON line prints —
    # a truncated run would lose the headline too
    budget = float(os.environ.get("BENCH_TIME_BUDGET_S", 3600))

    def over_budget(reserve_s: float) -> bool:
        return time.time() - t_start > budget - reserve_s

    result: dict = {"host_datagen_s": round(host_datagen_s, 2)}
    index, queries, _ = bench_dense(jax, jnp, rng, corpus, result)

    if os.environ.get("BENCH_SKIP_ENCODER") != "1":
        try:
            bench_encoder_and_e2e(jax, jnp, rng, index, result)
        except Exception as exc:  # noqa: BLE001 — sections are independent
            result["encoder_error"] = repr(exc)

    if os.environ.get("BENCH_SKIP_RERANK") != "1":
        if over_budget(reserve_s=900):
            result["rerank_skipped"] = "time budget"
        else:
            try:
                bench_rerank(jax, jnp, result)
            except Exception as exc:  # noqa: BLE001
                result["rerank_error"] = repr(exc)

    # the multipath e2e needs the dense ids and the BM25 ids to name the
    # SAME documents — it runs on the default ≤2M dense corpus only
    if os.environ.get("BENCH_SKIP_MULTIPATH") != "1" and CORPUS_N <= 2_000_000:
        if over_budget(reserve_s=800):
            result["multipath_skipped"] = "time budget"
        else:
            try:
                bench_multipath_e2e(jax, jnp, rng, index, queries, result)
            except Exception as exc:  # noqa: BLE001
                result["multipath_error"] = repr(exc)

    # the 10M BM25 build wants HBM headroom: free the dense index first
    del index
    if os.environ.get("BENCH_SKIP_BM25") != "1":
        # the 10M hybrid build alone is ~9 min — skip rather than get
        # killed JSON-less when the budget can't fit it
        if over_budget(reserve_s=750):
            result["bm25_skipped"] = "time budget"
        else:
            try:
                bench_bm25_hybrid(jax, jnp, result)
            except Exception as exc:  # noqa: BLE001
                result["bm25_error"] = repr(exc)

    result["device"] = str(jax.devices()[0])
    print(json.dumps(result))


if __name__ == "__main__":
    main()

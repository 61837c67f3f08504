"""BM25 scoring as a dense TPU kernel.

Replaces the reference's rank_bm25 ``BM25Okapi`` + ``np.argsort`` scoring
(``core/retrieval/bm25.py:306-313``) with a document-major device layout:

- ``doc_terms (N, Dmax) int32`` — each row holds the document's unique
  term ids, padded with ``DOC_PAD``.
- ``doc_weights (N, Dmax) float32`` — the *fully precomputed* per-term
  BM25 weight ``idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))``; the
  only query-time work left is matching query terms and summing weights.

Scoring a query batch is then a scan over ≤``QMAX`` query-term slots; each
step does a dense masked compare-and-accumulate over ``(B, N, Dmax)`` on
the VPU — no scatter, no variable-length postings, static shapes, and it
shards across chips by rows exactly like the dense index. The IDF follows
BM25Okapi semantics: ``ln((N−df+0.5)/(df+0.5))`` with negative values
floored to ``epsilon · mean(idf)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DOC_PAD = -1  # padding term id in doc_terms
QUERY_PAD = -2  # padding term id in query slots (never matches DOC_PAD)


def compute_idf(doc_freq: np.ndarray, n_docs: int, epsilon: float = 0.25) -> np.ndarray:
    """BM25Okapi IDF with the negative-IDF epsilon floor.

    rank_bm25 parity (the reference's backend, ``bm25.py:179``): the floor
    is ``epsilon * mean(idf)`` where the mean runs over every CORPUS term
    (df ≥ 1), negatives included — a stopword-heavy corpus drags the floor
    down and can make it negative, exactly as BM25Okapi does. df=0 slots
    (filler ids in sparse/partial-vocab CSR builds) are excluded from the
    mean: BM25Okapi's idf dict only ever contains corpus terms, and their
    log((n+0.5)/0.5) idf would inflate the floor."""
    idf = np.log((n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
    present = doc_freq > 0
    avg_idf = idf[present].mean() if present.any() else 1.0
    eps_floor = epsilon * avg_idf
    return np.where(idf < 0, eps_floor, idf).astype(np.float32)


def compute_doc_weights(
    tf: np.ndarray,
    idf_per_slot: np.ndarray,
    doc_len: np.ndarray,
    avgdl: float,
    k1: float = 1.5,
    b: float = 0.75,
) -> np.ndarray:
    """Precompute the document-side BM25 weight for every (doc, term) slot.

    ``tf (N, Dmax)``: term frequency per slot; ``idf_per_slot (N, Dmax)``:
    idf of the slot's term; ``doc_len (N,)``: document lengths in tokens.
    """
    norm = k1 * (1.0 - b + b * doc_len[:, None] / max(avgdl, 1e-9))
    return (idf_per_slot * tf * (k1 + 1.0) / (tf + norm)).astype(np.float32)


def bm25_scores_kernel(
    doc_terms: jax.Array,
    doc_weights: jax.Array,
    query_terms: jax.Array,
    query_counts: jax.Array,
) -> jax.Array:
    """(B, N) BM25 scores.

    ``query_terms (B, QMAX) int32`` padded with QUERY_PAD;
    ``query_counts (B, QMAX) float32`` — query-term multiplicity (rank_bm25
    scores each occurrence of a repeated query term).
    """

    def step(scores, slot):
        qt, qc = slot  # (B,), (B,)
        # (B, N, Dmax) masked compare, summed over Dmax → (B, N)
        match = doc_terms[None, :, :] == qt[:, None, None]
        contrib = jnp.sum(jnp.where(match, doc_weights[None, :, :], 0.0), axis=-1)
        return scores + qc[:, None] * contrib, None

    b = query_terms.shape[0]
    # Zero init derived from the (possibly mesh-sharded) corpus operand so
    # the scan carry has matching "varying" type inside shard_map.
    init = jnp.zeros((b, 1), dtype=jnp.float32) + (doc_weights[:, 0] * 0.0)[None, :]
    scores, _ = jax.lax.scan(
        step, init, (query_terms.T, query_counts.T)
    )  # scan over QMAX slots
    return scores


@partial(jax.jit, static_argnames=("k",))
def bm25_topk(
    doc_terms: jax.Array,
    doc_weights: jax.Array,
    valid: jax.Array,
    query_terms: jax.Array,
    query_counts: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    scores = bm25_scores_kernel(doc_terms, doc_weights, query_terms, query_counts)
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    return select_topk(scores, k)


def select_topk(scores: jax.Array, k: int):
    """Exact top-k over a materialized (B, N) score array WITHOUT
    ``lax.top_k`` — that lowers to a full-width sort (measured ~30 ms at
    (512, 15k) and a 9-minute tunnel compile at (512, 2M)). Two-level
    coarse tournament when a pow2 group divides N, else k argmax passes;
    ties resolve to the lowest index either way, same as lax.top_k."""
    for g in (512, 256, 128):
        if scores.shape[1] % g == 0 and k <= g:
            return _coarse_topk(scores, k, g)
    return _iter_topk(scores, k)


def _iter_topk(scores: jax.Array, k: int):
    """k-pass argmax top-k over (B, N) — ``lax.top_k`` SORTS the full
    width (measured ~30 ms at (512, 15k) and a 9-minute compile at
    (512, 2M) on this box); k max/argmax/mask passes stay linear."""

    def step(sc, _):
        idx = jnp.argmax(sc, axis=1)
        val = jnp.take_along_axis(sc, idx[:, None], axis=1)[:, 0]
        sc = sc.at[jnp.arange(sc.shape[0]), idx].set(-jnp.inf)
        return sc, (val, idx)

    _, (vals, idxs) = jax.lax.scan(step, scores, None, length=k)
    return vals.T, idxs.T  # (B, k)


def _coarse_topk(scores: jax.Array, k: int, g: int = 256):
    """Exact top-k over a materialized (B, N) score array, two-level.

    ``_iter_topk`` re-reads AND re-writes the full (B, N) array once per
    selected element — k·2·B·N·4 bytes of HBM traffic (2.5 GB at B=32,
    N=1M, k=10). Here one coarse pass reduces groups of ``g`` columns to
    their max (a single full read), then each of the k selection steps
    works on the (B, N/g) reduced array: argmax, gather the winning
    group's g raw scores, resolve the in-group winner, and lower that
    group's cached max — the same tournament the dense index's two-level
    select runs (ARCHITECTURE.md §2). Exact: a group's max is an upper
    bound for every element in it, so the global argmax over group-maxes
    always locates the group holding the true next-best element.
    Requires N % g == 0 (callers pad; ``bm25_hybrid_topk`` pads N to a
    multiple of 1024 at build). Ties broken by lowest index, matching
    jnp.argmax.
    """
    b, n = scores.shape
    n_sub = n // g
    sub = jnp.max(scores.reshape(b, n_sub, g), axis=2)  # ONE full read
    rows = jnp.arange(b)
    span = jnp.arange(g, dtype=jnp.int32)

    def grab(row, gi):
        return jax.lax.dynamic_slice(row, (gi * g,), (g,))

    def step(carry, _):
        sub, picked = carry
        gidx = jnp.argmax(sub, axis=1)                    # (B,)
        grp = jax.vmap(grab)(scores, gidx)                # (B, g) raw
        base = (gidx * g).astype(jnp.int32)
        absidx = base[:, None] + span[None, :]            # (B, g)
        dup = jnp.any(absidx[:, :, None] == picked[:, None, :], axis=-1)
        grp = jnp.where(dup, -jnp.inf, grp)
        e = jnp.argmax(grp, axis=1)
        val = jnp.take_along_axis(grp, e[:, None], axis=1)[:, 0]
        chosen = base + e.astype(jnp.int32)
        # exclude the winner and refresh this group's cached max
        grp = grp.at[rows, e].set(-jnp.inf)
        sub = sub.at[rows, gidx].set(jnp.max(grp, axis=1))
        picked = jnp.concatenate([picked[:, 1:], chosen[:, None]], axis=1)
        return (sub, picked), (val, chosen)

    picked0 = jnp.full((b, k), -1, dtype=jnp.int32)
    _, (vals, idxs) = jax.lax.scan(step, (sub, picked0), None, length=k)
    return vals.T, idxs.T  # (B, k)


def _hybrid_body(
    w_head: jax.Array,
    valid: jax.Array,
    q_head: jax.Array,
    tail_docs: jax.Array,
    tail_w: jax.Array,
    groups,  # sequence of (starts (B,T_w), lens, counts, width)
    k: int,
) -> tuple[jax.Array, jax.Array]:
    b = q_head.shape[0]
    scores = jnp.dot(
        q_head.astype(w_head.dtype),
        w_head,
        preferred_element_type=jnp.float32,
        # TPU f32 matmuls run bf16 passes at DEFAULT precision — an f32
        # head must ask for HIGHEST or its scores round exactly like a
        # bf16 head and the host-oracle parity breaks on near-ties
        precision=(
            jax.lax.Precision.HIGHEST
            if w_head.dtype == jnp.float32 else None
        ),
    )
    scores = jnp.where(valid[None, :], scores, -jnp.inf)

    # contiguous slab reads, not elementwise gather: each (query, term)
    # slot is ONE dynamic_slice of its group's width (the postings arrays
    # carry a max-width zero-pad so clamping never shifts a start) — B·T
    # wide HBM reads instead of B·T·width scalar gathers. Slabs come in
    # WIDTH BUCKETS: the scatter-add below costs per SLOT whether or not
    # the slot is padding, and one static width meant a df=300 term paid
    # a 9,766-slot slab at 10M docs (97% padding) — per-bucket widths
    # keep padded slots ≈ 2x the live postings.
    for starts, lens, counts, width in groups:
        span = jnp.arange(width, dtype=jnp.int32)
        in_list = span[None, None, :] < lens[:, :, None]    # (B, T, width)

        def grab(s, _w=width):
            return (
                jax.lax.dynamic_slice(tail_docs, (s,), (_w,)),
                jax.lax.dynamic_slice(tail_w, (s,), (_w,)),
            )

        docs_slab, w_slab = jax.vmap(grab)(starts.reshape(-1))
        cand = docs_slab.reshape(b, -1)                     # (B, T·width)
        w = w_slab.reshape(b, starts.shape[1], width) * counts[:, :, None]
        w = jnp.where(in_list, w, 0.0).reshape(b, -1)

        # pad slots point at doc 0 with w=0: the add is a no-op there,
        # and -inf invalid rows absorb any addition
        scores = scores.at[jnp.arange(b)[:, None], cand].add(w)
    return select_topk(scores, k)


@partial(jax.jit, static_argnames=("k", "max_df"))
def bm25_hybrid_topk(
    w_head: jax.Array,      # (H, N) per-doc weights of the H head terms
    valid: jax.Array,       # (N,) bool
    q_head: jax.Array,      # (B, H) f32 query-term multiplicities
    tail_docs: jax.Array,   # (nnz,) int32 HBM-resident postings doc ids
    tail_w: jax.Array,      # (nnz,) f32 HBM-resident postings weights
    starts: jax.Array,      # (B, T) int32 posting-list starts per tail term
    lens: jax.Array,        # (B, T) int32 posting-list lengths
    counts: jax.Array,      # (B, T) f32 query-term multiplicities
    k: int,
    max_df: int,            # static bound on any tail term's df
) -> tuple[jax.Array, jax.Array]:
    """Exact hybrid BM25 top-k (head-dense / tail-sparse), single slab
    width (the width-bucketed production entry is
    ``bm25_hybrid_topk_flat``).

    Head (high-df) terms score ALL docs with one MXU matmul; tail terms'
    postings live in HBM and are GATHERED ON DEVICE — the host ships only
    (start, len, count) per query tail term, so query-time host→device
    traffic is O(B·T), never O(Σ df). Tail contributions SCATTER-ADD into
    the (B, N) head-score array (already materialized for the matmul), so
    a doc matching several tail terms of one query accumulates their sum —
    a gather-and-merge formulation is NOT exact for such docs, because
    each candidate copy carries only its own term's weight and every copy
    underestimates the true total. One top-k over the summed array is
    exact by construction; returned ids are unique per query.
    """
    return _hybrid_body(
        w_head, valid, q_head, tail_docs, tail_w,
        ((starts, lens, counts, max_df),), k,
    )


@partial(jax.jit, static_argnames=("k", "b", "h", "widths", "ss"))
def bm25_hybrid_topk_flat(
    w_head: jax.Array,      # (H, N) per-doc weights of the H head terms
    valid: jax.Array,       # (N,) bool
    tail_docs: jax.Array,   # (nnz,) int32 HBM-resident postings doc ids
    tail_w: jax.Array,      # (nnz,) f32 HBM-resident postings weights
    packed: jax.Array,      # 1-D int32, layout below
    k: int,
    b: int,                 # static batch size (pow2-padded)
    h: int,
    widths: tuple,          # static slab width per bucket (ascending)
    ss: tuple,              # static SLAB counts per bucket, batch-shared
) -> tuple[jax.Array, jax.Array]:
    """``bm25_hybrid_topk`` with width-bucketed slabs FLATTENED across the
    batch. The per-query layout made every query pay the batch's maximum
    slab count per bucket — the scatter-add costs per SLOT whether live or
    padding, and at 10M docs a 32-query zipf batch paid 16 max-width slabs
    × 32 queries ≈ 5.1M slots when only ~70 slabs were live across the
    whole batch. Here each slab carries its owner query's row index, the
    scatter destination row comes from that id, and the slot count scales
    with Σ live slabs (pow2-padded ONCE per bucket, not per query).

      packed = [q_head (b·h) | per bucket: starts(s) lens(s) counts(s) qids(s)]

    Padding slabs carry start=len=count=qid=0: their weights are zero, so
    the add is a no-op on (query 0, doc 0). Exactness argument is the
    packed kernel's: all of a doc's tail-term contributions accumulate
    into the same (query, doc) cell before ONE top-k."""
    q_head = packed[: b * h].reshape(b, h).astype(jnp.float32)
    scores = jnp.dot(
        q_head.astype(w_head.dtype),
        w_head,
        preferred_element_type=jnp.float32,
        # see _hybrid_body: f32 heads need HIGHEST (TPU default runs
        # bf16 passes) for exact host-oracle parity
        precision=(
            jax.lax.Precision.HIGHEST
            if w_head.dtype == jnp.float32 else None
        ),
    )
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    o = b * h
    for width, s in zip(widths, ss):
        starts = packed[o : o + s]
        lens = packed[o + s : o + 2 * s]
        counts = packed[o + 2 * s : o + 3 * s].astype(jnp.float32)
        qids = packed[o + 3 * s : o + 4 * s]
        o += 4 * s
        span = jnp.arange(width, dtype=jnp.int32)
        in_list = span[None, :] < lens[:, None]            # (s, width)

        def grab(st, _w=width):
            return (
                jax.lax.dynamic_slice(tail_docs, (st,), (_w,)),
                jax.lax.dynamic_slice(tail_w, (st,), (_w,)),
            )

        docs_slab, w_slab = jax.vmap(grab)(starts)         # (s, width)
        w = jnp.where(in_list, w_slab * counts[:, None], 0.0)
        scores = scores.at[qids[:, None], docs_slab].add(w)
    return select_topk(scores, k)


@partial(jax.jit, static_argnames=("k", "widths", "ts"))
def bm25_tail_only_topk(
    tail_docs: jax.Array,
    tail_w: jax.Array,
    packed: jax.Array,      # (B, 3·Σts) int32 — the hybrid layout with h=0
    k: int,
    widths: tuple,
    ts: tuple,
) -> tuple[jax.Array, jax.Array]:
    """Exact BM25 top-k for HEAD-FREE batches without the (B, N) score
    array. The hybrid kernel's dense materialization + coarse top-k is a
    ~32 ms floor at 10M docs (bench_results/bm25_hybrid_probe_r04_10M.txt)
    — pure overhead when no query touches a head term, which is what
    realistic selective traffic (post-stopword queries) looks like.

    Gather the tail slabs exactly as the hybrid kernel, then merge
    per-doc contributions by SORTING candidates on doc id and running a
    segmented inclusive scan (Hillis-Steele, log₂W steps; ids are sorted,
    so id-equality at any shift distance IS the segment test). Run-end
    totals are the exact per-doc sums — same weights, same idf, only the
    f32 add order differs from the scatter path. Top-k via k argmax
    passes over the (B, W) candidate window (W = padded slab slots,
    thousands — never N)."""
    b = packed.shape[0]
    cands, wparts = [], []
    o = 0
    for width, t in zip(widths, ts):
        starts = packed[:, o : o + t]
        lens = packed[:, o + t : o + 2 * t]
        counts = packed[:, o + 2 * t : o + 3 * t].astype(jnp.float32)
        o += 3 * t
        span = jnp.arange(width, dtype=jnp.int32)
        in_list = span[None, None, :] < lens[:, :, None]

        def grab(s, _w=width):
            return (
                jax.lax.dynamic_slice(tail_docs, (s,), (_w,)),
                jax.lax.dynamic_slice(tail_w, (s,), (_w,)),
            )

        d, w = jax.vmap(grab)(starts.reshape(-1))
        cand = d.reshape(b, t, width)
        w = w.reshape(b, t, width) * counts[:, :, None]
        # pad slots get id -1 (sorts first, masked at the end) — id 0
        # with w=0 would fabricate a score-0.0 candidate for doc 0
        cands.append(jnp.where(in_list, cand, -1).reshape(b, -1))
        wparts.append(jnp.where(in_list, w, 0.0).reshape(b, -1))
    ids = jnp.concatenate(cands, axis=1)
    w = jnp.concatenate(wparts, axis=1)
    ids, w = jax.lax.sort((ids, w), dimension=1, num_keys=1)

    big = ids.shape[1]
    acc = w
    dist = 1
    while dist < big:
        same = (
            ids
            == jnp.pad(ids, ((0, 0), (dist, 0)), constant_values=-2)[:, :big]
        )
        shifted = jnp.pad(acc, ((0, 0), (dist, 0)))[:, :big]
        acc = acc + jnp.where(same, shifted, 0.0)
        dist *= 2
    nxt = jnp.pad(ids[:, 1:], ((0, 0), (0, 1)), constant_values=-2)
    score = jnp.where((ids != nxt) & (ids >= 0), acc, -jnp.inf)
    s, idx = _iter_topk(score, min(k, big))
    p = jnp.take_along_axis(ids, idx, axis=1)
    p = jnp.where(jnp.isneginf(s), -1, p)
    if s.shape[1] < k:
        pad = k - s.shape[1]
        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        p = jnp.pad(p, ((0, 0), (0, pad)), constant_values=-1)
    return s, p


def numpy_bm25_oracle(
    tokenized_docs: list[list[str]],
    tokenized_query: list[str],
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
) -> np.ndarray:
    """Straightforward host BM25Okapi for oracle testing (the reference's
    rank_bm25 dependency is re-derived here from the published formula)."""
    n = len(tokenized_docs)
    doc_len = np.array([len(d) for d in tokenized_docs], dtype=np.float64)
    avgdl = doc_len.mean() if n else 0.0
    vocab: dict[str, int] = {}
    for doc in tokenized_docs:
        for t in doc:
            vocab.setdefault(t, len(vocab))
    df = np.zeros(len(vocab))
    tfs = []
    for doc in tokenized_docs:
        tf: dict[int, int] = {}
        for t in doc:
            tf[vocab[t]] = tf.get(vocab[t], 0) + 1
        tfs.append(tf)
        for tid in tf:
            df[tid] += 1
    idf = compute_idf(df, n, epsilon)
    scores = np.zeros(n)
    for q in tokenized_query:
        tid = vocab.get(q)
        if tid is None:
            continue
        for i, tf in enumerate(tfs):
            f = tf.get(tid, 0)
            if f:
                norm = k1 * (1 - b + b * doc_len[i] / avgdl)
                scores[i] += idf[tid] * f * (k1 + 1) / (f + norm)
    return scores

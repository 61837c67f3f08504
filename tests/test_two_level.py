"""Two-level exact top-k tests (Pallas interpret mode on CPU) against the
XLA exact path. Mirrors tests/test_fused_mips.py's oracle style."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_arc_tpu.ops.topk import masked_topk
from rag_arc_tpu.ops.two_level import two_level_topk


def setup_corpus(rng, n=4096, d=64, metric="cosine", b=8):
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    if metric == "cosine":
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    valid = np.ones(n, dtype=bool)
    valid[5] = False  # one tombstone
    sqnorm = (corpus * corpus).sum(1).astype(np.float32)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    return (
        jnp.asarray(queries),
        jnp.asarray(corpus),
        jnp.asarray(valid),
        jnp.asarray(sqnorm),
    )


@pytest.mark.parametrize("metric", ["cosine", "ip", "l2"])
def test_matches_exact(rng, metric):
    q, corpus, valid, sqnorm = setup_corpus(rng, metric=metric)
    es, ep = masked_topk(q, corpus, valid, 10, metric, sqnorm)
    ts, tp = two_level_topk(
        q, corpus, valid, sqnorm, k=10, g=128, tile_n=1024, metric=metric,
        interpret=True,
    )
    for b in range(q.shape[0]):
        assert set(np.asarray(ep)[b].tolist()) == set(np.asarray(tp)[b].tolist())
    np.testing.assert_allclose(np.asarray(ts), np.asarray(es), rtol=1e-4, atol=1e-4)


def test_excludes_tombstones(rng):
    q, corpus, valid, sqnorm = setup_corpus(rng)
    _, tp = two_level_topk(
        q, corpus, valid, sqnorm, k=10, g=128, tile_n=1024, interpret=True
    )
    assert 5 not in np.asarray(tp)


def test_winners_concentrated_in_one_subtile(rng):
    """All true top-k inside a single sub-tile — the case that breaks naive
    'one candidate per tile' schemes; the top-k-subtile selection must keep
    enough candidates from that one sub-tile."""
    d = 64
    corpus = rng.standard_normal((2048, d)).astype(np.float32) * 0.01
    target = rng.standard_normal(d).astype(np.float32)
    # plant the 10 strongest matches in rows 256..265 (one g=128 sub-tile)
    for i in range(10):
        corpus[256 + i] = target * (10.0 - i)
    valid = np.ones(2048, dtype=bool)
    sqnorm = (corpus * corpus).sum(1).astype(np.float32)
    q = jnp.asarray(target[None, :].repeat(8, axis=0))
    ts, tp = two_level_topk(
        jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid),
        jnp.asarray(sqnorm), k=10, g=128, tile_n=1024, metric="ip",
        interpret=True,
    )
    for b in range(8):
        assert set(np.asarray(tp)[b].tolist()) == set(range(256, 266))


def test_fewer_valid_rows_than_k(rng):
    q, corpus, valid, sqnorm = setup_corpus(rng, n=1024)
    valid = valid.at[8:].set(False)  # only 8 live rows, k=10
    ts, tp = two_level_topk(
        q, corpus, valid, sqnorm, k=10, g=128, tile_n=1024, interpret=True
    )
    tp = np.asarray(tp)
    assert ((0 <= tp[:, :7]) & (tp[:, :7] < 8)).all()
    assert (tp[:, 8:] == -1).all()


def test_k_larger_than_subtile_count(rng):
    # n_sub = 1024/128 = 8 < k=16: k_tiles caps at n_sub, candidates = n
    q, corpus, valid, sqnorm = setup_corpus(rng, n=1024)
    es, ep = masked_topk(q, corpus, valid, 16, "cosine", sqnorm)
    ts, tp = two_level_topk(
        q, corpus, valid, sqnorm, k=16, g=128, tile_n=1024, interpret=True
    )
    for b in range(q.shape[0]):
        assert set(np.asarray(ep)[b].tolist()) == set(np.asarray(tp)[b].tolist())


def test_rejects_misaligned(rng):
    q, corpus, valid, sqnorm = setup_corpus(rng, n=1000)
    with pytest.raises(ValueError, match="multiple"):
        two_level_topk(q, corpus, valid, sqnorm, k=4, tile_n=1024, interpret=True)
    q, corpus, valid, sqnorm = setup_corpus(rng, n=1024)
    with pytest.raises(ValueError, match="multiple"):
        two_level_topk(
            q, corpus, valid, sqnorm, k=4, g=128, tile_n=192, interpret=True
        )


def test_multi_qblock_grid(rng):
    q, corpus, valid, sqnorm = setup_corpus(rng, b=16)
    es, ep = masked_topk(q, corpus, valid, 5, "cosine", sqnorm)
    ts, tp = two_level_topk(
        q, corpus, valid, sqnorm, k=5, g=128, tile_n=1024, q_block=4,
        interpret=True,
    )
    for b in range(q.shape[0]):
        assert set(np.asarray(ep)[b].tolist()) == set(np.asarray(tp)[b].tolist())


def test_bf16_corpus_recall(rng):
    """bf16 corpus: scores quantize but the two passes use identical
    arithmetic, so selection stays consistent (recall vs f32 oracle ≈ 1)."""
    q, corpus, valid, sqnorm = setup_corpus(rng, n=2048)
    es, ep = masked_topk(q, corpus, valid, 10, "cosine", sqnorm)
    ts, tp = two_level_topk(
        q, corpus.astype(jnp.bfloat16), valid, sqnorm, k=10, g=128,
        tile_n=1024, interpret=True,
    )
    recall = np.mean(
        [
            len(set(np.asarray(ep)[b].tolist()) & set(np.asarray(tp)[b].tolist())) / 10
            for b in range(q.shape[0])
        ]
    )
    assert recall >= 0.9


class TestInt8:
    """Quantized two-level search: exact under the int8 metric, high
    recall vs the f32 oracle."""

    def test_matches_int8_oracle_exactly(self, rng):
        from rag_arc_tpu.ops.two_level import quantize_rows, two_level_topk_i8

        n, d, b, k = 2048, 64, 8, 10
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        codes, scales = quantize_rows(corpus)
        valid = np.ones(n, bool)
        valid[7] = False
        q = rng.standard_normal((b, d)).astype(np.float32)

        s, p = two_level_topk_i8(
            jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
            jnp.asarray(valid), k=k, g=32, tile_n=1024, interpret=True,
        )
        # numpy oracle under the same quantized metric
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        qs = np.abs(qn).max(axis=1, keepdims=True) / 127.0
        qi = np.clip(np.rint(qn / qs), -127, 127).astype(np.int32)
        want = (qi @ codes.astype(np.int32).T).astype(np.float32) * scales[None, :]
        want[:, ~valid] = -np.inf
        want_top = np.argsort(-want, axis=1, kind="stable")[:, :k]
        for i in range(b):
            assert set(np.asarray(p)[i].tolist()) == set(want_top[i].tolist())

    def test_recall_vs_f32_exact(self, rng):
        from rag_arc_tpu.ops.two_level import quantize_rows, two_level_topk_i8
        from rag_arc_tpu.ops.topk import masked_topk

        n, d, b, k = 4096, 64, 16, 10
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        codes, scales = quantize_rows(corpus)
        valid = np.ones(n, bool)
        q = corpus[rng.integers(0, n, b)] + 0.1 * rng.standard_normal((b, d)).astype(
            np.float32
        )
        es, ep = masked_topk(
            jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid), k,
            "cosine", jnp.asarray((corpus * corpus).sum(1)),
        )
        qs_, qp = two_level_topk_i8(
            jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
            jnp.asarray(valid), k=k, g=32, tile_n=1024, interpret=True,
        )
        recall = np.mean(
            [
                len(set(np.asarray(ep)[i].tolist()) & set(np.asarray(qp)[i].tolist())) / k
                for i in range(b)
            ]
        )
        assert recall >= 0.95, recall
        # reported scores sit in the cosine range
        assert np.all(np.asarray(qs_)[:, 0] <= 1.05)

    def test_block_scales_kernel_matches_per_row(self, rng):
        """block_scales=True (per-sub-tile scale folded after an
        int32-sentinel-masked max — the low-memory kernel that makes
        10M+refine fit one chip) must be VALUE-identical to the per-row
        kernel whenever scales are QUANT_BLOCK-shared, including
        tombstoned rows, a whole dead sub-tile, and zeroed gap/tail
        padding (flat.py's storage invariants)."""
        from rag_arc_tpu.ops.two_level import (
            quantize_rows_blocked,
            two_level_topk_i8,
        )

        n, d, b, k, g = 2048, 64, 8, 10, 32
        corpus = rng.standard_normal((n - 192, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        codes, scales = quantize_rows_blocked(corpus, block=32)
        # capacity tail: zero codes, zero scale, invalid (as in flat.py)
        codes = np.concatenate([codes, np.zeros((192, d), np.int8)])
        scales = np.concatenate([scales, np.zeros(192, np.float32)])
        valid = np.ones(n, bool)
        valid[n - 192:] = False
        valid[5] = False            # tombstone inside a live sub-tile
        codes[5] = 0                # mark_deleted zeroes codes, keeps scale
        valid[64:96] = False        # a whole dead sub-tile
        codes[64:96] = 0
        q = rng.standard_normal((b, d)).astype(np.float32)

        ref = two_level_topk_i8(
            jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
            jnp.asarray(valid), k=k, g=g, tile_n=1024, interpret=True,
        )
        blk = two_level_topk_i8(
            jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
            jnp.asarray(valid), k=k, g=g, tile_n=1024, interpret=True,
            block_scales=True,
        )
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(blk[1]))
        np.testing.assert_allclose(
            np.asarray(ref[0]), np.asarray(blk[0]), rtol=0, atol=0
        )


class TestIterativeArgmaxTournament:
    """The hierarchical tournament must match the naive k-pass argmax
    exactly (same picks, same tie-breaks, same liveness, same residual)."""

    @staticmethod
    def naive(x, k):
        from rag_arc_tpu.ops.two_level import NEG

        x = np.array(x, dtype=np.float32)
        b, c = x.shape
        out = np.zeros((b, k), np.int32)
        live = np.zeros((b, k), bool)
        for j in range(k):
            idx = np.argmax(x, axis=1)
            best = x[np.arange(b), idx]
            out[:, j] = np.minimum(idx, c - 1)
            live[:, j] = best > NEG * 0.5
            x[np.arange(b), idx] = NEG
        return out, live, x.max(axis=1)

    @pytest.mark.parametrize("shape,k,chunk", [
        ((4, 1000), 10, 128),   # multi-chunk with padding
        ((3, 64), 5, 512),      # single chunk (chunk > width)
        ((2, 256), 8, 64),      # exact chunk multiple
    ])
    def test_matches_naive(self, rng, shape, k, chunk):
        from rag_arc_tpu.ops.two_level import iterative_argmax_resid

        x = rng.standard_normal(shape).astype(np.float32)
        # inject ties and near-sentinel values
        x[0, 5] = x[0, 17] = 3.5
        got_i, got_l, got_r = jax.device_get(
            iterative_argmax_resid(jnp.asarray(x), k, chunk=chunk)
        )
        want_i, want_l, want_r = self.naive(x, k)
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_array_equal(got_l, want_l)
        np.testing.assert_allclose(got_r, want_r)

    def test_exhausted_rows_marked_dead(self):
        from rag_arc_tpu.ops.two_level import NEG, iterative_argmax_resid

        x = np.full((2, 100), NEG, dtype=np.float32)
        x[0, 40] = 1.0  # row 0 has ONE live entry; row 1 none
        idx, live, resid = jax.device_get(
            iterative_argmax_resid(jnp.asarray(x), 4, chunk=32)
        )
        assert idx[0, 0] == 40 and live[0, 0]
        assert not live[0, 1:].any() and not live[1].any()
        assert (idx < 100).all()


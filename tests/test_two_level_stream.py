"""Streaming pass-1 kernel (interpret-mode oracle tests).

The production stream path is ``two_level_topk_certified``: maskless
pass 1 (15% faster than the grid producer, measured same-session on v5e:
36.4 vs 42.8 ms at 2Mx768/B=512) over a corpus whose dead rows the index
layer zeroes, guarded by the positive-kth-score certificate with an
in-program fallback to the masked grid kernel. masked=True still compiles
only in interpret mode (Mosaic rejects the row-mask reshape) and exists
as the oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from rag_arc_tpu.index.flat import DeviceFlatIndex
from rag_arc_tpu.ops.two_level_stream import (
    subtile_max_stream,
    two_level_topk_certified,
)


def setup(rng, n=4096, d=64, b=8):
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    valid = np.ones(n, bool)
    valid[5] = False
    valid[2048:2060] = False
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q, corpus, valid


def oracle(q, corpus, valid, g):
    scores = q @ corpus.T
    scores[:, ~valid] = -3.0e38
    b, n = scores.shape
    return scores.reshape(b, n // g, g).max(axis=2).T


@pytest.mark.parametrize("g", [16, 32, 128])
def test_masked_matches_oracle(rng, g):
    q, corpus, valid = setup(rng)
    got = np.asarray(
        subtile_max_stream(
            jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid),
            g=g, tile_n=1024, interpret=True, masked=True,
        )
    )
    np.testing.assert_allclose(got, oracle(q, corpus, valid, g), rtol=1e-4, atol=1e-4)


def test_unmasked_matches_on_live_rows(rng):
    q, corpus, valid = setup(rng)
    got = np.asarray(
        subtile_max_stream(
            jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid),
            g=32, tile_n=1024, interpret=True, masked=False,
        )
    )
    want = (q @ corpus.T).reshape(len(q), -1, 32).max(axis=2).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rejects_misalignment(rng):
    q, corpus, valid = setup(rng, n=4096)
    with pytest.raises(ValueError, match="alignment"):
        subtile_max_stream(
            jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid),
            g=48, tile_n=1024, interpret=True,
        )


# -- certified production path --------------------------------------------


def brute_topk(q, corpus, valid, k):
    scores = q @ corpus.T
    scores[:, ~valid] = -np.inf
    pos = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, pos, axis=1), pos


def test_certified_matches_oracle_zeroed_dead_rows(rng):
    q, corpus, valid = setup(rng, b=8)
    corpus = corpus * valid[:, None]  # the index layer's invariant
    s, p, ok = two_level_topk_certified(
        jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid),
        jnp.asarray((corpus * corpus).sum(1)), k=5, tile_n=1024,
        interpret=True,
    )
    want_s, want_p = brute_topk(q, corpus, valid, 5)
    assert bool(ok)  # random normalized corpus: top-5 cosine > 0
    np.testing.assert_array_equal(np.asarray(p), want_p)
    np.testing.assert_allclose(np.asarray(s), want_s, rtol=1e-4, atol=1e-5)


def test_certified_falls_back_on_negative_topk(rng):
    # corpus clustered around +v, query at -v: every score is negative, so
    # the certificate must fail and the masked grid fallback must run —
    # and the result must still be exact
    d = 64
    v = rng.standard_normal(d).astype(np.float32)
    corpus = v[None, :] + 0.1 * rng.standard_normal((2048, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    valid = np.ones(2048, bool)
    q = -v[None, :].astype(np.float32)
    q /= np.linalg.norm(q)
    s, p, ok = two_level_topk_certified(
        jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid),
        jnp.asarray((corpus * corpus).sum(1)), k=5, tile_n=1024,
        interpret=True,
    )
    assert not bool(ok)
    want_s, want_p = brute_topk(q / np.linalg.norm(q), corpus, valid, 5)
    assert np.asarray(s).max() < 0
    np.testing.assert_array_equal(np.asarray(p), want_p)
    np.testing.assert_allclose(np.asarray(s), want_s, rtol=1e-4, atol=1e-5)


def test_flat_index_stream_path(rng):
    idx = DeviceFlatIndex(dim=64, metric="cosine", capacity=4096)
    idx._force_stream = True
    vecs = rng.standard_normal((3000, 64)).astype(np.float32)
    pos = idx.add(vecs)
    idx.mark_deleted(pos[100:150])
    q = rng.standard_normal((6, 64)).astype(np.float32)
    s, p = idx.search(q, 5)
    assert idx.stats()["stream_certified"] is True

    ref = DeviceFlatIndex(dim=64, metric="cosine", capacity=4096)
    ref.add(vecs)
    ref.mark_deleted(pos[100:150])
    s2, p2 = ref.search(q, 5)
    np.testing.assert_array_equal(p, p2)
    np.testing.assert_allclose(s, s2, rtol=1e-4, atol=1e-5)


def test_stream_path_empty_slots_are_neg_inf(rng):
    """The Pallas paths emit the finite NEG=-3e38 sentinel on device; the
    host boundary must normalize it to the documented -inf / -1 contract
    (np.isneginf / JSON consumers would otherwise see ghost scores)."""
    idx = DeviceFlatIndex(dim=64, metric="cosine", capacity=2048)
    idx._force_stream = True
    vecs = rng.standard_normal((5, 64)).astype(np.float32)
    idx.add(vecs)
    s, p = idx.search(rng.standard_normal((2, 64)).astype(np.float32), 8)
    assert (p[:, 5:] == -1).all()
    assert np.isneginf(s[:, 5:]).all()
    assert np.isfinite(s[:, :5]).all()


def test_stats_certified_flag_not_stale(rng):
    """A grid/direct-path search after a stream search must clear the
    stream_certified flag — monitoring reads it per-search."""
    idx = DeviceFlatIndex(dim=64, metric="cosine", capacity=2048)
    idx._force_stream = True
    vecs = rng.standard_normal((1000, 64)).astype(np.float32)
    idx.add(vecs)
    idx.search(rng.standard_normal((4, 64)).astype(np.float32), 3)
    assert "stream_certified" in idx.stats()
    idx._force_stream = False  # next search takes the direct path
    idx.search(rng.standard_normal((4, 64)).astype(np.float32), 3)
    assert "stream_certified" not in idx.stats()


def test_flat_index_stream_fallback_exact(rng):
    # anti-correlated query: stream path must fall back in-program and
    # still return the exact (negative-similarity) top-k
    d = 64
    v = rng.standard_normal(d).astype(np.float32)
    vecs = (v[None, :] + 0.1 * rng.standard_normal((2000, d))).astype(np.float32)
    idx = DeviceFlatIndex(dim=d, metric="cosine", capacity=4096)
    idx._force_stream = True
    idx.add(vecs)
    s, p = idx.search(-v[None, :], 5)
    assert idx.stats()["stream_certified"] is False

    ref = DeviceFlatIndex(dim=d, metric="cosine", capacity=4096)
    ref.add(vecs)
    s2, p2 = ref.search(-v[None, :], 5)
    np.testing.assert_array_equal(p, p2)
    np.testing.assert_allclose(s, s2, rtol=1e-4, atol=1e-5)


# -- int8 certified stream path ---------------------------------------------


def test_certified_i8_equal_scales_certifies(rng):
    """With equal per-row scales the upper bound IS the exact scaled
    sub-max, so the certificate must pass and results equal the grid."""
    from rag_arc_tpu.ops.two_level import quantize_rows, two_level_topk_i8
    from rag_arc_tpu.ops.two_level_stream import two_level_topk_certified_i8

    q, corpus, valid = setup(rng, b=8)
    corpus = corpus * valid[:, None]  # dead rows zeroed BEFORE quantization
    # force equal amax per live row -> equal quantization scales
    amax = np.abs(corpus).max(axis=1, keepdims=True)
    corpus = np.where(amax > 0, corpus * (0.2 / np.maximum(amax, 1e-12)), 0.0)
    codes, scales = quantize_rows(corpus.astype(np.float32))
    s, p, ok = two_level_topk_certified_i8(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
        jnp.asarray(valid), k=5, tile_n=1024, interpret=True,
    )
    assert bool(ok)
    s2, p2 = two_level_topk_i8(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
        jnp.asarray(valid), k=5, tile_n=1024, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-6)


def test_certified_i8_varying_scales_still_exact(rng):
    """With varying per-row scales the bound may be loose and trip the
    fallback — either way results must equal the grid path exactly."""
    from rag_arc_tpu.ops.two_level import quantize_rows, two_level_topk_i8
    from rag_arc_tpu.ops.two_level_stream import two_level_topk_certified_i8

    q, corpus, valid = setup(rng, b=8)
    corpus = corpus * valid[:, None]
    codes, scales = quantize_rows(corpus)
    s, p, ok = two_level_topk_certified_i8(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
        jnp.asarray(valid), k=5, tile_n=1024, interpret=True,
    )
    s2, p2 = two_level_topk_i8(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
        jnp.asarray(valid), k=5, tile_n=1024, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-6)


def test_certified_i8_falls_back_on_negative_topk(rng):
    from rag_arc_tpu.ops.two_level import quantize_rows, two_level_topk_i8
    from rag_arc_tpu.ops.two_level_stream import two_level_topk_certified_i8

    d = 64
    v = rng.standard_normal(d).astype(np.float32)
    corpus = v[None, :] + 0.1 * rng.standard_normal((2048, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    codes, scales = quantize_rows(corpus)
    valid = np.ones(2048, bool)
    q = -v[None, :].astype(np.float32)
    s, p, ok = two_level_topk_certified_i8(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
        jnp.asarray(valid), k=5, tile_n=1024, interpret=True,
    )
    assert not bool(ok)
    s2, p2 = two_level_topk_i8(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(scales),
        jnp.asarray(valid), k=5, tile_n=1024, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p), np.asarray(p2))


def test_flat_index_i8_stream_path(rng):
    import jax.numpy as jnp2

    idx = DeviceFlatIndex(dim=64, metric="cosine", capacity=4096, dtype=jnp2.int8)
    idx._force_stream = True
    vecs = rng.standard_normal((3000, 64)).astype(np.float32)
    pos = idx.add(vecs)
    idx.mark_deleted(pos[200:240])
    q = rng.standard_normal((6, 64)).astype(np.float32)
    s, p = idx.search(q, 5)
    # block-shared scales make the upper bound exact, so a positive top-k
    # must certify without the fallback
    assert idx.stats()["stream_certified"] is True

    ref = DeviceFlatIndex(dim=64, metric="cosine", capacity=4096, dtype=jnp2.int8)
    ref.add(vecs)
    ref.mark_deleted(pos[200:240])
    s2, p2 = ref.search(q, 5)
    np.testing.assert_array_equal(p, p2)
    np.testing.assert_allclose(s, s2, rtol=1e-5, atol=1e-6)


def test_pipelined_producer_matches_plain(rng):
    """The two-slab software-pipelined producer must emit exactly the
    plain maskless producer's sub-max matrix."""
    from rag_arc_tpu.ops.two_level_stream import subtile_max_stream

    n, d, b, g = 2048, 64, 8, 16
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    plain = subtile_max_stream(
        jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid),
        g=g, tile_n=512, interpret=True, masked=False,
    )
    piped = subtile_max_stream(
        jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid),
        g=g, tile_n=512, interpret=True, masked=False, pipelined=True,
    )
    np.testing.assert_allclose(np.asarray(piped), np.asarray(plain))


def test_pipelined_rejects_masked(rng):
    from rag_arc_tpu.ops.two_level_stream import subtile_max_stream

    with pytest.raises(ValueError, match="maskless"):
        subtile_max_stream(
            jnp.zeros((8, 64)), jnp.zeros((1024, 64)),
            jnp.ones(1024, bool), g=16, tile_n=512, interpret=True,
            masked=True, pipelined=True,
        )


def test_scan_producer_matches_stream(rng):
    """The XLA-scan producer (producer='scan') must emit the same sub-max
    matrix as the Pallas stream kernel, and the certified path must give
    identical results through either producer."""
    from rag_arc_tpu.ops.two_level import subtile_max_scan
    from rag_arc_tpu.ops.two_level_stream import (
        subtile_max_stream,
        two_level_topk_certified,
    )

    n, d, b, g = 2048, 64, 8, 16
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid = np.ones(n, bool)
    sq = np.ones(n, np.float32)
    stream = subtile_max_stream(
        jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid),
        g=g, tile_n=512, interpret=True, masked=False,
    )
    scan = subtile_max_scan(
        jnp.asarray(q), jnp.asarray(corpus), g=g, tile_n=512
    )
    np.testing.assert_allclose(np.asarray(scan), np.asarray(stream))
    s0, p0, ok0 = two_level_topk_certified(
        jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid),
        jnp.asarray(sq), 5, g=g, tile_n=512, interpret=True,
        producer="stream",
    )
    s1, p1, ok1 = two_level_topk_certified(
        jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(valid),
        jnp.asarray(sq), 5, g=g, tile_n=512, interpret=True,
        producer="scan",
    )
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1))
    assert bool(ok0) == bool(ok1)


# -- stream producer inside shard_map (mesh path) -----------------------------


def test_mesh_stream_producer_matches_direct(rng):
    """The mesh bodies prefer the certified stream kernel per shard
    (measured +0.1% vs direct on a 1-device chip mesh where the masked
    grid kernel was 10x slower). Interpret mode on the emulated 8-device
    mesh must agree with the single-device result, bf16 grid fallback and
    all."""
    from rag_arc_tpu.parallel.mesh import default_mesh

    idx_direct = DeviceFlatIndex(dim=64, metric="cosine", capacity=8192)
    idx_mesh = DeviceFlatIndex(
        dim=64, metric="cosine", capacity=8192, mesh=default_mesh()
    )
    idx_mesh._force_stream = True
    vecs = rng.standard_normal((6000, 64)).astype(np.float32)
    idx_direct.add(vecs)
    idx_mesh.add(vecs)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    s1, p1 = idx_direct.search(q, 5)
    s2, p2 = idx_mesh.search(q, 5)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-5)


def test_mesh_stream_producer_matches_direct_i8(rng):
    """Int8 certified stream per shard: results must match the
    single-device int8 path (same quantized metric, same rescore)."""
    from rag_arc_tpu.parallel.mesh import default_mesh

    vecs = rng.standard_normal((6000, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    idx_direct = DeviceFlatIndex(
        dim=64, metric="cosine", capacity=8192, dtype=jnp.int8
    )
    idx_mesh = DeviceFlatIndex(
        dim=64, metric="cosine", capacity=8192, dtype=jnp.int8,
        mesh=default_mesh(),
    )
    idx_mesh._force_stream = True
    idx_direct.add(vecs)
    idx_mesh.add(vecs)
    q = vecs[:8] + 0.05 * rng.standard_normal((8, 64)).astype(np.float32)
    s1, p1 = idx_direct.search(q, 5)
    s2, p2 = idx_mesh.search(q, 5)
    overlap = np.mean(
        [len(set(p1[i]) & set(p2[i])) / 5 for i in range(8)]
    )
    assert overlap >= 0.9, overlap

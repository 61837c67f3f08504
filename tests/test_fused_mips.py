"""Fused Pallas MIPS+top-k kernel tests (interpret mode on CPU) against
the XLA exact path, plus the chunked-scan fallback."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_arc_tpu.ops.fused_mips import fused_mips_topk
from rag_arc_tpu.ops.topk import masked_topk, masked_topk_chunked


def setup_corpus(rng, n=4096, d=64, metric="cosine"):
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    if metric == "cosine":
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    valid = np.ones(n, dtype=bool)
    valid[5] = False  # one tombstone
    sqnorm = (corpus * corpus).sum(1).astype(np.float32)
    queries = rng.standard_normal((8, d)).astype(np.float32)
    return (
        jnp.asarray(queries),
        jnp.asarray(corpus),
        jnp.asarray(valid),
        jnp.asarray(sqnorm),
    )


@pytest.mark.parametrize("metric", ["cosine", "ip", "l2"])
def test_fused_matches_exact(rng, metric):
    q, corpus, valid, sqnorm = setup_corpus(rng, metric=metric)
    es, ep = masked_topk(q, corpus, valid, 10, metric, sqnorm)
    fs, fp = fused_mips_topk(
        q, corpus, valid, sqnorm, k=10, tile_n=1024, metric=metric, interpret=True
    )
    for b in range(q.shape[0]):
        assert set(np.asarray(ep)[b].tolist()) == set(np.asarray(fp)[b].tolist())
    np.testing.assert_allclose(np.asarray(fs), np.asarray(es), rtol=1e-4, atol=1e-4)


def test_fused_excludes_tombstones(rng):
    q, corpus, valid, sqnorm = setup_corpus(rng)
    _, fp = fused_mips_topk(
        q, corpus, valid, sqnorm, k=10, tile_n=1024, interpret=True
    )
    assert 5 not in np.asarray(fp)


def test_fused_single_tile(rng):
    q, corpus, valid, sqnorm = setup_corpus(rng, n=1024)
    es, ep = masked_topk(q, corpus, valid, 4, "cosine", sqnorm)
    fs, fp = fused_mips_topk(
        q, corpus, valid, sqnorm, k=4, tile_n=1024, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(ep))


def test_fused_rejects_misaligned(rng):
    q, corpus, valid, sqnorm = setup_corpus(rng, n=1000)
    with pytest.raises(ValueError, match="multiple"):
        fused_mips_topk(q, corpus, valid, sqnorm, k=4, tile_n=1024, interpret=True)


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_chunked_matches_exact(rng, metric):
    q, corpus, valid, sqnorm = setup_corpus(rng, metric=metric)
    es, ep = masked_topk(q, corpus, valid, 10, metric, sqnorm)
    cs, cp = masked_topk_chunked(
        q, corpus, valid, sqnorm, 10, metric=metric, chunk=1024
    )
    for b in range(q.shape[0]):
        assert set(np.asarray(ep)[b].tolist()) == set(np.asarray(cp)[b].tolist())
    np.testing.assert_allclose(np.asarray(cs), np.asarray(es), rtol=1e-4)


def test_index_chunked_path_on_cpu(rng):
    """Force the large-score-matrix branch through the public index API."""
    from rag_arc_tpu.index.flat import DeviceFlatIndex

    index = DeviceFlatIndex(dim=32, capacity=2048)
    index.SCORE_BYTES_BUDGET = 1  # force the chunked path
    data = rng.standard_normal((2000, 32)).astype(np.float32)
    index.add(data)
    q = data[17:18]
    _, p = index.search(q, k=1)
    assert p[0, 0] == 17


@pytest.mark.parametrize("metric", ["cosine", "ip", "l2"])
def test_early_exit_matches_exact(rng, metric):
    q, corpus, valid, sqnorm = setup_corpus(rng, metric=metric)
    es, ep = masked_topk(q, corpus, valid, 10, metric, sqnorm)
    fs, fp = fused_mips_topk(
        q, corpus, valid, sqnorm, k=10, tile_n=512, metric=metric,
        interpret=True, skip_tiles=True,
    )
    for b in range(q.shape[0]):
        assert set(np.asarray(ep)[b].tolist()) == set(np.asarray(fp)[b].tolist())
    np.testing.assert_allclose(np.asarray(fs), np.asarray(es), rtol=1e-4, atol=1e-4)


def test_early_exit_small_corpus_fewer_than_k(rng):
    q, corpus, valid, sqnorm = setup_corpus(rng, n=1024)
    valid = valid.at[8:].set(False)  # only 8 live rows, k=10
    fs, fp = fused_mips_topk(
        q, corpus, valid, sqnorm, k=10, tile_n=1024, interpret=True, skip_tiles=True,
    )
    fp = np.asarray(fp)
    assert ((0 <= fp[:, :7]) & (fp[:, :7] < 8)).all()
    assert (fp[:, 8:] == -1).all()


def test_packed_matches_exact_cosine(rng):
    q, corpus, valid, sqnorm = setup_corpus(rng)
    es, ep = masked_topk(q, corpus, valid, 10, "cosine", sqnorm)
    fs, fp = fused_mips_topk(
        q, corpus, valid, sqnorm, k=10, tile_n=1024, interpret=True,
        skip_tiles=True, packed=True,
    )
    for b in range(q.shape[0]):
        assert set(np.asarray(ep)[b].tolist()) == set(np.asarray(fp)[b].tolist())
    # scores quantized to bf16 granularity: ~3 decimal digits
    np.testing.assert_allclose(np.asarray(fs), np.asarray(es), rtol=5e-3, atol=5e-3)


def test_packed_falls_back_for_l2(rng):
    q, corpus, valid, sqnorm = setup_corpus(rng, metric="l2")
    es, ep = masked_topk(q, corpus, valid, 5, "l2", sqnorm)
    fs, fp = fused_mips_topk(
        q, corpus, valid, sqnorm, k=5, tile_n=1024, metric="l2",
        interpret=True, packed=True,  # ignored for non-cosine
    )
    for b in range(q.shape[0]):
        assert set(np.asarray(ep)[b].tolist()) == set(np.asarray(fp)[b].tolist())

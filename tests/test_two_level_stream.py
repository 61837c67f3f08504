"""Streaming pass-1 kernel (interpret-mode oracle tests).

Production defaults stay on the grid kernel (exact masking); the stream
variant is 15% faster (measured same-session on v5e: 36.4 vs 42.8 ms at
2Mx768/B=512) but Mosaic cannot lower its row-mask reshape, so masked=True
compiles only in interpret mode today. Productionizing = zero dead rows in
the corpus + a negative-score fallback guard (see CLAUDE.md round-3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rag_arc_tpu.ops.two_level_stream import subtile_max_stream


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
            g=g, tile_n=1024, interpret=True,
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

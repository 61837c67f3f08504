"""Model checkpoint tests."""

import numpy as np

import jax

from rag_arc_tpu.models.checkpoint import load_metadata, load_params, save_params
from rag_arc_tpu.models.encoder import TransformerConfig, init_encoder


def test_params_roundtrip(tmp_path):
    cfg = TransformerConfig.tiny()
    model, params = init_encoder(cfg, seed=3)
    save_params(params, tmp_path / "ckpt", metadata={"config": "tiny", "step": 7})
    restored = load_params(tmp_path / "ckpt", like=params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert load_metadata(tmp_path / "ckpt")["step"] == 7


def test_restored_params_drive_model(tmp_path):
    import jax.numpy as jnp

    cfg = TransformerConfig.tiny()
    model, params = init_encoder(cfg, seed=1)
    ids = jnp.ones((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), bool)
    want = model.apply(params, ids, mask)
    save_params(params, tmp_path / "c")
    got = model.apply(load_params(tmp_path / "c", like=params), ids, mask)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-6)

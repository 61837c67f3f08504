"""Flax Qwen2-VL parity vs torch Qwen2VLForConditionalGeneration on
random-init tiny models (no downloads) — the BERT/Qwen3 port playbook
applied to the layout-VLM family the reference serves via CUDA/vLLM."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from rag_arc_tpu.models.qwen2vl import (  # noqa: E402
    FlaxQwen2VL,
    Qwen2VLConfig,
    Qwen2VLGenerator,
    config_from_hf,
    convert_torch_qwen2vl,
    rope_index_single_image,
    vision_rotary_angles,
)

GRID = (1, 4, 4)  # t, h, w patches → 16 patches, 4 merged image tokens


def tiny_hf_config():
    from transformers import Qwen2VLConfig as HFConfig

    return HFConfig(
        vocab_size=256,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        image_token_id=250,
        video_token_id=249,
        vision_start_token_id=251,
        vision_end_token_id=252,
        vision_config=dict(
            depth=2,
            embed_dim=32,
            hidden_size=32,
            num_heads=4,
            in_channels=3,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            mlp_ratio=2.0,
        ),
        attn_implementation="eager",
    )


@pytest.fixture(scope="module")
def models():
    from transformers import Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = tiny_hf_config()
    torch_model = Qwen2VLForConditionalGeneration(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params = convert_torch_qwen2vl(torch_model.state_dict(), cfg)
    return torch_model, FlaxQwen2VL(cfg), params, cfg


def example_inputs(cfg, rng):
    t, h, w = GRID
    span = t * h * w // cfg.vision.spatial_merge_size**2
    prefix = [3, 4, 5, cfg.vision_start_token_id]
    suffix = [252, 7, 8, 9, 10]
    ids = np.asarray(
        prefix + [cfg.image_token_id] * span + suffix, dtype=np.int64
    )
    n_patch = t * h * w
    feat = (
        cfg.vision.in_channels
        * cfg.vision.temporal_patch_size
        * cfg.vision.patch_size**2
    )
    pixels = rng.standard_normal((n_patch, feat)).astype(np.float32)
    return ids, pixels


class TestParity:
    def test_config_roundtrip(self, models):
        _, _, _, cfg = models
        assert cfg.mrope_section == (2, 1, 1)
        assert cfg.vision.patch_size == 4

    def test_prefill_logits_match(self, models):
        torch_model, flax_model, params, cfg = models
        rng = np.random.default_rng(0)
        ids, pixels = example_inputs(cfg, rng)
        with torch.no_grad():
            got_t = torch_model(
                input_ids=torch.tensor(ids[None]),
                pixel_values=torch.tensor(pixels),
                image_grid_thw=torch.tensor([list(GRID)]),
            ).logits.numpy()[0]

        angles = vision_rotary_angles(
            GRID, cfg.vision.head_dim, cfg.vision.spatial_merge_size
        )
        img = flax_model.apply(
            params, jnp.asarray(pixels), jnp.asarray(angles),
            method=FlaxQwen2VL.encode_image,
        )
        pos = rope_index_single_image(ids, GRID, cfg)
        start = int(np.nonzero(ids == cfg.image_token_id)[0][0])
        got_f = np.asarray(
            flax_model.apply(
                params,
                jnp.asarray(ids[None]),
                img,
                jnp.asarray(pos[:, None, :]),
                jnp.int32(start),
            )
        )[0]
        np.testing.assert_allclose(got_f, got_t, rtol=2e-4, atol=2e-4)

    def test_rope_index_matches_hf(self, models):
        torch_model, _, _, cfg = models
        rng = np.random.default_rng(1)
        ids, _ = example_inputs(cfg, rng)
        want, _ = torch_model.model.get_rope_index(
            input_ids=torch.tensor(ids[None]),
            image_grid_thw=torch.tensor([list(GRID)]),
        )
        got = rope_index_single_image(ids, GRID, cfg)
        np.testing.assert_array_equal(got, want.numpy()[:, 0, :])

    def test_greedy_decode_matches_hf_generate(self, models):
        torch_model, flax_model, params, cfg = models
        rng = np.random.default_rng(2)
        ids, pixels = example_inputs(cfg, rng)
        with torch.no_grad():
            want = torch_model.generate(
                input_ids=torch.tensor(ids[None]),
                pixel_values=torch.tensor(pixels),
                image_grid_thw=torch.tensor([list(GRID)]),
                max_new_tokens=6,
                do_sample=False,
            ).numpy()[0][len(ids):]
        gen = Qwen2VLGenerator(flax_model, params, max_len=64)
        got = gen.generate(ids, pixels, GRID, max_new_tokens=6)
        assert got == want.tolist()

    def test_text_only_rope_index(self, models):
        _, _, _, cfg = models
        ids = np.asarray([1, 2, 3, 4], dtype=np.int64)
        pos = rope_index_single_image(ids, GRID, cfg)
        np.testing.assert_array_equal(pos, np.tile(np.arange(4), (3, 1)))

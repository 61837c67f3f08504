"""Native-VLM OCR path: FlaxVLMClient drives the Flax Qwen2-VL port end to
end through OCRParser (tiny random model — checks plumbing and shapes, not
transcription quality; numeric parity lives in tests/test_qwen2vl.py)."""

import io

import numpy as np
import pytest

pytest.importorskip("transformers")

from rag_arc_tpu.models.qwen2vl import FlaxQwen2VL, Qwen2VLConfig  # noqa: E402
from rag_arc_tpu.parsing.ocr import OCRParser  # noqa: E402
from rag_arc_tpu.parsing.vlm_native import FlaxVLMClient  # noqa: E402


class StubTokenizer:
    """encode/decode over a toy charset; ids stay below the image tokens."""

    def encode(self, text):
        return [ord(c) % 240 for c in text[:32]]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


@pytest.fixture(scope="module")
def client():
    import jax

    cfg = Qwen2VLConfig.tiny()
    model = FlaxQwen2VL(cfg)
    rng = np.random.default_rng(0)
    # init via a tiny dry run
    import jax.numpy as jnp

    patches = jnp.zeros((16, cfg.vision.in_channels * cfg.vision.temporal_patch_size * cfg.vision.patch_size**2))
    angles = jnp.zeros((16, cfg.vision.head_dim // 2))
    ids = jnp.zeros((1, 8), jnp.int32)
    pos = jnp.zeros((3, 1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, patches[:4] @ jnp.zeros(
        (patches.shape[1], cfg.hidden_size)
    ), pos, jnp.int32(0))
    # init doesn't touch the vision tower via __call__; init it separately
    vparams = model.init(
        jax.random.PRNGKey(1), patches, angles, method=FlaxQwen2VL.encode_image
    )
    params["params"]["visual"] = vparams["params"]["visual"]
    return FlaxVLMClient(
        model,
        params,
        StubTokenizer(),
        max_new_tokens=8,
        cache_len=128,
    )


def _png(w=16, h=16):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), "white").save(buf, format="PNG")
    return buf.getvalue()


def test_client_generates_text(client):
    out = client.generate(_png(), "Transcribe this page.")
    assert isinstance(out, str) and len(out) > 0


def test_ocr_parser_with_native_client(client):
    parser = OCRParser(client, prompt_mode="ocr")
    doc = parser.parse_images([(_png(), (16, 16))], source="native.pdf")
    assert doc.metadata["parser"] == "ocr"
    assert isinstance(doc.markdown, str) and doc.markdown.strip()


def test_input_ids_place_image_span(client):
    ids = client._build_input_ids("hi", (1, 4, 4))
    cfg = client.cfg
    span = 16 // cfg.vision.spatial_merge_size**2
    assert ids[0] == cfg.vision_start_token_id
    assert (ids[1 : 1 + span] == cfg.image_token_id).all()
    assert ids[1 + span] == cfg.vision_start_token_id + 1

"""TPU-native VLM client for OCR parsing.

Implements the ``VLMClient`` protocol (``parsing/ocr.py``) over the Flax
Qwen2-VL port (``models/qwen2vl.py``), replacing the external CUDA/vLLM
service the reference depends on (``pdf_parser.py:62-129``,
``vllm_launch.py``): page images preprocess on host (smart-resize + patch
extraction via the HF image processor — pure math, no weights), the vision
tower + decoder run under jit on TPU, and greedy KV-cache decoding streams
tokens without per-token host round trips.

Wiring: ``OCRParser(vlm=FlaxVLMClient.from_checkpoint(path))`` for real
DotsOCR/Qwen2-VL-family checkpoints on disk, or construct directly with a
model/params/tokenizer for tests.
"""

from __future__ import annotations

import io
import logging
from typing import Any, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class FlaxVLMClient:
    def __init__(
        self,
        model,
        params,
        tokenizer,
        image_processor=None,
        max_new_tokens: int = 4096,
        eos_token_id: Optional[int] = None,
        cache_len: int = 8192,
    ):
        """``tokenizer`` needs ``encode(text) -> list[int]`` and
        ``decode(ids) -> str``. ``image_processor`` defaults to a
        ``Qwen2VLImageProcessor`` built from the model's vision config
        (construction needs no checkpoint files)."""
        from rag_arc_tpu.models.qwen2vl import Qwen2VLGenerator

        self.cfg = model.cfg
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens
        self.eos_token_id = eos_token_id
        self.image_processor = image_processor or self._default_processor()
        self.generator = Qwen2VLGenerator(model, params, max_len=cache_len)

    def _default_processor(self):
        from transformers import Qwen2VLImageProcessor

        v = self.cfg.vision
        return Qwen2VLImageProcessor(
            patch_size=v.patch_size,
            temporal_patch_size=v.temporal_patch_size,
            merge_size=v.spatial_merge_size,
            min_pixels=v.patch_size**2 * 4,
            max_pixels=2048 * 2048,
        )

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "FlaxVLMClient":
        """Load a local HF Qwen2-VL-family checkpoint from disk."""
        from rag_arc_tpu.models.qwen2vl import load_hf_qwen2vl

        model, params, tokenizer, image_processor = load_hf_qwen2vl(path)
        eos = kw.pop("eos_token_id", tokenizer.eos_token_id)
        return cls(
            model, params, tokenizer, image_processor=image_processor,
            eos_token_id=eos, **kw,
        )

    # -- VLMClient protocol --------------------------------------------------

    def model_input_size(self, width: int, height: int) -> Tuple[int, int]:
        """Exact (w, h) the processor resizes a page to — keeps OCRParser's
        bbox rescaling consistent with what the model actually saw."""
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            smart_resize,
        )

        p = self.image_processor
        rh, rw = smart_resize(
            height,
            width,
            factor=p.patch_size * p.merge_size,
            min_pixels=p.min_pixels,
            max_pixels=p.max_pixels,
        )
        return rw, rh

    def generate(self, image_bytes: bytes, prompt: str) -> str:
        from PIL import Image

        with Image.open(io.BytesIO(image_bytes)) as im:
            im = im.convert("RGB")
            proc = self.image_processor(images=[im], return_tensors="np")
        pixels = np.asarray(proc["pixel_values"], dtype=np.float32)
        grid: Tuple[int, int, int] = tuple(
            int(x) for x in np.asarray(proc["image_grid_thw"]).reshape(-1)[:3]
        )
        ids = self._build_input_ids(prompt, grid)
        tokens = self.generator.generate(
            ids,
            pixels,
            grid,
            max_new_tokens=self.max_new_tokens,
            eos_token_id=self.eos_token_id,
        )
        return self.tokenizer.decode(tokens)

    def _build_input_ids(self, prompt: str, grid) -> np.ndarray:
        cfg = self.cfg
        span = int(np.prod(grid)) // cfg.vision.spatial_merge_size**2
        prompt_ids = list(self._encode_text(prompt))
        vision_end = getattr(cfg, "vision_start_token_id") + 1
        ids = (
            [cfg.vision_start_token_id]
            + [cfg.image_token_id] * span
            + [vision_end]
            + prompt_ids
        )
        return np.asarray(ids, dtype=np.int64)

    def _encode_text(self, text: str):
        enc = self.tokenizer.encode(text)
        ids = getattr(enc, "ids", enc)  # tokenizers lib returns an object
        return [int(t) for t in ids]


def check_native_vlm_available() -> Optional[str]:
    """Returns None when the native path can run, else a reason string."""
    try:
        import transformers  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        return f"missing dependency: {exc}"
    return None

"""TPU-native OCR: a layout VLM (Qwen2-VL family / DotsOCR-style) running
in Flax behind OCRParser — no vLLM server, no CUDA.

With a real checkpoint on disk:

    python examples/native_ocr.py --checkpoint /path/to/qwen2-vl --pdf doc.pdf

Without one (default), runs the full plumbing on a tiny random-init model:
image preprocessing → vision tower → mrope decoder → greedy KV-cache
decode → markdown, exercising exactly what a real checkpoint would.
The reference needed a CUDA vLLM server or a local flash-attn torch model
for this stage (pdf_parser.py:62-129).
"""

from __future__ import annotations

import argparse
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def tiny_client():
    import jax
    import jax.numpy as jnp

    from rag_arc_tpu.models.qwen2vl import FlaxQwen2VL, Qwen2VLConfig
    from rag_arc_tpu.parsing.vlm_native import FlaxVLMClient

    cfg = Qwen2VLConfig.tiny()
    model = FlaxQwen2VL(cfg)
    feat = cfg.vision.in_channels * cfg.vision.temporal_patch_size * cfg.vision.patch_size**2
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((4, cfg.hidden_size)),
        jnp.zeros((3, 1, 8), jnp.int32),
        jnp.int32(0),
    )
    vparams = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((16, feat)),
        jnp.zeros((16, cfg.vision.head_dim // 2)),
        method=FlaxQwen2VL.encode_image,
    )
    params["params"]["visual"] = vparams["params"]["visual"]

    class DemoTokenizer:
        def encode(self, text):
            return [ord(c) % 240 for c in text[:32]]

        def decode(self, ids):
            return " ".join(f"tok{i}" for i in ids)

    return FlaxVLMClient(model, params, DemoTokenizer(), max_new_tokens=12, cache_len=128)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", help="local Qwen2-VL-family checkpoint dir")
    ap.add_argument("--pdf", help="PDF/image to parse (demo page if omitted)")
    ap.add_argument("--mode", default="ocr", choices=["layout_all", "layout_only", "ocr"])
    args = ap.parse_args()

    from rag_arc_tpu.parsing.ocr import OCRParser
    from rag_arc_tpu.parsing.vlm_native import FlaxVLMClient

    if args.checkpoint:
        client = FlaxVLMClient.from_checkpoint(args.checkpoint)
    else:
        print("no --checkpoint: driving the pipeline with a tiny random model")
        client = tiny_client()

    parser = OCRParser(client, prompt_mode=args.mode)
    if args.pdf:
        doc = parser.parse(args.pdf)
    else:
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (112, 112), "white").save(buf, format="PNG")
        doc = parser.parse_images([(buf.getvalue(), (112, 112))], source="demo")
    print(f"--- markdown ({doc.metadata['pages']} pages) ---")
    print(doc.markdown[:2000])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

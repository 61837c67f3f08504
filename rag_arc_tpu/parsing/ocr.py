"""VLM-based PDF/image OCR parsing.

Capability parity with the reference's ``DotsOCRParser``
(``core/file_management/parser/pdf_parser.py:19``): PDF pages are rendered
to images, sent to a layout VLM with one of four prompt modes, the JSON
layout is repaired (``OutputCleaner``), bboxes are rescaled to page
coordinates, and the layout converts to markdown. The reference binds to a
CUDA vLLM server or a local flash-attn torch model; here inference sits
behind a small ``VLMClient`` protocol —

- ``OpenAIVisionClient``: OpenAI-compatible chat-with-image HTTP (covers
  vLLM-style serving of any layout VLM, the reference's primary mode).
- ``FakeVLMClient``: deterministic canned layouts for CPU tests.

Page rendering needs a rasterizer; pymupdf is absent from this image, so
``render_pdf_pages`` is pluggable and fails with a clear message if no
renderer is available. Page-level fan-out uses a thread pool
(``pdf_parser.py:296-301`` parity) — the work is network/IO-bound.
"""

from __future__ import annotations

import base64
import json
import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Callable, Dict, List, Protocol, Sequence, Tuple

from rag_arc_tpu.parsing.base import ParsedDocument, ParserBase
from rag_arc_tpu.parsing.layout import (
    layout_to_markdown,
    rescale_layout,
    smart_resize,
    sort_reading_order,
)
from rag_arc_tpu.parsing.output_cleaner import OutputCleaner

logger = logging.getLogger(__name__)

PROMPTS: Dict[str, str] = {
    "layout_all": (
        "Extract the full layout of this document page as a JSON list. Each "
        'element: {"category": one of Title/Section-header/Text/List-item/'
        'Table/Formula/Picture/Caption/Footnote/Page-header/Page-footer, '
        '"bbox": [x1, y1, x2, y2], "text": content}. Tables as HTML, '
        "formulas as LaTeX. Read in natural reading order."
    ),
    "layout_only": (
        "Detect the layout regions of this page. Return a JSON list of "
        '{"category": ..., "bbox": [x1, y1, x2, y2]} without text content.'
    ),
    "ocr": "Transcribe all text on this page in reading order, as plain text.",
    "grounding_ocr": (
        'Transcribe the text inside the region {bbox} of this page. '
        "Return only the text."
    ),
}


class VLMClient(Protocol):
    def generate(self, image_bytes: bytes, prompt: str) -> str: ...


class OpenAIVisionClient:
    """Chat-with-image over the OpenAI protocol (vLLM-compatible)."""

    def __init__(
        self,
        model: str,
        base_url: str = "http://localhost:8000/v1",
        api_key: str = "EMPTY",
        timeout: float = 120.0,
        max_tokens: int = 16384,
        temperature: float = 0.0,
    ):
        from rag_arc_tpu.llm.openai_compat import OpenAICompatLLM

        self._llm = OpenAICompatLLM(
            model=model, base_url=base_url, api_key=api_key, timeout=timeout
        )
        self.max_tokens = max_tokens
        self.temperature = temperature

    def generate(self, image_bytes: bytes, prompt: str) -> str:
        b64 = base64.b64encode(image_bytes).decode("ascii")
        payload = {
            "model": self._llm.model,
            "messages": [
                {
                    "role": "user",
                    "content": [
                        {
                            "type": "image_url",
                            "image_url": {"url": f"data:image/png;base64,{b64}"},
                        },
                        {"type": "text", "text": prompt},
                    ],
                }
            ],
            "max_tokens": self.max_tokens,
            "temperature": self.temperature,
        }
        data = self._llm._post("/chat/completions", payload)
        return data["choices"][0]["message"]["content"]


class FakeVLMClient:
    """Deterministic layouts for tests: returns canned responses in order,
    then repeats the last one."""

    def __init__(self, responses: Sequence[str]):
        self.responses = list(responses)
        self.calls: List[str] = []

    def generate(self, image_bytes: bytes, prompt: str) -> str:
        self.calls.append(prompt)
        if len(self.responses) > 1:
            return self.responses.pop(0)
        return self.responses[0]


def render_pdf_pages(
    path: str | Path, dpi: int = 200
) -> List[Tuple[bytes, Tuple[int, int]]]:
    """PDF → [(png_bytes, (width, height))]. Requires a rasterizer
    (pymupdf if available; pdftoppm binary otherwise)."""
    path = Path(path)
    try:
        import fitz  # pymupdf

        out = []
        with fitz.open(path) as doc:
            for page in doc:
                pix = page.get_pixmap(dpi=dpi)
                out.append((pix.tobytes("png"), (pix.width, pix.height)))
        return out
    except ImportError:
        pass
    import shutil
    import subprocess
    import tempfile

    if shutil.which("pdftoppm"):
        with tempfile.TemporaryDirectory() as tmp:
            subprocess.run(
                ["pdftoppm", "-png", "-r", str(dpi), str(path), f"{tmp}/page"],
                check=True,
                capture_output=True,
            )
            out = []
            from PIL import Image

            for png in sorted(Path(tmp).glob("page*.png")):
                blob = png.read_bytes()
                with Image.open(png) as im:
                    out.append((blob, im.size))
            return out
    raise RuntimeError(
        "no PDF rasterizer available (need pymupdf or pdftoppm); "
        "render pages externally and use OCRParser.parse_images"
    )


class OCRParser(ParserBase):
    extensions = ("pdf", "png", "jpg", "jpeg")

    def __init__(
        self,
        vlm: VLMClient,
        prompt_mode: str = "layout_all",
        dpi: int = 200,
        num_threads: int = 16,
        renderer: Callable[..., List[Tuple[bytes, Tuple[int, int]]]] = render_pdf_pages,
    ):
        if prompt_mode not in PROMPTS:
            raise ValueError(f"prompt_mode must be one of {sorted(PROMPTS)}")
        self.vlm = vlm
        self.prompt_mode = prompt_mode
        self.dpi = dpi
        self.num_threads = num_threads
        self.renderer = renderer
        self.cleaner = OutputCleaner()

    # -- per-page ----------------------------------------------------------

    def _parse_page(
        self, image_bytes: bytes, page_size: Tuple[int, int], page_idx: int
    ) -> Dict[str, Any]:
        raw = self.vlm.generate(image_bytes, PROMPTS[self.prompt_mode])
        if self.prompt_mode == "ocr":
            return {"page": page_idx, "markdown": raw.strip(), "layout": []}
        cells = self.cleaner.clean_model_output(raw)
        if cells is None:
            logger.warning("page %d: unrepairable VLM output", page_idx)
            return {"page": page_idx, "markdown": "", "layout": [], "failed": True}
        w, h = page_size
        rh, rw = smart_resize(h, w)
        cells = rescale_layout(cells, from_size=(rw, rh), to_size=(w, h))
        cells = sort_reading_order(cells)
        return {
            "page": page_idx,
            "markdown": layout_to_markdown(cells),
            "layout": cells,
        }

    # -- entry points ------------------------------------------------------

    def parse_images(
        self, images: Sequence[Tuple[bytes, Tuple[int, int]]], source: str = "images"
    ) -> ParsedDocument:
        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            pages = list(
                pool.map(
                    lambda args: self._parse_page(*args),
                    [(img, size, i) for i, (img, size) in enumerate(images)],
                )
            )
        pages.sort(key=lambda p: p["page"])
        markdown = "\n\n".join(p["markdown"] for p in pages if p["markdown"])
        # per-page layout sidecars (the reference writes page .json files,
        # pdf_parser.py:308-379) plus a combined layout document
        assets = {
            f"layout/page_{p['page']}.json": json.dumps(
                p["layout"], ensure_ascii=False
            ).encode("utf-8")
            for p in pages
        }
        assets["layout/combined.json"] = json.dumps(
            [p["layout"] for p in pages], ensure_ascii=False
        ).encode("utf-8")
        return ParsedDocument(
            markdown=markdown + "\n",
            source=source,
            assets=assets,
            metadata={
                "parser": "ocr",
                "prompt_mode": self.prompt_mode,
                "pages": len(pages),
                "failed_pages": [p["page"] for p in pages if p.get("failed")],
                "layout": [p["layout"] for p in pages],
            },
        )

    def parse(self, path: str | Path) -> ParsedDocument:
        path = Path(path)
        if path.suffix.lower() == ".pdf":
            images = self.renderer(path, dpi=self.dpi)
        else:
            from PIL import Image

            blob = path.read_bytes()
            import io

            with Image.open(io.BytesIO(blob)) as im:
                images = [(blob, im.size)]
        doc = self.parse_images(images, source=str(path))
        return doc

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
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Callable, Dict, List, Protocol, Sequence, Tuple

from rag_arc_tpu.parsing.base import ParsedDocument, ParserBase
from rag_arc_tpu.parsing.layout import (
    croppable_picture,
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
                            # sniff the actual payload type: labeling JPEG
                            # bytes image/png fails strict servers
                            "image_url": {
                                "url": f"data:{_image_mime(image_bytes)};"
                                f"base64,{b64}"
                            },
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


def _image_mime(image_bytes: bytes) -> str:
    """Magic-byte MIME sniff for the data-URL label."""
    if image_bytes[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if image_bytes[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if image_bytes[:4] == b"RIFF" and image_bytes[8:12] == b"WEBP":
        return "image/webp"
    return "image/png"


class FakeVLMClient:
    """Deterministic layouts for tests: returns canned responses in order,
    then repeats the last one. Thread-safe and popped under a lock —
    parse_images fans pages across a 16-thread pool, and a check-then-pop
    raced (IndexError / pages swapping each other's canned layouts)."""

    def __init__(self, responses: Sequence[str]):
        self.responses = list(responses)
        self.calls: List[str] = []
        self._lock = threading.Lock()

    def generate(self, image_bytes: bytes, prompt: str) -> str:
        with self._lock:
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


_CATEGORY_COLORS = {
    "Title": (200, 40, 40),
    "Section-header": (230, 130, 40),
    "Text": (60, 120, 200),
    "List-item": (60, 170, 90),
    "Table": (150, 60, 180),
    "Formula": (40, 170, 170),
    "Picture": (220, 60, 130),
    "Caption": (130, 130, 60),
    "Footnote": (110, 110, 110),
    "Page-header": (170, 170, 170),
    "Page-footer": (170, 170, 170),
}


def _draw_layout(im, cells: List[Dict[str, Any]]) -> bytes:
    """Debug rendering: category-colored boxes + labels on the page image
    (ref layout_utils.py:31-112)."""
    import io

    from PIL import ImageDraw

    canvas = im.copy()
    draw = ImageDraw.Draw(canvas)
    for cell in cells:
        bbox = cell.get("bbox")
        if not bbox:
            continue
        color = _CATEGORY_COLORS.get(cell.get("category", "Text"), (0, 0, 0))
        draw.rectangle(bbox, outline=color, width=3)
        draw.text((bbox[0] + 2, max(0, bbox[1] - 12)), cell.get("category", ""), fill=color)
    buf = io.BytesIO()
    canvas.save(buf, format="PNG")
    return buf.getvalue()


class OCRParser(ParserBase):
    extensions = ("pdf", "png", "jpg", "jpeg")

    def __init__(
        self,
        vlm: VLMClient,
        prompt_mode: str = "layout_all",
        dpi: int = 200,
        num_threads: int = 16,
        renderer: Callable[..., List[Tuple[bytes, Tuple[int, int]]]] = render_pdf_pages,
        grounding_bbox: Sequence[float] | None = None,
        draw_layout: bool = False,
    ):
        """``grounding_bbox`` (page coordinates, [x1, y1, x2, y2]) is
        required for ``prompt_mode="grounding_ocr"`` — it is rescaled into
        model-input coordinates and substituted into the prompt (the
        reference's grounding mode takes the same argument,
        ``dots_ocr/utils/prompts.py`` + ``pdf_parser.py`` prompt handling).
        ``draw_layout=True`` adds a per-page debug rendering of the layout
        boxes to the assets (ref ``layout_utils.py:31-112``)."""
        if prompt_mode not in PROMPTS:
            raise ValueError(f"prompt_mode must be one of {sorted(PROMPTS)}")
        if prompt_mode == "grounding_ocr" and grounding_bbox is None:
            raise ValueError("grounding_ocr requires grounding_bbox=[x1,y1,x2,y2]")
        self.vlm = vlm
        self.prompt_mode = prompt_mode
        self.dpi = dpi
        self.num_threads = num_threads
        self.renderer = renderer
        self.grounding_bbox = (
            list(grounding_bbox) if grounding_bbox is not None else None
        )
        self.draw_layout = draw_layout
        self.cleaner = OutputCleaner()

    # -- per-page ----------------------------------------------------------

    def _model_size(self, page_size: Tuple[int, int]) -> Tuple[int, int]:
        """The (w, h) the VLM actually sees. Clients that control their own
        preprocessing (FlaxVLMClient) expose ``model_input_size`` so bbox
        rescaling can't silently skew (r1 weak #6: the default assumed the
        serving stack resized exactly like layout.smart_resize)."""
        w, h = page_size
        fn = getattr(self.vlm, "model_input_size", None)
        if fn is not None:
            return fn(w, h)
        rh, rw = smart_resize(h, w)
        return rw, rh

    def _render_prompt(self, page_size: Tuple[int, int]) -> str:
        prompt = PROMPTS[self.prompt_mode]
        if self.prompt_mode == "grounding_ocr":
            # the VLM sees the smart-resized image, so the region must be
            # expressed in model-input coordinates
            w, h = page_size
            from rag_arc_tpu.parsing.layout import rescale_bbox

            scaled = rescale_bbox(
                self.grounding_bbox,
                from_size=(w, h),
                to_size=self._model_size(page_size),
            )
            prompt = prompt.format(bbox=json.dumps(scaled))
        return prompt

    def _parse_page(
        self, image_bytes: bytes, page_size: Tuple[int, int], page_idx: int
    ) -> Dict[str, Any]:
        raw = self.vlm.generate(image_bytes, self._render_prompt(page_size))
        if self.prompt_mode in ("ocr", "grounding_ocr"):
            return {"page": page_idx, "markdown": raw.strip(), "layout": []}
        cells = self.cleaner.clean_model_output(raw)
        if cells is None:
            logger.warning("page %d: unrepairable VLM output", page_idx)
            return {"page": page_idx, "markdown": "", "layout": [], "failed": True}
        w, h = page_size
        cells = rescale_layout(
            cells, from_size=self._model_size(page_size), to_size=(w, h)
        )
        cells = sort_reading_order(cells)
        prefix = f"page_{page_idx}_picture"
        assets = self._page_assets(image_bytes, cells, page_idx, prefix)
        return {
            "page": page_idx,
            "markdown": layout_to_markdown(cells, picture_prefix=prefix),
            "layout": cells,
            "assets": assets,
        }

    def _page_assets(
        self,
        image_bytes: bytes,
        cells: List[Dict[str, Any]],
        page_idx: int,
        prefix: str,
    ) -> Dict[str, bytes]:
        """Picture crops (so the markdown's image links resolve inside
        ``ParsedDocument.assets`` — ref ``format_transformer.py:144-179``)
        plus the optional layout-draw debug image."""
        assets: Dict[str, bytes] = {}
        # same predicate as layout_to_markdown's link numbering — the two
        # sets must match exactly or links dangle / point at wrong crops
        pictures = [c for c in cells if croppable_picture(c)]
        if not pictures and not self.draw_layout:
            return assets
        import io

        try:
            from PIL import Image
        except ImportError:  # pragma: no cover — PIL is in the image
            logger.warning("PIL unavailable; skipping picture-crop assets")
            return assets
        with Image.open(io.BytesIO(image_bytes)) as im:
            im = im.convert("RGB")
            for i, cell in enumerate(pictures, start=1):
                x1, y1, x2, y2 = cell["bbox"]
                buf = io.BytesIO()
                im.crop((x1, y1, x2, y2)).save(buf, format="PNG")
                assets[f"{prefix}_{i}.png"] = buf.getvalue()
            if self.draw_layout:
                assets[f"layout/page_{page_idx}_draw.png"] = _draw_layout(
                    im, cells
                )
        return assets

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
        # pdf_parser.py:308-379) plus a combined layout document; picture
        # crops / layout draws merge in so markdown links resolve
        assets = {
            f"layout/page_{p['page']}.json": json.dumps(
                p["layout"], ensure_ascii=False
            ).encode("utf-8")
            for p in pages
        }
        for p in pages:
            assets.update(p.get("assets", {}))
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

"""Figure understanding post-pass.

Capability parity with the reference's ``fig_recognize.py``: walk a parsed
layout, crop ``Picture`` regions larger than a pixel-area floor from the
page images, send each crop to a vision model with a structured prompt
(chart / knowledge-map / other), and collect the structured descriptions.
The reference hardcodes DashScope qwen-vl-plus; here any ``VLMClient``
serves.
"""

from __future__ import annotations

import io
import logging
from typing import Any, Dict, List, Sequence

from rag_arc_tpu.parsing.ocr import VLMClient
from rag_arc_tpu.parsing.output_cleaner import OutputCleaner

logger = logging.getLogger(__name__)

MIN_PICTURE_AREA = 52_000  # px² floor (reference fig_recognize.py:101-150)

FIGURE_PROMPT = (
    "Classify and describe this figure. Return JSON: "
    '{"figure_type": "chart" | "knowledge_map" | "other", '
    '"description": <2-3 sentence summary>, '
    '"data_points": [<key quantitative facts if a chart, else empty>]}'
)


def crop_picture(
    page_png: bytes, bbox: Sequence[float]
) -> bytes:
    from PIL import Image

    with Image.open(io.BytesIO(page_png)) as im:
        x1, y1, x2, y2 = (int(v) for v in bbox)
        crop = im.crop((x1, y1, x2, y2))
        buf = io.BytesIO()
        crop.save(buf, format="PNG")
        return buf.getvalue()


def understand_figures(
    vlm: VLMClient,
    page_images: Sequence[bytes],
    page_layouts: Sequence[List[Dict[str, Any]]],
    min_area: int = MIN_PICTURE_AREA,
) -> List[Dict[str, Any]]:
    """Returns one record per qualifying Picture region:
    {page, bbox, figure_type, description, data_points}."""
    cleaner = OutputCleaner()
    out: List[Dict[str, Any]] = []
    for page_idx, (png, layout) in enumerate(zip(page_images, page_layouts)):
        for cell in layout:
            if cell.get("category") != "Picture" or not cell.get("bbox"):
                continue
            x1, y1, x2, y2 = cell["bbox"]
            if (x2 - x1) * (y2 - y1) < min_area:
                continue
            try:
                crop = crop_picture(png, cell["bbox"])
                raw = vlm.generate(crop, FIGURE_PROMPT)
            except Exception as exc:  # noqa: BLE001 — per-figure isolation
                logger.warning("figure on page %d failed: %s", page_idx, exc)
                continue
            parsed = cleaner.clean_model_output(raw)
            record: Dict[str, Any] = {"page": page_idx, "bbox": list(cell["bbox"])}
            if parsed:
                record.update(parsed[0])
            else:
                record.update({"figure_type": "other", "description": raw.strip()})
            out.append(record)
    return out

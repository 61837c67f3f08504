"""Layout post-processing for VLM OCR output.

Capability parity with the reference's ``dots_ocr/utils`` helpers
(SURVEY.md §2.8): ``smart_resize`` (dimensions rounded to a patch-factor
grid inside a pixel budget, ``image_utils.py:29-63``), bbox rescaling from
model-input coordinates back to original page coordinates
(``layout_utils.py:202-228``), and layout-JSON → markdown conversion
(Formula → ``$$``, Table → HTML passthrough, Picture → asset link,
headers/footers dropped — ``format_transformer.py:144-179``).
"""

from __future__ import annotations

import logging
import math
from typing import Any, Dict, List, Sequence, Tuple

logger = logging.getLogger(__name__)

PATCH_FACTOR = 28  # ViT patch granularity of the layout VLM
MIN_PIXELS = 56 * 56
MAX_PIXELS = 2048 * 2048

CATEGORIES = (
    "Title",
    "Section-header",
    "Text",
    "List-item",
    "Table",
    "Formula",
    "Picture",
    "Caption",
    "Footnote",
    "Page-header",
    "Page-footer",
)


def smart_resize(
    height: int,
    width: int,
    factor: int = PATCH_FACTOR,
    min_pixels: int = MIN_PIXELS,
    max_pixels: int = MAX_PIXELS,
) -> Tuple[int, int]:
    """Round (height, width) to multiples of ``factor`` keeping the area
    within [min_pixels, max_pixels] and aspect ratio ~constant."""
    if height <= 0 or width <= 0:
        raise ValueError(f"invalid image size {height}x{width}")
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio beyond 200:1 is not OCR-able")
    h = max(factor, factor * round(height / factor))
    w = max(factor, factor * round(width / factor))
    if h * w > max_pixels:
        scale = math.sqrt(height * width / max_pixels)
        h = max(factor, factor * math.floor(height / scale / factor))
        w = max(factor, factor * math.floor(width / scale / factor))
    elif h * w < min_pixels:
        scale = math.sqrt(min_pixels / (height * width))
        h = factor * math.ceil(height * scale / factor)
        w = factor * math.ceil(width * scale / factor)
    return h, w


def rescale_bbox(
    bbox: Sequence[float],
    from_size: Tuple[int, int],
    to_size: Tuple[int, int],
) -> List[int]:
    """Map [x1, y1, x2, y2] from model-input (w, h) back to original (w, h),
    clamping to bounds and fixing inverted corners."""
    fw, fh = from_size
    tw, th = to_size
    if fw <= 0 or fh <= 0:
        raise ValueError(f"invalid from_size {from_size}")
    x1, y1, x2, y2 = bbox
    sx, sy = tw / fw, th / fh
    x1, x2 = sorted((x1 * sx, x2 * sx))
    y1, y2 = sorted((y1 * sy, y2 * sy))
    return [
        int(max(0, min(tw, round(x1)))),
        int(max(0, min(th, round(y1)))),
        int(max(0, min(tw, round(x2)))),
        int(max(0, min(th, round(y2)))),
    ]


def rescale_layout(
    cells: List[Dict[str, Any]],
    from_size: Tuple[int, int],
    to_size: Tuple[int, int],
) -> List[Dict[str, Any]]:
    out = []
    for cell in cells:
        cell = dict(cell)
        bbox = cell.get("bbox")
        if bbox is not None:
            # VLM output is untrusted: a malformed bbox (wrong arity, a
            # string) must degrade THIS cell to bbox-less, not abort the
            # whole multi-page parse through the page thread pool
            try:
                cell["bbox"] = rescale_bbox(bbox, from_size, to_size)
            except (TypeError, ValueError):
                logger.warning("dropping malformed bbox %r", bbox)
                cell["bbox"] = None
        out.append(cell)
    return out


def croppable_picture(cell: Dict[str, Any]) -> bool:
    """True iff this cell will get a cropped image asset. The markdown
    renderer and the asset writer (``ocr.py _page_assets``) MUST agree on
    this set — a link emitted for a cell whose crop is skipped dangles."""
    if cell.get("category") != "Picture":
        return False
    bbox = cell.get("bbox")
    if not isinstance(bbox, (list, tuple)) or len(bbox) != 4:
        return False
    try:
        x1, y1, x2, y2 = (float(v) for v in bbox)
    except (TypeError, ValueError):
        return False
    return x2 > x1 and y2 > y1


def layout_to_markdown(
    cells: List[Dict[str, Any]],
    include_pictures: bool = True,
    picture_prefix: str = "picture",
) -> str:
    """Render layout cells (already in reading order) to markdown."""
    parts: List[str] = []
    pic_idx = 0
    fn_idx = 0
    for cell in cells:
        category = cell.get("category", "Text")
        text = (cell.get("text") or "").strip()
        if category in ("Page-header", "Page-footer"):
            continue
        if category == "Title":
            parts.append(f"# {text}")
        elif category == "Section-header":
            parts.append(f"## {text}")
        elif category == "Formula":
            parts.append(text if text.startswith("$$") else f"$$\n{text}\n$$")
        elif category == "Table":
            parts.append(text)  # VLM emits HTML tables
        elif category == "Picture":
            # link emission and asset cropping share ONE predicate
            # (croppable_picture) — numbering must count the same set or
            # links point at the wrong crop / dangle (incl. degenerate
            # zero-area bboxes, which the crop loop skips)
            if include_pictures and croppable_picture(cell):
                pic_idx += 1
                parts.append(f"![{picture_prefix}-{pic_idx}]({picture_prefix}_{pic_idx}.png)")
        elif category == "List-item":
            parts.append(f"- {text}")
        elif category == "Caption":
            parts.append(f"*{text}*")
        elif category == "Footnote":
            if text:
                fn_idx += 1
                parts.append(f"[^{fn_idx}]: {text}")
        else:
            parts.append(text)
    return "\n\n".join(p for p in parts if p).strip()


def sort_reading_order(cells: List[Dict[str, Any]], band: int = 20) -> List[Dict[str, Any]]:
    """Stable top-to-bottom, left-to-right ordering by banded bbox origin."""

    def key(cell: Dict[str, Any]):
        bbox = cell.get("bbox") or [0, 0, 0, 0]
        return (bbox[1] // band, bbox[0])

    return sorted(cells, key=key)

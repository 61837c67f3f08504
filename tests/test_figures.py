"""Figure-understanding post-pass tests."""

import io
import json

from PIL import Image

from rag_arc_tpu.parsing.figures import crop_picture, understand_figures
from rag_arc_tpu.parsing.ocr import FakeVLMClient


def _page_png(w=800, h=600, color="white"):
    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


def test_crop_picture():
    crop = crop_picture(_page_png(), [10, 20, 110, 220])
    with Image.open(io.BytesIO(crop)) as im:
        assert im.size == (100, 200)


def test_understand_figures_filters_small_and_parses():
    layout = [
        {"category": "Picture", "bbox": [0, 0, 500, 400]},   # 200k px² — kept
        {"category": "Picture", "bbox": [0, 0, 50, 50]},     # tiny — skipped
        {"category": "Text", "bbox": [0, 0, 600, 600]},      # not a picture
    ]
    vlm = FakeVLMClient(
        [json.dumps({"figure_type": "chart", "description": "a bar chart",
                     "data_points": ["q1: 10"]})]
    )
    records = understand_figures(vlm, [_page_png()], [layout])
    assert len(records) == 1
    assert records[0]["figure_type"] == "chart"
    assert records[0]["page"] == 0


def test_unparseable_figure_degrades_to_raw_description():
    layout = [{"category": "Picture", "bbox": [0, 0, 500, 400]}]
    vlm = FakeVLMClient(["just a prose answer, no json"])
    records = understand_figures(vlm, [_page_png()], [layout])
    assert records[0]["figure_type"] == "other"
    assert "prose" in records[0]["description"]

"""Parser tests. OOXML fixtures are constructed by hand (zip + XML) so the
parsers are validated against the file-format spec, not a library."""

import io
import json
import zipfile

import pytest

from rag_arc_tpu.parsing import DocxParser, ExcelParser, HtmlParser, PptxParser
from rag_arc_tpu.parsing.layout import (
    layout_to_markdown,
    rescale_bbox,
    smart_resize,
    sort_reading_order,
)
from rag_arc_tpu.parsing.multi import MultiParser
from rag_arc_tpu.parsing.ocr import OCRParser, FakeVLMClient, PROMPTS
from rag_arc_tpu.parsing.output_cleaner import OutputCleaner

W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
S_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'


def make_docx(tmp_path):
    doc = f"""<?xml version="1.0"?>
<w:document {W_NS}>
<w:body>
<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>My Title</w:t></w:r></w:p>
<w:p><w:r><w:t>First paragraph </w:t></w:r><w:r><w:t>continues here.</w:t></w:r></w:p>
<w:tbl>
 <w:tr><w:tc><w:p><w:r><w:t>H1</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>H2</w:t></w:r></w:p></w:tc></w:tr>
 <w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc></w:tr>
</w:tbl>
<w:p><w:r><w:br w:type="page"/><w:t>After the break</w:t></w:r></w:p>
</w:body></w:document>"""
    path = tmp_path / "test.docx"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("word/document.xml", doc)
    return path


def make_xlsx(tmp_path, n_rows=3):
    shared = """<?xml version="1.0"?>
<sst {ns}><si><t>name</t></si><si><t>score</t></si><si><t>alice</t></si></sst>""".format(ns=S_NS)
    rows = ['<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>']
    rows.append('<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>91.5</v></c></row>')
    for i in range(3, n_rows + 1):
        rows.append(f'<row r="{i}"><c r="A{i}" t="inlineStr"><is><t>u{i}</t></is></c><c r="B{i}"><v>{i}</v></c></row>')
    sheet = f'<?xml version="1.0"?><worksheet {S_NS}><sheetData>{"".join(rows)}</sheetData></worksheet>'
    workbook = f'''<?xml version="1.0"?><workbook {S_NS}
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Scores" sheetId="1" r:id="rId1"/></sheets></workbook>'''
    rels = '''<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>'''
    path = tmp_path / "test.xlsx"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return path


def make_pptx(tmp_path):
    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    p = "http://schemas.openxmlformats.org/presentationml/2006/main"
    slide = f"""<?xml version="1.0"?>
<p:sld xmlns:p="{p}" xmlns:a="{a}">
<p:cSld><p:spTree>
<p:sp><p:spPr><a:xfrm><a:off x="100" y="9000000"/></a:xfrm></p:spPr>
  <p:txBody><a:p><a:r><a:t>Bottom text</a:t></a:r></a:p></p:txBody></p:sp>
<p:sp><p:spPr><a:xfrm><a:off x="100" y="100"/></a:xfrm></p:spPr>
  <p:txBody><a:p><a:r><a:t>Top title</a:t></a:r></a:p>
  <a:p><a:pPr lvl="1"/><a:r><a:t>nested bullet</a:t></a:r></a:p></p:txBody></p:sp>
</p:spTree></p:cSld></p:sld>"""
    path = tmp_path / "test.pptx"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("ppt/slides/slide1.xml", slide)
    return path


class TestDocx:
    def test_structure(self, tmp_path):
        doc = DocxParser().parse(make_docx(tmp_path))
        assert "# My Title" in doc.markdown
        assert "First paragraph continues here." in doc.markdown
        assert "<th>H1</th>" in doc.markdown and "<td>a</td>" in doc.markdown
        assert "---" in doc.markdown  # page break
        assert doc.metadata["tables"] == 1

    def test_to_document(self, tmp_path):
        d = DocxParser().parse(make_docx(tmp_path)).to_document()
        assert d.metadata["source"].endswith("test.docx")


class TestXlsx:
    def test_shared_strings_and_numbers(self, tmp_path):
        doc = ExcelParser().parse(make_xlsx(tmp_path))
        assert "## Scores" in doc.markdown
        assert "<th>name</th>" in doc.markdown
        assert "<td>alice</td>" in doc.markdown and "<td>91.5</td>" in doc.markdown

    def test_chunking_repeats_header(self, tmp_path):
        doc = ExcelParser(rows_per_chunk=5).parse(make_xlsx(tmp_path, n_rows=12))
        assert doc.markdown.count("<th>name</th>") == 3  # 11 data rows / 5

    def test_csv_with_encoding(self, tmp_path):
        p = tmp_path / "data.csv"
        p.write_bytes("name,城市\nalice,北京\n".encode("gb18030"))
        doc = ExcelParser().parse(p)
        assert "北京" in doc.markdown

    def test_implied_cell_positions(self, tmp_path):
        """ECMA-376 makes c/@r optional (position implied sequentially);
        cells without it all collapsed onto column 0."""
        sheet = (
            f'<?xml version="1.0"?><worksheet {S_NS}><sheetData>'
            '<row><c t="inlineStr"><is><t>a</t></is></c>'
            '<c t="inlineStr"><is><t>b</t></is></c>'
            '<c t="inlineStr"><is><t>c</t></is></c></row>'
            "</sheetData></worksheet>"
        )
        workbook = (
            f'<?xml version="1.0"?><workbook {S_NS} '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
        )
        # absolute OPC target too: '/xl/...' was prefixed again -> dropped
        rels = (
            '<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Target="/xl/worksheets/sheet1.xml"/></Relationships>'
        )
        path = tmp_path / "implied.xlsx"
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("xl/workbook.xml", workbook)
            zf.writestr("xl/_rels/workbook.xml.rels", rels)
            zf.writestr("xl/worksheets/sheet1.xml", sheet)
        doc = ExcelParser().parse(path)
        assert "<th>a</th>" in doc.markdown and "<th>c</th>" in doc.markdown

    def test_ole2_rejected(self, tmp_path):
        p = tmp_path / "old.xls"
        p.write_bytes(b"\xd0\xcf\x11\xe0" + b"\x00" * 100)
        with pytest.raises(ValueError, match="legacy"):
            ExcelParser().parse(p)


class TestPptx:
    def test_reading_order_and_bullets(self, tmp_path):
        doc = PptxParser().parse(make_pptx(tmp_path))
        assert "## Slide 1" in doc.markdown
        assert doc.markdown.index("Top title") < doc.markdown.index("Bottom text")
        assert "  - nested bullet" in doc.markdown


class TestHtml:
    HTML = """<html><head><title>Page Title</title><style>.x{}</style></head>
    <body><nav>menu junk</nav><article>
    <h2>Section</h2><p>Body <strong>bold</strong> and <a href="http://x">link</a>.</p>
    <ul><li>one</li><li>two</li></ul>
    <table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table>
    <pre><code>x = 1</code></pre>
    This article has plenty of body text to pass the main-content length gate.
    </article></body></html>"""

    def test_conversion(self):
        doc = HtmlParser().parse(self.HTML)
        md = doc.markdown
        assert "# Page Title" in md and "## Section" in md
        assert "**bold**" in md and "[link](http://x)" in md
        assert "- one" in md
        assert "| k | v |" in md
        assert "menu junk" not in md  # nav stripped
        assert "```" in md

    def test_file_input(self, tmp_path):
        p = tmp_path / "page.html"
        p.write_text(self.HTML)
        assert "# Page Title" in HtmlParser().parse(p).markdown


class TestOutputCleaner:
    C = OutputCleaner()

    def test_valid_passthrough(self):
        raw = '[{"category": "Text", "text": "hi", "bbox": [0,0,1,1]}]'
        out, status = self.C.clean_with_status(raw)
        assert status == "ok" and out[0]["text"] == "hi"

    def test_fenced(self):
        raw = '```json\n[{"category": "Text", "text": "hi"}]\n```'
        assert self.C.clean_model_output(raw)[0]["text"] == "hi"

    def test_dict_free_json_is_failure_not_empty_success(self):
        # valid JSON with no layout dicts is garbage, not an empty page:
        # returning [] made the caller record a successful empty layout
        assert self.C.clean_model_output('["line one", "line two"]') is None
        assert self.C.clean_model_output('"just a string"') is None
        # a literal empty list IS a valid empty page
        assert self.C.clean_model_output("[]") == []

    def test_truncated_list_recovers_complete_elements(self):
        raw = '[{"category": "Text", "text": "a"}, {"category": "Text", "text": "b"}, {"categ'
        out = self.C.clean_model_output(raw)
        assert [d["text"] for d in out] == ["a", "b"]

    def test_missing_wrapper(self):
        raw = '{"category": "Title", "text": "t"}, {"category": "Text", "text": "x"}'
        out = self.C.clean_model_output(raw)
        assert len(out) == 2

    def test_salvage_single_incomplete(self):
        raw = '[{"category": "Text", "text": "partial conten'
        out = self.C.clean_model_output(raw)
        assert out and out[0]["category"] == "Text"

    def test_dedup(self):
        raw = ('[{"category": "Text", "text": "same", "bbox": [1,2,3,4]},'
               '{"category": "Text", "text": "same", "bbox": [1,2,3,4]}]')
        assert len(self.C.clean_model_output(raw)) == 1

    def test_hopeless_returns_none(self):
        assert self.C.clean_model_output("no json here at all") is None
        assert self.C.clean_model_output("") is None

    def test_batch_report(self, tmp_path):
        p = tmp_path / "raw.jsonl"
        lines = [
            json.dumps({"raw": '[{"category": "Text", "text": "ok"}]'}),
            json.dumps({"raw": '[{"category": "Text", "text": "trunc"'}),
            json.dumps({"raw": "garbage"}),
        ]
        p.write_text("\n".join(lines))
        report = self.C.clean_all_data(p)
        assert report.total == 3 and report.ok == 1 and report.repaired == 1
        assert report.failed == 1 and report.failures == [2]
        assert (tmp_path / "raw.cleaned.jsonl").exists()


class TestLayout:
    def test_smart_resize_grid(self):
        h, w = smart_resize(1000, 750)
        assert h % 28 == 0 and w % 28 == 0
        assert abs(h / w - 1000 / 750) < 0.1

    def test_smart_resize_budget(self):
        h, w = smart_resize(10000, 10000, max_pixels=1024 * 1024)
        assert h * w <= 1024 * 1024

    def test_smart_resize_rejects_extreme_aspect(self):
        with pytest.raises(ValueError):
            smart_resize(10, 50000)

    def test_rescale_bbox(self):
        out = rescale_bbox([14, 14, 28, 28], from_size=(28, 28), to_size=(280, 560))
        assert out == [140, 280, 280, 560]

    def test_rescale_clamps_and_fixes_inversion(self):
        out = rescale_bbox([30, 5, 10, -2], from_size=(28, 28), to_size=(28, 28))
        assert out[0] <= out[2] and out[1] <= out[3] and out[1] >= 0

    def test_layout_to_markdown(self):
        cells = [
            {"category": "Page-header", "text": "skip me"},
            {"category": "Title", "text": "Doc"},
            {"category": "Formula", "text": "e=mc^2"},
            {"category": "Table", "text": "<table><tr><td>x</td></tr></table>"},
            {"category": "Picture", "bbox": [0, 0, 9, 9]},
            {"category": "List-item", "text": "item"},
        ]
        md = layout_to_markdown(cells)
        assert "skip me" not in md
        assert "# Doc" in md and "$$" in md and "<table>" in md and "- item" in md

    def test_malformed_bbox_degrades_cell_not_page(self):
        from rag_arc_tpu.parsing.layout import rescale_layout

        cells = [
            {"category": "Text", "text": "good", "bbox": [0, 0, 10, 10]},
            {"category": "Text", "text": "bad arity", "bbox": [1, 2, 3]},
            {"category": "Text", "text": "stringy", "bbox": "0,0,5,5"},
        ]
        out = rescale_layout(cells, from_size=(28, 28), to_size=(28, 28))
        assert out[0]["bbox"] == [0, 0, 10, 10]
        assert out[1]["bbox"] is None and out[2]["bbox"] is None

    def test_footnotes_numbered_independently(self):
        cells = [
            {"category": "Picture", "bbox": [0, 0, 9, 9]},
            {"category": "Footnote", "text": "first note"},
            {"category": "Footnote", "text": "second note"},
        ]
        md = layout_to_markdown(cells)
        assert "[^1]: first note" in md and "[^2]: second note" in md

    def test_picture_links_match_cropped_assets_only(self):
        # a bbox-less Picture has NO cropped asset; emitting a link for it
        # shifted numbering so links pointed at the wrong crops
        cells = [
            {"category": "Picture"},  # no bbox -> no asset -> no link
            {"category": "Picture", "bbox": [0, 0, 9, 9]},
        ]
        md = layout_to_markdown(cells, picture_prefix="p")
        assert md.count("![") == 1 and "p_1.png" in md

    def test_reading_order(self):
        cells = [
            {"category": "Text", "text": "right", "bbox": [500, 5, 600, 20]},
            {"category": "Text", "text": "left", "bbox": [10, 8, 100, 22]},
            {"category": "Text", "text": "below", "bbox": [10, 300, 100, 320]},
        ]
        ordered = [c["text"] for c in sort_reading_order(cells)]
        assert ordered == ["left", "right", "below"]


class TestOCR:
    def _png(self, w=280, h=280):
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (w, h), "white").save(buf, format="PNG")
        return buf.getvalue()

    def test_parse_images_layout_mode(self):
        layout = json.dumps(
            [
                {"category": "Title", "text": "Page One", "bbox": [0, 0, 100, 20]},
                {"category": "Text", "text": "body", "bbox": [0, 30, 100, 60]},
            ]
        )
        vlm = FakeVLMClient([layout])
        parser = OCRParser(vlm, prompt_mode="layout_all")
        doc = parser.parse_images([(self._png(), (280, 280))], source="x.pdf")
        assert "# Page One" in doc.markdown and "body" in doc.markdown
        assert doc.metadata["pages"] == 1
        assert vlm.calls[0] == PROMPTS["layout_all"]

    def test_broken_output_repaired(self):
        vlm = FakeVLMClient(['[{"category": "Text", "text": "recovered"}, {"cat'])
        doc = OCRParser(vlm).parse_images([(self._png(), (280, 280))])
        assert "recovered" in doc.markdown

    def test_ocr_mode_plain_text(self):
        vlm = FakeVLMClient(["plain transcription"])
        doc = OCRParser(vlm, prompt_mode="ocr").parse_images([(self._png(), (280, 280))])
        assert doc.markdown.strip() == "plain transcription"

    def test_unrepairable_page_flagged(self):
        vlm = FakeVLMClient(["utter garbage"])
        doc = OCRParser(vlm).parse_images([(self._png(), (280, 280))])
        assert doc.metadata["failed_pages"] == [0]

    def test_bad_prompt_mode(self):
        with pytest.raises(ValueError):
            OCRParser(FakeVLMClient(["x"]), prompt_mode="nope")


class TestMulti:
    def test_dispatch_and_tree(self, tmp_path):
        make_docx(tmp_path)
        make_xlsx(tmp_path)
        (tmp_path / "page.html").write_text(TestHtml.HTML)
        (tmp_path / "skip.bin").write_bytes(b"\x00")
        mp = MultiParser()
        results = mp.parse_tree(tmp_path)
        assert len(results) == 3
        with pytest.raises(ValueError, match="no parser"):
            mp.parse(tmp_path / "skip.bin")

    def test_cli(self, tmp_path, capsys):
        from rag_arc_tpu.parsing.multi import main

        make_docx(tmp_path)
        rc = main([str(tmp_path / "test.docx"), "-o", str(tmp_path / "out")])
        assert rc == 0
        assert (tmp_path / "out" / "test.md").exists()


def test_parsed_document_save_writes_assets(tmp_path):
    from rag_arc_tpu.parsing.base import ParsedDocument

    doc = ParsedDocument(
        markdown="# Title\nbody\n",
        source="x.pdf",
        assets={"layout/page_0.json": b"[]", "images/a.png": b"\x89PNG"},
    )
    md = doc.save(tmp_path / "out")
    assert md.read_text().startswith("# Title")
    # assets are namespaced per document stem (sources share names like
    # page_0_picture_1.png, so flat placement clobbers across sources)
    assert (tmp_path / "out" / "x" / "layout" / "page_0.json").read_bytes() == b"[]"
    assert (tmp_path / "out" / "x" / "images" / "a.png").exists()


def test_parsed_document_save_rewrites_asset_links(tmp_path):
    from rag_arc_tpu.parsing.base import ParsedDocument

    doc = ParsedDocument(
        markdown="![fig](images/a.png)\n",
        source="report.pdf",
        assets={"images/a.png": b"\x89PNG"},
    )
    md = doc.save(tmp_path / "out")
    # the link must resolve relative to the saved markdown
    link = md.read_text().split("](")[1].rstrip(")\n")
    assert (md.parent / link).read_bytes() == b"\x89PNG"


def test_parsed_document_save_disambiguates_stem_collisions(tmp_path):
    """a/index.html and b/index.html must not silently clobber each other
    in the output directory (data loss with exit code 0) — and their
    identically-named assets must stay separate too."""
    from rag_arc_tpu.parsing.base import ParsedDocument

    d1 = ParsedDocument(
        markdown="first ![i](p.png)",
        source="a/index.html",
        assets={"p.png": b"one"},
    )
    d2 = ParsedDocument(
        markdown="second ![i](p.png)",
        source="b/index.html",
        assets={"p.png": b"two"},
    )
    p1 = d1.save(tmp_path / "out")
    p2 = d2.save(tmp_path / "out")
    assert p1 != p2
    assert p1.read_text().startswith("first") and p2.read_text().startswith("second")
    for p, blob in ((p1, b"one"), (p2, b"two")):
        link = p.read_text().split("](")[1].rstrip(")")
        assert (p.parent / link).read_bytes() == blob


def test_parsed_document_save_same_source_is_idempotent(tmp_path):
    """Re-ingesting the same source must overwrite its outputs, not pile
    up stale duplicates next to them."""
    from rag_arc_tpu.parsing.base import ParsedDocument

    p1 = ParsedDocument(markdown="v1", source="a/index.html").save(tmp_path / "out")
    p2 = ParsedDocument(markdown="v2", source="a/index.html").save(tmp_path / "out")
    assert p1 == p2
    assert p2.read_text() == "v2"
    mds = sorted(f.name for f in (tmp_path / "out").glob("*.md"))
    assert mds == ["index.md"]


class TestOCRModeMatrix:
    """All four prompt modes work end to end, and markdown image links
    resolve to real assets (VERDICT r1 #5)."""

    def _png(self, w=280, h=280, color="white"):
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    def test_grounding_ocr_substitutes_bbox(self):
        vlm = FakeVLMClient(["text inside the region"])
        parser = OCRParser(
            vlm, prompt_mode="grounding_ocr", grounding_bbox=[10, 20, 100, 120]
        )
        doc = parser.parse_images([(self._png(), (280, 280))])
        assert doc.markdown.strip() == "text inside the region"
        sent = vlm.calls[0]
        assert "{bbox}" not in sent, "literal placeholder leaked into the prompt"
        # the bbox was rescaled into smart_resize coordinates and embedded
        from rag_arc_tpu.parsing.layout import rescale_bbox, smart_resize

        rh, rw = smart_resize(280, 280)
        want = rescale_bbox([10, 20, 100, 120], from_size=(280, 280), to_size=(rw, rh))
        assert json.dumps(want) in sent

    def test_grounding_requires_bbox(self):
        with pytest.raises(ValueError, match="grounding_bbox"):
            OCRParser(FakeVLMClient(["x"]), prompt_mode="grounding_ocr")

    def test_layout_only_mode(self):
        layout = json.dumps(
            [
                {"category": "Text", "bbox": [0, 30, 100, 60]},
                {"category": "Picture", "bbox": [0, 100, 50, 150]},
            ]
        )
        parser = OCRParser(FakeVLMClient([layout]), prompt_mode="layout_only")
        doc = parser.parse_images([(self._png(), (280, 280))])
        assert doc.metadata["layout"][0], "layout cells missing"

    def test_picture_crops_written_to_assets(self):
        layout = json.dumps(
            [
                {"category": "Text", "text": "before", "bbox": [0, 0, 100, 20]},
                {"category": "Picture", "bbox": [10, 30, 110, 130]},
                {"category": "Picture", "bbox": [10, 140, 110, 240]},
            ]
        )
        parser = OCRParser(FakeVLMClient([layout]))
        doc = parser.parse_images([(self._png(color="blue"), (280, 280))])
        # every image link in the markdown resolves to an asset
        import re

        links = re.findall(r"!\[[^\]]*\]\(([^)]+)\)", doc.markdown)
        assert len(links) == 2
        for link in links:
            assert link in doc.assets, f"dangling image link {link}"
            assert doc.assets[link].startswith(b"\x89PNG")
        # crop has the right dimensions
        from PIL import Image

        with Image.open(io.BytesIO(doc.assets[links[0]])) as im:
            assert im.size == (100, 100)

    def test_degenerate_picture_bbox_gets_no_link(self):
        """Zero-area bboxes are skipped by the crop loop; the markdown
        renderer must skip them too or the link dangles."""
        layout = json.dumps(
            [
                {"category": "Picture", "bbox": [100, 50, 100, 200]},  # x2==x1
                {"category": "Picture", "bbox": [10, 30, 110, 130]},  # real
            ]
        )
        parser = OCRParser(FakeVLMClient([layout]))
        doc = parser.parse_images([(self._png(), (280, 280))])
        import re

        links = re.findall(r"!\[[^\]]*\]\(([^)]+)\)", doc.markdown)
        assert len(links) == 1
        assert links[0] in doc.assets

    def test_picture_links_unique_across_pages(self):
        layout = json.dumps([{"category": "Picture", "bbox": [0, 0, 50, 50]}])
        parser = OCRParser(FakeVLMClient([layout, layout]))
        doc = parser.parse_images(
            [(self._png(), (280, 280)), (self._png(), (280, 280))]
        )
        import re

        links = re.findall(r"!\[[^\]]*\]\(([^)]+)\)", doc.markdown)
        assert len(links) == 2 and len(set(links)) == 2
        assert all(link in doc.assets for link in links)

    def test_layout_draw_asset(self):
        layout = json.dumps(
            [{"category": "Title", "text": "T", "bbox": [5, 5, 200, 40]}]
        )
        parser = OCRParser(FakeVLMClient([layout]), draw_layout=True)
        doc = parser.parse_images([(self._png(), (280, 280))])
        assert "layout/page_0_draw.png" in doc.assets
        assert doc.assets["layout/page_0_draw.png"].startswith(b"\x89PNG")

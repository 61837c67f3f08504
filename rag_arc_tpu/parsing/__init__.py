from rag_arc_tpu.parsing.base import ParsedDocument, ParserBase
from rag_arc_tpu.parsing.docx_parser import DocxParser
from rag_arc_tpu.parsing.html_parser import HtmlParser
from rag_arc_tpu.parsing.pptx_parser import PptxParser
from rag_arc_tpu.parsing.xlsx_parser import ExcelParser

__all__ = [
    "ParserBase",
    "ParsedDocument",
    "DocxParser",
    "ExcelParser",
    "PptxParser",
    "HtmlParser",
]

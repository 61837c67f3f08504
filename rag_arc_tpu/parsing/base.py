"""Parser interface.

The reference's parsers (``core/file_management/parser/`` — SURVEY.md §2.8)
each write sidecar files and return markdown. Here parsers return a
``ParsedDocument`` (markdown + extracted assets + structure) and leave IO
to the caller; ``save()`` reproduces the reference's file outputs when
wanted. All OOXML parsers are dependency-free (stdlib ``zipfile`` +
``xml.etree``) because python-docx/openpyxl/python-pptx are not in this
image — and OOXML is just zipped XML.
"""

from __future__ import annotations

import hashlib
import html
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

from rag_arc_tpu.utils.data_model import Document


@dataclass
class ParsedDocument:
    markdown: str
    source: str
    assets: Dict[str, bytes] = field(default_factory=dict)  # rel path → bytes
    metadata: Dict[str, object] = field(default_factory=dict)

    def to_document(self) -> Document:
        return Document(
            content=self.markdown, metadata={"source": self.source, **self.metadata}
        )

    def save(self, out_dir: str | Path) -> Path:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        stem = Path(self.source).stem or "document"
        md_path = out_dir / f"{stem}.md"
        if md_path.exists():
            # two sources sharing a stem (a/index.html + b/index.html)
            # silently clobbered each other — disambiguate by a short
            # source-path hash instead of losing data with exit code 0
            suffix = hashlib.md5(str(self.source).encode()).hexdigest()[:8]
            stem = f"{stem}-{suffix}"
            md_path = out_dir / f"{stem}.md"
        md_path.write_text(self.markdown, encoding="utf-8")
        for rel, blob in self.assets.items():
            # flat next to the markdown: its links reference bare names
            asset_path = out_dir / rel
            asset_path.parent.mkdir(parents=True, exist_ok=True)
            asset_path.write_bytes(blob)
        return md_path


class ParserBase(ABC):
    """File → ParsedDocument."""

    extensions: tuple[str, ...] = ()

    @abstractmethod
    def parse(self, path: str | Path) -> ParsedDocument: ...

    def can_parse(self, path: str | Path) -> bool:
        return Path(path).suffix.lower().lstrip(".") in self.extensions


def rows_to_html_table(rows: List[List[str]], header: Optional[List[str]] = None) -> str:
    """Render rows as an HTML table (the reference emits tables as HTML
    inside markdown across all parsers)."""
    parts = ["<table>"]
    if header is not None:
        parts.append(
            "<tr>" + "".join(f"<th>{html.escape(str(c))}</th>" for c in header) + "</tr>"
        )
    for row in rows:
        parts.append(
            "<tr>" + "".join(f"<td>{html.escape(str(c))}</td>" for c in row) + "</tr>"
        )
    parts.append("</table>")
    return "\n".join(parts)

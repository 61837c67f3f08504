"""Malformed VLM-output repair.

Capability parity with the reference's ``OutputCleaner``
(``core/file_management/parser/dots_ocr/utils/output_cleaner.py`` — 622 LoC
of string surgery): VLM layout output is supposed to be a JSON list of
``{"category", "text", "bbox"}`` dicts but arrives truncated, unfenced,
duplicated, or half-written. This implementation repairs by *incremental
decoding* instead of string patching: strip fences, locate the array,
walk it with ``json.JSONDecoder.raw_decode`` collecting every complete
element, attempt closure of a trailing incomplete element, and
deduplicate. A batch entry point cleans a JSONL file and emits a report.
"""

from __future__ import annotations

import json
import logging
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)

_FENCE_RE = re.compile(r"```(?:json)?\s*(.*?)\s*```", re.DOTALL)


@dataclass
class CleaningReport:
    total: int = 0
    ok: int = 0
    repaired: int = 0
    failed: int = 0
    failures: List[int] = field(default_factory=list)

    def as_dict(self) -> Dict[str, Any]:
        return {
            "total": self.total,
            "ok": self.ok,
            "repaired": self.repaired,
            "failed": self.failed,
            "failures": self.failures,
        }


class OutputCleaner:
    def __init__(self, max_close_attempts: int = 8):
        self.max_close_attempts = max_close_attempts

    # -- public API --------------------------------------------------------

    def clean_model_output(self, raw: str) -> Optional[List[Dict[str, Any]]]:
        """Best-effort parse of a VLM layout response into a list of dicts.
        Returns None only when nothing salvageable remains."""
        if not raw or not raw.strip():
            return None
        text = self._strip_fences(raw.strip())
        direct = self._try_load(text)
        if direct is not None:
            cells = self._dedup(self._ensure_list(direct))
            if cells or direct == []:
                # a literal [] is a valid empty page; valid JSON whose
                # items were ALL filtered out (strings, scalars) is
                # garbage — fall through to salvage, then report failure
                # rather than a silently-successful empty layout
                return cells
        elements, _ = self._scan_elements(text)
        if elements:
            return self._dedup(elements)
        salvaged = self._salvage_incomplete(text)
        if salvaged is not None:
            return self._dedup([salvaged])
        return None

    def clean_with_status(self, raw: str) -> Tuple[Optional[List[Dict]], str]:
        """(result, status) where status ∈ {ok, repaired, failed}."""
        if raw and raw.strip():
            direct = self._try_load(self._strip_fences(raw.strip()))
            if isinstance(direct, list) and all(isinstance(x, dict) for x in direct):
                return self._dedup(direct), "ok"
        result = self.clean_model_output(raw)
        return result, ("repaired" if result is not None else "failed")

    def clean_all_data(
        self, jsonl_path: str | Path, output_path: Optional[str | Path] = None
    ) -> CleaningReport:
        """Clean every line of a JSONL file of raw model outputs; writes the
        cleaned JSONL next to it (parity with the reference's batch mode)."""
        jsonl_path = Path(jsonl_path)
        output_path = Path(output_path or jsonl_path.with_suffix(".cleaned.jsonl"))
        report = CleaningReport()
        cleaned_lines = []
        for i, line in enumerate(jsonl_path.read_text(encoding="utf-8").splitlines()):
            if not line.strip():
                continue
            report.total += 1
            try:
                record = json.loads(line)
                raw = record.get("raw", record) if isinstance(record, dict) else record
            except json.JSONDecodeError:
                raw = line
            result, status = self.clean_with_status(
                raw if isinstance(raw, str) else json.dumps(raw)
            )
            if status == "ok":
                report.ok += 1
            elif status == "repaired":
                report.repaired += 1
            else:
                report.failed += 1
                report.failures.append(i)
                continue
            cleaned_lines.append(json.dumps(result, ensure_ascii=False))
        output_path.write_text("\n".join(cleaned_lines) + "\n", encoding="utf-8")
        return report

    # -- internals ---------------------------------------------------------

    @staticmethod
    def _strip_fences(text: str) -> str:
        m = _FENCE_RE.search(text)
        return m.group(1) if m else text

    @staticmethod
    def _try_load(text: str) -> Optional[Any]:
        try:
            return json.loads(text)
        except json.JSONDecodeError:
            return None

    @staticmethod
    def _ensure_list(data: Any) -> List[Dict[str, Any]]:
        if isinstance(data, dict):
            return [data]
        if isinstance(data, list):
            return [x for x in data if isinstance(x, dict)]
        return []

    def _scan_elements(self, text: str) -> Tuple[List[Dict[str, Any]], int]:
        """Walk the text collecting every complete JSON object; returns
        (elements, index after last complete element)."""
        decoder = json.JSONDecoder()
        elements: List[Dict[str, Any]] = []
        pos = text.find("{")
        last_end = 0
        while 0 <= pos < len(text):
            try:
                obj, end = decoder.raw_decode(text, pos)
            except json.JSONDecodeError:
                nxt = text.find("{", pos + 1)
                pos = nxt
                continue
            if isinstance(obj, dict):
                elements.append(obj)
            last_end = end
            pos = text.find("{", end)
        return elements, last_end

    def _salvage_incomplete(self, text: str) -> Optional[Dict[str, Any]]:
        """Close an unterminated trailing dict: progressively append
        plausible terminators (`"`, `]`, `}`) until it parses."""
        start = text.find("{")
        if start < 0:
            return None
        fragment = text[start:]
        suffixes = ["", '"', '"}', "}", '"]}', "]}", '"}]', "}]"]
        for _ in range(self.max_close_attempts):
            for suffix in suffixes:
                candidate = fragment + suffix
                loaded = self._try_load(candidate)
                if isinstance(loaded, dict):
                    return loaded
            # drop a trailing character (half-written token) and retry
            fragment = fragment[:-1]
            if not fragment:
                break
        return None

    @staticmethod
    def _dedup(elements: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        """Drop exact duplicates and duplicate (category, text, bbox)
        triples (reference dedup semantics)."""
        seen = set()
        out = []
        for el in elements:
            key = (
                str(el.get("category")),
                str(el.get("text")),
                json.dumps(el.get("bbox"), sort_keys=True),
            )
            full_key = json.dumps(el, sort_keys=True, ensure_ascii=False)
            if key in seen or full_key in seen:
                continue
            seen.add(key)
            seen.add(full_key)
            out.append(el)
        return out

"""Chunker tests (markdown / token / recursive / semantic)."""

import numpy as np
import pytest

from rag_arc_tpu.chunking import (
    MarkdownHeaderTextSplitter,
    RecursiveCharacterTextSplitter,
    SemanticChunker,
    TokenTextSplitter,
)
from rag_arc_tpu.models.embeddings import HashEmbeddings
from rag_arc_tpu.utils.data_model import Document

MD = """# Title
intro text

## Section A
a body line
another a line

```
# not a header, just code
code line
```

## Section B
b body
"""


class TestMarkdown:
    def test_sections_and_header_stack(self):
        docs = MarkdownHeaderTextSplitter().split_text(MD)
        by_header = {d.metadata["headers"].get("H2"): d for d in docs}
        assert "Section A" in by_header and "Section B" in by_header
        assert by_header["Section A"].metadata["headers"]["H1"] == "Title"

    def test_code_fence_not_split(self):
        docs = MarkdownHeaderTextSplitter().split_text(MD)
        section_a = next(
            d for d in docs if d.metadata["headers"].get("H2") == "Section A"
        )
        assert "# not a header" in section_a.content

    def test_strip_headers(self):
        docs = MarkdownHeaderTextSplitter(strip_headers=True).split_text(MD)
        assert not any(d.content.startswith("## ") for d in docs)

    def test_h2_reset_on_new_h1(self):
        text = "# One\n## A\nx\n# Two\nbody"
        docs = MarkdownHeaderTextSplitter().split_text(text)
        last = docs[-1]
        assert last.metadata["headers"] == {"H1": "Two"}

    def test_sub_chunking(self):
        text = "# T\n" + "x" * 500
        docs = MarkdownHeaderTextSplitter(max_chars=100, overlap=10).split_text(text)
        assert all(len(d.content) <= 100 for d in docs)
        assert len(docs) > 4


class TestToken:
    def test_windows_and_overlap(self):
        sp = TokenTextSplitter(tokens_per_chunk=10, chunk_overlap=2)
        text = " ".join(f"w{i}" for i in range(25))
        chunks = sp.split_text(text)
        assert len(chunks) == 3
        # overlap: last 2 tokens of chunk0 reappear in chunk1
        assert chunks[0].split()[-2:] == chunks[1].split()[:2]

    def test_roundtrip_no_loss(self):
        sp = TokenTextSplitter(tokens_per_chunk=8, chunk_overlap=0)
        text = "alpha beta  gamma\ndelta epsilon"
        assert "".join(sp.split_text(text)) == text

    def test_overlap_validation(self):
        with pytest.raises(ValueError):
            TokenTextSplitter(tokens_per_chunk=5, chunk_overlap=5)

    def test_split_documents_metadata(self):
        sp = TokenTextSplitter(tokens_per_chunk=4, chunk_overlap=0)
        docs = sp.split_documents([Document(content="a b c d e f", metadata={"s": 1})])
        assert all(d.metadata["s"] == 1 for d in docs)
        assert [d.metadata["chunk_index"] for d in docs] == list(range(len(docs)))


class TestRecursive:
    def test_prefers_paragraph_breaks(self):
        text = "para one is here.\n\npara two is here.\n\npara three."
        chunks = RecursiveCharacterTextSplitter(
            chunk_size=25, chunk_overlap=0
        ).split_text(text)
        assert any("para one" in c for c in chunks)
        assert all(len(c) <= 25 for c in chunks)

    def test_hard_fallback_with_overlap(self):
        text = "x" * 100  # no separators at all
        chunks = RecursiveCharacterTextSplitter(
            chunk_size=40, chunk_overlap=10, separators=["\n\n", "\n"]
        ).split_text(text)
        assert all(len(c) <= 40 for c in chunks)
        assert sum(len(c) for c in chunks) >= 100  # overlap duplicates chars

    def test_keep_separator_start(self):
        chunks = RecursiveCharacterTextSplitter(
            chunk_size=12, chunk_overlap=0, separators=["\n"], keep_separator="start"
        ).split_text("aaaaaaaaaa\nbbbbbbbbbb")
        assert chunks[1].startswith("\n")

    def test_keep_separator_end(self):
        chunks = RecursiveCharacterTextSplitter(
            chunk_size=12, chunk_overlap=0, separators=["\n"], keep_separator="end"
        ).split_text("aaaaaaaaaa\nbbbbbbbbbb")
        assert chunks[0].endswith("\n")

    def test_regex_separator(self):
        chunks = RecursiveCharacterTextSplitter(
            chunk_size=10,
            chunk_overlap=0,
            separators=[r"\d+"],
            is_separator_regex=True,
            keep_separator=False,
        ).split_text("aaaa123bbbb456cccc")
        assert all(not any(ch.isdigit() for ch in c) for c in chunks)
        assert all(len(c) <= 10 for c in chunks)
        assert "".join(chunks) == "aaaabbbbcccc"

    def test_small_text_passthrough(self):
        assert RecursiveCharacterTextSplitter(
            chunk_size=100, chunk_overlap=10
        ).split_text("short") == ["short"]


class TestSemantic:
    CORPUS = (
        "Cats are small felines. They purr and nap all day. Kittens play with yarn. "
        "The bond market fell sharply. Yields rose on inflation data. "
        "Central banks signaled further hikes."
    )

    @pytest.mark.parametrize(
        "ttype", ["percentile", "standard_deviation", "interquartile", "gradient"]
    )
    def test_threshold_types_produce_chunks(self, ttype):
        ch = SemanticChunker(
            HashEmbeddings(dim=32),
            breakpoint_threshold_type=ttype,
            breakpoint_threshold_amount=50.0 if "percent" in ttype or ttype == "gradient" else 0.5,
        )
        chunks = ch.split_text(self.CORPUS)
        assert chunks
        assert "".join(self.CORPUS.split()) == "".join("".join(chunks).split())

    def test_topic_boundary_detected(self):
        ch = SemanticChunker(
            HashEmbeddings(dim=64),
            breakpoint_threshold_type="percentile",
            breakpoint_threshold_amount=70.0,
        )
        chunks = ch.split_text(self.CORPUS)
        assert len(chunks) >= 2
        assert "Cats" in chunks[0] and "banks" in chunks[-1]

    def test_number_of_chunks_interpolation(self):
        ch = SemanticChunker(HashEmbeddings(dim=32), number_of_chunks=3)
        chunks = ch.split_text(self.CORPUS)
        assert 1 <= len(chunks) <= 5  # interpolation is approximate

    def test_min_chunk_size(self):
        ch = SemanticChunker(
            HashEmbeddings(dim=32),
            breakpoint_threshold_amount=10.0,
            min_chunk_size=60,
        )
        chunks = ch.split_text(self.CORPUS)
        assert all(len(c) >= 60 for c in chunks[:-1])

    def test_single_sentence_passthrough(self):
        ch = SemanticChunker(HashEmbeddings(dim=32))
        assert ch.split_text("One sentence only") == ["One sentence only"]
        assert ch.split_text("  ") == []

    def test_bad_threshold_type(self):
        with pytest.raises(ValueError):
            SemanticChunker(HashEmbeddings(dim=8), breakpoint_threshold_type="nope")


class TestReviewRegressions:
    def test_hard_split_no_suffix_duplicate_chunk(self):
        import string

        s = RecursiveCharacterTextSplitter(chunk_size=40, chunk_overlap=10)
        # separator-free (no '#'/newlines) but position-distinct content
        alpha = string.ascii_letters + string.digits
        text = "".join(alpha[i % len(alpha)] for i in range(100))
        chunks = s.split_text(text)
        for a, b in zip(chunks, chunks[1:]):
            assert not a.endswith(b), (a, b)  # no pure-suffix duplicates
        # full coverage with the 10-char overlaps intact
        assert chunks[0] == text[:40] and chunks[-1].endswith(text[-1])

    def test_markdown_subchunk_no_suffix_duplicate(self):
        s = MarkdownHeaderTextSplitter(max_chars=40, overlap=10)
        body = "".join(chr(33 + i % 90) for i in range(100))
        docs = s.split_text("# H\n" + body)
        contents = [d.content for d in docs]
        for a, b in zip(contents, contents[1:]):
            assert not a.endswith(b)

    def test_markdown_overlap_must_be_smaller(self):
        with pytest.raises(ValueError, match="overlap"):
            MarkdownHeaderTextSplitter(max_chars=100, overlap=100)

    def test_gradient_with_chunk_count_honors_count(self):
        """number_of_chunks interpolates a DISTANCE percentile; under
        gradient mode the comparison must use distances too, or the
        requested count is ignored (measured: always 1 chunk)."""
        emb = HashEmbeddings(dim=32)
        text = ". ".join(
            f"sentence about topic {i // 4} number {i}" for i in range(24)
        ) + "."
        chunker = SemanticChunker(
            emb, breakpoint_threshold_type="gradient", number_of_chunks=5
        )
        chunks = chunker.split_text(text)
        assert len(chunks) > 1, chunks

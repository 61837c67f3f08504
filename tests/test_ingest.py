"""Ingestion tool tests: directory → parse → chunk → index → snapshots →
reload → query."""

import json

import pytest

from rag_arc_tpu.index.persistence import load_store
from rag_arc_tpu.models.embeddings import HashEmbeddings
from rag_arc_tpu.retrieval.bm25 import BM25Retriever
from rag_arc_tpu.tools.ingest import ingest, main
from tests.test_parsing import TestHtml, make_docx, make_xlsx


@pytest.fixture
def corpus_dir(tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    make_docx(docs)
    make_xlsx(docs)
    (docs / "page.html").write_text(TestHtml.HTML)
    return docs


def test_ingest_end_to_end(corpus_dir, tmp_path):
    out = tmp_path / "snap"
    stats = ingest(corpus_dir, out, chunk_size=200, overlap=20, bm25=True)
    assert stats["files"] == 3
    assert stats["chunks"] >= 3
    store = load_store(stats["dense_snapshot"], HashEmbeddings(dim=64))
    hits = store.similarity_search("first paragraph continues", k=1)
    assert "First paragraph" in hits[0].content
    assert hits[0].metadata["source"].endswith("test.docx")
    sparse = BM25Retriever.load_from_disk(stats["bm25_snapshot"])
    assert sparse.invoke("alice score", k=1)

    # snapshots drive a registry-built pipeline
    from rag_arc_tpu.serving.configs import PipelineConfig

    cfg = PipelineConfig.model_validate(
        {
            "type": "PIPELINE",
            "retriever": {
                "type": "DENSE",
                "embeddings": {"type": "HASH_EMBEDDINGS", "dim": 64},
                "store_path": stats["dense_snapshot"],
                "k": 2,
            },
        }
    )
    pipeline = cfg.build()
    docs = pipeline.query_batch(["page title section"])[0]
    assert docs


def test_cli(corpus_dir, tmp_path, capsys):
    rc = main([str(corpus_dir), "-o", str(tmp_path / "s"), "--chunker", "markdown"])
    assert rc == 0
    assert "chunks:" in capsys.readouterr().out


def test_empty_dir_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="nothing"):
        ingest(tmp_path / "empty", tmp_path / "out")


def test_ingest_blob_docstore(corpus_dir, tmp_path):
    from rag_arc_tpu.index.blob_docstore import BlobDocstore

    out = tmp_path / "snap_blob"
    stats = ingest(corpus_dir, out, chunk_size=200, overlap=20, blob_docstore=True)
    store = load_store(stats["dense_snapshot"], HashEmbeddings(dim=64))
    assert isinstance(store.docstore, BlobDocstore)
    hits = store.similarity_search("first paragraph continues", k=1)
    assert "First paragraph" in hits[0].content


def test_ingest_cli_blob_flag(corpus_dir, tmp_path, capsys):
    rc = main(
        [str(corpus_dir), "-o", str(tmp_path / "cli_snap"), "--blob-docstore"]
    )
    assert rc == 0
    assert (tmp_path / "cli_snap" / "dense" / "docstore_blob" / "blob.jsonl").exists()

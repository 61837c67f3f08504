"""Disk-backed docstore tests: interface parity with the RAM Docstore,
store integration, persistence round-trip, and the 1M-doc host-memory
ceiling (VERDICT r1 #8)."""

import resource

import numpy as np
import pytest

from rag_arc_tpu.index.blob_docstore import BlobDocstore
from rag_arc_tpu.index.docstore import Docstore
from rag_arc_tpu.index.persistence import load_store, save_store
from rag_arc_tpu.index.vector_store import TPUVectorStore
from rag_arc_tpu.models.embeddings import HashEmbeddings
from rag_arc_tpu.utils.data_model import Document


def make_docs(n, prefix="doc"):
    return [
        Document(content=f"{prefix} {i} content", metadata={"i": i}, id=f"{prefix}-{i}")
        for i in range(n)
    ]


class TestInterfaceParity:
    """Both docstores run the same op sequence and must agree."""

    @pytest.fixture
    def stores(self, tmp_path):
        return Docstore(), BlobDocstore(tmp_path / "blob")

    def test_add_get_roundtrip(self, stores):
        ram, blob = stores
        docs = make_docs(20)
        for store in (ram, blob):
            ids = store.add(docs, list(range(20)))
            assert ids == [f"doc-{i}" for i in range(20)]
        for pos in (0, 7, 19):
            assert ram.get_by_position(pos).content == blob.get_by_position(pos).content
            assert blob.get_by_position(pos).metadata == {"i": pos}
        assert blob.position_of("doc-7") == 7
        assert blob.get_by_ids(["doc-3", "missing", "doc-9"]) == ram.get_by_ids(
            ["doc-3", "missing", "doc-9"]
        )
        assert len(blob) == len(ram) == 20
        assert "doc-3" in blob and "nope" not in blob

    def test_delete_and_overwrite(self, stores):
        ram, blob = stores
        docs = make_docs(10)
        for store in (ram, blob):
            store.add(docs, list(range(10)))
            freed = store.delete(["doc-3", "doc-4", "missing"])
            assert sorted(freed) == [3, 4]
            assert store.get_by_position(3) is None
            assert len(store) == 8
            # overwrite doc-5 at a new position
            store.add(
                [Document(content="rewritten", metadata={}, id="doc-5")], [11]
            )
            assert store.position_of("doc-5") == 11
            assert store.get_by_position(5) is None
            assert store.get_by_position(11).content == "rewritten"
            assert len(store) == 8

    def test_reassign(self, stores):
        ram, blob = stores
        docs = make_docs(6)
        for store in (ram, blob):
            store.add(docs, [0, 2, 4, 6, 8, 10])
            store.reassign({0: 0, 2: 1, 4: 2, 6: 3, 8: 4, 10: 5})
            for i in range(6):
                assert store.get_by_position(i).id == f"doc-{i}"
                assert store.position_of(f"doc-{i}") == i

    def test_items_and_all_ids(self, stores):
        _, blob = stores
        blob.add(make_docs(5), list(range(5)))
        blob.delete(["doc-2"])
        assert sorted(blob.all_ids()) == ["doc-0", "doc-1", "doc-3", "doc-4"]
        items = dict(blob.items())
        assert set(items) == {"doc-0", "doc-1", "doc-3", "doc-4"}
        assert items["doc-3"].content == "doc 3 content"


class TestStoreIntegration:
    def test_vector_store_with_blob_docstore(self, tmp_path):
        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore(emb, docstore_path=str(tmp_path / "ds"))
        texts = [f"document number {i} about topic {i % 5}" for i in range(50)]
        store.add_texts(texts)
        hits = store.similarity_search(texts[17], k=1)
        assert hits[0].content == texts[17]
        ids = store.add_texts(["kill me"])
        store.delete(ids)
        assert "kill me" not in [
            d.content for d in store.similarity_search("kill me", k=5)
        ]

    def test_persistence_roundtrip_blob(self, tmp_path):
        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore(emb, docstore_path=str(tmp_path / "ds"))
        texts = [f"document number {i} about topic {i % 5}" for i in range(30)]
        store.add_texts(texts)
        save_store(store, tmp_path / "snap")
        loaded = load_store(tmp_path / "snap", emb)
        assert isinstance(loaded.docstore, BlobDocstore)
        assert len(loaded) == 30
        got = loaded.similarity_search(texts[11], k=1)
        assert got[0].content == texts[11]
        # the loaded store accepts further mutation
        loaded.add_texts(["brand new"])
        assert loaded.similarity_search("brand new", k=1)[0].content == "brand new"

    def test_compaction_reassigns_blob(self, tmp_path):
        emb = HashEmbeddings(dim=16)
        store = TPUVectorStore(
            emb, docstore_path=str(tmp_path / "ds"), compact_threshold=0.01
        )
        texts = [f"text {i} unique" for i in range(20)]
        ids = store.add_texts(texts)
        store.delete(ids[:10])  # triggers compaction
        assert store.index.n_deleted == 0
        hit = store.similarity_search("text 15 unique", k=1)[0]
        assert hit.content == "text 15 unique"


class TestScale:
    def test_1m_docs_bounded_ram(self, tmp_path):
        """Ingest 1M documents; host RSS growth must stay bounded (the RAM
        Docstore would hold ~1M Document objects, hundreds of MB+); reads
        come back through the mmap."""
        blob = BlobDocstore(tmp_path / "big")
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KB on linux
        n, batch = 1_000_000, 50_000
        for start in range(0, n, batch):
            docs = [
                Document(
                    content=f"document {i} body text payload",
                    metadata={},
                    id=f"d{i}",
                )
                for i in range(start, start + batch)
            ]
            blob.add(docs, list(range(start, start + batch)))
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        growth_mb = (rss1 - rss0) / 1024
        assert len(blob) == n
        # numpy bookkeeping is ~28 B/doc ≈ 28 MB; give generous slack for
        # allocator noise but stay far below a RAM-resident docstore
        assert growth_mb < 300, f"RSS grew {growth_mb:.0f} MB for 1M docs"
        # random access through the mmap
        for pos in (0, 123_456, 999_999):
            doc = blob.get_by_position(pos)
            assert doc.id == f"d{pos}"
        assert blob.position_of("d777777") == 777_777
        # deletes and re-reads still work at scale
        assert blob.delete(["d500000"]) == [500_000]
        assert blob.get_by_position(500_000) is None


def test_duplicate_id_within_one_batch(tmp_path):
    blob = BlobDocstore(tmp_path / "dup")
    blob.add(
        [Document(content="v1", id="x"), Document(content="v2", id="x")], [0, 1]
    )
    assert len(blob) == 1
    assert blob.position_of("x") == 1
    assert blob.get_by_position(0) is None
    assert blob.get_by_position(1).content == "v2"


def test_pending_hash_collision_keeps_both_ids(tmp_path, monkeypatch):
    """Two DISTINCT ids whose 64-bit hashes collide inside one merge
    window must both stay findable — the pending overlay was a single
    slot per hash and silently orphaned the earlier id's record."""
    import rag_arc_tpu.index.blob_docstore as bd

    monkeypatch.setattr(bd, "_id_hash", lambda doc_id: 42)  # force collision
    store = bd.BlobDocstore(tmp_path / "blob")
    store.add(
        [Document(content="first", id="a"), Document(content="second", id="b")],
        [0, 1],
    )
    assert store.position_of("a") == 0
    assert store.position_of("b") == 1
    assert store.get_by_ids(["a"])[0].content == "first"


def test_failed_serialization_leaves_store_consistent(tmp_path):
    """A non-JSON-serializable metadata value mid-batch must not leave
    tombstoned old slots and offsets pointing at bytes never written."""
    import numpy as np
    import pytest

    from rag_arc_tpu.index.blob_docstore import BlobDocstore

    store = BlobDocstore(tmp_path / "blob")
    store.add([Document(content="keep me", id="k")], [0])
    bad = Document(content="x", id="k", metadata={"v": np.float32(1.0)})
    with pytest.raises(TypeError):
        store.add([Document(content="ok", id="o"), bad], [1, 2])
    # nothing from the failed batch landed; the old record survives
    assert len(store) == 1
    assert store.get_by_ids(["k"])[0].content == "keep me"
    assert store.position_of("o") is None

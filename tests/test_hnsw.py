"""Native C++ HNSW tests: recall vs flat oracle, deletes, persistence."""

import numpy as np
import pytest

from rag_arc_tpu.index.flat import DeviceFlatIndex
from rag_arc_tpu.index.hnsw import HNSWIndex


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    data = rng.standard_normal((3000, 48)).astype(np.float32)
    queries = data[rng.integers(0, 3000, 50)] + 0.02 * rng.standard_normal(
        (50, 48)
    ).astype(np.float32)
    return data, queries


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_recall_vs_flat(corpus, metric):
    data, queries = corpus
    flat = DeviceFlatIndex(dim=48, metric=metric, capacity=4096)
    flat.add(data)
    _, exact = flat.search(queries, 10)
    hnsw = HNSWIndex(dim=48, metric=metric, M=16, ef_construction=100)
    hnsw.add(data)
    _, approx = hnsw.search(queries, 10, ef=128)
    recall = np.mean(
        [len(set(exact[i]) & set(approx[i])) / 10 for i in range(len(queries))]
    )
    assert recall > 0.9, f"HNSW recall {recall} too low for {metric}"


def test_ef_improves_recall(corpus):
    data, queries = corpus
    flat = DeviceFlatIndex(dim=48, capacity=4096)
    flat.add(data)
    _, exact = flat.search(queries, 10)
    hnsw = HNSWIndex(dim=48, M=8, ef_construction=60)
    hnsw.add(data)

    def recall(ef):
        _, got = hnsw.search(queries, 10, ef=ef)
        return np.mean(
            [len(set(exact[i]) & set(got[i])) / 10 for i in range(len(queries))]
        )

    assert recall(200) >= recall(16) - 1e-9


def test_incremental_adds(corpus):
    data, _ = corpus
    hnsw = HNSWIndex(dim=48)
    p1 = hnsw.add(data[:100])
    p2 = hnsw.add(data[100:200])
    assert p1.tolist() == list(range(100))
    assert p2.tolist() == list(range(100, 200))
    _, ids = hnsw.search(data[150:151], 1)
    assert ids[0, 0] == 150


def test_delete(corpus):
    data, _ = corpus
    hnsw = HNSWIndex(dim=48)
    hnsw.add(data[:500])
    q = data[42:43]
    _, ids = hnsw.search(q, 1)
    assert ids[0, 0] == 42
    hnsw.mark_deleted(np.array([42]))
    _, ids = hnsw.search(q, 5)
    assert 42 not in ids[0]
    assert hnsw.n_active == 499


def test_take(corpus):
    data, _ = corpus
    hnsw = HNSWIndex(dim=48, metric="l2")
    hnsw.add(data[:10])
    np.testing.assert_allclose(hnsw.take([3, 7]), data[[3, 7]], rtol=1e-6)


def test_empty_search():
    hnsw = HNSWIndex(dim=8)
    scores, ids = hnsw.search(np.zeros((1, 8), np.float32), 3)
    assert (ids == -1).all() and np.isneginf(scores).all()


def test_persistence_roundtrip(corpus, tmp_path):
    data, queries = corpus
    hnsw = HNSWIndex(dim=48, M=16)
    hnsw.add(data[:1000])
    s1, p1 = hnsw.search(queries[:5], 5)
    path = tmp_path / "index.hnsw"
    hnsw.save(path)
    loaded = HNSWIndex.load(path)
    assert loaded.size == 1000 and loaded.dim == 48 and loaded.M == 16
    s2, p2 = loaded.search(queries[:5], 5)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    # adds continue after load
    loaded.add(data[1000:1010])
    assert loaded.size == 1010


def test_stats():
    hnsw = HNSWIndex(dim=8, M=4)
    hnsw.add(np.random.default_rng(0).standard_normal((20, 8)).astype(np.float32))
    s = hnsw.stats()
    assert s["kind"] == "hnsw" and s["size"] == 20 and s["backend"] == "native-c++"


def test_bad_metric():
    with pytest.raises(ValueError):
        HNSWIndex(dim=8, metric="hamming")


# -- SQ8 quantized storage --------------------------------------------------


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_sq8_recall_vs_flat(corpus, metric):
    data, queries = corpus
    flat = DeviceFlatIndex(dim=48, metric=metric, capacity=4096)
    flat.add(data)
    _, exact = flat.search(queries, 10)
    hnsw = HNSWIndex(
        dim=48, metric=metric, M=16, ef_construction=100, quantize=True
    )
    hnsw.add(data)
    _, approx = hnsw.search(queries, 10, ef=128)
    recall = np.mean(
        [len(set(exact[i]) & set(approx[i])) / 10 for i in range(len(queries))]
    )
    assert recall > 0.85, f"SQ8 HNSW recall {recall} too low for {metric}"
    assert hnsw.stats()["quantized"] is True
    assert hnsw.stats()["vector_bytes"] == 3000 * 48  # 1 byte/component


def test_sq8_take_dequantizes(corpus):
    data, _ = corpus
    hnsw = HNSWIndex(dim=48, metric="l2", quantize=True)
    hnsw.add(data[:100])
    got = hnsw.take(np.arange(10))
    # per-vector symmetric int8: relative error bounded by scale/2 = amax/254
    amax = np.abs(data[:10]).max(axis=1, keepdims=True)
    np.testing.assert_allclose(got, data[:10], atol=float(amax.max()) / 200)


def test_sq8_persistence_roundtrip(corpus, tmp_path):
    data, queries = corpus
    hnsw = HNSWIndex(dim=48, metric="cosine", M=16, quantize=True)
    hnsw.add(data[:500])
    hnsw.mark_deleted(np.asarray([3, 7]))
    s0, p0 = hnsw.search(queries[:5], 5)
    path = tmp_path / "sq8.hnsw"
    hnsw.save(path)
    back = HNSWIndex.load(path)
    assert back.quantize is True
    assert back.n_deleted == 2
    s1, p1 = back.search(queries[:5], 5)
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)


def test_store_dtype_int8_selects_sq8_hnsw():
    from rag_arc_tpu.index.vector_store import TPUVectorStore
    from rag_arc_tpu.models.embeddings import HashEmbeddings
    import numpy as _np

    store = TPUVectorStore(
        embedding=HashEmbeddings(dim=32), dim=32, index_type="hnsw",
        dtype=_np.int8,
    )
    store.add_texts(["alpha beta", "gamma delta", "epsilon zeta"])
    assert store.index.stats()["quantized"] is True
    docs = store.similarity_search("alpha beta", k=1)
    assert docs[0].content == "alpha beta"


# -- product quantization (FAISS IndexHNSWPQ parity) ------------------------


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_pq_recall_vs_flat(corpus, metric):
    data, queries = corpus
    flat = DeviceFlatIndex(dim=48, metric=metric, capacity=4096)
    flat.add(data)
    _, exact = flat.search(queries, 10)
    # gaussian data is PQ's worst case (no cluster structure for the
    # codebooks to exploit); dsub=2 keeps the test meaningful — measured
    # recall ~0.89 here vs ~0.64 at dsub=4, while real embedding corpora
    # (low intrinsic dimension) tolerate dsub=8 (dim=768 → m=96, 32x)
    hnsw = HNSWIndex(
        dim=48, metric=metric, M=16, ef_construction=100,
        pq_m=24, pq_train_threshold=1024,
    )
    hnsw.add(data)  # one add above the threshold: trains + builds
    assert hnsw.stats()["pq_trained"] is True
    assert hnsw.stats()["staged"] == 0
    _, approx = hnsw.search(queries, 10, ef=128)
    recall = np.mean(
        [len(set(exact[i]) & set(approx[i])) / 10 for i in range(len(queries))]
    )
    assert recall > 0.8, f"PQ HNSW recall {recall} too low for {metric}"


def test_pq_memory_stats(corpus):
    data, _ = corpus
    hnsw = HNSWIndex(dim=48, pq_m=12, pq_train_threshold=1024)
    hnsw.add(data)
    stats = hnsw.stats()
    assert stats["storage"] == "pq"
    # 12 bytes/vector + codebooks (12 * 256 * 4 dims * 4 bytes)
    assert stats["vector_bytes"] == 3000 * 12 + 12 * 256 * 4 * 4
    # 16x less per-vector storage than f32
    assert 3000 * 12 * 16 == 3000 * 48 * 4


def test_pq_staged_search_is_exact_before_training(corpus):
    data, _ = corpus
    hnsw = HNSWIndex(dim=48, metric="l2", pq_m=12, pq_train_threshold=4096)
    pos = hnsw.add(data[:100])
    np.testing.assert_array_equal(pos, np.arange(100))
    assert hnsw.stats()["pq_trained"] is False
    assert hnsw.size == 100
    # staged search is a brute-force exact scan
    s, p = hnsw.search(data[:3], 1)
    np.testing.assert_array_equal(p[:, 0], [0, 1, 2])
    # staged deletes and take work
    hnsw.mark_deleted(np.asarray([1]))
    _, p = hnsw.search(data[1:2], 1)
    assert p[0, 0] != 1
    np.testing.assert_allclose(hnsw.take(np.asarray([2])), data[2:3])


def test_pq_flush_preserves_positions_and_deletes(corpus):
    data, queries = corpus
    hnsw = HNSWIndex(
        dim=48, metric="l2", M=16, pq_m=12, pq_train_threshold=2048
    )
    hnsw.add(data[:1000])     # staged
    hnsw.mark_deleted(np.asarray([5, 6]))
    pos2 = hnsw.add(data[1000:3000])  # crosses threshold: trains + flushes
    np.testing.assert_array_equal(pos2[:3], [1000, 1001, 1002])
    assert hnsw.stats()["pq_trained"] is True
    assert hnsw.n_deleted == 2
    # a search for (deleted) row 5's vector must not return 5 or 6
    _, p = hnsw.search(data[5:6], 5, ef=64)
    assert 5 not in p[0] and 6 not in p[0]
    # position semantics survive the flush: row 42's nearest is 42
    _, p = hnsw.search(data[42:43], 1, ef=64)
    assert p[0, 0] == 42


def test_pq_persistence_roundtrip(corpus, tmp_path):
    data, queries = corpus
    hnsw = HNSWIndex(
        dim=48, metric="cosine", M=16, pq_m=12, pq_train_threshold=1024
    )
    hnsw.add(data[:2000])
    hnsw.mark_deleted(np.asarray([3, 7]))
    s0, p0 = hnsw.search(queries[:5], 5)
    path = tmp_path / "pq.hnsw"
    hnsw.save(path)
    back = HNSWIndex.load(path)
    assert back.pq_m == 12
    assert back.n_deleted == 2
    assert back.stats()["storage"] == "pq"
    s1, p1 = back.search(queries[:5], 5)
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)


def test_pq_save_trains_pending_staging(corpus, tmp_path):
    data, _ = corpus
    hnsw = HNSWIndex(dim=48, pq_m=12, pq_train_threshold=4096)
    hnsw.add(data[:500])  # staged (below threshold, above 256)
    path = tmp_path / "staged.hnsw"
    # trains on what it has rather than losing data, but warns that the
    # training set is below the configured threshold (codebooks freeze
    # into the snapshot)
    with pytest.warns(UserWarning, match="pq_train_threshold"):
        hnsw.save(path)
    back = HNSWIndex.load(path)
    assert back.size == 500
    _, p = back.search(data[10:11], 1, ef=64)
    assert p[0, 0] == 10


def test_pq_save_empty_untrained_raises(tmp_path):
    # an untrained PQ index with zero staged rows used to write an
    # unloadable V3 snapshot (empty codebooks); it must raise instead
    hnsw = HNSWIndex(dim=48, pq_m=12)
    with pytest.raises(IOError, match="untrained PQ"):
        hnsw.save(tmp_path / "empty.hnsw")
    # and with a handful of rows (below the 256 minimum) it also raises
    hnsw.add(np.random.default_rng(0).standard_normal((10, 48)).astype(np.float32))
    with pytest.raises(IOError, match="untrained PQ"):
        hnsw.save(tmp_path / "tiny.hnsw")


def test_pq_validation():
    with pytest.raises(ValueError, match="divide"):
        HNSWIndex(dim=48, pq_m=7)
    with pytest.raises(ValueError, match="ONE of"):
        HNSWIndex(dim=48, pq_m=12, quantize=True)


def test_store_hnsw_pq_mode():
    from rag_arc_tpu.index.vector_store import TPUVectorStore
    from rag_arc_tpu.models.embeddings import HashEmbeddings

    store = TPUVectorStore(
        embedding=HashEmbeddings(dim=32), dim=32, index_type="hnsw",
        hnsw_pq_m=8,
    )
    store.add_texts([f"doc number {i}" for i in range(40)])
    assert store.index.stats()["storage"] == "pq"
    docs = store.similarity_search("doc number 17", k=1)
    assert docs[0].content == "doc number 17"


def _neardup_corpus(n=2400, dim=48, seed=3):
    """Adversarial for PQ: clusters whose in-cluster spread (0.1) sits
    between SQ8's score resolution (~0.01 on unit vectors) and PQ's
    dsub=4 cell size — so the PQ metric confuses cluster siblings while
    the SQ8 rescore separates them (measured here: plain 0.64, refined
    0.90). Tighter spreads defeat BOTH quantizers; wider ones defeat
    neither."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n // 16, dim)).astype(np.float32)
    data = np.repeat(centers, 16, axis=0) + 0.1 * rng.standard_normal(
        (n, dim)
    ).astype(np.float32)
    queries = data[rng.integers(0, n, 40)] + 0.033 * rng.standard_normal(
        (40, dim)
    ).astype(np.float32)
    return data, queries


def test_pq_refine_recovers_neardup_recall():
    data, queries = _neardup_corpus()
    flat = DeviceFlatIndex(dim=48, capacity=4096)
    flat.add(data)
    _, exact = flat.search(queries, 10)

    plain = HNSWIndex(dim=48, M=16, pq_m=12, pq_train_threshold=1024)
    plain.add(data)
    refined = HNSWIndex(
        dim=48, M=16, pq_m=12, pq_train_threshold=1024, pq_refine=True
    )
    refined.add(data)

    def recall(idx):
        _, got = idx.search(queries, 10, ef=256)
        return np.mean(
            [len(set(exact[i]) & set(got[i])) / 10 for i in range(len(queries))]
        )

    r_plain, r_ref = recall(plain), recall(refined)
    assert r_ref > 0.8, f"refined recall {r_ref} too low"
    assert r_ref >= r_plain + 0.15, (
        f"refine should lift near-dup recall substantially "
        f"(plain {r_plain:.3f}, refined {r_ref:.3f})"
    )


def test_pq_refine_roundtrip(tmp_path):
    data, queries = _neardup_corpus(n=1600)
    hnsw = HNSWIndex(
        dim=48, M=16, pq_m=12, pq_train_threshold=1024, pq_refine=True
    )
    hnsw.add(data)
    hnsw.mark_deleted(np.asarray([5]))
    s0, p0 = hnsw.search(queries[:8], 5)
    path = tmp_path / "ref.hnsw"
    hnsw.save(path)
    assert (tmp_path / "ref.hnsw.refine.npz").exists()
    back = HNSWIndex.load(path)
    assert back.pq_refine and back.stats()["storage"] == "pq+refine"
    s1, p1 = back.search(queries[:8], 5)
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)


def test_pq_aggressive_config_warns():
    with pytest.warns(UserWarning, match="pq_refine"):
        HNSWIndex(dim=64, pq_m=8)  # dsub=8, no refine -> warn


def test_staged_delete_rejects_sentinels_and_dupes():
    """mark_deleted(-1) on a staged (untrained-PQ) index silently
    tombstoned the LAST staged doc via wraparound; duplicate deletes
    overcounted n_deleted (n_active drives caller behavior)."""
    idx = HNSWIndex(dim=8, pq_m=4, pq_train_threshold=4096)
    idx.add(np.random.default_rng(0).standard_normal((10, 8)).astype(np.float32))
    idx.mark_deleted(np.asarray([-1, 100]))  # sentinels/out of range: no-ops
    assert idx.n_deleted == 0
    s, p = idx.search(np.zeros((1, 8), np.float32), k=10)
    assert (p[0] >= 0).sum() == 10  # nobody tombstoned
    idx.mark_deleted(np.asarray([3, 3]))
    idx.mark_deleted(np.asarray([3]))
    assert idx.n_deleted == 1


def test_take_rejects_miss_sentinel():
    idx = HNSWIndex(dim=8)
    idx.add(np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32))
    with pytest.raises(ValueError, match="positions"):
        idx.take(np.asarray([-1]))


def test_trained_double_delete_counts_once():
    idx = HNSWIndex(dim=8)
    idx.add(np.random.default_rng(0).standard_normal((20, 8)).astype(np.float32))
    idx.mark_deleted(np.asarray([5, 5, 7]))
    idx.mark_deleted(np.asarray([5]))
    assert idx.n_deleted == 2

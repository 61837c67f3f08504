"""DeviceFlatIndex tests: exactness vs numpy oracle, all metrics,
tombstoning, growth, compaction, and mesh-sharded search."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_arc_tpu.index.flat import DeviceFlatIndex
from rag_arc_tpu.parallel.mesh import default_mesh


def numpy_topk(queries, corpus, k, metric):
    if metric == "cosine":
        q = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        c = corpus / np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-12)
        scores = q @ c.T
    elif metric == "ip":
        scores = queries @ corpus.T
    else:  # l2 — negative squared distance
        scores = -(
            (queries**2).sum(1, keepdims=True)
            - 2 * queries @ corpus.T
            + (corpus**2).sum(1)[None, :]
        )
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


@pytest.mark.parametrize("metric", ["cosine", "ip", "l2"])
def test_exact_topk_matches_oracle(rng, metric):
    corpus = rng.standard_normal((500, 32)).astype(np.float32)
    queries = rng.standard_normal((7, 32)).astype(np.float32)
    index = DeviceFlatIndex(dim=32, metric=metric, capacity=512)
    index.add(corpus)
    scores, positions = index.search(queries, k=10)
    o_scores, o_idx = numpy_topk(queries, corpus, 10, metric)
    # position sets must match (scores can tie); top-1 must match exactly
    for b in range(7):
        assert positions[b, 0] == o_idx[b, 0]
        assert set(positions[b]) == set(o_idx[b])
    np.testing.assert_allclose(scores, o_scores, rtol=1e-4, atol=1e-4)


def test_incremental_adds_equal_bulk(rng):
    data = rng.standard_normal((300, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    bulk = DeviceFlatIndex(dim=16, capacity=512)
    bulk.add(data)
    inc = DeviceFlatIndex(dim=16, capacity=512)
    for chunk in np.array_split(data, 7):
        inc.add(chunk)
    s1, p1 = bulk.search(q, k=5)
    s2, p2 = inc.search(q, k=5)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_growth(rng):
    index = DeviceFlatIndex(dim=8, capacity=1024)
    start_cap = index.capacity
    data = rng.standard_normal((3000, 8)).astype(np.float32)
    pos = index.add(data)
    assert index.capacity > start_cap
    assert pos.tolist() == list(range(3000))
    q = data[42:43]
    _, positions = index.search(q, k=1)
    assert positions[0, 0] == 42


def test_tombstone_excludes_deleted(rng):
    data = rng.standard_normal((100, 8)).astype(np.float32)
    index = DeviceFlatIndex(dim=8)
    index.add(data)
    q = data[5:6]
    _, p = index.search(q, k=1)
    assert p[0, 0] == 5
    index.mark_deleted(np.array([5]))
    _, p = index.search(q, k=3)
    assert 5 not in p[0]
    assert index.n_active == 99


def test_search_smaller_than_k(rng):
    index = DeviceFlatIndex(dim=8)
    index.add(rng.standard_normal((3, 8)).astype(np.float32))
    scores, positions = index.search(rng.standard_normal((1, 8)), k=10)
    assert positions.shape == (1, 10)
    assert (positions[0, :3] >= 0).all()
    assert (positions[0, 3:] == -1).all()
    assert np.isneginf(scores[0, 3:]).all()


def test_empty_index_returns_minus_one(rng):
    index = DeviceFlatIndex(dim=8)
    scores, positions = index.search(rng.standard_normal((2, 8)), k=4)
    assert (positions == -1).all()


def test_compact(rng):
    data = rng.standard_normal((50, 8)).astype(np.float32)
    index = DeviceFlatIndex(dim=8)
    index.add(data)
    index.mark_deleted(np.arange(0, 50, 2))  # delete even rows
    mapping = index.compact()
    assert index.n_active == 25
    assert index.size == 25
    # odd original rows survive, remapped densely
    assert mapping == {old: new for new, old in enumerate(range(1, 50, 2))}
    q = data[31:32]
    _, p = index.search(q, k=1)
    assert p[0, 0] == mapping[31]


def test_take(rng):
    data = rng.standard_normal((20, 8)).astype(np.float32)
    index = DeviceFlatIndex(dim=8, metric="ip")  # ip: no normalize at add
    index.add(data)
    got = index.take(np.array([3, 7]))
    np.testing.assert_allclose(got, data[[3, 7]], rtol=1e-6)


def test_bad_inputs(rng):
    index = DeviceFlatIndex(dim=8)
    with pytest.raises(ValueError):
        index.add(rng.standard_normal((3, 9)))
    with pytest.raises(ValueError):
        index.search(rng.standard_normal((1, 8)), k=0)
    with pytest.raises(ValueError):
        index.search(rng.standard_normal((1, 9)), k=1)
    with pytest.raises(ValueError):
        DeviceFlatIndex(dim=8, metric="hamming").search(rng.standard_normal((1, 8)), 1)


class TestSharded:
    def test_sharded_matches_single_device(self, rng):
        assert len(jax.devices()) == 8, "conftest must emulate 8 CPU devices"
        mesh = default_mesh()
        corpus = rng.standard_normal((2000, 32)).astype(np.float32)
        queries = rng.standard_normal((5, 32)).astype(np.float32)

        single = DeviceFlatIndex(dim=32, capacity=2048)
        single.add(corpus)
        sharded = DeviceFlatIndex(dim=32, capacity=2048, mesh=mesh)
        sharded.add(corpus)

        s1, p1 = single.search(queries, k=10)
        s2, p2 = sharded.search(queries, k=10)
        for b in range(5):
            assert set(p1[b]) == set(p2[b])
        np.testing.assert_allclose(np.sort(s1, 1), np.sort(s2, 1), rtol=1e-4)

    def test_sharded_delete_and_grow(self, rng):
        mesh = default_mesh()
        index = DeviceFlatIndex(dim=16, capacity=1024, mesh=mesh)
        data = rng.standard_normal((3000, 16)).astype(np.float32)
        index.add(data)  # forces growth across shards
        q = data[100:101]
        _, p = index.search(q, k=1)
        assert p[0, 0] == 100
        index.mark_deleted(np.array([100]))
        _, p = index.search(q, k=1)
        assert p[0, 0] != 100


class TestReplicaMesh:
    def test_replica_sharded_matches_single(self, rng):
        from rag_arc_tpu.parallel.mesh import replica_mesh

        mesh = replica_mesh(replicas=2, shards=4)
        corpus = rng.standard_normal((3000, 32)).astype(np.float32)
        queries = rng.standard_normal((16, 32)).astype(np.float32)
        single = DeviceFlatIndex(dim=32, capacity=4096)
        single.add(corpus)
        repl = DeviceFlatIndex(dim=32, capacity=4096, mesh=mesh)
        assert repl.n_replicas == 2 and repl.n_shards == 4
        repl.add(corpus)
        s1, p1 = single.search(queries, k=10)
        s2, p2 = repl.search(queries, k=10)
        for b in range(16):
            assert set(p1[b]) == set(p2[b])
        np.testing.assert_allclose(np.sort(s1, 1), np.sort(s2, 1), rtol=1e-4)

    def test_replica_mesh_single_query(self, rng):
        from rag_arc_tpu.parallel.mesh import replica_mesh

        mesh = replica_mesh(replicas=2, shards=2)
        data = rng.standard_normal((500, 16)).astype(np.float32)
        index = DeviceFlatIndex(dim=16, capacity=1024, mesh=mesh)
        index.add(data)
        _, p = index.search(data[42:43], k=1)  # B=1 padded to replica multiple
        assert p[0, 0] == 42

    def test_replica_mesh_too_many_devices(self):
        from rag_arc_tpu.parallel.mesh import replica_mesh

        with pytest.raises(ValueError):
            replica_mesh(replicas=4, shards=4)  # 16 > 8 emulated devices


class TestSliceMesh:
    """DCN multi-slice layout (VERDICT r1 #6): ("slice", "replica", "data")
    mesh, hierarchical top-k merge — ICI inside the slice, one (B, k) hop
    per slice across DCN."""

    def test_sliced_matches_single(self, rng):
        from rag_arc_tpu.parallel.mesh import slice_mesh

        mesh = slice_mesh(slices=2, shards=4)  # 2 x 1 x 4 = 8 devices
        corpus = rng.standard_normal((3000, 32)).astype(np.float32)
        queries = rng.standard_normal((8, 32)).astype(np.float32)
        single = DeviceFlatIndex(dim=32, capacity=8192)
        single.add(corpus)
        sliced = DeviceFlatIndex(dim=32, capacity=8192, mesh=mesh)
        assert sliced.n_slices == 2 and sliced.n_shards == 8
        sliced.add(corpus)
        s1, p1 = single.search(queries, k=10)
        s2, p2 = sliced.search(queries, k=10)
        for b in range(8):
            assert set(p1[b]) == set(p2[b])
        np.testing.assert_allclose(np.sort(s1, 1), np.sort(s2, 1), rtol=1e-4)

    def test_sliced_with_replicas(self, rng):
        from rag_arc_tpu.parallel.mesh import slice_mesh

        mesh = slice_mesh(slices=2, shards=2, replicas=2)  # 2 x 2 x 2
        corpus = rng.standard_normal((1500, 16)).astype(np.float32)
        queries = rng.standard_normal((8, 16)).astype(np.float32)
        single = DeviceFlatIndex(dim=16, capacity=4096)
        single.add(corpus)
        index = DeviceFlatIndex(dim=16, capacity=4096, mesh=mesh)
        assert index.n_slices == 2 and index.n_replicas == 2 and index.n_shards == 4
        index.add(corpus)
        s1, p1 = single.search(queries, k=5)
        s2, p2 = index.search(queries, k=5)
        for b in range(8):
            assert set(p1[b]) == set(p2[b])
        np.testing.assert_allclose(np.sort(s1, 1), np.sort(s2, 1), rtol=1e-4)

    def test_sliced_mutation(self, rng):
        from rag_arc_tpu.parallel.mesh import slice_mesh

        mesh = slice_mesh(slices=2, shards=4)
        index = DeviceFlatIndex(dim=16, capacity=8192, mesh=mesh)
        data = rng.standard_normal((2000, 16)).astype(np.float32)
        index.add(data)
        _, p = index.search(data[7:8], k=1)
        assert p[0, 0] == 7
        index.mark_deleted(np.array([7]))
        _, p = index.search(data[7:8], k=1)
        assert p[0, 0] != 7

    def test_slice_mesh_too_many_devices(self):
        from rag_arc_tpu.parallel.mesh import slice_mesh

        with pytest.raises(ValueError):
            slice_mesh(slices=4, shards=4)


class TestInt8Index:
    """Per-row-scaled int8 storage: half the HBM of bf16, exact under the
    quantized metric, recall ~bf16 vs the f32 oracle."""

    def test_add_search_recall(self, rng):
        data = rng.standard_normal((4096, 64)).astype(np.float32)
        f32 = DeviceFlatIndex(dim=64, capacity=4096)
        f32.add(data)
        q = data[rng.integers(0, 4096, 16)] + 0.05 * rng.standard_normal(
            (16, 64)
        ).astype(np.float32)
        _, exact = f32.search(q, 10)
        i8 = DeviceFlatIndex(dim=64, capacity=4096, dtype=jnp.int8)
        i8.add(data)
        assert i8.stats()["hbm_bytes"] == 4096 * 64  # 1 byte/dim
        _, got = i8.search(q, 10)
        recall = np.mean(
            [len(set(exact[i]) & set(got[i])) / 10 for i in range(16)]
        )
        assert recall >= 0.95, recall

    def test_delete_take_compact(self, rng):
        data = rng.standard_normal((64, 16)).astype(np.float32)
        i8 = DeviceFlatIndex(dim=16, capacity=1024, dtype=jnp.int8)
        i8.add(data)
        # take() dequantizes to ~the normalized original
        got = i8.take(np.array([3]))
        want = data[3] / np.linalg.norm(data[3])
        np.testing.assert_allclose(got[0], want, atol=2e-2)
        i8.mark_deleted(np.array([0, 1]))
        mapping = i8.compact()
        assert mapping[3] == 1  # rows 0,1 dropped
        _, p = i8.search(data[3:4], 1)
        assert p[0, 0] == mapping[3]

    def test_l2_and_mesh_rejected(self):
        with pytest.raises(ValueError, match="cosine/ip"):
            DeviceFlatIndex(dim=8, metric="l2", dtype=jnp.int8)
        from rag_arc_tpu.parallel.mesh import default_mesh

        with pytest.raises(NotImplementedError):
            DeviceFlatIndex(dim=8, dtype=jnp.int8, mesh=default_mesh())

    def test_store_and_persistence_roundtrip(self, rng, tmp_path):
        from rag_arc_tpu.index.persistence import load_store, save_store
        from rag_arc_tpu.index.vector_store import TPUVectorStore
        from rag_arc_tpu.models.embeddings import HashEmbeddings

        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore(emb, dtype=jnp.int8)
        texts = [f"doc {i} flavor {i % 6}" for i in range(40)]
        store.add_texts(texts)
        assert store.index.quantized
        assert store.similarity_search(texts[7], k=1)[0].content == texts[7]
        save_store(store, tmp_path / "snap")
        loaded = load_store(tmp_path / "snap", emb)
        assert loaded.index.quantized  # restored from the manifest
        assert loaded.similarity_search(texts[7], k=1)[0].content == texts[7]

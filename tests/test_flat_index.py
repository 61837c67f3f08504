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


def test_double_delete_counts_once(rng):
    """Deleting the same position twice (a retried request) must not
    inflate n_deleted — that corrupts n_active and fires compaction early."""
    data = rng.standard_normal((100, 8)).astype(np.float32)
    index = DeviceFlatIndex(dim=8)
    index.add(data)
    index.mark_deleted(np.array([5]))
    index.mark_deleted(np.array([5, 5, 7]))
    assert index.n_deleted == 2
    assert index.n_active == 98


def test_restore_rows_requires_empty_index(rng):
    data = rng.standard_normal((64, 8)).astype(np.float32)
    index = DeviceFlatIndex(dim=8)
    index.add(data)
    with pytest.raises(ValueError, match="empty"):
        index.restore_rows(
            data, np.ones(64, np.float32), np.ones(64, bool)
        )


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

    def test_replica_mesh_odd_batch_via_search_device(self, rng):
        """The device-chained path (vector_store._batch_search_raw) pads
        batches to a power of two only; search_device itself must enforce
        the replica divisibility (B=1 on a 4-replica mesh used to crash
        shard_map)."""
        import jax.numpy as jnp

        from rag_arc_tpu.parallel.mesh import replica_mesh

        mesh = replica_mesh(replicas=4, shards=2)
        data = rng.standard_normal((512, 16)).astype(np.float32)
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        index = DeviceFlatIndex(dim=16, capacity=1024, mesh=mesh)
        index.add(data)
        s, p = index.search_device(jnp.asarray(data[7:8]), k=3)
        assert s.shape == (1, 3) and int(np.asarray(p)[0, 0]) == 7

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

    def test_chunked_matches_direct(self, rng):
        """The non-TPU big-corpus fallback (_i8_topk_chunked: lax.scan over
        row chunks, O(B·chunk) memory) must score identically to the
        direct quantized path — it's what serves int8 indexes where
        Mosaic can't lower."""
        from rag_arc_tpu.index.flat import _i8_topk_chunked, _search_single_i8

        data = rng.standard_normal((4096, 32)).astype(np.float32)
        idx = DeviceFlatIndex(dim=32, capacity=4096, dtype=jnp.int8, refine=None)
        idx.add(data)
        idx.mark_deleted(np.arange(10, 20))
        q = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
        s1, p1 = _search_single_i8(idx.emb, idx.sqnorm, idx.valid, q, 10)
        s2, p2 = _i8_topk_chunked(idx.emb, idx.sqnorm, idx.valid, q, 10, chunk=1024)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)

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
        # 1 byte/dim codes + int4 residual sidecar (dim/2 + 4 bytes/row)
        assert i8.stats()["hbm_bytes"] == 4096 * 64 + 4096 * (32 + 4)
        assert DeviceFlatIndex(
            dim=64, capacity=4096, dtype=jnp.int8, refine=None
        ).stats()["hbm_bytes"] == 4096 * 64
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

    def test_residual_refine_recall_ladder(self, rng):
        """On a near-tie cluster corpus (in-cluster spread just above the
        int8 step) the raw quantized metric confuses siblings; the
        residual ladder recovers: measured ~0.74 raw → ~0.95 int4 →
        ~0.99 int8 (offline oracle in the module docstring of the refine
        code)."""
        dim = 128
        centers = rng.standard_normal((256, dim)).astype(np.float32)
        data = (np.repeat(centers, 16, axis=0)
                + 0.03 * rng.standard_normal((4096, dim)).astype(np.float32))
        q = data[rng.integers(0, 4096, 32)] + 0.01 * rng.standard_normal(
            (32, dim)
        ).astype(np.float32)
        f32 = DeviceFlatIndex(dim=dim, capacity=4096)
        f32.add(data)
        _, exact = f32.search(q, 10)

        def recall(idx):
            _, got = idx.search(q, 10)
            return np.mean(
                [len(set(exact[i]) & set(got[i])) / 10 for i in range(32)]
            )

        plain = DeviceFlatIndex(dim=dim, capacity=4096, dtype=jnp.int8,
                                rescore_i8=False, refine=None)
        plain.add(data)
        r_plain = recall(plain)
        int4 = DeviceFlatIndex(dim=dim, capacity=4096, dtype=jnp.int8)
        assert int4.refine == "int4"  # the default for int8 storage
        int4.add(data)
        r4 = recall(int4)
        int8r = DeviceFlatIndex(dim=dim, capacity=4096, dtype=jnp.int8,
                                refine="int8")
        int8r.add(data)
        r8 = recall(int8r)
        assert r4 >= r_plain + 0.1, (r_plain, r4)
        assert r4 >= 0.85, (r_plain, r4, r8)
        assert r8 >= r4 - 0.02, (r4, r8)
        assert r8 >= 0.97, (r_plain, r4, r8)

    def test_deleted_rows_residual_is_dead(self, rng):
        """mark_deleted must silence the residual sidecar too: take()
        promises zeros for deleted rows (feeding MMR), but the refined
        reconstruct adds decode(res)·res_scale on top of the zeroed codes
        — a surviving residual returned quantization noise instead. (The
        search path is additionally shielded by the stream certificate: a
        deleted row can only enter the candidate set when the kf-th score
        ≤ 0, which fails the certificate and falls back to the masked
        kernel — this test pins the sidecar itself.)"""
        dim = 64
        data = rng.standard_normal((256, dim)).astype(np.float32)
        idx = DeviceFlatIndex(dim=dim, capacity=256, dtype=jnp.int8)
        assert idx.refine == "int4"
        idx.add(data)
        assert np.abs(idx.take(np.asarray([0]))).max() > 0
        idx.mark_deleted(np.asarray([0]))
        np.testing.assert_array_equal(idx.take(np.asarray([0])), 0.0)
        assert float(np.asarray(idx.res_scale)[0]) == 0.0
        # and search never returns it
        scores, after = idx.search(data[0:1], 5)
        assert 0 not in after[0], (scores, after)

    def test_int8_ip_absolute_scores_match_f32(self, rng):
        """metric='ip' must return q·x, not q·x/‖q‖: the int8 pipeline
        scores with a normalized query (shared with cosine), so the final
        scores are rescaled by ‖q‖ — score-threshold filtering reads the
        absolute values, and they must not change with storage dtype."""
        dim = 64
        data = rng.standard_normal((256, dim)).astype(np.float32)
        q = 3.0 * rng.standard_normal((2, dim)).astype(np.float32)  # ‖q‖≉1
        f32 = DeviceFlatIndex(dim=dim, capacity=256, metric="ip")
        f32.add(data)
        s_f32, p_f32 = f32.search(q, 5)
        i8 = DeviceFlatIndex(dim=dim, capacity=256, metric="ip", dtype=jnp.int8)
        i8.add(data)
        s_i8, p_i8 = i8.search(q, 5)
        np.testing.assert_array_equal(p_f32, p_i8)
        np.testing.assert_allclose(s_i8, s_f32, rtol=2e-2)

    def test_odd_dim_int8_defaults_to_int8_refine(self, rng):
        """int4 nibble-packing needs an even dim; the DEFAULT must fall
        back to the int8 sidecar for odd dims instead of refusing the
        index outright (explicit refine='int4' still raises)."""
        idx = DeviceFlatIndex(dim=129, capacity=128, dtype=jnp.int8)
        assert idx.refine == "int8"
        data = rng.standard_normal((64, 129)).astype(np.float32)
        idx.add(data)
        _, p = idx.search(data[:4], 3)
        assert (np.asarray(p)[:, 0] == np.arange(4)).all()
        with pytest.raises(ValueError, match="even dim"):
            DeviceFlatIndex(dim=129, capacity=128, dtype=jnp.int8, refine="int4")

    def test_refine_survives_snapshot_and_incremental_adds(self, rng, tmp_path):
        from rag_arc_tpu.index.persistence import load_store, save_store
        from rag_arc_tpu.index.vector_store import TPUVectorStore
        from rag_arc_tpu.models.embeddings import HashEmbeddings

        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore(emb, dtype=jnp.int8)
        texts = [f"doc {i} about topic {i % 7}" for i in range(50)]
        store.add_texts(texts)
        assert store.index.refine == "int4"
        s0, p0 = store.index.search(
            np.asarray(emb.embed_documents(texts[:5]), np.float32), 5
        )
        save_store(store, tmp_path / "snap")
        loaded = load_store(tmp_path / "snap", emb)
        assert loaded.index.refine == "int4"
        s1, p1 = loaded.index.search(
            np.asarray(emb.embed_documents(texts[:5]), np.float32), 5
        )
        np.testing.assert_array_equal(p0, p1)
        np.testing.assert_allclose(s0, s1, rtol=1e-5)
        # incremental adds after load keep refining
        loaded.add_texts(["a brand new document"])
        hits = loaded.similarity_search("a brand new document", k=1)
        assert hits[0].content == "a brand new document"

    def test_l2_rejected(self):
        with pytest.raises(ValueError, match="cosine/ip"):
            DeviceFlatIndex(dim=8, metric="l2", dtype=jnp.int8)

    def test_int8_sharded_matches_single_device(self, rng):
        """int8 on the data mesh (VERDICT r2 #2): codes + block scales
        shard over rows; results match the single-device quantized path
        bit-for-bit (same arithmetic, same metric)."""
        from rag_arc_tpu.parallel.mesh import default_mesh

        mesh = default_mesh()
        data = rng.standard_normal((4096, 32)).astype(np.float32)
        q = data[rng.integers(0, 4096, 8)] + 0.05 * rng.standard_normal(
            (8, 32)
        ).astype(np.float32)

        single = DeviceFlatIndex(dim=32, capacity=4096, dtype=jnp.int8)
        single.add(data)
        sharded = DeviceFlatIndex(
            dim=32, capacity=4096, dtype=jnp.int8, mesh=mesh
        )
        sharded.add(data)
        s1, p1 = single.search(q, 10)
        s2, p2 = sharded.search(q, 10)
        for b in range(8):
            assert set(p1[b]) == set(p2[b])
        np.testing.assert_allclose(np.sort(s1, 1), np.sort(s2, 1), rtol=1e-5)

    def test_int8_sharded_delete_and_grow(self, rng):
        from rag_arc_tpu.parallel.mesh import default_mesh

        mesh = default_mesh()
        index = DeviceFlatIndex(dim=16, capacity=1024, dtype=jnp.int8, mesh=mesh)
        data = rng.standard_normal((3000, 16)).astype(np.float32)
        index.add(data)  # forces growth across shards
        q = data[100:101]
        _, p = index.search(q, k=1)
        assert p[0, 0] == 100
        index.mark_deleted(np.array([100]))
        _, p = index.search(q, k=1)
        assert p[0, 0] != 100

    def test_int8_replica_and_slice_mesh(self, rng):
        from rag_arc_tpu.parallel.mesh import replica_mesh, slice_mesh

        data = rng.standard_normal((3000, 32)).astype(np.float32)
        queries = data[rng.integers(0, 3000, 16)] + 0.05 * rng.standard_normal(
            (16, 32)
        ).astype(np.float32)
        single = DeviceFlatIndex(dim=32, capacity=4096, dtype=jnp.int8)
        single.add(data)
        _, want = single.search(queries, 10)

        for mesh in (replica_mesh(replicas=2, shards=4), slice_mesh(slices=2, shards=4)):
            idx = DeviceFlatIndex(dim=32, capacity=4096, dtype=jnp.int8, mesh=mesh)
            idx.add(data)
            _, got = idx.search(queries, 10)
            for b in range(16):
                assert set(want[b]) == set(got[b]), mesh

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

    def test_tail_block_fill_shares_scale(self, rng):
        """Sequential small adds fill the partial tail block (shared
        scale) instead of burning a 32-row block per add."""
        data = rng.standard_normal((10, 16)).astype(np.float32)
        i8 = DeviceFlatIndex(dim=16, capacity=1024, dtype=jnp.int8)
        for row in data:
            i8.add(row[None, :])
        # cosine rows are unit-norm, so every row's amax is comparable;
        # occasional realignment is allowed but most adds must coalesce
        from rag_arc_tpu.index.flat import QUANT_BLOCK

        assert i8._gap_rows < 9 * (QUANT_BLOCK - 1)
        assert i8.size == 10 + i8._gap_rows
        # each original row must find itself
        _, p = i8.search(data, 1)
        got = i8.take(p[:, 0])
        want = data / np.linalg.norm(data, axis=1, keepdims=True)
        np.testing.assert_allclose(got, want, atol=2e-2)

    def test_tail_block_realigns_on_range_overflow(self, rng):
        """A new row whose amax exceeds the tail block's int8 range forces
        realignment (gap rows) instead of clipping it into the old scale."""
        from rag_arc_tpu.index.flat import QUANT_BLOCK

        i8 = DeviceFlatIndex(dim=16, capacity=1024, dtype=jnp.int8)
        flat_row = np.ones((1, 16), dtype=np.float32)  # unit-norm: 0.25/dim
        i8.add(flat_row)
        spike = np.zeros((1, 16), dtype=np.float32)
        spike[0, 0] = 1.0  # unit-norm amax 1.0 = 4x the tail scale range
        i8.add(spike)
        assert i8._gap_rows == QUANT_BLOCK - 1
        assert i8.size == 1 + i8._gap_rows + 1
        # both rows remain searchable and exact-ish
        _, p = i8.search(np.concatenate([flat_row, spike]), 1)
        assert p[0, 0] == 0
        assert p[1, 0] == QUANT_BLOCK
        # gap rows never surface as results
        s, p = i8.search(spike, 5)
        live = p[0][s[0] > -np.inf]
        assert set(live) <= {0, QUANT_BLOCK}

    def test_quantized_snapshot_bit_exact(self, rng, tmp_path):
        """int8 snapshots store raw codes + scales; load places them
        without re-quantization (identical codes, bookkeeping intact)."""
        from rag_arc_tpu.index.persistence import load_store, save_store
        from rag_arc_tpu.index.vector_store import TPUVectorStore
        from rag_arc_tpu.models.embeddings import HashEmbeddings

        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore(emb, dtype=jnp.int8)
        texts = [f"doc {i} body {i * 17 % 11}" for i in range(50)]
        ids = store.add_texts(texts)
        store.delete(ids[3:6])
        save_store(store, tmp_path / "snap")
        loaded = load_store(tmp_path / "snap", emb)
        idx, lidx = store.index, loaded.index
        assert lidx.size == idx.size
        assert lidx.n_deleted == idx.n_deleted
        assert lidx._gap_rows == idx._gap_rows
        assert lidx._tail_scale == idx._tail_scale
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(lidx.emb[: idx.size])),
            np.asarray(jax.device_get(idx.emb[: idx.size])),
        )
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(lidx.sqnorm[: idx.size])),
            np.asarray(jax.device_get(idx.sqnorm[: idx.size])),
        )
        q = emb.encode([texts[9]])
        s0, p0 = idx.search(q, 5)
        s1, p1 = lidx.search(q, 5)
        np.testing.assert_array_equal(p0, p1)
        np.testing.assert_array_equal(s0, s1)
        # further adds after restore keep filling the tail block
        loaded.add_texts(["post-restore doc"])
        assert loaded.similarity_search("post-restore doc", k=1)[
            0
        ].content == "post-restore doc"

    def test_legacy_f32_quantized_snapshot_loads(self, rng, tmp_path):
        """Snapshots written before the raw-code format (dequantized f32
        emb.npy, no scales.npy) still load via the re-add path."""
        from rag_arc_tpu.index.persistence import load_store, save_store
        from rag_arc_tpu.index.vector_store import TPUVectorStore
        from rag_arc_tpu.models.embeddings import HashEmbeddings

        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore(emb, dtype=jnp.int8)
        texts = [f"legacy doc {i}" for i in range(30)]
        store.add_texts(texts)
        snap = tmp_path / "snap"
        save_store(store, snap)
        # rewrite as the legacy format: dequantized f32 rows, no scales
        codes = np.load(snap / "emb.npy")
        scales = np.load(snap / "scales.npy")
        np.save(snap / "emb.npy", codes.astype(np.float32) * scales[:, None])
        (snap / "scales.npy").unlink()
        loaded = load_store(snap, emb)
        assert loaded.index.quantized
        assert loaded.similarity_search(texts[4], k=1)[0].content == texts[4]


class TestIVFAutoTrainCompaction:
    def test_auto_train_compacts_tombstones(self, rng):
        """Deletes before the IVF auto-train point must not leave zeroed
        tombstone rows in the k-means training set; the docstore remaps
        through the compaction."""
        from rag_arc_tpu.index.ivf import DeviceIVFIndex
        from rag_arc_tpu.index.vector_store import TPUVectorStore
        from rag_arc_tpu.models.embeddings import HashEmbeddings

        emb = HashEmbeddings(dim=32)
        store = TPUVectorStore(
            emb, index_type="ivf", nlist=4, nprobe=4, train_threshold=60
        )
        ids = store.add_texts([f"early doc {i}" for i in range(40)])
        store.delete(ids[:10])
        store.add_texts([f"late doc {i}" for i in range(40)])
        assert isinstance(store.index, DeviceIVFIndex)
        assert store.index.n_deleted == 0
        # deleted docs are gone; surviving docs still resolve correctly
        assert store.similarity_search("early doc 25", k=1)[0].content == (
            "early doc 25"
        )
        assert store.similarity_search("late doc 3", k=1)[0].content == (
            "late doc 3"
        )
        got = {d.content for d in store.similarity_search("early doc 5", k=50)}
        assert "early doc 5" not in got

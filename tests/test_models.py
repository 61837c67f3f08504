"""Model stack tests: tokenizer, encoder, flax embeddings, reranker,
contrastive training (incl. sharded dp×tp step on the 8-device mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from rag_arc_tpu.models.encoder import (
    CausalLM,
    TextEncoder,
    TransformerConfig,
    count_params,
    init_causal_lm,
    init_encoder,
    param_shardings,
)
from rag_arc_tpu.models.flax_embeddings import FlaxEncoderEmbeddings
from rag_arc_tpu.models.tokenizer import HashTokenizer, PAD_ID
from rag_arc_tpu.models.training import (
    contrastive_loss,
    init_train_state,
    make_sharded_train_step,
    make_train_step,
)
from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker
from rag_arc_tpu.utils.data_model import Document

TINY = TransformerConfig.tiny()


class TestTokenizer:
    def test_deterministic(self):
        tok = HashTokenizer(vocab_size=1000)
        assert tok.encode("hello world") == tok.encode("hello world")

    def test_ids_in_range(self):
        tok = HashTokenizer(vocab_size=100)
        ids = tok.encode("some words and punctuation! 你好")
        assert all(0 <= i < 100 for i in ids)

    def test_batch_right_pad(self):
        tok = HashTokenizer()
        ids, mask = tok.batch_encode(["a b c", "a"])
        assert ids.shape == mask.shape
        assert mask[0].sum() > mask[1].sum()
        assert ids[1, mask[1].sum():].tolist() == [PAD_ID] * (ids.shape[1] - mask[1].sum())

    def test_batch_left_pad(self):
        tok = HashTokenizer()
        ids, mask = tok.batch_encode(["a b c", "a"], left_pad=True)
        assert not mask[1, 0]  # padding at the front
        assert mask[1, -1]  # content at the end

    def test_truncation(self):
        tok = HashTokenizer(max_len=8)
        ids, _ = tok.batch_encode(["w " * 100])
        assert ids.shape[1] == 8


class TestEncoder:
    def test_forward_shape_and_norm(self):
        model, params = init_encoder(TINY)
        ids = jnp.ones((2, 10), dtype=jnp.int32)
        mask = jnp.ones((2, 10), dtype=bool)
        out = model.apply(params, ids, mask)
        assert out.shape == (2, TINY.dim)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-5
        )

    def test_mask_ignores_padding(self):
        model, params = init_encoder(TINY)
        ids = jnp.asarray([[5, 6, 7, 0, 0]], dtype=jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 0, 0]], dtype=bool)
        ids2 = jnp.asarray([[5, 6, 7, 9, 9]], dtype=jnp.int32)  # junk in padding
        out1 = model.apply(params, ids, mask)
        out2 = model.apply(params, ids2, mask)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-2)

    def test_causal_lm_shape(self):
        model, params = init_causal_lm(TINY)
        logits = model.apply(
            params, jnp.ones((2, 6), jnp.int32), jnp.ones((2, 6), bool)
        )
        assert logits.shape == (2, 6, TINY.vocab_size)

    def test_causality(self):
        """Changing a future token must not change past logits."""
        model, params = init_causal_lm(TINY)
        mask = jnp.ones((1, 6), bool)
        a = jnp.asarray([[4, 5, 6, 7, 8, 9]], jnp.int32)
        b = a.at[0, 5].set(100)
        la = model.apply(params, a, mask)
        lb = model.apply(params, b, mask)
        np.testing.assert_allclose(
            np.asarray(la[0, :5]), np.asarray(lb[0, :5]), atol=1e-4
        )
        assert not np.allclose(np.asarray(la[0, 5]), np.asarray(lb[0, 5]), atol=1e-4)

    def test_param_count_flagship_scale(self):
        cfg = TransformerConfig(vocab_size=1024, dim=128, depth=2, heads=4, max_len=64)
        _, params = init_encoder(cfg)
        assert count_params(params) > 100_000


class TestFlaxEmbeddings:
    def test_encode_shapes_and_determinism(self):
        emb = FlaxEncoderEmbeddings(cfg=TINY)
        v1 = emb.encode(["hello world", "another text entirely"])
        v2 = emb.encode(["hello world", "another text entirely"])
        assert v1.shape == (2, TINY.dim)
        np.testing.assert_allclose(v1, v2, atol=1e-5)

    def test_similar_texts_closer(self):
        emb = FlaxEncoderEmbeddings(cfg=TINY)
        v = emb.encode(["the cat sat", "the cat sat down", "finance rates bonds"])
        sim_close = v[0] @ v[1]
        sim_far = v[0] @ v[2]
        assert sim_close > sim_far

    def test_empty(self):
        emb = FlaxEncoderEmbeddings(cfg=TINY)
        assert emb.encode([]).shape == (0, TINY.dim)

    def test_embed_documents_list_api(self):
        emb = FlaxEncoderEmbeddings(cfg=TINY)
        out = emb.embed_documents(["a"])
        assert isinstance(out, list) and len(out[0]) == TINY.dim

    def test_end_to_end_with_store(self):
        from rag_arc_tpu.index.vector_store import TPUVectorStore

        emb = FlaxEncoderEmbeddings(cfg=TINY)
        store = TPUVectorStore.from_texts(
            ["alpha beta gamma", "delta epsilon zeta", "alpha beta"], emb
        )
        docs = store.similarity_search("alpha beta gamma", k=1)
        assert docs[0].content == "alpha beta gamma"


class TestReranker:
    def test_scores_shape_and_range(self):
        rr = CrossEncoderReranker(cfg=TransformerConfig.tiny(causal=True))
        docs = [Document(content=f"doc {i}") for i in range(5)]
        scores = rr.compute_scores("query", docs)
        assert scores.shape == (5,)
        assert ((scores >= 0) & (scores <= 1)).all()

    def test_rerank_sorted_and_truncated(self):
        rr = CrossEncoderReranker(cfg=TransformerConfig.tiny(causal=True))
        docs = [Document(content=f"document number {i}") for i in range(6)]
        out = rr.rerank("q", docs, k=3)
        assert len(out) == 3
        scores = [d.metadata["rerank_score"] for d in out]
        assert scores == sorted(scores, reverse=True)

    def test_empty(self):
        rr = CrossEncoderReranker(cfg=TransformerConfig.tiny(causal=True))
        assert rr.rerank("q", []) == []

    def test_score_invariant_to_batch_composition(self):
        """Left-padded scoring must not depend on the batch's longest
        candidate: positions derive from the mask, so a pair scores the
        same alone (small bucket, little padding) as next to a long doc
        (big bucket, heavy left padding). Absolute arange positions broke
        this — rerank order changed with candidate-set composition."""
        rr = CrossEncoderReranker(cfg=TransformerConfig.tiny(causal=True))
        short = Document(content="short relevant answer")
        long_doc = Document(content="filler words " * 120)
        alone = rr.compute_scores("the query", [short])[0]
        together = rr.compute_scores("the query", [short, long_doc])[0]
        np.testing.assert_allclose(alone, together, atol=1e-4)

    def test_rerank_does_not_mutate_input_documents(self):
        """Scores stamp a per-request COPY: the docstore hands out shared
        Document instances, and in-place metadata writes leaked one
        request's scores into other responses."""
        rr = CrossEncoderReranker(cfg=TransformerConfig.tiny(causal=True))
        docs = [Document(content=f"doc {i}", metadata={"keep": i}) for i in range(3)]
        out = rr.rerank("q", docs, k=3)
        assert all("rerank_score" not in d.metadata for d in docs)
        assert all("rerank_score" in d.metadata and d.metadata["keep"] is not None
                   for d in out)


class TestTraining:
    def test_loss_decreases(self):
        model, params = init_encoder(TINY, seed=0)
        optimizer = optax.adam(1e-2)
        state = init_train_state(model, params, optimizer)
        step = jax.jit(make_train_step(model, optimizer))
        rng = np.random.default_rng(0)
        batch = {
            "q_ids": jnp.asarray(rng.integers(4, 500, (8, 12)), jnp.int32),
            "q_mask": jnp.ones((8, 12), bool),
            "d_ids": jnp.asarray(rng.integers(4, 500, (8, 12)), jnp.int32),
            "d_mask": jnp.ones((8, 12), bool),
        }
        _, m0 = step(state, batch)
        for _ in range(5):
            state, metrics = step(state, batch)
        assert float(metrics["loss"]) < float(m0["loss"])

    def test_sharded_train_step_8dev(self):
        import optax

        devices = jax.devices()
        assert len(devices) == 8
        mesh = Mesh(np.asarray(devices).reshape(4, 2), ("dp", "tp"))
        model, params = init_encoder(TINY, seed=0)
        optimizer = optax.adamw(1e-3)
        state = init_train_state(model, params, optimizer)
        step, shard_state, shard_batch = make_sharded_train_step(
            model, optimizer, params, mesh
        )
        state = shard_state(state)
        rng = np.random.default_rng(0)
        batch = shard_batch(
            {
                "q_ids": rng.integers(4, 500, (8, 16)).astype(np.int32),
                "q_mask": np.ones((8, 16), bool),
                "d_ids": rng.integers(4, 500, (8, 16)).astype(np.int32),
                "d_mask": np.ones((8, 16), bool),
            }
        )
        with mesh:
            state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_tp_shardings_cover_qkv(self):
        mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
        _, params = init_encoder(TINY)
        shards = param_shardings(params, mesh)
        flat = jax.tree_util.tree_leaves_with_path(shards)
        tp_sharded = [
            "/".join(str(getattr(p, "key", p)) for p in path)
            for path, s in flat
            if "tp" in str(s.spec)
        ]
        assert any("qkv" in p for p in tp_sharded)
        assert any("mlp_up" in p for p in tp_sharded)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestFit:
    def test_fit_learns_and_checkpoints(self, tmp_path):
        from rag_arc_tpu.models.tokenizer import HashTokenizer
        from rag_arc_tpu.models.training import fit

        cfg = TransformerConfig.tiny(dim=64, vocab_size=512)
        model, params = init_encoder(cfg, seed=0)
        pairs = [(f"query topic {i}", f"document topic {i} body") for i in range(16)]
        tok = HashTokenizer(vocab_size=512, max_len=16)
        trained, history = fit(
            model, params, pairs, tok,
            steps=15, batch_size=16, max_len=16, learning_rate=5e-3,
            checkpoint_dir=str(tmp_path), checkpoint_every=15, log_every=5,
        )
        assert history[-1]["loss"] < history[0]["loss"]
        assert (tmp_path / "step_15").exists()

    def test_fit_requires_enough_pairs(self):
        from rag_arc_tpu.models.tokenizer import HashTokenizer
        from rag_arc_tpu.models.training import fit

        cfg = TransformerConfig.tiny()
        model, params = init_encoder(cfg)
        with pytest.raises(ValueError, match="batch_size"):
            fit(model, params, [("a", "b")], HashTokenizer(), batch_size=8)

    def test_fit_does_not_delete_caller_params(self):
        """The jitted step donates its state; fit must copy first or the
        caller's own param arrays are deleted by the first step."""
        from rag_arc_tpu.models.tokenizer import HashTokenizer
        from rag_arc_tpu.models.training import fit

        cfg = TransformerConfig.tiny()
        model, params = init_encoder(cfg, seed=0)
        pairs = [(f"q {i}", f"d {i}") for i in range(8)]
        tok = HashTokenizer(vocab_size=512, max_len=16)
        fit(model, params, pairs, tok, steps=2, batch_size=8, max_len=16)
        # the ORIGINAL params must still be usable after training
        ids = jnp.zeros((2, 8), jnp.int32)
        out = model.apply(params, ids, jnp.ones((2, 8), bool))
        assert np.isfinite(np.asarray(out)).all()

    def test_left_pad_truncation_keeps_the_tail(self):
        """Last-position readers (the reranker's 'Answer:' cue) must keep
        the END of overlong prompts through truncation."""
        from rag_arc_tpu.models.tokenizer import HashTokenizer

        tok = HashTokenizer(vocab_size=512, max_len=16)
        prompt = " ".join(f"w{i}" for i in range(100)) + " FINALCUE"
        ids, mask = tok.batch_encode([prompt], left_pad=True)
        cue = tok.token_id("finalcue")
        assert cue in ids[0].tolist()
        # head-keep (document path) unchanged
        ids_r, _ = tok.batch_encode([prompt], left_pad=False)
        assert cue not in ids_r[0].tolist()


class TestSequencePacking:
    """PackedTextEncoder + pack_token_lists: short docs share MXU-sized
    rows; embeddings must match the unpacked forward."""

    def test_pack_token_lists_shapes_and_mapping(self):
        from rag_arc_tpu.models.packing import pack_token_lists

        lists = [[1, 2, 3], [4, 5], [6] * 20, [7]]
        ids, pos, seg, mapping = pack_token_lists(
            lists, row_len=16, max_segments=4
        )
        assert ids.shape == pos.shape == seg.shape
        assert ids.shape[1] == 16
        # every doc is findable and its tokens are intact, in order
        for i, tl in enumerate(lists):
            r, s = mapping[i]
            sel = seg[r] == s
            got = ids[r][sel].tolist()
            assert got == tl[:16], (i, got, tl)
            # positions restart at 0 within the segment
            assert pos[r][sel].tolist() == list(range(min(len(tl), 16)))
        # padding is seg -1
        assert (seg[ids == 0] <= 0).all()

    def test_pack_respects_max_segments(self):
        from rag_arc_tpu.models.packing import pack_token_lists

        lists = [[1]] * 10
        ids, pos, seg, mapping = pack_token_lists(
            lists, row_len=128, max_segments=4
        )
        rows = {r for r, _ in mapping}
        assert len(rows) >= 3  # 10 single-token docs / 4 per row
        for r in rows:
            assert len({s for rr, s in mapping if rr == r}) <= 4

    def test_packed_encoder_matches_unpacked(self):
        from rag_arc_tpu.models.encoder import PackedTextEncoder
        from rag_arc_tpu.models.packing import pack_token_lists

        cfg = TransformerConfig.tiny(dtype=jnp.float32)
        model, params = init_encoder(cfg, seed=3)
        packed = PackedTextEncoder(cfg, max_segments=4)
        rng = np.random.default_rng(0)
        lists = [
            rng.integers(4, cfg.vocab_size, size=n).tolist()
            for n in (5, 9, 3, 12, 7, 2)
        ]
        ids, pos, seg, mapping = pack_token_lists(
            lists, row_len=32, max_segments=4
        )
        got_rows = packed.apply(
            params, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(seg)
        )
        for i, tl in enumerate(lists):
            one_ids = jnp.asarray(np.asarray(tl, np.int32)[None, :])
            one_mask = jnp.ones_like(one_ids, dtype=bool)
            want = np.asarray(model.apply(params, one_ids, one_mask))[0]
            r, s = mapping[i]
            np.testing.assert_allclose(
                np.asarray(got_rows)[r, s], want, atol=1e-5, rtol=1e-5
            )

    def test_embeddings_packed_equals_unpacked(self):
        texts = [
            "short text one",
            "another tiny query",
            "a slightly longer sentence about retrieval on tpus",
            "x",
        ] * 3
        cfg = TransformerConfig.tiny(dtype=jnp.float32)
        packed = FlaxEncoderEmbeddings(cfg=cfg, pack_short=True)
        plain = FlaxEncoderEmbeddings(cfg=cfg, pack_short=False)
        # same params (same seed) — outputs must agree per text
        a = packed.encode(texts)
        b = plain.encode(texts)
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_mixed_short_long_batch(self):
        cfg = TransformerConfig.tiny(dtype=jnp.float32)
        emb = FlaxEncoderEmbeddings(cfg=cfg, pack_short=True)
        long_text = "word " * 120  # beyond PACK_MAX_TOKENS
        texts = ["tiny", long_text, "another short one"]
        out = emb.encode(texts)
        assert out.shape == (3, cfg.dim)
        assert np.isfinite(out).all()
        # norms ~1 (L2-normalized embeddings)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-3)

    def test_empty_token_list_packed_equals_unpacked(self):
        """A tokenizer that emits [] for empty text (no BOS/EOS) must get
        the SAME vector on both paths — the packed path used to pool a
        phantom PAD token into a unit-norm vector where unpacked gave 0."""

        class NoSpecials:
            def encode(self, t):
                return [ord(c) % 256 + 1 for c in t.strip()][:16]

            def batch_encode(self, texts, left_pad=False):
                raise AssertionError("encode() path expected")

        cfg = TransformerConfig.tiny(dtype=jnp.float32)
        a = FlaxEncoderEmbeddings(cfg=cfg, tokenizer=NoSpecials(), pack_short=True)
        b = FlaxEncoderEmbeddings(cfg=cfg, tokenizer=NoSpecials(), pack_short=False)
        texts = ["hello", "   ", "world"]
        va, vb = a.encode(texts), b.encode(texts)
        np.testing.assert_allclose(va, vb, atol=1e-4, rtol=1e-4)
        assert np.allclose(va[1], 0.0)  # empty doc -> exact zero vector

    def test_packed_routing_respects_max_len(self):
        """Docs between cfg.max_len and PACK_MAX_TOKENS must not take the
        packed path: per-segment positions past the pos_embed table would
        silently clamp instead of truncate."""
        cfg = TransformerConfig.tiny(dtype=jnp.float32, max_len=32)
        packed = FlaxEncoderEmbeddings(cfg=cfg, pack_short=True)
        plain = FlaxEncoderEmbeddings(cfg=cfg, pack_short=False)
        text = "tok " * 50  # ~50 tokens: > max_len=32, <= PACK_MAX_TOKENS=64
        np.testing.assert_allclose(
            packed.encode([text, "tiny"]), plain.encode([text, "tiny"]),
            atol=1e-4, rtol=1e-4,
        )

    def test_mesh_encode_small_batches(self):
        """Mesh-sharded embeddings must handle batches smaller than the
        data axis (pow2 padding alone is not divisible by 8)."""
        from rag_arc_tpu.parallel.mesh import default_mesh

        cfg = TransformerConfig.tiny(dtype=jnp.float32)
        emb = FlaxEncoderEmbeddings(cfg=cfg, mesh=default_mesh())
        one = emb.encode(["lonely query"])
        assert one.shape == (1, cfg.dim) and np.isfinite(one).all()
        three = emb.encode(["a", "b b b", "c " * 100])  # packed + bucketed
        assert three.shape == (3, cfg.dim) and np.isfinite(three).all()
        ref = FlaxEncoderEmbeddings(cfg=cfg)
        np.testing.assert_allclose(
            three, ref.encode(["a", "b b b", "c " * 100]), atol=1e-4, rtol=1e-4
        )

    def test_describe_records_dtypes(self):
        """The snapshot spec must pin activation/param dtypes: a rebuild
        that silently flips f32 -> bf16 drifts every vector."""
        cfg = TransformerConfig.tiny(dtype=jnp.float32)
        spec = FlaxEncoderEmbeddings(cfg=cfg).describe()
        assert spec["cfg"]["dtype"] == "float32"
        rebuilt = FlaxEncoderEmbeddings(cfg=TransformerConfig(**spec["cfg"]))
        out = rebuilt.encode(["x y z"])
        np.testing.assert_allclose(
            FlaxEncoderEmbeddings(cfg=cfg).encode(["x y z"]), out, atol=1e-6
        )
        # norms ~1 (L2-normalized embeddings)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-3)

"""Flax Qwen3 parity vs torch Qwen3ForCausalLM (random init — validates
RMSNorm/QK-norm/RoPE/GQA/SwiGLU + converter with no downloads)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from rag_arc_tpu.models.qwen3 import FlaxQwen3LM, Qwen3Config, convert_torch_qwen3


@pytest.fixture(scope="module")
def models():
    hf_cfg = transformers.Qwen3Config(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        max_position_embeddings=64,
        rope_theta=10000.0,
        attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch_model = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    cfg = Qwen3Config.tiny()
    flax_model = FlaxQwen3LM(cfg)
    params = convert_torch_qwen3(torch_model.state_dict(), cfg)
    return torch_model, flax_model, params


def test_logits_parity_full_mask(models):
    torch_model, flax_model, params = models
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), dtype=np.int64)
    with torch.no_grad():
        want = torch_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    got = flax_model.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, bool))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def test_logits_parity_left_padded(models):
    """The reranker reads last-position logits of left-padded rows — the
    padding-aware positions must match HF's position_ids semantics."""
    torch_model, flax_model, params = models
    ids = np.array([[0, 0, 5, 6, 7], [1, 2, 3, 4, 5]], dtype=np.int64)
    mask = np.array([[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]], dtype=np.int64)
    position_ids = np.maximum(np.cumsum(mask, axis=1) - 1, 0)
    with torch.no_grad():
        want = torch_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(position_ids),
        ).logits.numpy()
    got = np.asarray(
        flax_model.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, bool))
    )
    np.testing.assert_allclose(got[:, -1, :], want[:, -1, :], atol=3e-4)


def test_tied_embeddings_variant():
    hf_cfg = transformers.Qwen3Config(
        vocab_size=96,
        hidden_size=16,
        intermediate_size=32,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=1,
        head_dim=8,
        max_position_embeddings=32,
        rope_theta=10000.0,
        tie_word_embeddings=True,
    )
    torch_model = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    cfg = Qwen3Config.tiny(
        vocab_size=96, hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=1, head_dim=8,
        max_position_embeddings=32, tie_word_embeddings=True,
    )
    params = convert_torch_qwen3(torch_model.state_dict(), cfg)
    ids = np.arange(8, dtype=np.int64)[None, :] % 96
    with torch.no_grad():
        want = torch_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones((1, 8), dtype=torch.long),
        ).logits.numpy()
    got = FlaxQwen3LM(cfg).apply(
        params, jnp.asarray(ids, jnp.int32), jnp.ones((1, 8), bool)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def test_reranker_over_flax_qwen3(models):
    """The cross-encoder surface accepts the Qwen3 model: yes/no readout
    over left-padded prompts."""
    import jax

    _, flax_model, params = models
    from rag_arc_tpu.models.tokenizer import HashTokenizer

    tok = HashTokenizer(vocab_size=128, max_len=32)
    prompts = [f"judge doc {i}" for i in range(3)]
    ids, mask = tok.batch_encode(prompts, pad_to=16, left_pad=True)
    logits = flax_model.apply(params, jnp.asarray(ids), jnp.asarray(mask, bool))
    last = np.asarray(logits)[:, -1, :]
    yes, no = tok.token_id("yes"), tok.token_id("no")
    pair = np.stack([last[:, no], last[:, yes]], axis=-1)
    p_yes = np.exp(pair[:, 1]) / np.exp(pair).sum(-1)
    assert p_yes.shape == (3,) and np.isfinite(p_yes).all()


def test_cross_encoder_over_qwen3(models):
    """Full reranker surface over the weight-ported Qwen3."""
    _, flax_model, params = models
    from rag_arc_tpu.models.tokenizer import HashTokenizer
    from rag_arc_tpu.rerank.cross_encoder import CrossEncoderReranker
    from rag_arc_tpu.utils.data_model import Document

    rr = CrossEncoderReranker.from_causal_lm(
        flax_model, params, HashTokenizer(vocab_size=128, max_len=64), max_length=64
    )
    docs = [Document(content=f"candidate {i}") for i in range(5)]
    out = rr.rerank("the query", docs, k=3)
    assert len(out) == 3
    scores = [d.metadata["rerank_score"] for d in out]
    assert scores == sorted(scores, reverse=True)
    assert all(0 <= s <= 1 for s in scores)
    batched = rr.rerank_batch(["q1", "q2"], [docs[:3], docs[3:]], k=2)
    assert len(batched) == 2 and len(batched[0]) == 2


def test_qwen3_embeddings_end_to_end(models):
    _, flax_model, params = models
    from rag_arc_tpu.index.vector_store import TPUVectorStore
    from rag_arc_tpu.models.qwen3 import Qwen3Embeddings
    from rag_arc_tpu.models.tokenizer import HashTokenizer

    emb = Qwen3Embeddings(flax_model, params, HashTokenizer(vocab_size=128, max_len=32))
    vecs = emb.encode(["alpha beta", "gamma delta"])
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-5)
    store = TPUVectorStore.from_texts(["alpha beta", "gamma delta", "alpha beta x"], emb)
    assert store.similarity_search("alpha beta", k=1)[0].content == "alpha beta"


def test_attn_impl_gate():
    """Flash eligibility: validates impl names, rejects on CPU under auto,
    and requires 128-multiple L / head_dim when forced."""
    import dataclasses

    import jax

    from rag_arc_tpu.models.qwen3 import _flash_eligible

    cfg = Qwen3Config(head_dim=128)
    assert jax.default_backend() == "cpu"  # conftest pins CPU
    assert not _flash_eligible(cfg, 512)  # auto on CPU -> einsum
    assert not _flash_eligible(dataclasses.replace(cfg, attn_impl="einsum"), 512)
    forced = dataclasses.replace(cfg, attn_impl="flash")
    assert _flash_eligible(forced, 512)
    assert _flash_eligible(forced, 384)
    assert not _flash_eligible(forced, 200)  # L not a 128 multiple
    assert not _flash_eligible(
        dataclasses.replace(forced, head_dim=64), 512
    )  # head_dim too small for the kernel's lane tile
    with pytest.raises(ValueError):
        _flash_eligible(dataclasses.replace(cfg, attn_impl="bogus"), 512)


def test_attn_impl_einsum_forced_matches_auto_on_cpu(models):
    """On CPU, auto and forced-einsum are the same path — same logits."""
    import dataclasses

    import jax

    _, flax_model, params = models
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 100, (2, 16)))
    mask = jnp.asarray([[0] * 4 + [1] * 12, [1] * 16], dtype=bool)
    out_auto = flax_model.apply(params, ids, mask)
    forced = FlaxQwen3LM(dataclasses.replace(flax_model.cfg, attn_impl="einsum"))
    out_forced = forced.apply(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_forced))

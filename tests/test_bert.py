"""Flax BERT numeric parity vs torch HF BertModel (random-init — validates
the architecture + weight converter without downloads)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from rag_arc_tpu.models.bert import BertConfig, FlaxBertModel, convert_torch_bert


@pytest.fixture(scope="module")
def models():
    hf_cfg = transformers.BertConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch_model = transformers.BertModel(hf_cfg).eval()
    cfg = BertConfig.tiny()
    flax_model = FlaxBertModel(cfg)
    params = convert_torch_bert(torch_model.state_dict(), cfg)
    return torch_model, flax_model, params


def test_hidden_state_parity(models):
    torch_model, flax_model, params = models
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), dtype=np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        want = torch_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    got, _ = flax_model.apply(params, jnp.asarray(ids), jnp.asarray(mask, bool))
    # positions under the mask are never read downstream; compare live ones
    np.testing.assert_allclose(
        np.asarray(got)[mask.astype(bool)], want[mask.astype(bool)], atol=2e-4
    )


def test_pooler_parity(models):
    torch_model, flax_model, params = models
    ids = np.arange(8, dtype=np.int32)[None, :] % 100
    mask = np.ones((1, 8), dtype=np.int64)
    with torch.no_grad():
        want = torch_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
        ).pooler_output.numpy()
    _, got = flax_model.apply(params, jnp.asarray(ids), jnp.asarray(mask, bool))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_mean_pooled_unit_norm(models):
    _, flax_model, params = models
    ids = jnp.asarray([[1, 2, 3, 4, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], bool)
    emb = flax_model.mean_pooled(params, ids, mask)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb)), 1.0, rtol=1e-5)


def test_bert_embeddings_end_to_end(models):
    torch_model, flax_model, params = models
    from rag_arc_tpu.models.bert import BertEmbeddings
    from rag_arc_tpu.models.tokenizer import HashTokenizer

    emb = BertEmbeddings(
        flax_model, params, HashTokenizer(vocab_size=128, max_len=32)
    )
    from rag_arc_tpu.index.vector_store import TPUVectorStore

    store = TPUVectorStore.from_texts(["cats purr", "bonds yield", "cats nap"], emb)
    hits = store.similarity_search("cats purr", k=1)
    assert hits[0].content == "cats purr"

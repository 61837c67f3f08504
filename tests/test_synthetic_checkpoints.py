"""Exercise the disk→Flax checkpoint loaders with SYNTHETIC checkpoints
(VERDICT r2 #6).

The real-weights tests (test_real_checkpoints.py) stay gated on weights
being present, but the loader code itself — config parse, AutoModel
load, weight mapping, tokenizer plumbing — runs here today: a tiny
random-init HF model saved with ``save_pretrained`` to tmp drives the
full ``load_hf_*`` path, asserting parity against the same torch model's
forward. Replaces the reference's torch loading path
(``core/file_management/embeddings/huggingface.py:96-98``).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _save_wordlevel_tokenizer(tmp_path, vocab_size):
    """A minimal offline fast tokenizer (WordLevel over byte-ish tokens)
    that AutoTokenizer can round-trip from disk."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    vocab = {"[UNK]": 0, "[PAD]": 1}
    for i in range(2, vocab_size):
        vocab[f"tok{i}"] = i
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="[UNK]", pad_token="[PAD]"
    )
    fast.save_pretrained(tmp_path)
    return fast


def test_load_hf_bert_from_disk(tmp_path):
    from rag_arc_tpu.models.bert import load_hf_bert

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
    torch.manual_seed(0)
    torch_model = transformers.BertModel(hf_cfg).eval()
    torch_model.save_pretrained(tmp_path)
    # BERT tokenizer from a hand-written vocab file (offline)
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                  + [f"tok{i}" for i in range(123)])
    )
    transformers.BertTokenizerFast(str(vocab_file)).save_pretrained(tmp_path)

    model, params, tok = load_hf_bert(str(tmp_path))
    assert model.cfg.hidden_size == 32 and model.cfg.num_hidden_layers == 2
    assert tok is not None

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), dtype=np.int64)
    with torch.no_grad():
        want = torch_model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    import jax.numpy as jnp

    got, _ = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    # and the tokenizer survives a real encode round-trip
    enc = tok(["tok7 tok9"], return_tensors="np")
    assert enc["input_ids"].shape[0] == 1


def test_load_hf_qwen3_from_disk(tmp_path):
    from rag_arc_tpu.models.qwen3 import load_hf_qwen3

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
    torch.manual_seed(0)
    torch_model = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    torch_model.save_pretrained(tmp_path)
    _save_wordlevel_tokenizer(tmp_path, 128)

    model, params, tok = load_hf_qwen3(str(tmp_path))
    assert model.cfg.hidden_size == 32 and model.cfg.head_dim == 8

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), dtype=np.int64)
    with torch.no_grad():
        want = torch_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    import jax.numpy as jnp

    got = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)

    ids2 = tok(["tok5 tok6 tok7"], return_tensors="np")["input_ids"]
    assert ids2.shape == (1, 3)


def test_load_hf_qwen2vl_from_disk(tmp_path):
    from rag_arc_tpu.models.qwen2vl import load_hf_qwen2vl, vision_rotary_angles

    from transformers import Qwen2VLConfig as HFConfig

    hf_cfg = HFConfig(
        vocab_size=256,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        image_token_id=250,
        video_token_id=249,
        vision_start_token_id=251,
        vision_end_token_id=252,
        vision_config=dict(
            depth=2,
            embed_dim=32,
            hidden_size=32,
            num_heads=4,
            in_channels=3,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            mlp_ratio=2.0,
        ),
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    from transformers import Qwen2VLForConditionalGeneration

    torch_model = Qwen2VLForConditionalGeneration(hf_cfg).eval()
    torch_model.save_pretrained(tmp_path)

    # save tokenizer + image processor as separate artifacts (the full
    # Qwen2VLProcessor drags in a video processor that needs torchvision,
    # absent here — the loader's fallback path covers exactly this)
    _save_wordlevel_tokenizer(tmp_path, 256)
    from transformers import Qwen2VLImageProcessor

    Qwen2VLImageProcessor().save_pretrained(tmp_path)

    model, params, hf_tok, img_proc = load_hf_qwen2vl(str(tmp_path))
    assert model.cfg.hidden_size == 32
    assert img_proc is not None and hf_tok is not None

    # vision-tower parity on a random patch batch
    t, h, w = 1, 4, 4
    rng = np.random.default_rng(1)
    n_patch = t * h * w
    patch_dim = 3 * 2 * 4 * 4
    patches = rng.standard_normal((n_patch, patch_dim)).astype(np.float32)
    grid = torch.tensor([[t, h, w]])
    with torch.no_grad():
        want = torch_model.visual(
            torch.tensor(patches), grid_thw=grid
        ).numpy()
    import jax.numpy as jnp

    angles = vision_rotary_angles(
        (t, h, w), model.cfg.vision.head_dim, model.cfg.vision.spatial_merge_size
    )
    from rag_arc_tpu.models.qwen2vl import FlaxQwen2VL

    got = model.apply(
        params, jnp.asarray(patches), jnp.asarray(angles),
        method=FlaxQwen2VL.encode_image,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

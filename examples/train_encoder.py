"""Train the dual encoder with contrastive InfoNCE on synthetic pairs.

Demonstrates the (dp × tp) sharded train step; runs on however many
devices are present (1 real TPU chip here, or 8 emulated CPU devices with
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8).

    python examples/train_encoder.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import optax
from jax.sharding import Mesh

from rag_arc_tpu.models.encoder import TransformerConfig, init_encoder
from rag_arc_tpu.models.tokenizer import HashTokenizer
from rag_arc_tpu.models.training import init_train_state, make_sharded_train_step

_TOPICS = [
    ("tpu matmuls", "the mxu systolic array executes matrix multiplies"),
    ("rank fusion", "reciprocal rank fusion combines retriever outputs"),
    ("bm25 scoring", "term frequency and idf drive bm25 relevance"),
    ("cake baking", "cocoa flour and sugar make chocolate cake"),
]
# 16 distinct pairs so in-batch negatives are meaningful
PAIRS = [
    (f"{q} question {i}", f"{d} variant {i}")
    for i in range(4)
    for q, d in _TOPICS
]


def main() -> None:
    devices = jax.devices()
    tp = 2 if len(devices) % 2 == 0 and len(devices) > 1 else 1
    dp = len(devices) // tp
    mesh = Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp), ("dp", "tp"))
    print(f"mesh: {dp} dp x {tp} tp over {dp * tp} device(s)")

    cfg = TransformerConfig.tiny(dim=128, depth=2, heads=4, vocab_size=2048, max_len=32)
    model, params = init_encoder(cfg, seed=0)
    optimizer = optax.adamw(3e-3)
    state = init_train_state(model, params, optimizer)
    step, shard_state, shard_batch = make_sharded_train_step(
        model, optimizer, params, mesh
    )
    state = shard_state(state)

    tok = HashTokenizer(vocab_size=cfg.vocab_size, max_len=16)
    q_ids, q_mask = tok.batch_encode([q for q, _ in PAIRS], pad_to=16)
    d_ids, d_mask = tok.batch_encode([d for _, d in PAIRS], pad_to=16)
    batch = shard_batch(
        {"q_ids": q_ids, "q_mask": q_mask, "d_ids": d_ids, "d_mask": d_mask}
    )

    with mesh:
        for i in range(20):
            state, metrics = step(state, batch)
            if i % 5 == 0 or i == 19:
                print(
                    f"step {i:02d}  loss={float(metrics['loss']):.4f}  "
                    f"acc={float(metrics['accuracy']):.2f}"
                )


if __name__ == "__main__":
    main()

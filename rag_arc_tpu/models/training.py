"""Dual-encoder contrastive training.

The reference never trains anything (it consumes pretrained torch
checkpoints), but a TPU-native retrieval framework must be able to fit its
own encoder — this module provides the standard InfoNCE in-batch-negatives
objective used to train sentence embedders, as a single pjit-sharded train
step:

- mesh axes ``("dp", "tp")`` — the batch shards over ``dp``; attention QKV
  / MLP / vocab parameters shard over ``tp`` via
  ``rag_arc_tpu.models.encoder.param_shardings``.
- the (B, B) similarity logits require every device to see every document
  embedding; expressing the loss on globally-sharded arrays lets XLA insert
  the all-gather over ICI.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag_arc_tpu.models.encoder import TextEncoder, param_shardings


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jax.Array


def contrastive_loss(
    params: Dict,
    model: TextEncoder,
    batch: Dict[str, jax.Array],
    temperature: float = 0.05,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Symmetric InfoNCE over in-batch negatives."""
    q = model.apply(params, batch["q_ids"], batch["q_mask"])  # (B, D) unit-norm
    d = model.apply(params, batch["d_ids"], batch["d_mask"])
    logits = (q @ d.T) / temperature  # (B, B)
    labels = jnp.arange(logits.shape[0])
    loss_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = 0.5 * (loss_qd.mean() + loss_dq.mean())
    accuracy = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    return loss, {"loss": loss, "accuracy": accuracy}


def make_train_step(model: TextEncoder, optimizer: optax.GradientTransformation):
    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        grad_fn = jax.value_and_grad(contrastive_loss, has_aux=True)
        (loss, metrics), grads = grad_fn(state.params, model, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def init_train_state(
    model: TextEncoder,
    params: Dict,
    optimizer: optax.GradientTransformation,
) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def fit(
    model: TextEncoder,
    params: Dict,
    pairs,
    tokenizer,
    steps: int = 100,
    batch_size: int = 32,
    max_len: int = 64,
    learning_rate: float = 1e-4,
    mesh: Optional[Mesh] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    log_every: int = 10,
    seed: int = 0,
) -> Tuple[Dict, list]:
    """Simple contrastive training driver over (query, document) pairs.

    Shuffles per epoch, tokenizes per batch, runs the (optionally
    dp×tp-sharded) train step, optionally checkpoints. Returns
    (trained params, metric history). This is the training loop the
    reference never had — it only consumed pretrained torch checkpoints.
    """
    import optax as _optax

    pairs = list(pairs)
    if len(pairs) < batch_size:
        raise ValueError(
            f"need at least batch_size={batch_size} pairs, got {len(pairs)}"
        )
    optimizer = _optax.adamw(learning_rate)
    state = init_train_state(model, params, optimizer)
    if mesh is not None:
        step_fn, shard_state, shard_batch = make_sharded_train_step(
            model, optimizer, params, mesh
        )
        state = shard_state(state)
    else:
        # copy onto fresh buffers first: the jitted step DONATES its input
        # state, and the mesh-less TrainState wraps the caller's own param
        # arrays — donating those deletes them ('Array has been deleted'
        # the next time the caller touches the params they passed in)
        state = jax.tree_util.tree_map(jnp.array, state)
        step_fn = jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))
        shard_batch = lambda b: {k: jnp.asarray(v) for k, v in b.items()}  # noqa: E731

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(pairs))
    cursor = 0
    history = []
    ctx = mesh if mesh is not None else _NullContext()
    with ctx:
        for step_idx in range(steps):
            if cursor + batch_size > len(pairs):
                order = rng.permutation(len(pairs))
                cursor = 0
            batch_pairs = [pairs[i] for i in order[cursor : cursor + batch_size]]
            cursor += batch_size
            q_ids, q_mask = tokenizer.batch_encode(
                [q for q, _ in batch_pairs], pad_to=max_len
            )
            d_ids, d_mask = tokenizer.batch_encode(
                [d for _, d in batch_pairs], pad_to=max_len
            )
            batch = shard_batch(
                {"q_ids": q_ids, "q_mask": q_mask, "d_ids": d_ids, "d_mask": d_mask}
            )
            state, metrics = step_fn(state, batch)
            if log_every and (step_idx % log_every == 0 or step_idx == steps - 1):
                entry = {
                    "step": step_idx,
                    "loss": float(jax.device_get(metrics["loss"])),
                    "accuracy": float(jax.device_get(metrics["accuracy"])),
                }
                history.append(entry)
            if checkpoint_dir and checkpoint_every and (
                (step_idx + 1) % checkpoint_every == 0 or step_idx == steps - 1
            ):
                from rag_arc_tpu.models.checkpoint import save_params

                save_params(
                    state.params,
                    f"{checkpoint_dir}/step_{step_idx + 1}",
                    metadata={"step": step_idx + 1},
                )
    return state.params, history


class _NullContext:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def make_sharded_train_step(
    model: TextEncoder,
    optimizer: optax.GradientTransformation,
    params: Dict,
    mesh: Mesh,
):
    """jit the train step over a (dp, tp) mesh with explicit shardings.

    Returns (jitted_step, shard_fn) where shard_fn places a host TrainState
    / batch onto the mesh.
    """
    p_shard = param_shardings(params, mesh)
    batch_sharding = NamedSharding(mesh, P("dp", None))
    replicated = NamedSharding(mesh, P())

    step_fn = make_train_step(model, optimizer)

    def _sharding_for_state(state: TrainState):
        # optimizer slots mirror the PARAM TREE (optax mu/nu are
        # params-structured) → walk the opt_state and mirror param
        # shardings by tree structure, never by shape: two same-shaped
        # params with different specs (e.g. tok_embed tp-sharded vs
        # pos_embed replicated when vocab == max_len) would otherwise
        # collide first-match-wins and silently mis-shard one of them.
        param_struct = jax.tree_util.tree_structure(state.params)

        def assign(node):
            if isinstance(node, tuple):
                parts = (assign(f) for f in node)
                return type(node)(*parts) if hasattr(node, "_fields") else tuple(parts)
            if jax.tree_util.tree_structure(node) == param_struct:
                return jax.tree_util.tree_map(lambda _, s: s, node, p_shard)
            # scalars (counts, schedules) and anything non-param-shaped
            return jax.tree_util.tree_map(lambda _: replicated, node)

        opt_shard = assign(state.opt_state)
        return TrainState(p_shard, opt_shard, replicated)

    def shard_state(state: TrainState) -> TrainState:
        shardings = _sharding_for_state(state)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), state, shardings
        )

    def shard_batch(batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        return {k: jax.device_put(jnp.asarray(v), batch_sharding) for k, v in batch.items()}

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    return jitted, shard_state, shard_batch

"""Jitted train/eval steps and optimizer construction.

Parity with the reference harness semantics (`train.py:126-156`): Adam with
L2-in-gradient weight decay (torch `Adam(weight_decay=...)` ==
`optax.add_decayed_weights` *before* the Adam transform), cosine-annealed
learning rate over num_epochs, cross-entropy loss, accuracy metric. The
whole step (fwd + bwd + update + BN stat update) is one compiled XLA
program; under a Mesh the same step runs data-parallel via NamedSharding
(see parallel/).
"""
from __future__ import annotations

from functools import partial
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from .config import ExperimentConfig


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(config: ExperimentConfig, steps_per_epoch: int):
    """Adam + L2 weight decay + cosine annealing (ref: configs tree)."""
    total_steps = max(config.optim.num_epochs * steps_per_epoch, 1)
    if config.optim.schedule == "cosine":
        schedule = optax.cosine_decay_schedule(config.optim.lr, total_steps)
    else:
        schedule = config.optim.lr
    parts = []
    if config.optim.grad_clip:
        parts.append(optax.clip_by_global_norm(config.optim.grad_clip))
    if config.optim.weight_decay:
        parts.append(optax.add_decayed_weights(config.optim.weight_decay))
    parts.append(optax.adam(schedule))
    return optax.chain(*parts)


def create_state(model, config: ExperimentConfig, sample_batch: jnp.ndarray,
                 steps_per_epoch: int, seed: int = 0) -> tuple[TrainState, Any]:
    # init under jit and on a single item: eager init would materialize the
    # boolean neighbor-selection masks ([b, n, k, n] — 16 GiB at the flagship
    # batch) that XLA otherwise fuses into the dots; params and batch_stats
    # do not depend on the batch dimension.
    init_fn = jax.jit(lambda rngs, x: model.init(rngs, x, train=False))
    variables = init_fn(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)},
        sample_batch[:1],
    )
    tx = make_optimizer(config, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    return state, tx


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def make_train_step(model, tx):
    @jax.jit
    def train_step(state: TrainState, clouds, labels, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                clouds, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            return cross_entropy(out, labels), (out, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
        )
        return new_state, {"loss": loss, "acc": acc}

    return train_step


def make_eval_step(model):
    @jax.jit
    def eval_step(state: TrainState, clouds):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            clouds, train=False,
        )

    return eval_step

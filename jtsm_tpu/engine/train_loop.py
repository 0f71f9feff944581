"""Train-step construction (reference: detectron2/engine/train_loop.py:78
``TrainerBase``/``SimpleTrainer``/``AMPTrainer``).

TPU re-design: the reference's run_step (forward, backward, DDP all-reduce,
optimizer step) becomes ONE jitted function over a device mesh. AMPTrainer's
GradScaler is unnecessary — bf16 has fp32 range, so the bf16 path needs no
loss scaling.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    frozen: Any  # FrozenBN tensors and other non-trainable collections
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def create_train_state(model, tx, rng, example_batch) -> TrainState:
    init_rng, sample_rng, state_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": init_rng, "sampling": sample_rng}, example_batch, train=True
    )
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        rng=state_rng,
    )


def make_train_step(model, tx) -> Callable[[TrainState, Any], Tuple[TrainState, Dict]]:
    """Returns train_step(state, batch) -> (state, metrics). jit/pjit-able."""

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, sub, drop = jax.random.split(state.rng, 3)

        has_bn = bool(jax.tree_util.tree_leaves(state.batch_stats))

        def loss_fn(params):
            variables = {"params": params}
            if jax.tree_util.tree_leaves(state.frozen):
                variables["frozen"] = state.frozen
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                losses, mutated = model.apply(
                    variables,
                    batch,
                    train=True,
                    rngs={"sampling": sub, "dropout": drop},
                    mutable=["batch_stats"],
                )
                new_bn = mutated["batch_stats"]
            else:
                losses = model.apply(
                    variables, batch, train=True, rngs={"sampling": sub, "dropout": drop}
                )
                new_bn = state.batch_stats
            total = jnp.asarray(0.0, jnp.float32)
            for v in losses.values():
                total = total + v
            return total, (losses, new_bn)

        (total, (losses, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_bn,
            opt_state=opt_state,
            rng=rng,
        )
        metrics = dict(losses)
        metrics["total_loss"] = total
        return new_state, metrics

    return train_step

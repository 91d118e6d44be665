"""Jitted train/eval steps over the device mesh.

One SPMD program replaces the reference's per-GPU processes: the batch is
sharded over the mesh's ``data`` axis, params/optimizer state are
replicated, and the MSE reduction is a global mean (XLA inserts the psum).
The CLU decoder's BatchNorm statistics are batch means under jit — with a
sharded batch they become *cross-replica* batch stats automatically, a
strict upgrade over per-GPU stats in torch DDP.

Loss is masked MSE so the final partial batch can be padded to a static
shape (reference torch loops simply take ragged final batches —
reference: CLIPLPIPS_REG_training_sweep_example.py:58-75).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from srsem.train.partition import merge_params

Array = jax.Array


def masked_mse(pred: Array, target: Array, mask: Array) -> Array:
    """Mean squared error over valid rows; maps broadcast the row mask."""
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if err.ndim > 1:
        mask_b = mask.reshape((-1,) + (1,) * (err.ndim - 1))
        return jnp.sum(err * mask_b) / (jnp.sum(mask) * err[0].size + 1e-9)
    return jnp.sum(err * mask) / (jnp.sum(mask) + 1e-9)


@dataclasses.dataclass
class StepFns:
    train_step: Callable
    eval_step: Callable


def build_step_fns(
    model,
    tx: optax.GradientTransformation,
    mesh,
    is_map_model: bool = False,
) -> StepFns:
    """Build jitted (train_step, eval_step).

    Sharding is placement-driven: callers device_put state/batches with the
    desired shardings (replicated params + data-sharded batches by default;
    ``dryrun_multichip`` additionally tensor-shards the frozen tower) and
    jit propagates them — pinning in_shardings here would force a reshard
    and forbid TP layouts.  ``trainable`` and ``opt_state`` are donated.
    """
    def apply_model(params, batch_stats, a, b, train: bool):
        variables: Dict[str, Any] = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if is_map_model:
            if train:
                pred, updates = model.apply(
                    variables, a, b, train=True, mutable=["batch_stats"])
                return pred, updates["batch_stats"]
            return model.apply(variables, a, b, train=False), batch_stats
        return model.apply(variables, a, b), batch_stats

    @partial(jax.jit, donate_argnums=(0, 1, 3))
    def train_step(trainable, opt_state, frozen, batch_stats, images, y, mask):
        a, b = images

        def loss_fn(tr):
            params = merge_params(tr, frozen)
            pred, new_stats = apply_model(params, batch_stats, a, b, train=True)
            return masked_mse(pred, y, mask), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        updates, new_opt_state = tx.update(grads, opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        return new_trainable, new_opt_state, new_stats, loss

    @jax.jit
    def eval_step(trainable, frozen, batch_stats, images, y, mask):
        a, b = images
        params = merge_params(trainable, frozen)
        pred, _ = apply_model(params, batch_stats, a, b, train=False)
        return pred, masked_mse(pred, y, mask)

    return StepFns(train_step=train_step, eval_step=eval_step)

"""Scalar objectives differentiated to produce CAMs.

Rebuilds the reference's Grad-CAM target classes
(reference: additional_approaches/src/my_pytorch_grad_cam_targets.py:7-48)
as closures returning pure functions — the idiomatic JAX shape for
objectives fed to ``jax.grad``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def _reduce(values: Array, reduction: str) -> Array:
    if reduction == "mean":
        return jnp.mean(values)
    if reduction == "sum":
        return jnp.sum(values)
    if reduction == "none":
        return values
    raise ValueError(f"unsupported reduction {reduction!r}")


def mse_target(target: Array, reduction: str = "mean") -> Callable[[Array], Array]:
    """MSE against a fixed embedding (reference :7-13)."""
    target = jnp.asarray(target)

    def fn(model_output: Array) -> Array:
        return _reduce((model_output - target) ** 2, reduction)

    return fn


def cosine_similarity_target(target: Array, reduction: str = "mean") -> Callable[[Array], Array]:
    """Cosine similarity against a fixed (pre-normalized) embedding
    (reference :15-40)."""
    t = jnp.asarray(target)
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True).clip(1e-12)

    def fn(model_output: Array) -> Array:
        out = model_output / jnp.linalg.norm(
            model_output, axis=-1, keepdims=True).clip(1e-12)
        cos = jnp.sum(t * out, axis=-1)
        return _reduce(cos, reduction)

    return fn


def vector_sum_target(_target: Array = None, reduction: str = "mean") -> Callable[[Array], Array]:
    """Plain sum of the output vector (reference :42-48)."""

    def fn(model_output: Array) -> Array:
        return jnp.sum(model_output)

    return fn

"""Train-step building blocks: masked MSE over scalars and maps."""

import jax.numpy as jnp
import numpy as np
import pytest

from srsem.train.steps import masked_mse


def test_masked_mse_scalar_ignores_padded_rows():
    pred = jnp.array([1.0, 2.0, 99.0])
    target = jnp.array([0.0, 0.0, 0.0])
    mask = jnp.array([1.0, 1.0, 0.0])
    # (1 + 4) / 2 — the padded row's huge error must not leak in.
    assert float(masked_mse(pred, target, mask)) == pytest.approx(2.5)


def test_masked_mse_map_broadcasts_row_mask():
    pred = jnp.ones((2, 4, 4))
    target = jnp.zeros((2, 4, 4))
    mask = jnp.array([1.0, 0.0])
    assert float(masked_mse(pred, target, mask)) == pytest.approx(1.0)


def test_masked_mse_all_masked_is_finite():
    pred = jnp.ones((2,))
    assert np.isfinite(float(masked_mse(pred, pred, jnp.zeros(2))))

"""TranSalNet saliency model + loss tests
(reference: additional_approaches/src/transalnet/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsem.explain.saliency import (
    DenseNet161Features,
    TranSalNetDense,
    loss_cc,
    loss_kldiv,
    loss_nss,
    loss_similarity,
    saliency_loss,
)


def test_densenet_tap_channels(rng):
    """Tap channels must match the reference's TransEncoder in_channels:
    768 / 2112 / 2208 (TranSalNet_Dense.py:93-95)."""
    model = DenseNet161Features()
    x = jnp.zeros((1, 96, 128, 3))
    (x3, x4, x5), _ = model.init_with_output(rng, x, train=False)
    assert x3.shape[-1] == 768 and x3.shape[1:3] == (12, 16)
    assert x4.shape[-1] == 2112 and x4.shape[1:3] == (6, 8)
    assert x5.shape[-1] == 2208 and x5.shape[1:3] == (3, 4)


@pytest.mark.slow
def test_transalnet_output_map(rng):
    model = TranSalNetDense()
    x = jnp.zeros((1, 96, 128, 3))
    out, _ = model.init_with_output(rng, x, train=False)
    assert out.shape == (1, 96, 128)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_saliency_losses(np_rng):
    a = np_rng.uniform(0.1, 1.0, (2, 16, 16)).astype(np.float32)
    # Perfect correlation with itself.
    assert float(np.mean(np.asarray(loss_cc(a, a)))) == pytest.approx(1.0, abs=1e-5)
    # KL of identical distributions ~ 0.
    assert float(np.mean(np.asarray(loss_kldiv(a, a)))) == pytest.approx(0.0, abs=1e-4)
    # SIM of identical maps ~ 1.
    assert float(np.mean(np.asarray(loss_similarity(a, a)))) == pytest.approx(1.0, abs=1e-3)
    # NSS: prediction z-scored at fixations; uniform fixations → ~0.
    fix = (np_rng.uniform(size=(2, 16, 16)) > 0.5).astype(np.float32)
    val = float(np.asarray(saliency_loss(a, fix, "nss")))
    assert np.isfinite(val)
    # dispatcher
    assert float(np.asarray(saliency_loss(a, a, "cc"))) == pytest.approx(1.0, abs=1e-5)

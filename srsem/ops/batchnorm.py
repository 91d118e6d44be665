"""BatchNorm with torch.nn.BatchNorm2d's EXACT training semantics.

``flax.linen.BatchNorm`` and torch agree on the train-mode output (both
normalize with the biased batch variance) and on the running-mean update,
but differ on the running-VARIANCE update: torch stores the
Bessel-corrected (unbiased, n/(n-1)) batch variance in ``running_var``
while flax stores the biased one.  The drift is O(1/n) per step —
irrelevant at production map resolutions (n = N·H·W ≈ 10^5) but exactly
the kind of unpinned training-dynamics gap that breaks golden train-parity
tests and, compounded over a 60-epoch CLU sweep at small spatial sizes,
erodes the "trained srsem == trained torch" contract (the SRCC ≤0.005
north star, BASELINE.md).  The trained-BN modules (the CLU decoder,
reference models/local_eval_models.py:38-82 via ``nn.BatchNorm2d``
defaults; TranSalNet, reference
additional_approaches/src/transalnet/TranSalNet_Dense.py) use this module
so srsem training reproduces torch training bit-for-bit (to fp32
tolerance — tests/test_train_parity.py).

Conventions match ``flax.linen.BatchNorm`` so checkpoints, converters
(srsem/utils/convert.py:convert_clu_decoder) and partitioners are
unaffected: params {scale, bias}, batch_stats {mean, var}, and the flax
momentum convention ``ra = momentum·ra + (1-momentum)·batch`` (flax
momentum 0.9 == torch momentum 0.1).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchBatchNorm(nn.Module):
    """Drop-in ``nn.BatchNorm`` replacement with torch running-var update.

    Train mode: normalize with the BIASED batch variance (torch does
    too), update ``batch_stats`` with running_mean ← momentum·rm +
    (1-momentum)·batch_mean and running_var ← momentum·rv +
    (1-momentum)·batch_var·n/(n-1) — the Bessel correction is the single
    intentional difference from ``flax.linen.BatchNorm``.
    """

    use_running_average: bool
    momentum: float = 0.9  # flax convention; == torch momentum 0.1
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feats = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((feats,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((feats,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones,
                           (feats,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (feats,), self.param_dtype)

        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            # Biased variance for normalization — torch semantics.  Two-pass
            # form, NOT E[x²]-E[x]² (flax's use_fast_variance default):
            # post-conv activations have |mean|² >> var, and the one-pass
            # form loses ~4 decimal digits to cancellation there — enough
            # to break fp32 train-parity through a 5-level decoder.
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                n = 1
                for ax in axes:
                    n *= x.shape[ax]
                bessel = float(n) / float(max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var * bessel

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype or x.dtype)

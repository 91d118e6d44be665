"""Classical image-quality metrics in JAX: PSNR, SSIM, sliding-window maps.

Replaces the reference's pyiqa/piq metric calls
(reference: additional_approaches/src/eval_utils/compute_metrics.py:25-27,
my_psnr_map.py:5-33, datasets/SRdatasetPseudolabelGen/
1_compute_image_metrics.py:7-57) with native implementations:

* ``psnr`` — 10·log10(data_range² / mse);
* ``ssim`` — the standard Gaussian-window (11, σ=1.5) SSIM with K1=0.01,
  K2=0.03, per-channel then averaged (pyiqa's default convention);
* ``psnr_map`` / ``ssim_map`` — per-pixel maps over replicate-padded
  sliding windows.  The reference unfolds 224²·11² patch tensors
  (my_psnr_map.py:21-27, ~2.9 GB at float32 per image!); here the window
  reduction is two separable box-filter convolutions — O(HW) memory,
  mathematically identical, and it maps onto the TPU's convolution units.

All functions take NHWC float arrays in [0, data_range].
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _separable_filter(x: Array, kernel_1d: Array) -> Array:
    """Valid-mode separable depthwise filter: the 1-D kernel applied along
    H then W.  x: (N, H, W, C)."""
    window = kernel_1d.shape[0]
    c = x.shape[-1]
    kh = jnp.tile(kernel_1d.reshape(window, 1, 1, 1), (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    kw = jnp.tile(kernel_1d.reshape(1, window, 1, 1), (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _box_filter_mean(x: Array, window: int) -> Array:
    """Per-pixel mean over a replicate-padded window×window neighborhood via
    separable depthwise convolution.  x: (N, H, W, C) → (N, H, W, C).

    Total pad is ``window - 1`` split (half, window-1-half): a symmetric
    (half, half) pad followed by a VALID conv returns (H+1, W+1) maps for
    EVEN windows, breaking the documented same-shape contract."""
    half = window // 2
    x = jnp.pad(x, ((0, 0), (half, window - 1 - half),
                    (half, window - 1 - half), (0, 0)), mode="edge")
    return _separable_filter(x, jnp.ones((window,), x.dtype) / window)


def _gaussian_kernel(window: int, sigma: float) -> np.ndarray:
    coords = np.arange(window) - (window - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_filter(x: Array, window: int, sigma: float) -> Array:
    """Valid-mode separable Gaussian filter (SSIM convention)."""
    return _separable_filter(x, jnp.asarray(_gaussian_kernel(window, sigma)))


@partial(jax.jit, static_argnames=("data_range",))
def psnr(x: Array, y: Array, data_range: float = 1.0) -> Array:
    """Per-image PSNR over NHWC batches → (N,)."""
    mse = jnp.mean((x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2,
                   axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


@partial(jax.jit, static_argnames=("data_range", "window", "sigma"))
def ssim(x: Array, y: Array, data_range: float = 1.0,
         window: int = 11, sigma: float = 1.5) -> Array:
    """Per-image mean SSIM over NHWC batches → (N,)."""
    return jnp.mean(_ssim_full(x, y, data_range, window, sigma), axis=(1, 2, 3))


def _ssim_full(x, y, data_range, window, sigma):
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_x = _gaussian_filter(x, window, sigma)
    mu_y = _gaussian_filter(y, window, sigma)
    sxx = _gaussian_filter(x * x, window, sigma) - mu_x ** 2
    syy = _gaussian_filter(y * y, window, sigma) - mu_y ** 2
    sxy = _gaussian_filter(x * y, window, sigma) - mu_x * mu_y
    return ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2))


@partial(jax.jit, static_argnames=("data_range", "window"))
def psnr_map(x: Array, y: Array, window: int = 11,
             data_range: float = 1.0) -> Array:
    """Per-pixel PSNR over replicate-padded windows, NHWC → (N, H, W)
    (reference: my_psnr_map.py:5-33 — same math, O(HW) memory via separable
    box filters instead of an unfolded patch tensor)."""
    err = (x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2
    local_mse = jnp.mean(_box_filter_mean(err, window), axis=-1)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(local_mse, 1e-12))


@partial(jax.jit, static_argnames=("data_range", "window", "sigma"))
def ssim_map(x: Array, y: Array, window: int = 11, sigma: float = 1.5,
             data_range: float = 1.0) -> Array:
    """Per-pixel SSIM map (valid region, channel-averaged) → (N, H', W')."""
    return jnp.mean(_ssim_full(x, y, data_range, window, sigma), axis=-1)

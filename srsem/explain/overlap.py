"""CAM comparison metrics: similarity matrices, quantile binarization,
overlap percentages (reference: additional_approaches/src/eval_utils/
compute_metrics.py:7-78)."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srsem.ops.image import resize_bilinear

Array = jax.Array


def similarity_matrix(vectors: Array, target_factory: Callable,
                      dim_mean: bool = False) -> np.ndarray:
    """n×n matrix of target_factory(v_i)(v_j) scores — vectorized version of
    the reference's row loop (reference: compute_metrics.py:7-22)."""
    vectors = jnp.asarray(vectors)
    n = vectors.shape[0]
    rows = []
    for i in range(n):
        fn = target_factory(vectors[i])
        out = jax.vmap(lambda v: fn(v))(vectors)
        if dim_mean and out.ndim > 1:
            out = jnp.mean(out, axis=-1)
        rows.append(out)
    return np.asarray(jnp.stack(rows))


def binarize_top_percent(x: Array, top_percent: float = 0.9) -> Array:
    """1 for values ≥ the (1 - top_percent) quantile, else 0
    (reference: compute_metrics.py:32-45; quantile uses linear
    interpolation like torch.quantile)."""
    x = jnp.asarray(x, jnp.float32)
    threshold = jnp.quantile(x.reshape(-1), 1.0 - top_percent)
    return (x >= threshold).astype(jnp.float32)


def overlap_metrics(a: Array, b: Array,
                    top_percent: float = 0.9) -> Tuple[float, float, float]:
    """(%A-in-B, %B-in-A, %overlap-of-total) between binarized heatmaps;
    ``b`` is bilinearly resized to ``a``'s shape first
    (reference: compute_metrics.py:47-78)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if b.shape != a.shape:
        b = resize_bilinear(b[None, ..., None], a.shape)[0, ..., 0]
    bin_a = binarize_top_percent(a, top_percent)
    bin_b = binarize_top_percent(b, top_percent)
    overlap = float(jnp.sum(bin_a * bin_b))
    total_a = float(jnp.sum(bin_a))
    total_b = float(jnp.sum(bin_b))
    total_pixels = bin_a.size
    pct_a_in_b = (overlap / total_a) * 100 if total_a > 0 else 0.0
    pct_b_in_a = (overlap / total_b) * 100 if total_b > 0 else 0.0
    return pct_a_in_b, pct_b_in_a, (overlap / total_pixels) * 100

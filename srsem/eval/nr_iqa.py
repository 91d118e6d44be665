"""Native no-reference IQA head — a trainable stand-in for KonIQ++.

The reference scores SR outputs with an external KonIQ++ checkout
(reference: datasets/SRdatasetPseudolabelGen/1_compute_image_metrics.py:
7-57 — columns Koniq++{IQA, blur, artifacts, contrast, color}) that is not
in its tree.  This module provides the native equivalent: a 5-output
regression head (overall quality + the four distortion dimensions) over
the frozen ImageNet ResNet-50 pyramid — per-stage GAP features,
concatenated, through a small MLP.  Train it on KonIQ-10k-style labels
with the standard harness (masked MSE; srsem.train); once trained it slots
into ImageQualityMetrics as the ``koniqpp`` backend
(srsem/eval/folder_metrics.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from srsem.backbones.resnet import IMAGENET_STAGE_TAPS, ImageNetResNet50

Array = jax.Array

OUTPUT_NAMES = ("Koniq++IQA", "Koniq++blur", "Koniq++artifacts",
                "Koniq++contrast", "Koniq++color")


class NrIqaHead(nn.Module):
    """Frozen tower → per-stage GAP → concat → MLP → 5 quality scores."""

    compute_dtype: Any = jnp.bfloat16
    hidden: int = 512

    @nn.compact
    def __call__(self, x: Array) -> Array:
        backbone = ImageNetResNet50(dtype=self.compute_dtype, name="backbone")
        _, taps = backbone(x)
        taps = jax.tree.map(jax.lax.stop_gradient, taps)
        pooled = jnp.concatenate(
            [jnp.mean(taps[n].astype(jnp.float32), axis=(1, 2))
             for n in IMAGENET_STAGE_TAPS], axis=-1)
        # LayerNorm decouples head training from the tower's feature scale
        # (random-init towers produce O(10..100) GAP features; pretrained
        # towers O(1) — same head trains stably on both).
        pooled = nn.LayerNorm(name="head.norm")(pooled)
        h = nn.Dense(self.hidden, param_dtype=jnp.float32, name="head.fc1")(pooled)
        h = nn.relu(h)
        h = nn.Dense(self.hidden // 2, param_dtype=jnp.float32,
                     name="head.fc2")(h)
        h = nn.relu(h)
        # Zero-init output: predictions start at 0 so the initial loss is
        # E[y^2], not the random-projection blow-up.
        return nn.Dense(len(OUTPUT_NAMES), param_dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros,
                        name="head.out")(h)


class NrIqaScorer:
    """KonIQ++-backend adapter for ImageQualityMetrics: path → score dict."""

    def __init__(self, variables, image_size: int = 224,
                 compute_dtype: str = "bfloat16"):
        from srsem.data.preprocess import Preprocess

        self.model = NrIqaHead(compute_dtype=jnp.dtype(compute_dtype))
        self.variables = variables
        self.preprocess = Preprocess.for_backbone("resnet50", image_size)
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))

    def __call__(self, path: str) -> Dict[str, float]:
        img = self.preprocess(path)[None]
        out = np.asarray(self._apply(self.variables, jnp.asarray(img)))[0]
        return dict(zip(OUTPUT_NAMES, out.tolist()))

    def batch(self, images: Array) -> Array:
        """Normalized NHWC batch → (N, 5) scores (for the batched folder
        pipeline)."""
        return self._apply(self.variables, images)

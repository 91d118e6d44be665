"""Global pair-scoring regressors ("CLIP-LPIPS").

Reimplements all eight variants of the reference's
``models/global_eval_models.py`` as one configurable Flax module.  Shared
numerics (reference: models/global_eval_models.py:341-397):

* run both images through the frozen backbone,
* per tapped layer, squared difference ``(f_a - f_b) ** 2``,
* a small trained head: 1x1-conv/linear to one channel, arithmetic mean over
  spatial dims (or ViT tokens) then over layers, final ReLU.

TPU-first deviations from the reference (behavior-preserving):

* the two backbone passes become ONE pass on a 2N batch (concat A and B on
  the batch axis) — twice the MXU occupancy, identical math;
* no forward hooks / mutable dicts — the backbone returns its tap pyramid;
* heads run in float32 regardless of the backbone compute dtype (they are
  tiny; the backbone is bfloat16 by default);
* the fused squared-diff → 1x1-conv → spatial-mean scoring path has a
  Pallas kernel (srsem/ops/fused_head.py) used by the inference scorer.

Head variants and their reference classes:

==================  ==============================================  =========
cfg.head            reference class                                 lines
==================  ==============================================  =========
stages_cnn          CLIP_lpips_stages_cnn (flagship, CLIP RN50)     :308-429
stages_cnn (with    CLIP_lpips_stages_cnn_clsbckb (ImageNet RN50,
 backbone=resnet50)  README's winning variant)                      :682-812
wperlay_cnn         CLIP_lpips_wperlay_cnn                          :815-914
stages_cnn_pooling  CLIP_lpips_stages_cnn_pooling                   :431-564
emb_lin             CLIP_lpips_stages_emb_lin                       :566-680
single_lin_vit      CLIP_lpips_singleLin_vit                        :6-100
stages_vit          CLIP_lpips_stages_vit                           :103-202
wperlay_vit         CLIP_lpips_wperlay_vit                          :205-305
unet_global         CLIP_lpips_Unet (global copy, no sigmoid)       :921-1068
==================  ==============================================  =========
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from srsem.backbones.resnet import (
    CLIP_STAGE_TAPS,
    IMAGENET_STAGE_TAPS,
    make_backbone,
)
from srsem.backbones.vit import vit_block_taps
from srsem.core.config import GlobalModelConfig

Array = jax.Array

# Two head inits, matching the reference exactly:
# * the 1x1-conv / linear scoring heads use torch's DEFAULT Conv2d/Linear
#   init — kaiming_uniform(a=√5) over fan_in, i.e. U(±1/√fan_in) —
#   because the stages_cnn/wperlay/vit classes never call init_weights.
#   (Kaiming fan_out would be catastrophic here: a C→1 head has fan_out=1
#   → std≈1.4, inflating initial scores ~70× and driving the final ReLU
#   dead under training.)
# * the MLP variants call init_weights with Kaiming-normal fan_out
#   (reference: models/global_eval_models.py:527-532).
_head_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# Head bias starts slightly positive: squared-diff inputs are nonnegative,
# so the sign of the initial pre-ReLU score is one random draw per head —
# a 50% chance the final ReLU is born dead and training never starts.
# +0.01 sits inside torch's own default bias range U(±1/√fan_in) but on
# the live side.
_head_bias_init = nn.initializers.constant(0.01)
_mlp_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def stage_taps_for(kind: str, depth: int) -> Tuple[str, ...]:
    """The ``depth + 1`` deepest per-stage taps — the reference's
    ``range(3-depth, 4)`` / ``range(4-depth, 5)`` includes the last stage
    plus ``depth`` more (reference: models/global_eval_models.py:327,701),
    so depth∈{1,2,3} taps 2..4 stages."""
    names = CLIP_STAGE_TAPS if kind == "resnet50_clip" else IMAGENET_STAGE_TAPS
    return names[3 - depth:]


def wperlay_taps(depth: int) -> Tuple[str, ...]:
    """Last ``depth + 1`` of the 12 per-block taps
    (reference: models/global_eval_models.py:832-833)."""
    names = [f"stages.{s}.{b}.act" for s in range(4) for b in range(3)]
    return tuple(names[11 - depth:])


def squared_diffs(
    taps_a: Dict[str, Array], taps_b: Dict[str, Array], names: Sequence[str]
) -> List[Array]:
    return [
        (taps_a[n].astype(jnp.float32) - taps_b[n].astype(jnp.float32)) ** 2
        for n in names
    ]


class ConvHeadAggregator(nn.Module):
    """Per-layer 1x1-conv-to-scalar heads + spatial mean + layer mean + ReLU
    — the shared aggregation of stages_cnn / clsbckb / wperlay
    (reference: models/global_eval_models.py:379-395)."""

    n_layers: int

    @nn.compact
    def __call__(self, diffs: List[Array]) -> Array:
        scores = []
        for j, d in enumerate(diffs):
            # 1x1 conv C→1 == Dense over the channel axis.
            w = nn.Dense(1, kernel_init=_head_init,
                         bias_init=_head_bias_init, param_dtype=jnp.float32,
                         name=f"w_layers.{j}")(d)[..., 0]
            scores.append(jnp.mean(w, axis=(1, 2)))
        return nn.relu(jnp.mean(jnp.stack(scores, axis=0), axis=0))


class TokenHeadAggregator(nn.Module):
    """ViT-token analogue: linear head on squared token diffs, mean over
    tokens then layers, ReLU.  ``shared`` uses one head for all layers
    (singleLin, reference :29-80); otherwise one per layer (:125,:227)."""

    n_layers: int
    shared: bool = False

    @nn.compact
    def __call__(self, diffs: List[Array]) -> Array:
        shared_head = (nn.Dense(1, kernel_init=_head_init,
                                bias_init=_head_bias_init,
                                param_dtype=jnp.float32, name="w_layer")
                       if self.shared else None)
        scores = []
        for j, d in enumerate(diffs):  # d: (N, tokens, width)
            head = shared_head or nn.Dense(
                1, kernel_init=_head_init, bias_init=_head_bias_init,
                param_dtype=jnp.float32, name=f"w_layers.{j}")
            w = head(d)[..., 0]
            scores.append(jnp.mean(w, axis=-1))
        return nn.relu(jnp.mean(jnp.stack(scores, axis=0), axis=0))


class MlpHead(nn.Module):
    """ReLU MLP ending in a scalar, Kaiming fan-out init (reference
    fin_lin, models/global_eval_models.py:460-469,594-601).  The final ReLU
    lives inside the Sequential in the reference, so it is part of the head
    here too."""

    widths: Tuple[int, ...]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x.astype(jnp.float32)
        for j, width in enumerate(self.widths):
            h = nn.Dense(width, kernel_init=_mlp_init, param_dtype=jnp.float32,
                         name=f"fin_lin.{j}")(h)
            h = nn.relu(h)
        return h[..., 0]


class GlobalPairScorer(nn.Module):
    """score = model(a, b) for NHWC image batches a, b."""

    cfg: GlobalModelConfig

    def setup(self):
        self.backbone = make_backbone(self.cfg.backbone)
        head, depth = self.cfg.head, self.cfg.depth
        kind = self.cfg.backbone.kind
        if head == "stages_cnn":
            self.tap_names = stage_taps_for(kind, depth)
            self.aggregator = ConvHeadAggregator(len(self.tap_names))
        elif head == "wperlay_cnn":
            self.tap_names = wperlay_taps(depth)
            self.aggregator = ConvHeadAggregator(len(self.tap_names))
        elif head == "stages_cnn_pooling":
            self.tap_names = stage_taps_for(kind, depth)
            # Widths mirror the reference's (sic) 2056/1028 sizes (:460-469).
            self.aggregator = MlpHead((2056, 1028, 512, 1))
        elif head == "emb_lin":
            self.tap_names = ()
            self.aggregator = MlpHead((1028, 512, 1))
        elif head == "single_lin_vit":
            self.tap_names = vit_block_taps(depth, total=self.cfg.backbone.vit_depth)
            self.aggregator = TokenHeadAggregator(len(self.tap_names), shared=True)
        elif head == "stages_vit":
            # Every 3rd block to mirror ResNet's four stages
            # (reference: models/global_eval_models.py:116).
            self.tap_names = vit_block_taps(
                depth, total=self.cfg.backbone.vit_depth, step=3)
            self.aggregator = TokenHeadAggregator(len(self.tap_names))
        elif head == "wperlay_vit":
            self.tap_names = vit_block_taps(depth, total=self.cfg.backbone.vit_depth)
            self.aggregator = TokenHeadAggregator(len(self.tap_names))
        else:
            raise ValueError(f"unknown global head {self.cfg.head!r}")

    def __call__(self, a: Array, b: Array) -> Array:
        n = a.shape[0]
        emb, taps = self.backbone(jnp.concatenate([a, b], axis=0))
        if not self.cfg.enc_ft:
            emb = jax.lax.stop_gradient(emb)
            taps = jax.tree.map(jax.lax.stop_gradient, taps)
        taps_a = {k: v[:n] for k, v in taps.items()}
        taps_b = {k: v[n:] for k, v in taps.items()}

        if self.cfg.head == "emb_lin":
            feats = jnp.concatenate(
                [emb[:n].astype(jnp.float32), emb[n:].astype(jnp.float32)], axis=-1)
            return self.aggregator(feats)
        if self.cfg.head == "stages_cnn_pooling":
            # Absolute (not diff) features: per-stage GAP, concat stages,
            # then concat A/B (reference :514-526).
            pooled = [
                jnp.mean(taps[nm].astype(jnp.float32), axis=(1, 2))
                for nm in self.tap_names
            ]
            pooled = jnp.concatenate(pooled, axis=-1)
            feats = jnp.concatenate([pooled[:n], pooled[n:]], axis=-1)
            return self.aggregator(feats)
        diffs = squared_diffs(taps_a, taps_b, self.tap_names)
        return self.aggregator(diffs)


def make_global_model(cfg: GlobalModelConfig):
    if cfg.head == "unet_global":
        # The reference's global CLIP_lpips_Unet copy — the CLU decoder
        # without the final sigmoid, emitting a raw map
        # (reference: models/global_eval_models.py:921-1068).
        from srsem.models.local_models import CluUnet

        return CluUnet(
            backbone_kind=cfg.backbone.kind,
            compute_dtype=jnp.dtype(cfg.backbone.compute_dtype),
            image_size=cfg.backbone.image_size,
            sigmoid=False)
    return GlobalPairScorer(cfg)

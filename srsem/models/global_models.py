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


def head_bias_initializer(mode: str, fan_in: int):
    """Scoring-head bias initializer for ``cfg.head_bias_init``.

    ``"live"`` — constant +0.01 (the dead-ReLU-safe default, see above).
    ``"torch"`` — torch's Conv2d/Linear default ``U(±1/√fan_in)``: the
    reference heads never call init_weights, so their biases sample
    ``kaiming_uniform``'s companion bias distribution
    (reference: models/global_eval_models.py:361-369 → torch
    ``nn.Conv2d`` ``reset_parameters``).  ``fan_in`` is the head's input
    channel/width count — it cannot be derived from the bias shape
    ``(1,)``, hence the factory.
    """
    if mode == "live":
        return _head_bias_init
    if mode == "torch":
        bound = float(fan_in) ** -0.5

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return init
    raise ValueError(f"unknown head_bias_init {mode!r}")


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
    bias_init: str = "live"

    @nn.compact
    def __call__(self, diffs: List[Array]) -> Array:
        scores = []
        for j, d in enumerate(diffs):
            # 1x1 conv C→1 == Dense over the channel axis.
            w = nn.Dense(1, kernel_init=_head_init,
                         bias_init=head_bias_initializer(
                             self.bias_init, d.shape[-1]),
                         param_dtype=jnp.float32,
                         name=f"w_layers.{j}")(d)[..., 0]
            scores.append(jnp.mean(w, axis=(1, 2)))
        return nn.relu(jnp.mean(jnp.stack(scores, axis=0), axis=0))


def fused_grouped_head(
    head_params, taps_g: Dict[str, Array], taps_s: Dict[str, Array],
    names: Sequence[str],
) -> Array:
    """:class:`ConvHeadAggregator` scoring in grouped (G, K) layout.

    ``taps_g`` holds G shared-GT taps, ``taps_s`` G*K SR taps; returns
    (G, K) scores.  Numerically equivalent to applying the aggregator to
    the K per-pair squared-diff pyramids — the head math is algebraically
    identical (``mean_hw(d @ w + b) == sum_hwc(d * w) / (h*w) + b``), only
    the FP reduction order differs.  Written this way the broadcast
    GT-vs-K diff, the square, and the weighted reduce stay ONE XLA fusion,
    so the (G, K, h, w, c) diff tensor is never materialized in HBM
    (BENCH_NOTES.md: 1.39× over dense pairwise at K=5).

    This helper OWNS the aggregator's param layout (``w_layers.{j}``
    kernel/bias); grouped callers (srsem/eval/grouped.py,
    srsem/eval/dataset_sweep.py) must use it rather than reaching into the
    params themselves.
    """
    g = taps_g[names[0]].shape[0]
    layer_scores = []
    for j, nm in enumerate(names):
        tg = taps_g[nm].astype(jnp.float32)[:, None]
        t = taps_s[nm]
        k = t.shape[0] // g
        ts = t.reshape((g, k) + t.shape[1:]).astype(jnp.float32)
        d = (tg - ts) ** 2  # fused into the reduce, not materialized
        w = head_params[f"w_layers.{j}"]["kernel"][:, 0].astype(jnp.float32)
        b = head_params[f"w_layers.{j}"]["bias"][0].astype(jnp.float32)
        hw = t.shape[1] * t.shape[2]
        layer_scores.append(jnp.sum(d * w, axis=(2, 3, 4)) / hw + b)
    return nn.relu(jnp.mean(jnp.stack(layer_scores, axis=0), axis=0))


def _token_head(head_params, j: int, shared: bool):
    """(w, b) of the j-th :class:`TokenHeadAggregator` head — ``w_layer``
    when shared (singleLin), ``w_layers.{j}`` otherwise.  Owns the param
    layout like :func:`fused_grouped_head`."""
    p = head_params["w_layer"] if shared else head_params[f"w_layers.{j}"]
    return (p["kernel"][:, 0].astype(jnp.float32),
            p["bias"][0].astype(jnp.float32))


def fused_grouped_token_head(
    head_params, taps_g: Dict[str, Array], taps_s: Dict[str, Array],
    names: Sequence[str], shared: bool = False,
) -> Array:
    """:class:`TokenHeadAggregator` scoring in grouped (G, K) layout.

    The ViT analogue of :func:`fused_grouped_head`: GT token taps
    (G, T, W) broadcast against SR taps (G*K, T, W), the per-layer linear
    head folded into the reduction (``mean_t(d @ w + b) ==
    sum_{t,w}(d * w) / T + b``), so the (G, K, T, W) diff tensor is never
    materialized.  ``shared`` selects the singleLin shared head
    (reference: models/global_eval_models.py:29-80 vs :125,:227).
    """
    g = taps_g[names[0]].shape[0]
    layer_scores = []
    for j, nm in enumerate(names):
        w, b = _token_head(head_params, j, shared)
        tg = taps_g[nm].astype(jnp.float32)[:, None]  # (G, 1, T, W)
        t = taps_s[nm]
        k = t.shape[0] // g
        ts = t.reshape((g, k) + t.shape[1:]).astype(jnp.float32)
        d = (tg - ts) ** 2  # fused into the reduce, not materialized
        tokens = t.shape[1]
        layer_scores.append(jnp.sum(d * w, axis=(2, 3)) / tokens + b)
    return nn.relu(jnp.mean(jnp.stack(layer_scores, axis=0), axis=0))


def token_head_from_stats(
    head_params, stats: Sequence[Array], shared: bool = False,
) -> Array:
    """:class:`TokenHeadAggregator` scoring from per-layer diff statistics.

    ``stats[j]`` is the token mean of the j-th squared-diff level, shape
    ``(..., W)`` — the exact sufficient statistic of the linear head, as
    :func:`conv_head_from_stats` is for the conv heads:
    ``mean_t(d @ w + b) == dot(mean_t(d), w) + b``.
    """
    layer_scores = []
    for j, s in enumerate(stats):
        w, b = _token_head(head_params, j, shared)
        layer_scores.append(jnp.tensordot(
            s.astype(jnp.float32), w, axes=([-1], [0])) + b)
    return nn.relu(jnp.mean(jnp.stack(layer_scores, axis=0), axis=0))


def grouped_diff_pyramid(
    taps_g: Dict[str, Array], taps_s: Dict[str, Array],
    names: Sequence[str], dtype=jnp.float32,
) -> List[Array]:
    """Per-pair squared-diff pyramids from grouped taps.

    GT taps (G, h, w, c) broadcast against SR taps (G*K, h, w, c) →
    ``[(G*K, h, w, c), ...]`` in ``dtype``, ready for
    :meth:`CluUnet.decode_from_diffs`.  The broadcast subtract/square fuses
    into the consumer, so the GT tap tensors are never tiled K× in HBM.
    """
    g = taps_g[names[0]].shape[0]
    out = []
    for nm in names:
        tg = taps_g[nm].astype(jnp.float32)[:, None]
        t = taps_s[nm]
        k = t.shape[0] // g
        ts = t.reshape((g, k) + t.shape[1:]).astype(jnp.float32)
        out.append(
            (((tg - ts) ** 2).astype(dtype)).reshape((g * k,) + t.shape[1:]))
    return out


def conv_head_from_stats(
    head_params, stats: Sequence[Array],
) -> Array:
    """:class:`ConvHeadAggregator` scoring from per-layer diff statistics.

    ``stats[j]`` is the spatial mean of the j-th squared-diff pyramid
    level, shape ``(..., C_j)`` — the head's *sufficient statistic*: since
    the head is a 1x1 conv followed by a spatial mean,
    ``mean_hw(d @ w + b) == dot(mean_hw(d), w) + b`` exactly, so scores
    (and head gradients) computed from the ~C-float stat equal those
    computed from the full (h, w, C) diff tensor up to FP reduction order.
    This is what makes the stat-cache sweep (srsem/train/statcache.py)
    exact: ~15 KB/pair instead of ~6 MB/pair.

    Like :func:`fused_grouped_head`, this helper OWNS the aggregator's
    param layout (``w_layers.{j}`` kernel/bias); callers must not reach
    into the params themselves.
    """
    layer_scores = []
    for j, s in enumerate(stats):
        w = head_params[f"w_layers.{j}"]["kernel"][:, 0].astype(jnp.float32)
        b = head_params[f"w_layers.{j}"]["bias"][0].astype(jnp.float32)
        layer_scores.append(jnp.tensordot(
            s.astype(jnp.float32), w, axes=([-1], [0])) + b)
    return nn.relu(jnp.mean(jnp.stack(layer_scores, axis=0), axis=0))


def conv_head_params(weights: Sequence[Array], biases: Sequence[float]):
    """Build a :class:`ConvHeadAggregator` param tree from per-layer
    weight vectors ``weights[j]`` (shape ``(C_j,)``) and scalar biases.

    Owns the ``w_layers.{j}`` kernel/bias layout like
    :func:`conv_head_from_stats` / :func:`fused_grouped_head`; the
    closed-form head solver (srsem/train/statcache.py) uses it to emit
    params interchangeable with Adam-trained ones.
    """
    return {
        f"w_layers.{j}": {
            "kernel": jnp.asarray(w, jnp.float32).reshape(-1, 1),
            "bias": jnp.asarray([b], jnp.float32),
        }
        for j, (w, b) in enumerate(zip(weights, biases))
    }


def token_head_params(weights: Sequence[Array], biases: Sequence[float],
                      shared: bool = False):
    """:class:`TokenHeadAggregator` param tree from per-layer weight
    vectors — the Dense layout is identical to the conv heads'
    (:func:`conv_head_params`); ``shared`` emits the singleLin ``w_layer``
    (reference: models/global_eval_models.py:29-31) from ONE weight/bias.
    """
    params = conv_head_params(weights, biases)
    if not shared:
        return params
    if len(weights) != 1:
        raise ValueError("shared head takes exactly one weight vector")
    return {"w_layer": params["w_layers.0"]}


class TokenHeadAggregator(nn.Module):
    """ViT-token analogue: linear head on squared token diffs, mean over
    tokens then layers, ReLU.  ``shared`` uses one head for all layers
    (singleLin, reference :29-80); otherwise one per layer (:125,:227)."""

    n_layers: int
    shared: bool = False
    bias_init: str = "live"

    @nn.compact
    def __call__(self, diffs: List[Array]) -> Array:
        bias_init = head_bias_initializer(self.bias_init, diffs[0].shape[-1])
        shared_head = (nn.Dense(1, kernel_init=_head_init,
                                bias_init=bias_init,
                                param_dtype=jnp.float32, name="w_layer")
                       if self.shared else None)
        scores = []
        for j, d in enumerate(diffs):  # d: (N, tokens, width)
            head = shared_head or nn.Dense(
                1, kernel_init=_head_init, bias_init=bias_init,
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
        bias_mode = self.cfg.head_bias_init
        # Validate for EVERY head so a typo fails at build time, not only
        # on the conv/vit heads that consult it.  The MLP heads
        # (stages_cnn_pooling / emb_lin) legitimately ignore the mode:
        # their reference classes call init_weights explicitly (Kaiming,
        # reference: models/global_eval_models.py:474,527-531), so there is no
        # torch-default-vs-live choice to make for them.
        if bias_mode not in ("live", "torch"):
            raise ValueError(f"unknown head_bias_init {bias_mode!r}")
        if head == "stages_cnn":
            self.tap_names = stage_taps_for(kind, depth)
            self.aggregator = ConvHeadAggregator(
                len(self.tap_names), bias_init=bias_mode)
        elif head == "wperlay_cnn":
            self.tap_names = wperlay_taps(depth)
            self.aggregator = ConvHeadAggregator(
                len(self.tap_names), bias_init=bias_mode)
        elif head == "stages_cnn_pooling":
            self.tap_names = stage_taps_for(kind, depth)
            # Widths mirror the reference's (sic) 2056/1028 sizes (:460-469).
            self.aggregator = MlpHead((2056, 1028, 512, 1))
        elif head == "emb_lin":
            self.tap_names = ()
            self.aggregator = MlpHead((1028, 512, 1))
        elif head == "single_lin_vit":
            self.tap_names = vit_block_taps(depth, total=self.cfg.backbone.vit_depth)
            self.aggregator = TokenHeadAggregator(
                len(self.tap_names), shared=True, bias_init=bias_mode)
        elif head == "stages_vit":
            # Every 3rd block to mirror ResNet's four stages
            # (reference: models/global_eval_models.py:116).
            self.tap_names = vit_block_taps(
                depth, total=self.cfg.backbone.vit_depth, step=3)
            self.aggregator = TokenHeadAggregator(
                len(self.tap_names), bias_init=bias_mode)
        elif head == "wperlay_vit":
            self.tap_names = vit_block_taps(depth, total=self.cfg.backbone.vit_depth)
            self.aggregator = TokenHeadAggregator(
                len(self.tap_names), bias_init=bias_mode)
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
        return self.score_from_taps(emb[:n], emb[n:], taps_a, taps_b)

    def score_from_taps(self, emb_a: Array, emb_b: Array,
                        taps_a: Dict[str, Array],
                        taps_b: Dict[str, Array]) -> Array:
        """Head application on precomputed tower outputs — the single owner
        of every head's tap/param semantics.  Callable via ``model.apply(
        variables, ..., method=GlobalPairScorer.score_from_taps)`` by
        serving paths that produce taps elsewhere (e.g. the fused Pallas
        tower, srsem/backbones/fused_resnet.py)."""
        if self.cfg.head == "emb_lin":
            feats = jnp.concatenate(
                [emb_a.astype(jnp.float32), emb_b.astype(jnp.float32)],
                axis=-1)
            return self.aggregator(feats)
        if self.cfg.head == "stages_cnn_pooling":
            # Absolute (not diff) features: per-stage GAP, concat stages,
            # then concat A/B (reference :514-526).
            pool = lambda taps: jnp.concatenate(  # noqa: E731
                [jnp.mean(taps[nm].astype(jnp.float32), axis=(1, 2))
                 for nm in self.tap_names], axis=-1)
            feats = jnp.concatenate([pool(taps_a), pool(taps_b)], axis=-1)
            return self.aggregator(feats)
        diffs = squared_diffs(taps_a, taps_b, self.tap_names)
        return self.aggregator(diffs)


def make_global_model(cfg: GlobalModelConfig, split_tower: bool = False):
    """``split_tower`` only affects ``head="unet_global"`` (the CluUnet
    copy): mesh-aware callers pass ``mesh.shape["data"] > 1`` so the
    GT+SR tower concat never forces a GSPMD all-to-all reshard (see
    CluUnet.split_tower); the conv/vit heads ignore it."""
    if cfg.head == "unet_global":
        # The reference's global CLIP_lpips_Unet copy — the CLU decoder
        # without the final sigmoid, emitting a raw map
        # (reference: models/global_eval_models.py:921-1068).
        from srsem.models.local_models import CluUnet

        return CluUnet(
            backbone_kind=cfg.backbone.kind,
            compute_dtype=jnp.dtype(cfg.backbone.compute_dtype),
            image_size=cfg.backbone.image_size,
            sigmoid=False,
            split_tower=split_tower)
    return GlobalPairScorer(cfg)

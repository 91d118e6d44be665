"""Fused-serving ResNet-50 towers: same params, Pallas bottleneck interiors.

A pure-function re-expression of srsem/backbones/resnet.py's two towers
that consumes the SAME Flax param tree (param paths are plain dict keys)
but routes the 12 stride-1 interior bottlenecks through the VMEM-resident
Pallas kernel (srsem/ops/fused_bottleneck.py).  Everything else — stems,
the four downsampling blocks, max/avg pools, CLIP's attention pool — stays
on XLA, with frozen BN folded into conv weights so each plain conv is one
conv + bias.

Serving-only by design: no LoRA deltas (the frozen serving tower never
carries them) and no tap gradient offsets.  Parity with
``backbone.apply`` is pinned by tests/test_fused_bottleneck.py; scorers
opt in via their ``fused_tower`` flag once the on-chip A/B favors it
(BENCH_NOTES.md).

Tap names match the reference's forward-hook names verbatim, exactly as
the Flax towers do (reference: models/global_eval_models.py:327,701;
models/local_eval_models.py:28,196).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from srsem.backbones.resnet import (
    CLIP_STAGE_TAPS,
    CLIP_STEM_TAP,
    IMAGENET_STAGE_TAPS,
    IMAGENET_STEM_TAP,
    STAGE_BLOCKS,
)
from srsem.ops.fused_bottleneck import (
    bottleneck_weights,
    fold_bn_into_conv,
    fused_bottleneck,
    fused_bottleneck_tiled,
)

Array = jax.Array


def _conv(x: Array, kernel: Array, stride: int = 1,
          bias: Array | None = None) -> Array:
    k = kernel.shape[0]
    p = k // 2
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def _conv_bn(x: Array, p: dict, conv: str, bn: str, stride: int = 1,
             relu: bool = True) -> Array:
    w, b = fold_bn_into_conv(p[conv]["kernel"], p[bn])
    y = _conv(x, w, stride, b)
    return nn.relu(y) if relu else y


def _plain_imagenet_block(p: dict, x: Array, stride: int) -> Array:
    h = _conv_bn(x, p, "conv1", "bn1")
    h = _conv_bn(h, p, "conv2", "bn2", stride=stride)
    h = _conv_bn(h, p, "conv3", "bn3", relu=False)
    if "downsample_conv" in p:
        x = _conv_bn(x, p, "downsample_conv", "downsample_bn",
                     stride=stride, relu=False)
    return nn.relu(h + x)


def _plain_clip_block(p: dict, x: Array, stride: int) -> Array:
    h = _conv_bn(x, p, "conv1", "bn1")
    h = _conv_bn(h, p, "conv2", "bn2")
    if stride > 1:
        h = nn.avg_pool(h, (stride, stride), (stride, stride))
    h = _conv_bn(h, p, "conv3", "bn3", relu=False)
    if stride > 1 or x.shape[-1] != h.shape[-1]:
        if stride > 1:
            x = nn.avg_pool(x, (stride, stride), (stride, stride))
        x = _conv_bn(x, p, "downsample_conv", "downsample_bn", relu=False)
    return nn.relu(h + x)


def _fused_block(p: dict, x: Array, dtype, interpret: bool,
                 row_tile: int | None = None) -> Array:
    w1, b1, w2, b2, w3, b3 = bottleneck_weights(p)
    if row_tile and x.shape[1] // row_tile >= 2 and x.shape[1] % row_tile == 0:
        # Halo-tiled variant: tiny per-step buffers for compile-hostile
        # whole-image shapes (stage 0 — srsem/ops/fused_bottleneck.py).
        return fused_bottleneck_tiled(x, w1, b1, w2, b2, w3, b3,
                                      row_tile=row_tile, compute_dtype=dtype,
                                      interpret=interpret)
    return fused_bottleneck(x, w1, b1, w2, b2, w3, b3,
                            compute_dtype=dtype, interpret=interpret)


def _attnpool(p: dict, x: Array, dtype) -> Array:
    """CLIP attention pool from the param dict — mirrors
    srsem/backbones/resnet.py::AttentionPool2d."""
    n, h, w, c = x.shape
    tokens = x.reshape(n, h * w, c)
    mean = jnp.mean(tokens, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)

    from srsem.ops.image import interpolate_pos_embed

    pos = interpolate_pos_embed(p["positional_embedding"], (h, w))
    tokens = tokens.astype(dtype) + pos.astype(dtype)

    dense = lambda name, t: (  # noqa: E731
        t @ p[name]["kernel"].astype(dtype) + p[name]["bias"].astype(dtype))
    q = dense("q_proj", tokens[:, :1])
    k = dense("k_proj", tokens)
    v = dense("v_proj", tokens)

    num_heads = 32
    head_dim = c // num_heads
    split = lambda t: t.reshape(n, t.shape[1], num_heads, head_dim)  # noqa: E731
    attn = jnp.einsum("nqhd,nkhd->nhqk", split(q), split(k)) / jnp.sqrt(
        jnp.asarray(head_dim, dtype))
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", attn, split(v)).reshape(n, 1, c)
    return dense("out_proj", out)[:, 0]


#: Stages whose interior blocks run the Pallas kernel by default when the
#: EXPERIMENTAL ``fused_tower`` flag is set.  Stage 0 (56x56x256 at 224px
#: input) is excluded: its whole-image fused block crashes the axon
#: remote-compile helper (HTTP 500, tpu_compile_helper exit 1); opting it
#: in routes it through the halo-tiled kernel (``TILED_STAGE_ROWS``).
#: On-chip A/B verdict (scripts/ab_fused_bottleneck.py, BENCH_NOTES.md
#: r3): the fused tower is 0.69-1.00x the XLA tower at every serving
#: config, so serving defaults stay on XLA and this path is opt-in only.
DEFAULT_FUSE_STAGES = (1, 2, 3)

#: Row-tile per stage for the halo-tiled kernel when that stage is fused.
#: Only stage 0 defaults to tiling (whole-image is compile-hostile there);
#: stages 1-3 stay on the whole-image kernel.
TILED_STAGE_ROWS = {0: 8}


def fused_imagenet_apply(
    params: dict, x: Array, dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    fuse_stages: Tuple[int, ...] = DEFAULT_FUSE_STAGES,
) -> Tuple[Array, Dict[str, Array]]:
    """ImageNetResNet50 forward with Pallas interior blocks.

    Same (pooled, taps) contract and param tree as
    srsem/backbones/resnet.py::ImageNetResNet50."""
    taps: Dict[str, Array] = {}
    x = x.astype(dtype)
    stem = _conv(x, params["conv1"]["kernel"], stride=2)
    taps[IMAGENET_STEM_TAP] = stem  # reference hooks the bare conv
    scale = params["bn1"]["scale"] * jax.lax.rsqrt(params["bn1"]["var"] + 1e-5)
    shift = params["bn1"]["bias"] - params["bn1"]["mean"] * scale
    h = nn.relu(stem * scale.astype(dtype) + shift.astype(dtype))
    h = nn.max_pool(h, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

    for s, blocks in enumerate(STAGE_BLOCKS):
        for b in range(blocks):
            p = params[f"layer{s + 1}.{b}"]
            if b == 0:  # downsample block (stride 2 for s>0, 1x1 proj at s=0)
                h = _plain_imagenet_block(p, h, stride=2 if s > 0 else 1)
            elif s in fuse_stages:
                h = _fused_block(p, h, dtype, interpret,
                                 row_tile=TILED_STAGE_ROWS.get(s))
            else:
                h = _plain_imagenet_block(p, h, stride=1)
            if b == 2:
                taps[IMAGENET_STAGE_TAPS[s]] = h
    return jnp.mean(h, axis=(1, 2)), taps


def fused_clip_apply(
    params: dict, x: Array, dtype: Any = jnp.bfloat16,
    interpret: bool = False,
    fuse_stages: Tuple[int, ...] = DEFAULT_FUSE_STAGES,
) -> Tuple[Array, Dict[str, Array]]:
    """ClipResNet50 forward with Pallas interior blocks.

    Same (embedding, taps) contract and param tree as
    srsem/backbones/resnet.py::ClipResNet50."""
    taps: Dict[str, Array] = {}
    x = x.astype(dtype)
    h = _conv_bn(x, params, "stem.conv1", "stem.bn1", stride=2)
    h = _conv_bn(h, params, "stem.conv2", "stem.bn2")
    h = _conv_bn(h, params, "stem.conv3", "stem.bn3")
    taps[CLIP_STEM_TAP] = h  # timm ConvNormAct → post-BN+ReLU
    h = nn.avg_pool(h, (2, 2), (2, 2))

    for s, blocks in enumerate(STAGE_BLOCKS):
        for b in range(blocks):
            p = params[f"stages.{s}.{b}"]
            if b == 0:  # avg-pool downsample (stride 2 for s>0) / projection
                h = _plain_clip_block(p, h, stride=2 if s > 0 else 1)
            elif s in fuse_stages:
                h = _fused_block(p, h, dtype, interpret,
                                 row_tile=TILED_STAGE_ROWS.get(s))
            else:
                h = _plain_clip_block(p, h, stride=1)
            if b < 3:
                taps[f"stages.{s}.{b}.act"] = h
    emb = _attnpool(params["attnpool"], h, dtype)
    return emb, taps


def fused_apply(kind: str, params: dict, x: Array,
                dtype: Any = jnp.bfloat16, interpret: bool = False,
                fuse_stages: Tuple[int, ...] = DEFAULT_FUSE_STAGES):
    """Dispatch on backbone kind ("resnet50" | "resnet50_clip")."""
    if kind == "resnet50":
        return fused_imagenet_apply(params, x, dtype, interpret, fuse_stages)
    if kind == "resnet50_clip":
        return fused_clip_apply(params, x, dtype, interpret, fuse_stages)
    raise ValueError(f"no fused tower for backbone kind {kind!r}")

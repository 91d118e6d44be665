"""Image resizing and normalization ops with explicit torch-parity semantics.

The reference mixes two bilinear conventions that we must keep distinct for
numeric parity:

* ``nn.UpsamplingBilinear2d(scale_factor=2)`` — align_corners=True
  (reference: models/local_eval_models.py:84, the UNet upscaler);
* ``F.interpolate(mode='bilinear', align_corners=False)`` — half-pixel
  centers (reference: models/local_eval_models.py:449-456 for the v2 pixel
  channel, datasets/local_eval_torch_ds.py:40 for cosine-map resizing).

``jax.image.resize`` implements only the half-pixel convention, so
``resize_bilinear`` here is a gather+lerp implementation that supports both.
All functions take NHWC (or HWC / NHW) arrays and are jit/shard_map safe
(static output shapes).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> Array:
    """Fractional source coordinate of each output pixel center."""
    out_idx = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), jnp.float32)
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        return out_idx * scale
    scale = in_size / out_size
    coords = (out_idx + 0.5) * scale - 0.5
    return jnp.clip(coords, 0.0, float(in_size - 1))


def _axis_weights(out_size: int, in_size: int, align_corners: bool):
    coords = _source_coords(out_size, in_size, align_corners)
    lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = coords - lo.astype(jnp.float32)
    return lo, hi, frac


def resize_bilinear(
    x: Array, out_hw: Tuple[int, int], align_corners: bool = False
) -> Array:
    """Bilinear resize of the two spatial axes of an NHWC (or HWC/NHW...)
    array — spatial axes are assumed to be the last two for rank-3-no-channel
    inputs and axes (-3, -2) otherwise.

    Layout contract: rank 2 = (H, W); rank >= 3 = (..., H, W, C).  Batched
    label maps (N, H, W) must be passed as ``maps[..., None]``.

    Implemented as two separable 1-D lerps (gathers along rows then
    columns); XLA lowers the gathers to cheap dynamic-slices because the
    index vectors are iota-derived.
    """
    if x.ndim == 2:
        return resize_bilinear(x[..., None], out_hw, align_corners)[..., 0]

    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = out_hw
    if (in_h, in_w) == (out_h, out_w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    lo, hi, frac = _axis_weights(out_h, in_h, align_corners)
    top = jnp.take(xf, lo, axis=h_axis)
    bot = jnp.take(xf, hi, axis=h_axis)
    frac_h = frac.reshape((-1,) + (1,) * (x.ndim - 1 - h_axis))
    xf = top * (1.0 - frac_h) + bot * frac_h

    lo, hi, frac = _axis_weights(out_w, in_w, align_corners)
    left = jnp.take(xf, lo, axis=w_axis)
    right = jnp.take(xf, hi, axis=w_axis)
    frac_w = frac.reshape((-1,) + (1,) * (x.ndim - 1 - w_axis))
    xf = left * (1.0 - frac_w) + right * frac_w
    return xf.astype(dtype)


def _resize_matrix(out_size: int, in_size: int, align_corners: bool) -> Array:
    """Dense (out, in) interpolation matrix for one axis.  Bilinear resize
    then becomes two einsums — matmuls that ride the MXU instead of the
    gather path (useful inside big fused programs like the CLU decoder)."""
    import numpy as np

    # Pure-numpy so the matrix is a compile-time constant under jit
    # (the jnp-based _axis_weights would produce tracers while tracing).
    idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        coords = idx * scale
    else:
        coords = np.clip((idx + 0.5) * (in_size / out_size) - 0.5,
                         0.0, in_size - 1)
    lo = np.clip(np.floor(coords).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = coords - lo
    mat = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - frac)
    np.add.at(mat, (rows, hi), frac)
    return jnp.asarray(mat)


def resize_bilinear_mxu(x: Array, out_hw: Tuple[int, int],
                        align_corners: bool = False,
                        compute_dtype=jnp.float32) -> Array:
    """Matmul formulation of ``resize_bilinear`` (numerically identical in
    the default f32 compute): y = W_h · x · W_wᵀ per channel.  NHWC only.
    ``compute_dtype=bfloat16`` halves the einsum traffic for serving-mode
    decoders (opt-in; interpolation weights are exact in bf16 only for
    power-of-two fractions, so parity paths keep f32)."""
    out_h, out_w = out_hw
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    wh = _resize_matrix(out_h, h, align_corners).astype(compute_dtype)
    ww = _resize_matrix(out_w, w, align_corners).astype(compute_dtype)
    dtype = x.dtype
    y = jnp.einsum("oh,nhwc->nowc", wh, x.astype(compute_dtype))
    y = jnp.einsum("pw,nowc->nopc", ww, y)
    return y.astype(dtype)


def upsample_x2_align_corners(x: Array, use_mxu: bool = True,
                              compute_dtype=jnp.float32) -> Array:
    """The UNet's ×2 upsampler — torch ``nn.UpsamplingBilinear2d(2)``
    (align_corners=True) (reference: models/local_eval_models.py:84,124).
    Defaults to the matmul formulation (MXU) inside jitted decoders."""
    n, h, w, c = x.shape
    if use_mxu:
        return resize_bilinear_mxu(x, (2 * h, 2 * w), align_corners=True,
                                   compute_dtype=compute_dtype)
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=True)


def normalize(x: Array, mean: Sequence[float], std: Sequence[float]) -> Array:
    """Channel-wise (x - mean) / std on NHWC float images in [0, 1]."""
    mean_a = jnp.asarray(mean, x.dtype)
    std_a = jnp.asarray(std, x.dtype)
    return (x - mean_a) / std_a


# Preprocessing constants matching the reference's timm/CLIP transforms.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def interpolate_pos_embed(pos: Array, grid_hw: Tuple[int, int]) -> Array:
    """Resize a [cls | H·W grid] positional table to a new patch grid.

    Bilinear over the square source grid, cls token untouched — the
    reference's ALBEF-style pos-embed interpolation (SURVEY.md §2.6,
    albef/model_wrapper.py:58-60).  Accepts (T, C) or (1, T, C); the one
    implementation is shared by AttentionPool2d (backbones/resnet.py),
    ClipViT (backbones/vit.py) and the fused attnpool
    (backbones/fused_resnet.py).
    """
    squeeze = pos.ndim == 2
    p = pos if pos.ndim == 3 else pos[None]
    c = p.shape[-1]
    gh, gw = grid_hw
    if p.shape[1] == gh * gw + 1:
        return pos
    cls_pos, grid_pos = p[:, :1], p[:, 1:]
    side = int(round(float(grid_pos.shape[1]) ** 0.5))
    grid_pos = jax.image.resize(
        grid_pos.reshape(side, side, c), (gh, gw, c),
        method="bilinear").reshape(1, gh * gw, c)
    out = jnp.concatenate([cls_pos, grid_pos], axis=1)
    return out[0] if squeeze else out

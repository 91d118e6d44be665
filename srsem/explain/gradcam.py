"""Grad-CAM via ``jax.grad`` on tap-offset probes.

Replaces the reference's pytorch_grad_cam dependency
(reference: additional_approaches/src/gcam_utils.py:6-36).  Mechanism: our
backbones accept ``tap_offsets`` — an additive zero at a tap point — so the
gradient of a scalar target w.r.t. that offset IS the gradient w.r.t. the
tapped activation.  Classic Grad-CAM then GAPs the gradient into channel
weights, takes relu(Σ wᶜ·actᶜ), min-max normalizes, and resizes to image
resolution.

ViT taps are token sequences; the class token is dropped and the rest
reshaped to the patch grid — the reference's ``reshape_transform``
(reference: gcam_utils.py:10-17).

``grad_cam_matrix`` compiles ONE jitted program per (tap, image shape)
and reuses it for all n² cells — the target embedding is a traced
argument, so fresh targets never retrace (srsem.explain.targets are pure
jnp closures).  Single ``grad_cam`` calls stay eager: a one-shot CAM is
cheaper than a compile.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srsem.ops.image import resize_bilinear, resize_bilinear_mxu

Array = jax.Array


def _cam_from(act: Array, grad: Array, grid_hw: Optional[Tuple[int, int]]) -> Array:
    """act/grad: (N, H, W, C) or (N, 1+T, C) token layout."""
    if act.ndim == 3:  # tokens → grid, dropping the class token
        n, t, c = act.shape
        gh, gw = grid_hw
        act = act[:, 1:, :].reshape(n, gh, gw, c)
        grad = grad[:, 1:, :].reshape(n, gh, gw, c)
    weights = jnp.mean(grad, axis=(1, 2), keepdims=True)  # GAP over space
    cam = jnp.maximum(jnp.sum(weights * act, axis=-1), 0.0)  # (N, H, W)
    lo = jnp.min(cam, axis=(1, 2), keepdims=True)
    hi = jnp.max(cam, axis=(1, 2), keepdims=True)
    return (cam - lo) / jnp.maximum(hi - lo, 1e-7)


def grad_cam(
    embed_fn: Callable,
    img: Array,
    tap_name: str,
    target_fn: Callable[[Array], Array],
    out_hw: Optional[Tuple[int, int]] = None,
    grid_hw: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """Compute a CAM.

    ``embed_fn(img, tap_offsets) -> (embedding, taps)`` — typically a
    partial of ``backbone.apply`` with params bound.  ``target_fn`` maps the
    embedding to the scalar objective (srsem.explain.targets).  Returns
    (N, out_h, out_w) float32 in [0, 1].
    """
    img = jnp.asarray(img)
    # Shape probe only — eval_shape traces without running the tower.
    act0 = jax.eval_shape(embed_fn, img, None)[1][tap_name]

    def objective(eps):
        emb, taps = embed_fn(img, {tap_name: eps})
        return jnp.sum(target_fn(emb)), taps[tap_name]

    grad, act = jax.grad(objective, has_aux=True)(
        jnp.zeros(act0.shape, act0.dtype))
    cam = _cam_from(act.astype(jnp.float32), grad.astype(jnp.float32), grid_hw)
    if out_hw is not None:
        cam = resize_bilinear(cam[..., None], out_hw)[..., 0]
    return np.asarray(cam)


def grad_cam_matrix(
    embed_fn: Callable,
    images: Sequence[Array],
    embeddings: Array,
    tap_name: str,
    target_factory: Callable[[Array], Callable],
    out_hw: Tuple[int, int],
    grid_hw: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """All-pairs CAM grid: CAM of image i under the target built from
    embedding j → (n, n, H, W)
    (reference: gcam_utils.py:23-36 compute_gradcams_matrix).

    One jitted forward+backward+weighting program per distinct image
    shape, executed n² times — the target embedding is an argument of the
    traced function, so every cell reuses the compiled executable."""
    n = len(images)
    imgs = [jnp.asarray(im)[None] if np.ndim(im) == 3 else jnp.asarray(im)
            for im in images]
    embeddings = jnp.asarray(embeddings)
    programs = {}

    def program_for(img):
        key = (img.shape, str(img.dtype))
        if key not in programs:
            act0 = jax.eval_shape(embed_fn, img, None)[1][tap_name]

            @jax.jit
            def cam_pair(img, emb, act0=act0):
                target_fn = target_factory(emb)

                def objective(eps):
                    e, taps = embed_fn(img, {tap_name: eps})
                    return jnp.sum(target_fn(e)), taps[tap_name]

                grad, act = jax.grad(objective, has_aux=True)(
                    jnp.zeros(act0.shape, act0.dtype))
                cam = _cam_from(act.astype(jnp.float32),
                                grad.astype(jnp.float32), grid_hw)
                # matmul resize inside jit — gathers don't pipeline on
                # TPU (CLAUDE.md; numerically identical in f32).
                return resize_bilinear_mxu(cam[..., None], out_hw)[..., 0]

            programs[key] = cam_pair
        return programs[key]

    out = np.empty((n, n, *out_hw), np.float32)
    for i in range(n):
        cam_pair = program_for(imgs[i])
        for j in range(n):
            out[i, j] = np.asarray(cam_pair(imgs[i], embeddings[j]))[0]
    return out

"""Pallas kernel: fused squared-diff → 1x1-conv head → spatial-sum.

STATUS: documented experiment, NOT the serving path.  Measured on v5e
(BENCH_r02): 224px b128 4.96k vs dense 5.86k pairs/s; 512px b16 714 vs
820 — XLA's own epilogue fusion wins at every published config, so the
serving flag was removed (VERDICT r1 next-step #7).  The kernel stays as
verified, numerically-identical Pallas reference code (tested in
tests/test_fused_head.py, interpret-mode off-TPU); both multi-image block
variants crash the Mosaic compiler on this toolchain (TODO.md r1 #2).

The global regressor's head computes, per tapped stage,
``mean_hw((f_a - f_b)^2 · w) + b`` (reference numerics:
models/global_eval_models.py:379-392).  Left to XLA this materializes the
(N, H, W, C) squared-difference tensor between two fusion boundaries; the
kernel instead streams both feature tiles through VMEM once and reduces to
a scalar partial per tile — a single HBM read of each feature map and no
intermediate write.  This is the serving path's hot op after the backbone
itself (stage-0 features at 224px are 56·56·256 floats per image per side).

Layout: features arrive flattened to (N, HW, C); the grid is
(N, HW/T) with T chosen so both tiles fit comfortably in VMEM.  Each
program computes ``sum((fa-fb)^2 * w)`` over its tile on the VPU and
accumulates into its image's scalar slot (grid dim 1 revisits the same
output block, initialized at tile 0).

``fused_stage_score`` == per-stage head; ``fused_global_score`` composes
stages with the bias, HW mean, layer mean and final ReLU in plain jnp
(tiny).  Falls back to interpreter mode off-TPU so tests validate the same
code path.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_VMEM_BUDGET = 4 * 1024 * 1024  # bytes per input tile buffer


def _tile_rows(hw: int, c: int, itemsize: int) -> int:
    """Largest divisor of hw whose tile fits the VMEM budget."""
    limit = max(1, _VMEM_BUDGET // max(1, c * itemsize))
    if hw <= limit:
        return hw
    best = 1
    for t in range(1, int(np.sqrt(hw)) + 1):
        if hw % t == 0:
            for cand in (t, hw // t):
                if cand <= limit:
                    best = max(best, cand)
    return best


def _make_kernel(images_per_block: int):
    def kernel(fa_ref, fb_ref, w_ref, out_ref):
        # out_ref is the WHOLE (N,) accumulator in SMEM — scalar outputs
        # can't satisfy the (8, 128) VMEM tiling constraint, so we index it
        # by program id instead of blocking it.  Each program reduces
        # ``images_per_block`` images over one spatial tile.
        i = pl.program_id(0)
        t = pl.program_id(1)
        d = fa_ref[...].astype(jnp.float32) - fb_ref[...].astype(jnp.float32)
        partial = jnp.sum(d * d * w_ref[...].astype(jnp.float32), axis=(1, 2))
        base = i * images_per_block
        for k in range(images_per_block):

            @pl.when(t == 0)
            def _init(k=k):
                out_ref[base + k] = 0.0

            out_ref[base + k] += partial[k]

    return kernel


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("interpret", "images_per_block"))
def fused_stage_score(fa: Array, fb: Array, w: Array, b: Array,
                      interpret: bool = False,
                      images_per_block: int = 1) -> Array:
    """(N, H, W, C) feature pair + head (C,), bias scalar → (N,) scores
    ``mean_hw((fa-fb)^2·w) + b``.

    Blocks are (images_per_block, T, C).  images_per_block=1 is the
    TPU-proven configuration; larger blocks cut grid overhead but their
    dynamic SMEM scalar stores currently crash the Mosaic compiler on the
    target toolchain (remote-compile HTTP 500) — keep >1 experimental.
    N is zero-padded up to a block multiple (padded rows read fa=fb=0 →
    contribute nothing)."""
    n, h, wd, c = fa.shape
    hw = h * wd
    ib = min(images_per_block, max(1, n))
    n_pad = ((n + ib - 1) // ib) * ib
    fa2 = fa.reshape(n, hw, c)
    fb2 = fb.reshape(n, hw, c)
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0), (0, 0))
        fa2 = jnp.pad(fa2, pad)
        fb2 = jnp.pad(fb2, pad)
    t = _tile_rows(hw, c, fa2.dtype.itemsize * ib)
    grid = (n_pad // ib, hw // t)

    sums = pl.pallas_call(
        _make_kernel(ib),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ib, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ib, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(fa2, fb2, w.reshape(1, c))
    return sums[:n] / hw + b


def fused_global_score(
    taps_a: Dict[str, Array], taps_b: Dict[str, Array],
    head_params: Dict[str, Dict[str, Array]], tap_names: Sequence[str],
    interpret: bool = False,
) -> Array:
    """The full stages_cnn aggregation through the kernel: per-stage fused
    score, mean over stages, final ReLU — numerically identical to
    ConvHeadAggregator (verified in tests/test_fused_head.py)."""
    scores: List[Array] = []
    for j, name in enumerate(tap_names):
        hp = head_params[f"w_layers.{j}"]
        w = hp["kernel"][:, 0]
        b = hp["bias"][0]
        scores.append(fused_stage_score(
            taps_a[name], taps_b[name], w, b, interpret=interpret))
    return jax.nn.relu(jnp.mean(jnp.stack(scores), axis=0))

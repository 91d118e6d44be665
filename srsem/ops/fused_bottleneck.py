"""Pallas fused ResNet bottleneck: one VMEM-resident kernel per block.

The round-2 roofline analysis (BENCH_NOTES.md) showed the frozen tower at
~91% of v5e HBM peak with the 1x1 convs' activation traffic setting the
ceiling: XLA executes conv1 -> conv2 -> conv3 as three kernels, writing the
two intermediate activations to HBM and reading them back.  A stride-1
bottleneck's interior activations are small enough to live entirely in
VMEM, so this module fuses the whole block —

    h1 = relu(x @ W1 + b1)                 # 1x1 conv = channel matmul
    h2 = relu(conv3x3(h1, W2) + b2)        # 9 shifted matmuls, VMEM-resident
    y  = relu(h2 @ W3 + b3 + x)            # 1x1 conv + residual

— into ONE pallas_call that reads x once and writes y once, cutting the
block's HBM traffic roughly in half.  Frozen BatchNorm (the reference keeps
backbones in eval mode — reference: models/global_eval_models.py:318-319)
is a pure per-channel affine, so it folds exactly into the conv weights
(``fold_bn_into_conv``): the fused kernel is numerically the conv+BN chain
with a different FP contraction order, nothing approximate.

Applies to the 12 stride-1 interior blocks of ResNet-50 (both the ImageNet
and the CLIP variant — CLIP's stride-1 bottlenecks have the same dataflow;
its stride-2/avg-pool blocks and the stems stay on XLA).  The full fused
towers live in srsem/backbones/fused_resnet.py.

MXU notes: all three matmuls accumulate in float32
(``preferred_element_type``); activations stream through in the tower's
compute dtype (bf16 for serving).  The grid runs over image-batch tiles so
Pallas double-buffers the x/y blocks while the MXU works.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def fold_bn_into_conv(kernel: Array, bn: dict, eps: float = 1e-5,
                      bias: Array | None = None) -> Tuple[Array, Array]:
    """Fold a FrozenBatchNorm (srsem/backbones/resnet.py) into the preceding
    conv: returns (kernel', bias') with ``conv(x, k') + b' ==
    bn(conv(x, k) + b)`` exactly (the BN affine commutes with the conv's
    output channels)."""
    scale = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
    shift = bn["bias"] - bn["mean"] * scale
    folded = kernel * scale  # broadcasts over the trailing (out) axis
    if bias is not None:
        shift = shift + bias * scale
    return folded, shift


def _bottleneck_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                       b3_ref, out_ref, *, h: int, w: int,
                       compute_dtype: Any):
    """One batch-tile of stride-1 bottlenecks, fully VMEM-resident.

    x_ref: (bb, h, w, C); w1: (C, wd); w2: (9, wd, wd) [3x3 taps, row-major];
    w3: (wd, C); biases f32.  out = relu(x + conv3(relu(conv2(relu(
    conv1(x)))))) with f32 accumulation on every matmul.
    """
    bb = x_ref.shape[0]
    c = x_ref.shape[-1]
    wd = w1_ref.shape[-1]

    x = x_ref[:]
    xf = x.reshape(bb * h * w, c)

    # conv1 (1x1): channel matmul, f32 accumulate, ReLU.
    h1 = jnp.dot(xf, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(compute_dtype)

    # conv2 (3x3, SAME): zero-pad each image spatially, then 9 shifted
    # channel matmuls accumulated in f32 — the classic im2col-free form.
    h1p = jnp.pad(h1.reshape(bb, h, w, wd),
                  ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((bb * h * w, wd), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = h1p[:, dy:dy + h, dx:dx + w, :].reshape(bb * h * w, wd)
            acc = acc + jnp.dot(win, w2_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(compute_dtype)

    # conv3 (1x1) + residual + ReLU.
    y = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
    y = y + b3_ref[:] + xf.astype(jnp.float32)
    out_ref[:] = jnp.maximum(y, 0.0).astype(out_ref.dtype).reshape(x.shape)


def _pick_batch_tile(n: int, h: int, w: int, c: int, wd: int,
                     itemsize: int, vmem_budget: int = 16 * 2**20) -> int:
    """Largest batch tile whose working set fits the VMEM budget.

    Pallas DOUBLE-BUFFERS the gridded in/out blocks (next tile streams in
    while this one computes), so x and out count twice; add the padded h1,
    h2, and the f32 conv2 accumulator.  The budget must stay under the
    ``vmem_limit_bytes`` passed to the compiler (measured: exceeding the
    Mosaic VMEM limit is a hard compile failure, and the DEFAULT limit is
    far below the v5e's physical VMEM — stage-0 shapes abort the compiler
    unless the limit is raised).  Measured guardrail: big tiles also blow
    up Mosaic COMPILE TIME — a 4-image stage-0 tile (26 MB of
    double-buffered blocks) hung the compiler for 20+ minutes, while
    1-2-image tiles compile in seconds, so the default budget stays at
    16 MB."""
    per_img = (4 * h * w * c * itemsize          # x + out, double-buffered
               + (h + 2) * (w + 2) * wd * itemsize  # padded h1
               + h * w * wd * itemsize           # h2
               + h * w * wd * 4)                 # f32 accumulator
    bb = max(1, vmem_budget // max(per_img, 1))
    while n % bb:
        bb -= 1
    return bb


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def fused_bottleneck(x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
                     w3: Array, b3: Array, compute_dtype: Any = jnp.bfloat16,
                     interpret: bool = False) -> Array:
    """Stride-1 ResNet bottleneck ``relu(x + f(x))`` as one Pallas kernel.

    x: (N, H, W, C) activations; w1: (C, wd), w2: (3, 3, wd, wd),
    w3: (wd, C) BN-folded kernels (``fold_bn_into_conv``); b*: f32 biases.
    Matches the XLA conv chain to FP-reduction-order tolerance
    (tests/test_fused_bottleneck.py).
    """
    n, h, w, c = x.shape
    wd = w1.shape[-1]
    cd = jnp.dtype(compute_dtype)
    bb = _pick_batch_tile(n, h, w, c, wd, cd.itemsize)

    kernel = functools.partial(_bottleneck_kernel, h=h, w=w,
                               compute_dtype=cd)
    grid = (n // bb,)
    repl = lambda i: (0, 0)  # noqa: E731 — weights replicated per step
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, wd), repl, memory_space=pltpu.VMEM),
            pl.BlockSpec((wd,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, wd, wd), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wd,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((wd, c), repl, memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x.astype(cd),
      w1.astype(cd), b1.astype(jnp.float32),
      w2.reshape(9, wd, wd).astype(cd), b2.astype(jnp.float32),
      w3.astype(cd), b3.astype(jnp.float32))
    return out


def _halo_copy(src_hbm, scratch, sem, i, t, nt, th: int, hh: int, w: int,
               c: int, start: bool):
    """Start (or wait on) the halo DMA of tile (image i, row-tile t) into
    ``scratch`` ((th + 2*hh, W, C)): rows [t*th - hh, t*th + th + hh)
    clamped to the image, out-of-image halo rows zeroed (the 3x3 conv's
    SAME zero padding).  ``start=False`` reconstructs the same descriptor
    and waits — the 2-slot pipeline's wait side (the descriptor depends
    only on (i, t), so the waiting step can rebuild it)."""

    def go(dma):
        if start:
            dma.start()
        else:
            dma.wait()

    @pl.when(t == 0)
    def _first():
        if start:
            scratch[0:hh] = jnp.zeros((hh, w, c), scratch.dtype)
        go(pltpu.make_async_copy(
            src_hbm.at[i, pl.ds(0, th + hh)],
            scratch.at[pl.ds(hh, th + hh)], sem))

    @pl.when(jnp.logical_and(t > 0, t < nt - 1))
    def _interior():
        go(pltpu.make_async_copy(
            src_hbm.at[i, pl.ds(t * th - hh, th + 2 * hh)], scratch.at[:],
            sem))

    @pl.when(t == nt - 1)
    def _last():
        if start:
            scratch[th + hh: th + 2 * hh] = jnp.zeros((hh, w, c),
                                                      scratch.dtype)
        go(pltpu.make_async_copy(
            src_hbm.at[i, pl.ds(t * th - hh, th + hh)],
            scratch.at[pl.ds(0, th + hh)], sem))


def _tiled_bottleneck_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                             b3_ref, out_ref, xs, sems, *, th: int, h: int,
                             w: int, compute_dtype: Any):
    """One (image, row-tile) step of the halo-tiled bottleneck.

    ``x_hbm`` is the full (N, H, W, C) input left in HBM/ANY; tiles plus a
    1-row halo stream into the 2-slot ``xs`` VMEM scratch — overlapping
    reads a blocked ``BlockSpec`` grid cannot express.  The halo DMA is
    pipelined: step s starts the copy for step s+1's tile, then waits on
    its own (started by step s-1, or by itself at s == 0)."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    n = x_hbm.shape[0]
    nt = h // th
    c = x_hbm.shape[-1]
    wd = w1_ref.shape[-1]

    s = i * nt + t
    slot = jax.lax.rem(s, 2)

    @pl.when(s == 0)
    def _own():
        _halo_copy(x_hbm, xs.at[slot], sems.at[slot], i, t, nt, th, 1, w, c,
                   start=True)

    @pl.when(s + 1 < n * nt)
    def _prefetch():
        s2 = s + 1
        i2 = jax.lax.div(s2, nt)
        t2 = jax.lax.rem(s2, nt)
        _halo_copy(x_hbm, xs.at[jax.lax.rem(s2, 2)],
                   sems.at[jax.lax.rem(s2, 2)], i2, t2, nt, th, 1, w, c,
                   start=True)

    _halo_copy(x_hbm, xs.at[slot], sems.at[slot], i, t, nt, th, 1, w, c,
               start=False)

    x = xs[slot].astype(compute_dtype)
    # conv1 (1x1) over tile + halo rows.
    h1 = jnp.dot(x.reshape((th + 2) * w, c), w1_ref[:],
                 preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(compute_dtype)
    # conv2 (3x3): rows come from the halo, columns from zero padding.
    # Halo rows outside the image must be ZERO in h1-space (conv2's SAME
    # padding pads h1, not x) — conv1's bias+ReLU turned the zeroed x halo
    # into relu(b1), so mask them out.
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    g_row = t * th - 1 + row
    valid = jnp.logical_and(g_row >= 0, g_row < h)
    h1p = jnp.where(valid, h1.reshape(th + 2, w, wd), 0.0)
    h1p = jnp.pad(h1p, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((th * w, wd), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = h1p[dy:dy + th, dx:dx + w, :].reshape(th * w, wd)
            acc = acc + jnp.dot(win, w2_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(compute_dtype)
    # conv3 (1x1) + residual (tile interior rows of the slot) + ReLU.
    y = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
    y = (y + b3_ref[:]
         + xs[slot, 1: th + 1].reshape(th * w, c).astype(jnp.float32))
    out_ref[:] = jnp.maximum(y, 0.0).astype(out_ref.dtype).reshape(
        1, th, w, c)


@functools.partial(jax.jit, static_argnames=("row_tile", "compute_dtype",
                                              "interpret"))
def fused_bottleneck_tiled(x: Array, w1: Array, b1: Array, w2: Array,
                           b2: Array, w3: Array, b3: Array, row_tile: int,
                           compute_dtype: Any = jnp.bfloat16,
                           interpret: bool = False) -> Array:
    """Halo-tiled ``fused_bottleneck``: grid over (image, H/row_tile) with a
    manual 1-row-halo DMA per tile instead of one whole-image VMEM block.

    For shapes whose full-image working set is compile-hostile (stage 0's
    56x56x256 at 224px hung/500'd the Mosaic remote-compile path at
    whole-image tiles — BENCH_NOTES.md), small row tiles keep every buffer
    tiny at ~1.25x the x-read traffic (halo overlap).  Numerics identical
    to ``fused_bottleneck`` (same matmul decomposition)."""
    n, h, w, c = x.shape
    wd = w1.shape[-1]
    if h % row_tile or h // row_tile < 2:
        raise ValueError(f"row_tile {row_tile} must divide H={h} with at "
                         "least 2 tiles (1-tile inputs: use fused_bottleneck)")
    cd = jnp.dtype(compute_dtype)
    th = row_tile

    kernel = functools.partial(_tiled_bottleneck_kernel, th=th, h=h, w=w,
                               compute_dtype=cd)
    grid = (n, h // th)
    repl2 = lambda i, t: (0, 0)  # noqa: E731
    repl3 = lambda i, t: (0, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((c, wd), repl2, memory_space=pltpu.VMEM),
            pl.BlockSpec((wd,), lambda i, t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, wd, wd), repl3, memory_space=pltpu.VMEM),
            pl.BlockSpec((wd,), lambda i, t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((wd, c), repl2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, w, c), cd),  # 2-slot pipelined halo
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x.astype(cd),
      w1.astype(cd), b1.astype(jnp.float32),
      w2.reshape(9, wd, wd).astype(cd), b2.astype(jnp.float32),
      w3.astype(cd), b3.astype(jnp.float32))
    return out


def bottleneck_weights(block_params: dict, eps: float = 1e-5):
    """BN-folded (w1, b1, w2, b2, w3, b3) from a stride-1 bottleneck's param
    subtree (srsem/backbones/resnet.py::{ImageNet,Clip}Bottleneck: conv1/bn1,
    conv2/bn2, conv3/bn3; 1x1 kernels squeezed to (Cin, Cout))."""
    w1, b1 = fold_bn_into_conv(block_params["conv1"]["kernel"],
                               block_params["bn1"], eps)
    w2, b2 = fold_bn_into_conv(block_params["conv2"]["kernel"],
                               block_params["bn2"], eps)
    w3, b3 = fold_bn_into_conv(block_params["conv3"]["kernel"],
                               block_params["bn3"], eps)
    return (w1[0, 0], b1, w2, b2, w3[0, 0], b3)

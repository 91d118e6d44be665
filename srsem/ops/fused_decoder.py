"""Pallas fused CLU decoder level: one VMEM-resident kernel per UNet block.

The CLU serving path is decoder-bound (BENCH_NOTES.md round-2 dissection:
tower 12.8 ms of ~20 ms at b32/224px; the decoder's conv-BN-ReLU pairs set
the rest).  XLA runs each level's two 3x3 convs as separate kernels with
the mid activation (``h1``) round-tripping through HBM.  For SERVING the
BatchNorms use running statistics — a pure per-channel affine that folds
exactly into the conv weights — so a whole decoder level

    h1 = relu(conv3x3(d, W1d) + conv3x3(u, W1u) + b1)   # split concat-conv
    y  = relu(conv3x3(h1, W2) + b2)                     # 1x1 at level 0

is one fused kernel: read the (skip, upsampled) pair once, write y once,
``h1`` never leaves VMEM.  The split-conv identity (srsem/models/
local_models.py::_ConcatConv — ``conv(concat([d,u]),W) == conv(d,W[:cd]) +
conv(u,W[cd:])``) carries over: the kernel accumulates both input branches
into one f32 accumulator, so the concat is never materialized either.

3x3 convs run as 9 shifted channel-matmuls on the MXU (the im2col-free
form, as in srsem/ops/fused_bottleneck.py), all accumulation in float32.
The ×2 bilinear upsample between levels stays outside on XLA
(resize_bilinear_mxu) — its interpolation-matrix einsums are already
MXU-shaped.

Serving-only by design: training-mode BN needs batch statistics of ``h1``,
which would break the fold.  Parity with ``CluUnet.decode_from_diffs`` is
pinned by tests/test_fused_decoder.py (interpret mode).

Reference for what the level computes: models/local_eval_models.py:38-82
(UNet blocks Conv3x3+BN+ReLU ×2; shallowest block Conv3x3+BN+ReLU then
Conv1x1→1ch, no second BN, :39-45).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _conv3x3_acc(xpad: Array, w_ref, bb: int, h: int, w: int,
                 acc: Array) -> Array:
    """Accumulate a 3x3 SAME conv as 9 shifted matmuls into f32 ``acc``.

    xpad: (bb, h+2, w+2, cin) spatially padded input; w_ref: (9, cin, cout)
    tap-major folded kernel."""
    cin = xpad.shape[-1]
    for dy in range(3):
        for dx in range(3):
            win = xpad[:, dy:dy + h, dx:dx + w, :].reshape(bb * h * w, cin)
            acc = acc + jnp.dot(win, w_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
    return acc


def _decoder_kernel(*refs, h: int, w: int, has_u: bool, final_kernel: int,
                    compute_dtype: Any):
    """One batch tile of a fused decoder level, fully VMEM-resident."""
    if has_u:
        d_ref, u_ref, w1d_ref, w1u_ref, b1_ref, w2_ref, b2_ref, out_ref = refs
    else:
        d_ref, w1d_ref, b1_ref, w2_ref, b2_ref, out_ref = refs
        u_ref = w1u_ref = None
    bb = d_ref.shape[0]
    cm = w1d_ref.shape[-1]

    acc = jnp.zeros((bb * h * w, cm), jnp.float32)
    dpad = jnp.pad(d_ref[:], ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = _conv3x3_acc(dpad, w1d_ref, bb, h, w, acc)
    if has_u:
        upad = jnp.pad(u_ref[:], ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = _conv3x3_acc(upad, w1u_ref, bb, h, w, acc)
    h1 = jnp.maximum(acc + b1_ref[:], 0.0).astype(compute_dtype)

    co = w2_ref.shape[-1]
    if final_kernel == 3:
        h1p = jnp.pad(h1.reshape(bb, h, w, cm),
                      ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc2 = jnp.zeros((bb * h * w, co), jnp.float32)
        acc2 = _conv3x3_acc(h1p, w2_ref, bb, h, w, acc2)
    else:  # 1x1: plain channel matmul (level 0's map head)
        acc2 = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
    y = jnp.maximum(acc2 + b2_ref[:], 0.0)
    out_ref[:] = y.astype(out_ref.dtype).reshape(bb, h, w, co)


def _tile_bytes(h: int, w: int, cd: int, cu: int, cm: int, co: int,
                itemsize: int, final_kernel: int) -> int:
    """VMEM working set of a 1-image tile (double-buffered grid blocks count
    twice — see srsem/ops/fused_bottleneck.py::_pick_batch_tile)."""
    hw = h * w
    pad_hw = (h + 2) * (w + 2)
    n = (2 * hw * (cd + cu) * itemsize      # d (+u) in, double-buffered
         + 2 * hw * co * itemsize           # out, double-buffered
         + pad_hw * (cd + cu) * itemsize    # in-kernel padded copies
         + hw * cm * 4                      # f32 conv1 accumulator
         + hw * cm * itemsize)              # h1
    if final_kernel == 3:
        n += pad_hw * cm * itemsize + hw * co * 4
    return n


def _pick_batch_tile(n: int, per_img: int,
                     vmem_budget: int = 16 * 2**20) -> int:
    bb = max(1, vmem_budget // max(per_img, 1))
    while n % bb:
        bb -= 1
    return bb


def _copy_with_halo(src_hbm, scratch, sem, i, t, nt, th: int, hh: int,
                    w: int, c: int, start: bool):
    """Start (or wait on) the halo DMA of tile (image i, row-tile t) into
    ``scratch`` ((th + 2*hh, W, C)): rows [t*th - hh, t*th + th + hh)
    clamped to the image, out-of-image halo rows zeroed (the 3x3 conv's
    SAME zero padding of the level inputs).  ``start=False`` reconstructs
    the same descriptor and waits — the 2-slot pipeline's wait side
    (srsem/ops/fused_bottleneck.py::_halo_copy has the same shape)."""

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


def _tiled_decoder_kernel(d_hbm, u_hbm, w1d_ref, w1u_ref, b1_ref, w2_ref,
                          b2_ref, out_ref, ds_, us_, sem_d, sem_u, *,
                          th: int, h: int, w: int, final_kernel: int,
                          compute_dtype: Any):
    """One (image, row-tile) step of a halo-tiled decoder level (pair form).

    conv1 is 3x3, so the tile needs ``hh`` halo rows of (d, u): 1 when
    conv2 is the 1x1 map head (level 0), 2 when conv2 is 3x3 (h1 itself
    then carries a 1-row halo, masked to zero outside the image — conv2's
    SAME padding pads h1, not the inputs)."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    n = d_hbm.shape[0]
    nt = h // th
    hh = 1 if final_kernel == 1 else 2
    cd = d_hbm.shape[-1]
    cu = u_hbm.shape[-1]
    cm = w1d_ref.shape[-1]
    co = w2_ref.shape[-1]

    # 2-slot pipelined halo DMAs: step s starts the copies for step s+1's
    # tile, then waits on its own (started by step s-1, or itself at s==0).
    s = i * nt + t
    slot = jax.lax.rem(s, 2)

    @pl.when(s == 0)
    def _own():
        _copy_with_halo(d_hbm, ds_.at[slot], sem_d.at[slot], i, t, nt, th,
                        hh, w, cd, start=True)
        _copy_with_halo(u_hbm, us_.at[slot], sem_u.at[slot], i, t, nt, th,
                        hh, w, cu, start=True)

    @pl.when(s + 1 < n * nt)
    def _prefetch():
        s2 = s + 1
        i2 = jax.lax.div(s2, nt)
        t2 = jax.lax.rem(s2, nt)
        slot2 = jax.lax.rem(s2, 2)
        _copy_with_halo(d_hbm, ds_.at[slot2], sem_d.at[slot2], i2, t2, nt,
                        th, hh, w, cd, start=True)
        _copy_with_halo(u_hbm, us_.at[slot2], sem_u.at[slot2], i2, t2, nt,
                        th, hh, w, cu, start=True)

    _copy_with_halo(d_hbm, ds_.at[slot], sem_d.at[slot], i, t, nt, th, hh,
                    w, cd, start=False)
    _copy_with_halo(u_hbm, us_.at[slot], sem_u.at[slot], i, t, nt, th, hh,
                    w, cu, start=False)

    # conv1 (3x3, SAME in W) over every row with full 3x3 support: rows
    # [1, th + 2*hh - 1) of the scratch — the tile plus (hh-1) h1-halo rows.
    nh1 = th + 2 * hh - 2
    acc = jnp.zeros((nh1 * w, cm), jnp.float32)
    dpad = jnp.pad(ds_[slot].astype(compute_dtype),
                   ((0, 0), (1, 1), (0, 0)))
    upad = jnp.pad(us_[slot].astype(compute_dtype),
                   ((0, 0), (1, 1), (0, 0)))
    for dy in range(3):
        for dx in range(3):
            win_d = dpad[dy:dy + nh1, dx:dx + w, :].reshape(nh1 * w, cd)
            acc = acc + jnp.dot(win_d, w1d_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
            win_u = upad[dy:dy + nh1, dx:dx + w, :].reshape(nh1 * w, cu)
            acc = acc + jnp.dot(win_u, w1u_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)
    h1 = jnp.maximum(acc + b1_ref[:], 0.0).astype(compute_dtype)

    if final_kernel == 3:
        # h1 rows j map to global rows t*th + j - 1; zero those outside the
        # image, then 3x3 over the tile's th interior rows.
        row = jax.lax.broadcasted_iota(jnp.int32, (nh1, 1, 1), 0)
        valid = jnp.logical_and(t * th + row - 1 >= 0, t * th + row - 1 < h)
        h1p = jnp.where(valid, h1.reshape(nh1, w, cm), 0.0)
        h1p = jnp.pad(h1p, ((0, 0), (1, 1), (0, 0)))
        acc2 = jnp.zeros((th * w, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                win = h1p[dy:dy + th, dx:dx + w, :].reshape(th * w, cm)
                acc2 = acc2 + jnp.dot(win, w2_ref[dy * 3 + dx],
                                      preferred_element_type=jnp.float32)
    else:  # 1x1 map head — h1 is exactly the tile (hh == 1)
        acc2 = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
    y = jnp.maximum(acc2 + b2_ref[:], 0.0)
    out_ref[:] = y.astype(out_ref.dtype).reshape(1, th, w, co)


@functools.partial(jax.jit, static_argnames=("row_tile", "final_kernel",
                                              "compute_dtype", "interpret"))
def fused_decoder_level_tiled(d: Array, u: Array, w1d: Array, w1u: Array,
                              b1: Array, w2: Array, b2: Array, row_tile: int,
                              final_kernel: int = 3,
                              compute_dtype: Any = jnp.bfloat16,
                              interpret: bool = False) -> Array:
    """Halo-tiled ``fused_decoder_level`` (pair form only): grid over
    (image, H/row_tile) with manual halo DMAs, for the big shallow levels
    whose whole-image blocks are compile-hostile (L0 112px / L1 56px at
    224px serving).  Numerics identical to the whole-image kernel."""
    n, h, w, cd = d.shape
    cu = u.shape[-1]
    cm = w1d.shape[-1]
    co = w2.shape[-1]
    hh = 1 if final_kernel == 1 else 2
    if h % row_tile or h // row_tile < 2 or row_tile < hh:
        raise ValueError(f"row_tile {row_tile} must divide H={h} with >=2 "
                         f"tiles and be >= the halo {hh}")
    cdt = jnp.dtype(compute_dtype)
    th = row_tile

    kernel = functools.partial(_tiled_decoder_kernel, th=th, h=h, w=w,
                               final_kernel=final_kernel, compute_dtype=cdt)
    repl3 = lambda i, t: (0, 0, 0)  # noqa: E731
    b_spec = lambda c: pl.BlockSpec((c,), lambda i, t: (0,),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    if final_kernel == 3:
        w2_spec = pl.BlockSpec((9, cm, co), repl3, memory_space=pltpu.VMEM)
        w2_arg = w2.reshape(9, cm, co).astype(cdt)
    else:
        w2_spec = pl.BlockSpec((cm, co), lambda i, t: (0, 0),
                               memory_space=pltpu.VMEM)
        w2_arg = w2.reshape(cm, co).astype(cdt)
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # d stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # u stays in HBM
            pl.BlockSpec((9, cd, cm), repl3, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cu, cm), repl3, memory_space=pltpu.VMEM),
            b_spec(cm),
            w2_spec,
            b_spec(co),
        ],
        out_specs=pl.BlockSpec((1, th, w, co), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), d.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * hh, w, cd), cdt),  # 2-slot pipeline
            pltpu.VMEM((2, th + 2 * hh, w, cu), cdt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(d.astype(cdt), u.astype(cdt),
      w1d.reshape(9, cd, cm).astype(cdt), w1u.reshape(9, cu, cm).astype(cdt),
      b1.astype(jnp.float32), w2_arg, b2.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("final_kernel", "compute_dtype",
                                              "interpret"))
def fused_decoder_level(d: Array, u: Optional[Array], w1d: Array,
                        w1u: Optional[Array], b1: Array, w2: Array,
                        b2: Array, final_kernel: int = 3,
                        compute_dtype: Any = jnp.bfloat16,
                        interpret: bool = False) -> Array:
    """One CLU decoder level as a single Pallas kernel.

    d: (N, H, W, Cd) skip diff; u: (N, H, W, Cu) upsampled deeper-level
    output, or None for the deepest block; w1d/(w1u): (3, 3, C*, Cm)
    BN1-folded conv1 slices; w2: (3, 3, Cm, Co) BN2-folded conv2, or
    (Cm, Co) for ``final_kernel=1``; b*: f32 folded biases.  Returns
    relu(conv2(relu(conv1))) in ``d.dtype`` — numerically the XLA chain
    with a different FP reduction order.
    """
    n, h, w, cd = d.shape
    cu = 0 if u is None else u.shape[-1]
    cm = w1d.shape[-1]
    co = w2.shape[-1]
    cdt = jnp.dtype(compute_dtype)
    bb = _pick_batch_tile(
        n, _tile_bytes(h, w, cd, cu, cm, co, cdt.itemsize, final_kernel))

    kernel = functools.partial(_decoder_kernel, h=h, w=w, has_u=u is not None,
                               final_kernel=final_kernel, compute_dtype=cdt)
    img_spec = lambda c: pl.BlockSpec(  # noqa: E731
        (bb, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    w3_spec = lambda cin, cout: pl.BlockSpec(  # noqa: E731
        (9, cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    b_spec = lambda c: pl.BlockSpec((c,), lambda i: (0,),  # noqa: E731
                                    memory_space=pltpu.VMEM)

    in_specs = [img_spec(cd)]
    args = [d.astype(cdt)]
    if u is not None:
        in_specs.append(img_spec(cu))
        args.append(u.astype(cdt))
    in_specs.append(w3_spec(cd, cm))
    args.append(w1d.reshape(9, cd, cm).astype(cdt))
    if u is not None:
        in_specs.append(w3_spec(cu, cm))
        args.append(w1u.reshape(9, cu, cm).astype(cdt))
    in_specs.append(b_spec(cm))
    args.append(b1.astype(jnp.float32))
    if final_kernel == 3:
        in_specs.append(w3_spec(cm, co))
        args.append(w2.reshape(9, cm, co).astype(cdt))
    else:
        in_specs.append(pl.BlockSpec((cm, co), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(w2.reshape(cm, co).astype(cdt))
    in_specs.append(b_spec(co))
    args.append(b2.astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(n // bb,),
        in_specs=in_specs,
        out_specs=img_spec(co),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), d.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*args)

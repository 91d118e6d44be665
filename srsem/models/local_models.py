"""Local semantic-fidelity map models ("CLU" = CLIP-LPIPS-UNet).

Reimplements the four classes of the reference's
``models/local_eval_models.py`` as one configurable module:

================================  ======================================
reference class                   config
================================  ======================================
CLIP_lpips_Unet (:7-171)          backbone=resnet50_clip, v2=False
CLIP_lpips_Unet_clsbckbn (:175)   backbone=resnet50,      v2=False
CLIP_lpips_Unet_v2 (:343-514)     backbone=resnet50_clip, v2=True
CLIP_lpips_Unet_clsbckbn_v2       backbone=resnet50,      v2=True
  (:518-689 — note the reference copy cannot even import: stray token
  ``glo`` at local_eval_models.py:624; fixed here by construction)
================================  ======================================

Architecture (reference: models/local_eval_models.py:38-124): the frozen
backbone yields a 5-level squared-difference pyramid over taps
``stem + stages.{0..3}.2.act`` (channels 64/256/512/1024/2048, strides
2/4/8/16/32).  The decoder starts at the deepest diff, and at each level
conv-block → ×2 align-corners bilinear upsample → concat with the next
shallower diff.  Blocks are Conv3x3+BN+ReLU ×2 except the last
(Conv3x3+BN+ReLU then Conv1x1→1ch+ReLU).  Output is a 1-channel sigmoid map
at input resolution.

``v2`` adds a pixel-space squared-error channel — ``mean((a-b)^2)`` over RGB,
bilinearly (align_corners=False) resized to each level and concatenated as
one extra channel (reference: models/local_eval_models.py:444-456).

LoRA / full fine-tune of the backbone mirrors the reference's
``lora_rank`` semantics (reference: models/local_eval_models.py:17-24);
the trainable-parameter partition (decoder, or decoder+LoRA, or everything)
is decided by srsem.train.partition, matching ``save_model``'s
"decoder-only unless LoRA" checkpoint contract (:160-171).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from srsem.backbones.resnet import (
    CLIP_STAGE_TAPS,
    CLIP_STEM_TAP,
    IMAGENET_STAGE_TAPS,
    IMAGENET_STEM_TAP,
    ClipResNet50,
    ImageNetResNet50,
)
from srsem.core.config import LocalModelConfig
from srsem.ops.batchnorm import TorchBatchNorm
from srsem.ops.image import resize_bilinear_mxu, upsample_x2_align_corners

Array = jax.Array

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")

# Decoder channel plan, shallow→deep: (in_extra_from_skip, out) pairs are
# implied by the tap channels; reference: models/local_eval_models.py:38-82.
_LEVEL_CHANNELS = (64, 256, 512, 1024, 2048)


class _ConcatConv(nn.Module):
    """3x3 conv over the (skip, upsampled) channel concat, computed as two
    sliced convs: conv(concat([d, u]), W) == conv(d, W[:ch_d]) +
    conv(u, W[ch_d:]) exactly — same kernel param layout as the concat
    form (checkpoints unchanged) but the (N,H,W,ch_d+ch_u) concat is never
    materialized.  Measured 1.25-1.37x at the 112px level, 1.08x at 56px
    (scripts/profile_clu2.py)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, d: Array, u: Optional[Array] = None) -> Array:
        cin = d.shape[-1] + (u.shape[-1] if u is not None else 0)
        w = self.param("kernel", _conv_init, (3, 3, cin, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        w = w.astype(self.dtype)

        def cv(x, k):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        y = cv(d, w[:, :, : d.shape[-1]])
        if u is not None:
            y = y + cv(u, w[:, :, d.shape[-1]:])
        return y + b.astype(self.dtype)


class DecoderBlock(nn.Module):
    """Conv3x3+BN+ReLU → Conv(k)+[BN]+ReLU.  The shallowest block ends with
    a 1x1 conv to one channel and no second BN (reference :39-45).

    ``dtype`` is the conv compute dtype (params stay float32; BN statistics
    always compute in float32 regardless).  Accepts either one array or a
    ``(skip_diff, upsampled)`` pair — the pair form feeds the split conv1
    (see :class:`_ConcatConv`)."""

    mid: int
    out: int
    final_kernel: int = 3
    final_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> Array:
        d, u = x if isinstance(x, tuple) else (x, None)
        x = _ConcatConv(self.mid, dtype=self.dtype, name="conv1")(d, u)
        # TorchBatchNorm, not flax BN: the decoder is TRAINED, and torch's
        # running-var update is Bessel-corrected (srsem/ops/batchnorm.py).
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32,
                           param_dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x).astype(self.dtype)
        k = self.final_kernel
        x = nn.Conv(self.out, (k, k), padding="SAME", kernel_init=_conv_init,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(x)
        if self.final_bn:
            x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=jnp.float32,
                               param_dtype=jnp.float32, name="bn2")(x)
        # Stay in the decoder compute dtype between blocks: in bf16 serving
        # mode the upsample/concat traffic halves (the f32 parity default is
        # unchanged — dtype is f32 there).
        return nn.relu(x.astype(self.dtype))


class CluUnet(nn.Module):
    """map = model(a, b): per-pixel semantic-fidelity map in [0, 1]."""

    backbone_kind: str = "resnet50_clip"
    v2: bool = False
    lora_rank: Optional[Union[int, str]] = None
    compute_dtype: Any = jnp.bfloat16
    sigmoid: bool = True  # False = the reference's global CLIP_lpips_Unet copy
    image_size: int = 224
    # Decoder conv compute dtype.  float32 is the parity default; bfloat16
    # trades ~3 decimal digits of map precision for decoder throughput on
    # the MXU (the CLU serving path is decoder-bound, BENCH_NOTES.md).
    decoder_dtype: Any = jnp.float32
    # Dtype of the RETURNED map (sigmoid itself always runs in f32).
    # float32 is the parity default; bfloat16 halves the output buffer's
    # HBM write and host-delivery bytes — the dominant cost of full-map
    # serving at 512px (scripts/ab_clu512_output.py, BENCH_NOTES r5).
    output_dtype: Any = jnp.float32
    # Decoder width multiplier.  1.0 (default) is the reference channel
    # plan (_LEVEL_CHANNELS) — required for parity and checkpoint
    # compatibility.  Fractions scale every decoder block's channels
    # (min 8) without changing the code path, BN/upsample/skip structure,
    # or param layout shape-classes: used by the multi-chip dryrun, where
    # full-width 2048-channel decoder convs make the 8-virtual-device
    # XLA:CPU step minutes-slow (__graft_entry__.dryrun_multichip).
    width_mult: float = 1.0
    # Tower batching.  False (default): ONE 2N-batch tower pass over
    # concat([a, b]) — measured ~1.1x faster on a single chip
    # (scripts/ab_clu.py: 1,445 vs 1,230 maps/s; better pipelining at 2N).
    # True: two N-batch passes — REQUIRED under a multi-device mesh with
    # data-sharded inputs, where the concat's mismatched per-device
    # boundaries force a GSPMD all-to-all reshard (slow over ICI, and it
    # aborts XLA:CPU's AllToAllThunk on the virtual test mesh).  Numerics
    # are identical either way in every mode — the tower's BN is
    # FrozenBatchNorm (running stats even under LoRA/full fine-tune), so
    # per-image results don't depend on batch composition.  Mesh-aware
    # scorers/trainers set this from the mesh size (srsem/eval/scorer.py,
    # srsem/train/loop.py).
    split_tower: bool = False

    def setup(self):
        rank = self.lora_rank if isinstance(self.lora_rank, int) else None
        if self.backbone_kind == "resnet50_clip":
            cls, kwargs = ClipResNet50, dict(
                lora_rank=rank, dtype=self.compute_dtype,
                image_size=self.image_size)
            self.tap_names = (CLIP_STEM_TAP,) + CLIP_STAGE_TAPS
        elif self.backbone_kind == "resnet50":
            cls, kwargs = ImageNetResNet50, dict(
                lora_rank=rank, dtype=self.compute_dtype)
            self.tap_names = (IMAGENET_STEM_TAP,) + IMAGENET_STAGE_TAPS
        else:
            raise ValueError(f"unsupported CLU backbone {self.backbone_kind!r}")
        if self.lora_rank == "full":
            # Full fine-tune backprops through the tower; rematerialize its
            # activations instead of storing them (HBM for FLOPs —
            # jax.checkpoint via nn.remat).
            cls = nn.remat(cls)
        self.backbone = cls(**kwargs)

        # Block lvl consumes concat(diff[lvl], upsampled block lvl+1 output)
        # and emits ch[lvl] channels; the shallowest block emits the 1-channel
        # map (reference: models/local_eval_models.py:38-82).
        def scaled(ch: int) -> int:
            return ch if self.width_mult == 1.0 else max(8, int(ch * self.width_mult))

        blocks = []
        for lvl, ch in enumerate(_LEVEL_CHANNELS):
            if lvl == 0:
                blocks.append(DecoderBlock(scaled(64), 1, final_kernel=1,
                                           final_bn=False,
                                           dtype=self.decoder_dtype,
                                           name="decoder.0"))
            else:
                blocks.append(DecoderBlock(scaled(ch), scaled(ch),
                                           dtype=self.decoder_dtype,
                                           name=f"decoder.{lvl}"))
        self.decoder = blocks

    def __call__(self, a: Array, b: Array, train: bool = False) -> Array:
        full_ft = self.lora_rank == "full"
        if not self.split_tower:
            # One 2N tower pass over concat([a, b]) — the single-chip-fast
            # form (see ``split_tower``).
            n = a.shape[0]
            emb, taps = self.backbone(jnp.concatenate([a, b], axis=0))
            if not (full_ft or isinstance(self.lora_rank, int)):
                taps = jax.tree.map(jax.lax.stop_gradient, taps)
            taps_a = {k: v[:n] for k, v in taps.items()}
            taps_b = {k: v[n:] for k, v in taps.items()}
        else:
            # Two N-batch tower passes — see ``split_tower``.
            _, taps_a = self.backbone(a)
            _, taps_b = self.backbone(b)
            if not (full_ft or isinstance(self.lora_rank, int)):
                taps_a = jax.tree.map(jax.lax.stop_gradient, taps_a)
                taps_b = jax.tree.map(jax.lax.stop_gradient, taps_b)
        return self.decode_from_taps(taps_a, taps_b, a, b, train)

    def decode_from_taps(self, taps_a, taps_b, a: Array, b: Array,
                         train: bool = False) -> Array:
        """Diff + UNet decode over precomputed backbone taps — lets the
        dataset-sweep scorer share ONE frozen-tower pass between the global
        head and this decoder (srsem/eval/dataset_sweep.py)."""
        dd = self.decoder_dtype
        diffs: List[Array] = []
        for name in self.tap_names:
            fa = taps_a[name].astype(jnp.float32)
            fb = taps_b[name].astype(jnp.float32)
            # Subtraction in f32 (bf16 cancellation is the risky part),
            # then the decoder's compute dtype for storage/concat.
            diffs.append(((fa - fb) ** 2).astype(dd))

        img_sq = None
        if self.v2:
            img_sq = jnp.mean(
                (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                axis=-1, keepdims=True)
        return self.decode_from_diffs(diffs, img_sq, train)

    def decode_from_diffs(self, diffs: List[Array],
                          img_sq: Optional[Array] = None,
                          train: bool = False) -> Array:
        """UNet decode over precomputed squared-diff pyramids (shallow→deep
        order matching ``tap_names``).  Grouped GT-vs-K-SR scorers build the
        diffs with a fused broadcast over the shared GT taps and feed them
        here directly (srsem/eval/grouped.py), so the GT tap tensors are
        never tiled K× in HBM.  ``img_sq`` is the v2 pixel-space squared
        error, (N, H, W, 1)."""
        dd = self.decoder_dtype
        if self.v2:
            # Pixel-space squared error, one channel, resized per level
            # with align_corners=False (reference :444-456).
            if img_sq is None:
                raise ValueError("v2 decode needs the pixel img_sq channel")
            diffs = [
                jnp.concatenate(
                    [d, resize_bilinear_mxu(
                        img_sq, d.shape[1:3],
                        align_corners=False).astype(dd)],
                    axis=-1)
                for d in diffs
            ]

        # Decode deepest→shallowest (reference :117-124).  Upsample einsums
        # run in the decoder dtype (f32 parity default; bf16 serving mode).
        h = self.decoder[-1](diffs[-1], train)
        h = upsample_x2_align_corners(h, compute_dtype=dd)
        for lvl in range(len(diffs) - 2, -1, -1):
            # (skip, upsampled) pair → split conv1; no concat materialized.
            h = self.decoder[lvl]((diffs[lvl], h), train)
            h = upsample_x2_align_corners(h, compute_dtype=dd)

        h = h[..., 0].astype(jnp.float32)  # (N, H, W)
        out = jax.nn.sigmoid(h) if self.sigmoid else h
        # Sigmoid in f32 always; the cast only narrows the OUTPUT buffer.
        # bf16 halves the final HBM write and the host-delivery bytes — at
        # 512px the (N, H, W) f32 map is 1 MiB/image, and its delivery
        # dominates the serving gap (scripts/ab_clu512_output.py: 250
        # maps/s reduced vs ~165 full-map f32 on the relay link).
        return out.astype(self.output_dtype)


#: Decoder levels routed through the fused Pallas kernel by default.
#: Level 4 (7x7, 2048→2048) is excluded by construction: its two conv
#: kernels are ~75 MB each in bf16 — more than v5e VMEM — and the level is
#: compute-bound 3072-wide matmul work XLA already runs well.  Level 3
#: (14x14, (1024+2048)→1024) fits (~83 MB weights+activations) but sits
#: close to the 100 MB compiler limit, so it is opt-in.
#: On-chip A/B verdict (scripts/ab_fused_decoder.py, BENCH_NOTES.md r3):
#: no fused-level choice beats the XLA decoder (0.86–1.02x) — XLA already
#: fuses the folded-BN conv chain well — so the fused decoder stays an
#: opt-in EXPERIMENT, not a serving default.
DEFAULT_FUSE_LEVELS: Tuple[int, ...] = (0, 1, 2)

#: Row-tile per level for the halo-tiled decoder kernel
#: (srsem/ops/fused_decoder.py::fused_decoder_level_tiled).  Only applies
#: to levels that are in fuse_levels AND have an upsampled branch (the
#: tiled kernel is pair-form).  EMPTY by default: the halo-tiled variants
#: hard-fail Mosaic on the real chip (axon remote-compile helper exits 1
#: at the L0 112px / L1 56x56-row-tile shapes — measured r3, every tiled
#: config crashed while every whole-image kernel compiled), so tiling is
#: reachable only by explicit request (tests run it in interpret mode).
DEFAULT_TILED_LEVEL_ROWS: Dict[int, int] = {}


def folded_decoder_weights(variables: Dict, lvl: int, cd: int):
    """BN-folded serving weights of decoder level ``lvl``.

    Returns ``(w1d, w1u, b1, w2, b2, final_kernel)`` with conv1 split at
    ``cd`` input channels (the skip-diff branch) — w1u is None for the
    deepest level, whose block consumes the diff alone.  Serving BN uses
    running statistics, a per-channel affine that folds exactly into the
    conv weights (srsem/ops/fused_bottleneck.py::fold_bn_into_conv), so
    this is the single owner of the decoder's param/batch_stats layout for
    every fused serving path (srsem/ops/fused_decoder.py consumes shapes
    only)."""
    from srsem.ops.fused_bottleneck import fold_bn_into_conv

    name = f"decoder.{lvl}"
    p = variables["params"][name]
    stats = variables.get("batch_stats", {}).get(name, {})

    def bn(which: str) -> dict:
        return {**p[which], **stats[which]}

    w1, b1 = fold_bn_into_conv(p["conv1"]["kernel"], bn("bn1"),
                               bias=p["conv1"]["bias"])
    w1d, w1u = w1[:, :, :cd], (w1[:, :, cd:] if w1.shape[2] > cd else None)
    if "bn2" in p:
        w2, b2 = fold_bn_into_conv(p["conv2"]["kernel"], bn("bn2"),
                                   bias=p["conv2"]["bias"])
    else:  # level 0: Conv1x1 → 1 channel, no second BN (reference :39-45)
        w2, b2 = p["conv2"]["kernel"], p["conv2"]["bias"]
    final_kernel = w2.shape[0]
    return w1d, w1u, b1, w2, b2, final_kernel


def _xla_decoder_level(d: Array, u: Optional[Array], w1d: Array,
                       w1u: Optional[Array], b1: Array, w2: Array,
                       b2: Array, final_kernel: int, dtype: Any) -> Array:
    """Folded-weight decoder level on plain XLA convs — identical math to
    the fused kernel; the fallback for levels outside ``fuse_levels``."""

    def cv(x, k):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), k.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    h = cv(d, w1d)
    if u is not None:
        h = h + cv(u, w1u)
    h = nn.relu(h + b1.astype(dtype))
    y = cv(h, w2) if final_kernel == 3 else (
        h @ w2[0, 0].astype(dtype))
    return nn.relu(y + b2.astype(dtype))


def fused_serving_decode(model: "CluUnet", variables: Dict,
                         diffs: List[Array],
                         img_sq: Optional[Array] = None,
                         interpret: bool = False,
                         fuse_levels: Optional[Tuple[int, ...]] = None,
                         tiled_rows: Optional[Dict[int, int]] = None
                         ) -> Array:
    """Serving-only UNet decode with fused Pallas levels.

    Mirrors :meth:`CluUnet.decode_from_diffs` (eval mode) with every level
    in ``fuse_levels`` running as ONE VMEM-resident kernel (conv1-split +
    folded BN + ReLU + conv2 + folded BN + ReLU — srsem/ops/
    fused_decoder.py) and the rest on folded-weight XLA convs.  BatchNorm
    running statistics fold into the conv weights, so results match the
    train=False decoder up to FP reduction order."""
    from srsem.ops.fused_decoder import (fused_decoder_level,
                                         fused_decoder_level_tiled)

    if fuse_levels is None:
        fuse_levels = DEFAULT_FUSE_LEVELS
    if tiled_rows is None:
        tiled_rows = DEFAULT_TILED_LEVEL_ROWS
    dd = model.decoder_dtype
    if model.v2:
        if img_sq is None:
            raise ValueError("v2 decode needs the pixel img_sq channel")
        diffs = [
            jnp.concatenate(
                [d, resize_bilinear_mxu(img_sq, d.shape[1:3],
                                        align_corners=False).astype(d.dtype)],
                axis=-1)
            for d in diffs
        ]

    def level(lvl: int, d: Array, u: Optional[Array]) -> Array:
        wts = folded_decoder_weights(variables, lvl, d.shape[-1])
        w1d, w1u, b1, w2, b2, fk = wts
        if lvl in fuse_levels:
            th = tiled_rows.get(lvl)
            hh = 1 if fk == 1 else 2
            if (u is not None and th and th >= hh
                    and d.shape[1] % th == 0 and d.shape[1] // th >= 2):
                return fused_decoder_level_tiled(
                    d.astype(dd), u.astype(dd), w1d, w1u, b1, w2, b2,
                    row_tile=th, final_kernel=fk,
                    compute_dtype=jnp.dtype(dd), interpret=interpret)
            return fused_decoder_level(
                d.astype(dd), None if u is None else u.astype(dd),
                w1d, w1u, b1, w2, b2, final_kernel=fk,
                compute_dtype=jnp.dtype(dd), interpret=interpret)
        return _xla_decoder_level(d, u, w1d, w1u, b1, w2, b2, fk, dd)

    h = level(len(diffs) - 1, diffs[-1], None)
    h = upsample_x2_align_corners(h, compute_dtype=dd)
    for lvl in range(len(diffs) - 2, -1, -1):
        h = level(lvl, diffs[lvl], h)
        h = upsample_x2_align_corners(h, compute_dtype=dd)

    h = h[..., 0].astype(jnp.float32)
    out = jax.nn.sigmoid(h) if model.sigmoid else h
    return out.astype(model.output_dtype)  # see CluUnet.decode_from_diffs


def make_local_model(cfg: LocalModelConfig,
                     split_tower: bool = False,
                     width_mult: float = 1.0) -> CluUnet:
    return CluUnet(
        backbone_kind=cfg.backbone.kind,
        v2=cfg.v2,
        lora_rank=cfg.lora_rank,
        compute_dtype=jnp.dtype(cfg.backbone.compute_dtype),
        image_size=cfg.backbone.image_size,
        decoder_dtype=jnp.dtype(getattr(cfg, "decoder_dtype", "float32")),
        output_dtype=jnp.dtype(getattr(cfg, "output_dtype", "float32")),
        width_mult=width_mult,
        split_tower=split_tower,
    )

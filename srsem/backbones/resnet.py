"""ResNet-50 feature-pyramid backbones (ImageNet + CLIP variants), NHWC.

Two towers mirror the reference's two timm backbones:

* ``ImageNetResNet50`` — classic torchvision/timm ``resnet50``: 7x7/2 stem,
  3x3/2 max-pool, four bottleneck stages with stride on the 3x3 conv
  (reference: models/global_eval_models.py:695-698 loads ``resnet50``).
* ``ClipResNet50`` — OpenAI CLIP's modified ResNet ("resnet50_clip.openai"):
  3-conv stem + 2x2 avg-pool, bottlenecks whose downsampling is a stride-1
  conv followed by avg-pool (anti-aliasing), and an attention-pool head
  producing a 1024-d embedding (reference: models/global_eval_models.py:315).

Both return ``(embedding, taps)``; tap keys use the reference's forward-hook
names verbatim so the head↔backbone contract is self-documenting:

* CLIP:     ``"stem.conv3"`` (64ch, stride 2, post-BN+ReLU — timm ByobNet's
  ``stem.conv3`` is a ConvNormAct module) and ``"stages.{s}.2.act"`` — the
  post-residual ReLU of the *third* block of each stage (NOT the stage
  output for stages 1/2, which have 4/6 blocks)
  (reference: models/global_eval_models.py:327, local_eval_models.py:28).
* ImageNet: ``"conv1"`` (64ch, stride 2, RAW conv output — the reference
  hooks the bare ``nn.Conv2d``, so no BN/ReLU)
  and ``"layer{i}.2.act3"`` — third block's post-residual ReLU
  (reference: models/local_eval_models.py:196, global_eval_models.py:701).

Frozen-BN semantics: the reference keeps backbones in eval mode, so BN uses
running statistics (reference: models/global_eval_models.py:318-319).  Here
BN is a pure affine ``(x - mean) * gamma / sqrt(var + eps) + beta`` with the
four statistics held as ordinary (frozen) params — XLA fuses it into the
convolution epilogue.

Optional LoRA on every conv (rank-r factors added to the kernel at apply
time) replaces the reference's ``pytora.apply_lora``
(reference: models/local_eval_models.py:23); see srsem/ops/lora.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from srsem.ops.lora import lora_delta

Array = jax.Array

# Stage depths of ResNet-50.
STAGE_BLOCKS = (3, 4, 6, 3)

CLIP_STEM_TAP = "stem.conv3"
CLIP_STAGE_TAPS = tuple(f"stages.{s}.2.act" for s in range(4))
IMAGENET_STEM_TAP = "conv1"
IMAGENET_STAGE_TAPS = tuple(f"layer{s + 1}.2.act3" for s in range(4))


class FrozenBatchNorm(nn.Module):
    """BatchNorm locked to its running statistics (reference backbones are
    always in eval mode).  Parameters are float32; the affine is applied in
    the module's compute dtype."""

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        shape = (self.features,)
        gamma = self.param("scale", nn.initializers.ones, shape, jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, shape, jnp.float32)
        var = self.param("var", nn.initializers.ones, shape, jnp.float32)
        scale = gamma * jax.lax.rsqrt(var + self.eps)
        shift = beta - mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


class LoraConv(nn.Module):
    """Conv2D whose kernel can carry a LoRA delta.

    The base kernel is a frozen param; when ``lora_rank`` is set, two small
    trainable factors are added at apply time (W + (alpha/r)·AB), matching
    pytora's additive-delta semantics on ``nn.Conv2d``
    (reference: models/local_eval_models.py:23)."""

    features: int
    kernel: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = False
    lora_rank: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kshape = (*self.kernel, in_features, self.features)
        w = self.param(
            "kernel", nn.initializers.kaiming_normal(), kshape, jnp.float32
        )
        if self.lora_rank:
            w = w + lora_delta(
                self, kshape, self.lora_rank, nn.initializers.kaiming_normal()
            )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


def _same_pad_torch(k: int, s: int) -> Any:
    """Torch convs pad symmetrically with ``padding=k//2``; XLA's "SAME" can
    differ for even strides, so use explicit padding to match."""
    p = k // 2
    return ((p, p), (p, p))


class ImageNetBottleneck(nn.Module):
    """torchvision-v1.5 bottleneck: stride on the 3x3 conv."""

    width: int
    stride: int = 1
    lora_rank: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.width * 4
        conv = lambda name, feats, k, s: LoraConv(  # noqa: E731
            feats, (k, k), (s, s), _same_pad_torch(k, s),
            lora_rank=self.lora_rank, dtype=self.dtype, name=name)
        bn = lambda name, feats: FrozenBatchNorm(feats, dtype=self.dtype, name=name)  # noqa: E731

        h = nn.relu(bn("bn1", self.width)(conv("conv1", self.width, 1, 1)(x)))
        h = nn.relu(bn("bn2", self.width)(conv("conv2", self.width, 3, self.stride)(h)))
        h = bn("bn3", out_ch)(conv("conv3", out_ch, 1, 1)(h))
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = bn("downsample_bn", out_ch)(
                conv("downsample_conv", out_ch, 1, self.stride)(x))
        return nn.relu(h + x)


class ClipBottleneck(nn.Module):
    """OpenAI ModifiedResNet bottleneck: all convs stride 1; spatial
    reduction is a 2x2 average pool after the 3x3 conv (and on the shortcut
    before its 1x1 conv) — CLIP's anti-aliased downsampling."""

    width: int
    stride: int = 1
    lora_rank: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.width * 4
        conv = lambda name, feats, k: LoraConv(  # noqa: E731
            feats, (k, k), (1, 1), _same_pad_torch(k, 1),
            lora_rank=self.lora_rank, dtype=self.dtype, name=name)
        bn = lambda name, feats: FrozenBatchNorm(feats, dtype=self.dtype, name=name)  # noqa: E731
        pool = lambda v: nn.avg_pool(v, (self.stride, self.stride), (self.stride, self.stride))  # noqa: E731

        h = nn.relu(bn("bn1", self.width)(conv("conv1", self.width, 1)(x)))
        h = nn.relu(bn("bn2", self.width)(conv("conv2", self.width, 3)(h)))
        if self.stride > 1:
            h = pool(h)
        h = bn("bn3", out_ch)(conv("conv3", out_ch, 1)(h))
        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                x = pool(x)
            x = bn("downsample_bn", out_ch)(conv("downsample_conv", out_ch, 1)(x))
        return nn.relu(h + x)


class AttentionPool2d(nn.Module):
    """CLIP's attention-pool head: prepend the spatial mean as a query
    token, add learned positional embeddings, run one multi-head attention
    step, and project the query output to ``embed_dim`` (1024 for RN50)."""

    num_heads: int = 32
    embed_dim: int = 1024
    spatial: int = 7  # H=W of the final feature map at 224px input
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c)
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # (N, HW+1, C)

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=c ** -0.5),
            (self.spatial * self.spatial + 1, c),
            jnp.float32,
        )
        # Bilinear pos-embed interpolation for non-224 inputs
        # (srsem/ops/image.py::interpolate_pos_embed; no-op when sizes
        # match).
        from srsem.ops.image import interpolate_pos_embed

        pos = interpolate_pos_embed(pos, (h, w))
        tokens = tokens.astype(self.dtype) + pos.astype(self.dtype)

        dense = lambda name, feats: nn.Dense(  # noqa: E731
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q = dense("q_proj", c)(tokens[:, :1])
        k = dense("k_proj", c)(tokens)
        v = dense("v_proj", c)(tokens)

        head_dim = c // self.num_heads
        split = lambda t: t.reshape(n, t.shape[1], self.num_heads, head_dim)  # noqa: E731
        attn = jnp.einsum("nqhd,nkhd->nhqk", split(q), split(k)) / jnp.sqrt(
            jnp.asarray(head_dim, self.dtype))
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, split(v)).reshape(n, 1, c)
        out = dense("out_proj", self.embed_dim)(out)
        return out[:, 0]


def _tap(taps: Dict[str, Array], offsets, name: str, value: Array) -> Array:
    """Record ``value`` as tap ``name``; if a gradient probe registered an
    additive offset for this tap (srsem.explain.gradcam), apply it so
    ``jax.grad`` w.r.t. the offset yields d(output)/d(activation)."""
    if offsets and name in offsets:
        value = value + offsets[name].astype(value.dtype)
    taps[name] = value
    return value


class ImageNetResNet50(nn.Module):
    """ImageNet ResNet-50 returning (pooled_features, taps)."""

    lora_rank: Optional[int] = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, tap_offsets=None) -> Tuple[Array, Dict[str, Array]]:
        taps: Dict[str, Array] = {}
        x = x.astype(self.dtype)
        stem = LoraConv(64, (7, 7), (2, 2), ((3, 3), (3, 3)),
                        lora_rank=self.lora_rank, dtype=self.dtype, name="conv1")(x)
        # Reference hooks the bare nn.Conv2d → raw pre-BN output.
        stem = _tap(taps, tap_offsets, IMAGENET_STEM_TAP, stem)
        h = nn.relu(FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(stem))
        h = nn.max_pool(h, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        for s, (blocks, width) in enumerate(zip(STAGE_BLOCKS, widths)):
            for b in range(blocks):
                stride = 2 if (b == 0 and s > 0) else 1
                h = ImageNetBottleneck(
                    width, stride, lora_rank=self.lora_rank, dtype=self.dtype,
                    name=f"layer{s + 1}.{b}")(h)
                if b == 2:
                    h = _tap(taps, tap_offsets, IMAGENET_STAGE_TAPS[s], h)
        pooled = jnp.mean(h, axis=(1, 2))
        return pooled, taps


class ClipResNet50(nn.Module):
    """CLIP modified ResNet-50 returning (1024-d embedding, taps)."""

    lora_rank: Optional[int] = None
    dtype: Any = jnp.bfloat16
    embed_dim: int = 1024
    image_size: int = 224

    @nn.compact
    def __call__(self, x: Array, tap_offsets=None) -> Tuple[Array, Dict[str, Array]]:
        taps: Dict[str, Array] = {}
        x = x.astype(self.dtype)
        conv = lambda name, feats, k, s: LoraConv(  # noqa: E731
            feats, (k, k), (s, s), _same_pad_torch(k, s),
            lora_rank=self.lora_rank, dtype=self.dtype, name=name)
        bn = lambda name, feats: FrozenBatchNorm(feats, dtype=self.dtype, name=name)  # noqa: E731

        h = nn.relu(bn("stem.bn1", 32)(conv("stem.conv1", 32, 3, 2)(x)))
        h = nn.relu(bn("stem.bn2", 32)(conv("stem.conv2", 32, 3, 1)(h)))
        h = nn.relu(bn("stem.bn3", 64)(conv("stem.conv3", 64, 3, 1)(h)))
        # timm ByobNet's stem.conv3 is a ConvNormAct → tap is post-BN+ReLU.
        h = _tap(taps, tap_offsets, CLIP_STEM_TAP, h)
        h = nn.avg_pool(h, (2, 2), (2, 2))

        widths = (64, 128, 256, 512)
        for s, (blocks, width) in enumerate(zip(STAGE_BLOCKS, widths)):
            for b in range(blocks):
                stride = 2 if (b == 0 and s > 0) else 1
                h = ClipBottleneck(
                    width, stride, lora_rank=self.lora_rank, dtype=self.dtype,
                    name=f"stages.{s}.{b}")(h)
                if b < 3:
                    # Per-block taps "stages.{s}.{b}.act" serve both the
                    # per-stage heads (b == 2) and the wperlay head's
                    # 12-block list (reference: global_eval_models.py:832).
                    h = _tap(taps, tap_offsets, f"stages.{s}.{b}.act", h)
        emb = AttentionPool2d(
            num_heads=32, embed_dim=self.embed_dim,
            spatial=self.image_size // 32, dtype=self.dtype, name="attnpool")(h)
        return emb, taps


def make_backbone(cfg) -> nn.Module:
    """Instantiate a backbone from a BackboneConfig."""
    from srsem.backbones.vit import ClipViT

    dtype = jnp.dtype(cfg.compute_dtype)
    lora = cfg_lora_rank(cfg)
    if cfg.kind == "resnet50":
        return ImageNetResNet50(lora_rank=lora, dtype=dtype)
    if cfg.kind == "resnet50_clip":
        return ClipResNet50(lora_rank=lora, dtype=dtype, image_size=cfg.image_size)
    if cfg.is_vit:
        return ClipViT(
            patch=cfg.vit_patch, width=cfg.vit_width, depth=cfg.vit_depth,
            heads=cfg.vit_heads, dtype=dtype)
    raise ValueError(f"unknown backbone kind {cfg.kind!r}")


def cfg_lora_rank(cfg) -> Optional[int]:
    rank = getattr(cfg, "lora_rank", None)
    return rank if isinstance(rank, int) else None

"""TranSalNet-Dense saliency predictor + saliency losses, in Flax.

Rebuilds the reference's vendored TranSalNet
(reference: additional_approaches/src/transalnet/TranSalNet_Dense.py,
utils/densenet.py, utils/TransformerEncoder.py, utils/loss_function.py):

* encoder — DenseNet-161 features tapped after denseblocks 2/3/4
  (channels 768 / 2112 / 2208 at strides 8/16/32 — reference
  TranSalNet_Dense.py:57-70);
* three 2-layer transformer encoders over 1x1-projected feature tokens
  with learned positional embeddings (reference :146-169, cfg1-3 at
  :17-41);
* decoder — top-down multiplicative fusion: conv+BN+ReLU, nearest ×2
  upsample, multiply with the next shallower transformer output, ending in
  a 1-channel sigmoid map (reference :103-143);
* losses — CC / KL-div / SIM / NSS (reference utils/loss_function.py:
  35-69), vectorized over the batch instead of the reference's per-sample
  Python loop.

Weights convert from the torch checkpoint via ``convert_transalnet``
(srsem/utils/convert.py; CLI ``srsem convert --kind transalnet``),
parity-tested against a torch mirror in tests/test_saliency.py.  The
reference's default input is 288×384 (spatial token counts 9·12 / 18·24 /
36·48); images enter through the reference's aspect-preserving pad and
predictions leave through its center crop-back
(:func:`preprocess_pad` / :func:`postprocess_crop`, mirroring
reference: additional_approaches/src/transalnet/utils/data_process.py:9-80).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from srsem.ops.batchnorm import TorchBatchNorm

Array = jax.Array


# ---------------- DenseNet-161 encoder ----------------------------------

class DenseLayer(nn.Module):
    growth: int = 48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        h = TorchBatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="norm1")(x)
        h = nn.relu(h)
        h = nn.Conv(4 * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = TorchBatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="norm2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class DenseBlock(nn.Module):
    layers: int
    growth: int = 48

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        for i in range(self.layers):
            x = DenseLayer(self.growth, name=f"denselayer{i + 1}")(x, train)
        return x


class Transition(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = TorchBatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="norm")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv")(x)
        return nn.avg_pool(x, (2, 2), (2, 2))


class DenseNet161Features(nn.Module):
    """Returns the three tapped feature maps (768/2112/2208 ch)."""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Array, Array]:
        x = nn.Conv(96, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv0")(x)
        x = TorchBatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="norm0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        x = DenseBlock(6, name="denseblock1")(x, train)        # 384
        x = Transition(192, name="transition1")(x, train)
        x = DenseBlock(12, name="denseblock2")(x, train)       # 768
        x3 = x
        x = Transition(384, name="transition2")(x, train)
        x = DenseBlock(36, name="denseblock3")(x, train)       # 2112
        x4 = x
        x = Transition(1056, name="transition3")(x, train)
        x = DenseBlock(24, name="denseblock4")(x, train)       # 2208
        return x3, x4, x


# ---------------- Transformer encoders ----------------------------------

class SaliencyTransBlock(nn.Module):
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, t, c = x.shape
        head_dim = c // self.heads
        h = nn.LayerNorm(epsilon=1e-6, name="attention_norm")(x)
        qkv = nn.Dense(3 * c, name="attn_qkv")(h).reshape(
            n, t, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jax.nn.softmax(
            jnp.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(head_dim), axis=-1)
        h = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, c)
        x = x + nn.Dense(c, name="attn_out")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(x)
        h = nn.Dense(4 * c, name="ffn_fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(c, name="ffn_fc2")(h)


class TransEncoder(nn.Module):
    hidden: int
    heads: int
    layers: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        tokens = nn.Conv(self.hidden, (1, 1), name="patch_embeddings")(x)
        tokens = tokens.reshape(n, h * w, self.hidden)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, h * w, self.hidden), jnp.float32)
        tokens = tokens + pos
        for i in range(self.layers):
            tokens = SaliencyTransBlock(self.hidden, self.heads,
                                        name=f"layer{i}")(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(tokens)
        return tokens.reshape(n, h, w, self.hidden)


# ---------------- Full model --------------------------------------------

def _upsample_nearest_x2(x: Array) -> Array:
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class TranSalNetDense(nn.Module):
    """(N, H, W, 3) → (N, H', W') saliency map in [0, 1] (H'=H at the
    reference's 288×384 input)."""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x3, x4, x5 = DenseNet161Features(name="encoder")(x, train)

        def conv_bn_relu(h, ch, name):
            h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"{name}_conv")(h)
            h = TorchBatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, name=f"{name}_bn")(h)
            return nn.relu(h)

        h = TransEncoder(768, 12, name="TransEncoder1")(x5)
        h = conv_bn_relu(h, 768, "d1")
        h = _upsample_nearest_x2(h)

        x4a = TransEncoder(768, 12, name="TransEncoder2")(x4)
        h = nn.relu(h * x4a)
        h = conv_bn_relu(h, 512, "d2")
        h = _upsample_nearest_x2(h)

        x3a = TransEncoder(512, 8, name="TransEncoder3")(x3)
        h = nn.relu(h * x3a)
        h = conv_bn_relu(h, 256, "d3")
        h = _upsample_nearest_x2(h)

        h = conv_bn_relu(h, 128, "d4")
        h = _upsample_nearest_x2(h)
        h = conv_bn_relu(h, 64, "d5")
        h = _upsample_nearest_x2(h)
        h = conv_bn_relu(h, 32, "d6")
        h = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="d7_conv")(h)
        return jax.nn.sigmoid(h[..., 0])


# ---------------- Losses -------------------------------------------------

_EPS = 2.2204e-16


def loss_kldiv(pred: Array, gt: Array) -> Array:
    """Per-map KL divergence after normalizing both to distributions
    (reference loss_function.py:35-40).  Batched: (N, H, W) → (N,)."""
    p = pred / jnp.sum(pred, axis=(-2, -1), keepdims=True)
    g = gt / jnp.sum(gt, axis=(-2, -1), keepdims=True)
    return jnp.sum(g * jnp.log(_EPS + g / (p + _EPS)), axis=(-2, -1))


def loss_cc(pred: Array, gt: Array) -> Array:
    """Pearson correlation coefficient (reference :43-47)."""
    p = pred - jnp.mean(pred, axis=(-2, -1), keepdims=True)
    g = gt - jnp.mean(gt, axis=(-2, -1), keepdims=True)
    num = jnp.sum(p * g, axis=(-2, -1))
    den = jnp.sqrt(jnp.sum(p * p, axis=(-2, -1)) * jnp.sum(g * g, axis=(-2, -1)))
    return num / (den + _EPS)


def loss_similarity(pred: Array, gt: Array) -> Array:
    """Histogram intersection of min-max-normalized distributions
    (reference :50-60)."""
    def norm(m):
        lo = jnp.min(m, axis=(-2, -1), keepdims=True)
        hi = jnp.max(m, axis=(-2, -1), keepdims=True)
        m = (m - lo) / (hi - lo + _EPS)
        return m / (jnp.sum(m, axis=(-2, -1), keepdims=True) + _EPS)

    return jnp.sum(jnp.minimum(norm(pred), norm(gt)), axis=(-2, -1))


def loss_nss(pred: Array, fixation: Array) -> Array:
    """Normalized scanpath saliency vs a binary fixation map
    (reference :63-69)."""
    mu = jnp.mean(pred, axis=(-2, -1), keepdims=True)
    sd = jnp.std(pred, axis=(-2, -1), keepdims=True)
    z = (pred - mu) / (sd + _EPS)
    mask = (fixation > 0).astype(jnp.float32)
    return jnp.sum(z * mask, axis=(-2, -1)) / (
        jnp.sum(mask, axis=(-2, -1)) + _EPS)


def saliency_loss(pred: Array, target: Array, loss_type: str = "cc") -> Array:
    """Batch-mean dispatcher (reference SaliencyLoss, :6-32)."""
    fn = {"cc": loss_cc, "kldiv": loss_kldiv, "sim": loss_similarity,
          "nss": loss_nss}[loss_type]
    return jnp.mean(fn(pred, target))


def preprocess_pad(img: np.ndarray, target_hw: Tuple[int, int] = (288, 384),
                   pad_value: int = 1) -> np.ndarray:
    """Aspect-preserving resize + center pad into ``target_hw``, uint8.

    Mirrors the reference's ``preprocess_img``
    (reference: additional_approaches/src/transalnet/utils/
    data_process.py:9-41) exactly, including its quirks: 3-channel pads
    fill with value **1** (``np.ones``), 1-channel with 0; the resized
    extent uses integer floor division.  The resize itself is the repo's
    half-pixel-center bilinear (srsem/ops/npimage.py), the same sampling
    convention as the reference's ``cv2.resize`` INTER_LINEAR (cv2's
    fixed-point coefficients may differ by ±1 LSB).

    ``img`` is (H, W, C) or (H, W) uint8; channel ORDER is the caller's —
    the reference pipeline feeds cv2 BGR (see
    :func:`generate_saliency_maps`).  A trailing singleton channel
    ``(H, W, 1)`` is treated as grayscale: the reference's ``channels=1``
    arrays are 2-D (``cv2.imread(path, 0)``), so it is squeezed to match
    that contract — zero pad bands, 2-D result.
    """
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[..., 0]
    th, tw = target_hw
    h, w = img.shape[:2]
    if img.ndim == 2:
        padded = np.zeros((th, tw), np.uint8)
    else:
        padded = np.full((th, tw, img.shape[2]), pad_value, np.uint8)

    def _resize_u8(x, out_hw):
        from srsem.ops.npimage import resize_bilinear_np

        r = resize_bilinear_np(x.astype(np.float32), out_hw)
        return np.clip(np.rint(r), 0, 255).astype(np.uint8)

    # rows_rate > cols_rate ⟺ height is the binding dimension; the
    # post-resize min() clamps are vestigial (floor division guarantees
    # the free dimension fits) but kept for literal reference parity.
    if h / th > w / tw:
        new_cols = min((w * th) // h, tw)
        left = (tw - new_cols) // 2
        padded[:, left:left + new_cols] = _resize_u8(img, (th, new_cols))
    else:
        new_rows = min((h * tw) // w, th)
        top = (th - new_rows) // 2
        padded[top:top + new_rows] = _resize_u8(img, (new_rows, tw))
    return padded


def postprocess_crop(pred: np.ndarray,
                     source_hw: Tuple[int, int]) -> np.ndarray:
    """Map a model-resolution prediction back onto the source geometry.

    Mirrors the reference's ``postprocess_img``
    (reference: additional_approaches/src/transalnet/utils/
    data_process.py:43-80): upscale the padded-frame prediction until the
    source rectangle is covered, then center-crop the pad bands away.
    Exact inverse of :func:`preprocess_pad`'s placement (same floor/center
    arithmetic).  Keeps float32 (the reference round-trips through a PIL
    image; quantization there is incidental, not geometric).
    """
    pred = np.asarray(pred, np.float32)
    if pred.ndim != 2:
        raise ValueError(f"expected a (H, W) map, got shape {pred.shape}")
    from srsem.ops.npimage import resize_bilinear_np

    sh, sw = source_hw
    ph, pw = pred.shape
    if sh / ph > sw / pw:
        new_cols = (pw * sh) // ph
        r = resize_bilinear_np(pred, (sh, new_cols))
        left = (new_cols - sw) // 2
        return r[:, left:left + sw]
    new_rows = (ph * sw) // pw
    r = resize_bilinear_np(pred, (new_rows, sw))
    top = (new_rows - sh) // 2
    return r[top:top + sh, :]


def generate_saliency_maps(model_apply, variables, image_dir: str,
                           out_dir: str, image_size=(288, 384),
                           exts=(".jpg", ".png"), geometry: str = "pad",
                           channel_order: str = "bgr") -> int:
    """Folder job writing ``SaliencyMaps`` .npy files consumed by
    srsem.eval.approaches (reference usage: compute_metrics.py:130-134).
    Skip-existing resumable.

    ``geometry="pad"`` (default) is the reference pipeline: images enter
    through :func:`preprocess_pad` (aspect-preserving, 288×384) and the
    prediction is cropped back to the SOURCE resolution with
    :func:`postprocess_crop`, so the saved maps are interchangeable with
    reference-produced SaliencyMaps trees on any aspect ratio.
    ``geometry="resize"`` keeps the pre-round-5 distorting bicubic resize
    (maps saved at ``image_size``; the FULL pre-round-5 behavior also
    needs ``channel_order="rgb"``).

    ``channel_order="bgr"`` matches the reference's cv2.imread input
    convention (upstream TranSalNet checkpoints were trained on BGR);
    pass "rgb" for models trained in this repo's convention.

    Skip-existing resume is guarded against geometry mixing: the tree
    carries a ``.srsem_saliency_meta.json`` marker and resuming with
    different flags fails fast — a half-RGB/resize, half-BGR/pad tree
    would silently skew every downstream overlap metric.
    """
    import json as _json
    import os
    import sys as _sys

    from PIL import Image

    if geometry not in ("pad", "resize"):
        raise ValueError(f"unknown geometry {geometry!r}")
    if channel_order not in ("bgr", "rgb"):
        raise ValueError(f"unknown channel_order {channel_order!r}")
    os.makedirs(out_dir, exist_ok=True)
    meta = {"geometry": geometry, "channel_order": channel_order,
            "image_size": list(image_size)}
    meta_path = os.path.join(out_dir, ".srsem_saliency_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = _json.load(f)
        if prev != meta:
            raise ValueError(
                f"SaliencyMaps tree {out_dir!r} was generated with {prev}, "
                f"resuming with {meta} would mix map geometries in one "
                "tree — use a fresh out_dir or pass matching flags")
    else:
        existing = sum(f.endswith(".npy") for f in os.listdir(out_dir))
        if existing:
            # Unmarked non-empty tree: provenance unknown (pre-round-5
            # srsem trees were rgb/resize; reference trees are bgr/pad).
            print(f"saliency: warning: resuming an unmarked tree with "
                  f"{existing} existing maps; cannot verify they used "
                  f"geometry={geometry!r} channel_order={channel_order!r}",
                  file=_sys.stderr, flush=True)
        with open(meta_path, "w") as f:
            _json.dump(meta, f)
    n = 0
    for name in sorted(os.listdir(image_dir)):
        if not name.endswith(exts):
            continue
        # rsplit: keep dotted stems intact ('a.v1.jpg' → 'a.v1.npy') — the
        # consumer saliency_path_for (srsem/eval/approaches.py:31-36)
        # strips only the final extension.
        out_path = os.path.join(out_dir, name.rsplit(".", 1)[0] + ".npy")
        if os.path.exists(out_path):
            continue
        img = Image.open(os.path.join(image_dir, name)).convert("RGB")
        if geometry == "pad":
            src = np.asarray(img, np.uint8)
            if channel_order == "bgr":
                src = src[..., ::-1]
            arr = preprocess_pad(src, image_size).astype(np.float32)[None]
            arr /= 255.0
            sal = np.asarray(model_apply(variables, jnp.asarray(arr)))[0]
            sal = postprocess_crop(sal, src.shape[:2])
        else:
            img = img.resize((image_size[1], image_size[0]), Image.BICUBIC)
            arr = np.asarray(img, np.float32)[None]
            if channel_order == "bgr":
                arr = arr[..., ::-1]
            arr = arr / 255.0
            sal = np.asarray(model_apply(variables, jnp.asarray(arr)))[0]
        np.save(out_path, np.ascontiguousarray(sal))
        n += 1
    return n

"""Learned Perceptual Image Patch Similarity (LPIPS) — the real metric.

The reference scores SR outputs with pyiqa's learned LPIPS
(reference: datasets/SRdatasetPseudolabelGen/1_compute_image_metrics.py:17,44
and additional_approaches/src/eval_utils/compute_metrics.py:27,123), which is
Zhang et al.'s v0.1 metric: a frozen AlexNet (pyiqa default) or VGG16
feature tower, per-stage channelwise unit normalization, squared feature
differences, learned non-negative 1x1 convolutions to a scalar per stage,
spatial averaging, and a sum over stages.

TPU-first restructure: both images run through the tower as ONE 2N batch
(NHWC, MXU-friendly convs); the five stage reductions fuse into the same
XLA program.  ``convert_lpips`` maps the official torch checkpoints
(torchvision AlexNet/VGG16 ``features.N.*`` + lpips ``lin{k}.model.1.weight``)
into the Flax tree; architecture + converter are pinned by a torch-mirror
golden test (tests/test_lpips.py) so real checkpoints convert identically.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import traverse_util

# v0.1 input scaling layer constants (RGB, applied after mapping to [-1,1]).
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

ALEX_CHANNELS = (64, 192, 384, 256, 256)
VGG16_CHANNELS = (64, 128, 256, 512, 512)


def _maxpool(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet ``features`` trunk, NHWC, returning the five
    post-ReLU taps (relu1..relu5) that LPIPS consumes."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        conv = lambda ch, k, s, p, name: nn.Conv(  # noqa: E731
            ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
            dtype=self.dtype, name=name)
        x = nn.relu(conv(64, 11, 4, 2, "conv1")(x))
        r1 = x
        x = _maxpool(x, 3, 2)
        x = nn.relu(conv(192, 5, 1, 2, "conv2")(x))
        r2 = x
        x = _maxpool(x, 3, 2)
        x = nn.relu(conv(384, 3, 1, 1, "conv3")(x))
        r3 = x
        x = nn.relu(conv(256, 3, 1, 1, "conv4")(x))
        r4 = x
        x = nn.relu(conv(256, 3, 1, 1, "conv5")(x))
        r5 = x
        return r1, r2, r3, r4, r5


class VGG16Features(nn.Module):
    """torchvision VGG16 ``features`` trunk, NHWC, returning the
    relu{1_2,2_2,3_3,4_3,5_3} taps."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        plan = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        taps = []
        idx = 0
        for stage, (ch, n) in enumerate(plan):
            if stage:
                x = _maxpool(x, 2, 2)
            for _ in range(n):
                x = nn.relu(nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                                    dtype=self.dtype,
                                    name=f"conv{idx}")(x))
                idx += 1
            taps.append(x)
        return tuple(taps)


class LPIPS(nn.Module):
    """LPIPS v0.1 distance on a [0,1]-range NHWC image pair batch.

    ``spatial=True`` skips the spatial average and returns per-pixel
    distance maps upsampled to the input resolution — pyiqa's
    ``spatial`` option, useful as a local-fidelity baseline map.
    """

    net: str = "alex"  # pyiqa default (1_compute_image_metrics.py:17)
    dtype: Any = jnp.float32
    spatial: bool = False

    @nn.compact
    def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
        n = x0.shape[0]
        x = jnp.concatenate([x0, x1], axis=0)
        # [0,1] → [-1,1] → v0.1 scaling layer.
        x = 2.0 * x - 1.0
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        x = (x - shift) / scale
        tower = (AlexNetFeatures if self.net == "alex" else
                 VGG16Features)(dtype=self.dtype, name="tower")
        taps = tower(x)
        chans = ALEX_CHANNELS if self.net == "alex" else VGG16_CHANNELS
        total = None
        for k, (tap, ch) in enumerate(zip(taps, chans)):
            f = tap.astype(jnp.float32)
            f = f * jax.lax.rsqrt(
                jnp.sum(f * f, axis=-1, keepdims=True) + 1e-10)
            diff = (f[:n] - f[n:]) ** 2
            # Learned non-negative 1x1 conv to one channel, no bias
            # (lpips NetLinLayer).
            d = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{k}")(diff)
            if self.spatial:
                d = jax.image.resize(
                    d, (n, x0.shape[1], x0.shape[2], 1), "bilinear")
                total = d if total is None else total + d
            else:
                d = jnp.mean(d, axis=(1, 2, 3))
                total = d if total is None else total + d
        return total[..., 0] if (self.spatial and total.ndim == 4) else total


def make_lpips(net: str = "alex",
               params: Optional[Dict] = None,
               image_size: int = 224,
               dtype: Any = jnp.float32,
               spatial: bool = False):
    """Build a jitted ``(gt, ev) -> (N,) distance`` callable.

    ``params``: converted checkpoint from :func:`convert_lpips`; when None
    the architecture initializes randomly (this container has no weights —
    zero egress; the converter + parity test pin the real checkpoint path).
    """
    model = LPIPS(net=net, dtype=dtype, spatial=spatial)
    if params is None:
        z = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), z, z)
    else:
        variables = {"params": params}

    @jax.jit
    def lpips(gt: jnp.ndarray, ev: jnp.ndarray) -> jnp.ndarray:
        return model.apply(variables, gt, ev)

    return lpips


# --------------------------------------------------------------------------
# Torch-checkpoint converter (torchvision tower + official lpips lins).

def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW → HWIO


# torchvision ``features`` indices of the conv layers, in tap order.
_ALEX_FEATURE_IDX = (0, 3, 6, 8, 10)
_VGG16_FEATURE_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_lpips(lin_sd: Mapping[str, Any],
                  tower_sd: Optional[Mapping[str, Any]] = None,
                  net: str = "alex") -> Dict:
    """Official LPIPS checkpoints → Flax param tree for :class:`LPIPS`.

    ``lin_sd``: the learned-weights file (richzhang ``lpips`` /pyiqa
    ``LPIPS_v0.1_alex*.pth``) with keys ``lin{k}.model.1.weight`` (also
    accepts ``lins.{k}.model.1.weight`` and bare ``lin{k}.weight``).
    ``tower_sd``: torchvision ``alexnet``/``vgg16`` state dict
    (``features.N.weight/bias``); optional so the lins can be converted
    standalone and composed with an already-converted tower.
    """
    flat: Dict[tuple, np.ndarray] = {}
    chans = ALEX_CHANNELS if net == "alex" else VGG16_CHANNELS
    for k in range(len(chans)):
        w = None
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight",
                    f"lin{k}.weight"):
            if key in lin_sd:
                w = lin_sd[key]
                break
        if w is None:
            raise KeyError(f"lin{k} weight not found in lpips state dict")
        flat[(f"lin{k}", "kernel")] = _conv(w)

    if tower_sd is not None:
        tower_sd = {k.replace("net.", "").replace("module.", ""): v
                    for k, v in tower_sd.items()}
        idxs = _ALEX_FEATURE_IDX if net == "alex" else _VGG16_FEATURE_IDX
        for j, fi in enumerate(idxs):
            name = f"conv{j + 1}" if net == "alex" else f"conv{j}"
            flat[("tower", name, "kernel")] = _conv(
                tower_sd[f"features.{fi}.weight"])
            flat[("tower", name, "bias")] = _np(tower_sd[f"features.{fi}.bias"])
    return traverse_util.unflatten_dict(flat)

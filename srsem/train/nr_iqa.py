"""Training harness for the native KonIQ++-equivalent NR-IQA head.

The reference consumes an external, pre-trained KonIQ++ checkout
(reference: datasets/SRdatasetPseudolabelGen/1_compute_image_metrics.py:7-57
— columns Koniq++{IQA, blur, artifacts, contrast, color}); its training
recipe is out of its tree.  This module makes the native head
(srsem.eval.nr_iqa.NrIqaHead) trainable end-to-end:

* :func:`degrade` — a jitted synthetic degradation generator producing
  (degraded image, 5 quality labels) pairs from clean images: Gaussian
  blur, blocky compression artifacts, contrast compression, and color
  desaturation, each with a per-sample severity drawn on host — so the
  head can be trained without the (unavailable) KonIQ-10k label CSV, and
  drop-in retrained on the real labels when present;
* :func:`train_nr_iqa` — head-only masked-MSE training (frozen tower never
  enters ``jax.grad``), Adam, checkpointing via the standard harness.

The trained head slots into ``ImageQualityMetrics(koniqpp=...)`` through
:class:`srsem.eval.nr_iqa.NrIqaScorer`, filling the five Koniq++ columns of
``metrics.csv``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from srsem.eval.nr_iqa import NrIqaHead, OUTPUT_NAMES
from srsem.train.partition import merge_params, partition_params, trainable_predicate

Array = jax.Array


def _gauss_kernel(radius: int, sigma: Array) -> Array:
    """(2r+1,) normalized Gaussian; sigma is a traced scalar."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    return k / jnp.sum(k)


def _sep_blur(img: Array, sigma: Array, radius: int = 7) -> Array:
    """Separable Gaussian blur of one HWC image with a traced sigma
    (edge-padded depthwise convs, MXU/VPU-friendly)."""
    k = _gauss_kernel(radius, sigma)
    c = img.shape[-1]
    x = img[None]

    def depthwise(x, kern, pad_hw):
        return jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (pad_hw[0], pad_hw[0]),
                        (pad_hw[1], pad_hw[1]), (0, 0)), mode="edge"),
            kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    kv = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kh = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, c))
    x = depthwise(x, kv, (radius, 0))
    x = depthwise(x, kh, (0, radius))
    return x[0]


def _blockify(img: Array, amount: Array, block: int = 8) -> Array:
    """Compression-artifact proxy: blend toward per-block mean color."""
    h, w, c = img.shape
    hb, wb = h // block, w // block
    crop = img[: hb * block, : wb * block]
    means = crop.reshape(hb, block, wb, block, c).mean(axis=(1, 3))
    blocky = jnp.repeat(jnp.repeat(means, block, axis=0), block, axis=1)
    out = crop * (1 - amount) + blocky * amount
    return img.at[: hb * block, : wb * block].set(out)


@partial(jax.jit, static_argnames=("radius",))
def degrade(images: Array, severities: Array, radius: int = 7
            ) -> Tuple[Array, Array]:
    """Apply per-sample degradations and return (degraded, labels).

    ``images``: (N, H, W, 3) in [0,1]; ``severities``: (N, 4) in [0,1] —
    (blur, artifacts, contrast, color).  Labels are quality scores in
    [0,1]: per-dimension ``1 - severity`` plus an overall IQA score
    ``1 - mean(severity)`` — the KonIQ++ convention of one global MOS and
    four distortion-specific scores.
    """

    def one(img, sev):
        blur_s, art_s, con_s, col_s = sev[0], sev[1], sev[2], sev[3]
        x = _sep_blur(img, blur_s * 3.0, radius)
        x = _blockify(x, art_s)
        mean = jnp.mean(x, axis=(0, 1), keepdims=True)
        x = x * (1 - 0.8 * con_s) + mean * (0.8 * con_s)
        gray = jnp.mean(x, axis=-1, keepdims=True)
        x = x * (1 - col_s) + gray * col_s
        return jnp.clip(x, 0.0, 1.0)

    degraded = jax.vmap(one)(images, severities)
    quality = 1.0 - severities
    iqa = 1.0 - jnp.mean(severities, axis=-1, keepdims=True)
    labels = jnp.concatenate([iqa, quality], axis=-1)
    return degraded, labels


@dataclasses.dataclass
class NrIqaTrainResult:
    variables: Dict
    losses: list
    val_mse: float


def train_nr_iqa(
    images: np.ndarray,
    epochs: int = 5,
    batch_size: int = 8,
    lr: float = 1e-3,
    seed: int = 0,
    compute_dtype=jnp.float32,
    checkpoint_dir: Optional[str] = None,
    val_fraction: float = 0.25,
) -> NrIqaTrainResult:
    """Train the NR-IQA head on synthetic degradations of ``images``.

    Head-only training: the frozen tower is partitioned out of ``jax.grad``
    exactly like the global regressors (srsem/train/partition.py).  Each
    epoch draws fresh severities, so the head sees a stream of (degraded,
    label) pairs rather than a fixed set.
    """
    rng = np.random.default_rng(seed)
    images = np.asarray(images, np.float32)
    n_val = max(1, int(len(images) * val_fraction))
    train_imgs, val_imgs = images[:-n_val], images[-n_val:]

    model = NrIqaHead(compute_dtype=compute_dtype)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1,) + images.shape[1:], jnp.float32))
    trainable, frozen = partition_params(
        variables["params"], trainable_predicate(backbone_key="backbone"))
    tx = optax.adam(lr)
    opt_state = tx.init(trainable)

    from srsem.ops.image import IMAGENET_MEAN, IMAGENET_STD, normalize

    @jax.jit
    def train_step(trainable, opt_state, x, y):
        # Degraded images are raw [0,1]; the scorer feeds ImageNet-normalized
        # pixels (Preprocess.for_backbone("resnet50")) — match it here.
        x = normalize(x, IMAGENET_MEAN, IMAGENET_STD)

        def loss_fn(tr):
            pred = model.apply({"params": merge_params(tr, frozen)}, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    @jax.jit
    def eval_mse(trainable, x, y):
        x = normalize(x, IMAGENET_MEAN, IMAGENET_STD)
        pred = model.apply({"params": merge_params(trainable, frozen)}, x)
        return jnp.mean((pred - y) ** 2)

    losses = []
    for _ in range(epochs):
        order = rng.permutation(len(train_imgs))
        for start in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[start: start + batch_size]
            sev = rng.uniform(0.0, 1.0, size=(len(idx), 4)).astype(np.float32)
            x, y = degrade(jnp.asarray(train_imgs[idx]), jnp.asarray(sev))
            trainable, opt_state, loss = train_step(trainable, opt_state, x, y)
            losses.append(float(jax.device_get(loss)))

    sev = rng.uniform(0.0, 1.0, size=(len(val_imgs), 4)).astype(np.float32)
    xv, yv = degrade(jnp.asarray(val_imgs), jnp.asarray(sev))
    val_mse = float(jax.device_get(eval_mse(trainable, xv, yv)))

    out_vars = {"params": merge_params(trainable, frozen)}
    if checkpoint_dir:
        from srsem.train.checkpoint import save_checkpoint

        # The tower is random-init from PRNGKey(seed): the head is only
        # meaningful against THAT tower, so the seed rides along and
        # load_nr_iqa_head rebuilds the same one.
        save_checkpoint(checkpoint_dir, len(losses),
                        {"trainable": jax.device_get(trainable),
                         "tower_seed": np.int32(seed)})
    return NrIqaTrainResult(variables=out_vars, losses=losses, val_mse=val_mse)


def load_nr_iqa_head(checkpoint_dir: str, image_size: int = 224,
                     compute_dtype=jnp.bfloat16) -> Dict:
    """Rebuild full variables from a head-only checkpoint (frozen tower
    re-initialized deterministically — replace with converted pretrained
    weights in production; srsem.utils.convert.convert_torch_resnet50)."""
    from srsem.train.checkpoint import restore_checkpoint

    raw = restore_checkpoint(checkpoint_dir)
    # Rebuild the SAME random tower the head was trained against — the
    # training seed rides in the checkpoint (older checkpoints without it
    # were all trained at the former hardcoded seed 0).
    seed = int(raw.get("tower_seed", 0))
    model = NrIqaHead(compute_dtype=compute_dtype)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, image_size, image_size, 3)))
    trainable, frozen = partition_params(
        variables["params"], trainable_predicate(backbone_key="backbone"))
    restored = jax.tree.map(jnp.asarray, raw["trainable"])
    return {"params": merge_params(restored, frozen)}

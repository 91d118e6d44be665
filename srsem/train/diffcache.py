"""Diff-cache sweep training: precompute the frozen tower ONCE, train on it.

The frozen backbone + deterministic preprocessing mean every pair's
squared-diff pyramid is a *constant* of the dataset — yet the reference
recomputes it every epoch of every grid point (30 epochs x 3 depths for
the global sweep, reference: CLIPLPIPS_REG_training_sweep_example.py:
107-114,169-188), and even the shared-tower sweep (srsem/train/
multisweep.py) still pays one tower pass per batch per epoch.  Here the
tap-union diff pyramids for the whole train/val streams are computed in a
single pass and kept **device-resident, sharded over the mesh's data
axis**; every subsequent epoch of every grid point is a head-only jitted
scan over the cache.  The tower is ~99% of a head-training step, so
epochs 2..E run at head speed.

Numerics: identical diffs (cached in ``cache_dtype``, float32 by default)
feed the same ConvHeadAggregator math as the per-epoch paths — one
training step from the cache equals one uncached step exactly
(tests/test_diffcache.py).  One behavioral difference, documented: batch
*composition* is frozen at cache-build time and epochs shuffle the batch
ORDER only (the torch DataLoader reshuffles rows every epoch).  At the
user-study scale (bs 5, reference:169) batch-order shuffling is an
equivalent regularizer.

Memory: the depth-3 tap union at 224px is ~6 MB/pair in float32
(~1.4 GB for the 240-pair train split) — comfortably device-resident.
``estimate_cache_bytes`` guards the budget; callers fall back to
``train_global_sweep_shared_tower`` when the dataset outgrows HBM.

Sharding note: the cache is stored as ``(n_batches, batch, h, w, c)``
with the *batch* axis sharded over ``data`` and the leading batch-index
axis replicated, so the per-step ``dynamic_index_in_dim`` over axis 0 is
local to every device — no GSPMD reshards anywhere in the epoch program
(XLA:CPU's AllToAllThunk aborts on the virtual test mesh; CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from srsem.backbones.resnet import make_backbone
from srsem.core.config import GlobalModelConfig, TrainConfig
from srsem.core.meshes import DATA_AXIS, create_mesh, replicate, shard_batch
from srsem.models.global_models import ConvHeadAggregator
from srsem.train.metrics import mse as mse_metric, srcc
from srsem.train.multisweep import SweepPoint
from srsem.train.steps import masked_mse


@dataclasses.dataclass
class DiffCache:
    """Device-resident squared-diff pyramids for a pair stream.

    ``diffs[name]``: (n_batches, batch, h, w, c), batch axis sharded over
    ``data``; ``y``/``mask``: (n_batches, batch).
    """

    diffs: Dict[str, jax.Array]
    y: jax.Array
    mask: jax.Array

    @property
    def n_batches(self) -> int:
        return int(self.y.shape[0])

    @property
    def batch(self) -> int:
        return int(self.y.shape[1])


def estimate_cache_bytes(tap_shapes: Dict[str, Tuple[int, ...]],
                         n_pairs: int, cache_dtype) -> int:
    """Bytes for ``n_pairs`` diff pyramids over the given (h, w, c) taps."""
    item = jnp.dtype(cache_dtype).itemsize
    per_pair = sum(int(np.prod(s)) for s in tap_shapes.values())
    return per_pair * n_pairs * item


def build_diff_cache(
    backbone,
    bparams,
    tap_names: Sequence[str],
    loader,
    mesh,
    cache_dtype=jnp.float32,
    max_bytes: Optional[int] = 8 << 30,
) -> DiffCache:
    """One frozen-tower pass over ``loader`` → device-resident diff cache.

    The tower runs as two per-image applies (a GT+SR concat would force a
    GSPMD all-to-all reshard on multi-device meshes).  Batches come back to
    host once, are stacked into the (n_batches, batch, ...) layout, and go
    to device with the batch axis sharded — a one-time cost amortized over
    every epoch of every grid point.
    """
    tap_names = list(tap_names)

    @jax.jit
    def batch_diffs(bp, a, b):
        _, taps_a = backbone.apply({"params": bp}, a)
        _, taps_b = backbone.apply({"params": bp}, b)
        return {
            nm: ((taps_a[nm].astype(jnp.float32)
                  - taps_b[nm].astype(jnp.float32)) ** 2).astype(cache_dtype)
            for nm in tap_names
        }

    host: Dict[str, List[np.ndarray]] = {nm: [] for nm in tap_names}
    ys: List[np.ndarray] = []
    masks: List[np.ndarray] = []
    total = 0
    for batch in loader:
        # Loaders must yield the masked form ``(((a, b), y), mask)`` —
        # srsem.data.loader's contract.  (An isinstance-based fallback for
        # an unmasked form is impossible to discriminate structurally: an
        # unmasked ((a, b), y) batch is also a 2-tuple.)
        ((a, b), y), mask = batch
        mask = np.asarray(mask, np.float32)
        a_d, b_d = shard_batch(mesh, (np.asarray(a), np.asarray(b)))
        d = jax.device_get(batch_diffs(bparams, a_d, b_d))
        for nm in tap_names:
            host[nm].append(np.asarray(d[nm]))
        ys.append(np.asarray(y, np.float32))
        masks.append(np.asarray(mask, np.float32))
        total += sum(arr.nbytes for arr in d.values())
        if max_bytes is not None and total > max_bytes:
            raise MemoryError(
                f"diff cache exceeds {max_bytes} bytes after "
                f"{sum(m.size for m in masks)} pairs; use the shared-tower "
                "sweep (srsem/train/multisweep.py) for datasets this large")

    if not ys:
        raise ValueError("empty loader — nothing to cache")
    bs = ys[0].shape[0]
    if any(y.shape[0] != bs for y in ys):
        raise ValueError("loader must yield fixed-size (padded) batches")

    batch_sharded = NamedSharding(mesh, P(None, DATA_AXIS))
    diffs = {
        nm: jax.device_put(np.stack(host[nm]), batch_sharded)
        for nm in tap_names
    }
    yx = jax.device_put(np.stack(ys), batch_sharded)
    mx = jax.device_put(np.stack(masks), batch_sharded)
    return DiffCache(diffs=diffs, y=yx, mask=mx)


def train_global_sweep_cached_diffs(
    points: Sequence[SweepPoint],
    cfg: GlobalModelConfig,
    tcfg: TrainConfig,
    train_loader,
    val_loader,
    mesh=None,
    rng: Optional[jax.Array] = None,
    cache_dtype=jnp.float32,
    max_cache_bytes: Optional[int] = 8 << 30,
    backbone_params=None,
) -> List[Dict]:
    """The global depth sweep with the tower amortized to ONE pass total.

    Same contract as ``train_global_sweep_shared_tower`` (one summary dict
    per point with val SRCC/MSE and the trained head params), but epochs
    2..E never touch the backbone: a jitted ``lax.scan`` over the cached
    diff batches trains all heads, with the batch order reshuffled per
    epoch (``jax.random.permutation``).

    ``backbone_params``: converted pretrained tower params (``srsem
    convert`` / CLI ``--backbone-checkpoint``) — the whole premise of
    diff caching is "cache the frozen PRETRAINED tower's diffs", so the
    random init is only the zero-egress/test fallback.
    """
    mesh = mesh or create_mesh(tcfg.mesh.data_axis, tcfg.mesh.model_axis)
    rng = rng if rng is not None else jax.random.PRNGKey(tcfg.seed)
    kind = cfg.backbone.kind
    backbone = make_backbone(cfg.backbone)

    from srsem.data.loader import peek_first_batch

    (a0, b0), _ = peek_first_batch(train_loader)[0]
    a0 = jnp.asarray(a0[:1])
    if backbone_params is None:
        backbone_params = backbone.init(rng, a0)["params"]
    bparams = replicate(mesh, backbone_params)
    # Tap SHAPES only — eval_shape traces without running the tower (an
    # eager forward here is seconds of serial host work).
    _, taps0 = jax.eval_shape(backbone.apply, {"params": bparams}, a0)

    aggs, head_params = [], []
    for i, p in enumerate(points):
        names = p.tap_names(kind)
        agg = ConvHeadAggregator(len(names))
        diffs0 = [jnp.zeros(taps0[n].shape, jnp.float32) for n in names]
        aggs.append(agg)
        head_params.append(
            agg.init(jax.random.fold_in(rng, i), diffs0)["params"])

    tap_union = sorted({n for p in points for n in p.tap_names(kind)})
    cache = build_diff_cache(backbone, bparams, tap_union, train_loader,
                             mesh, cache_dtype, max_cache_bytes)
    val_cache = build_diff_cache(backbone, bparams, tap_union, val_loader,
                                 mesh, cache_dtype, max_cache_bytes)

    tx = optax.adam(tcfg.lr)
    opt_states = [tx.init(hp) for hp in head_params]
    head_params = replicate(mesh, head_params)
    opt_states = replicate(mesh, opt_states)

    def head_pred(i, point, diffs_b):
        names = point.tap_names(kind)
        sel = [diffs_b[nm].astype(jnp.float32) for nm in names]
        return lambda hp: aggs[i].apply({"params": hp}, sel)

    @jax.jit
    def epoch_fn(heads, opts, perm, diffs, y, mask):
        def body(carry, idx):
            heads, opts = carry
            diffs_b = {nm: jax.lax.dynamic_index_in_dim(
                v, idx, 0, keepdims=False) for nm, v in diffs.items()}
            y_b = jax.lax.dynamic_index_in_dim(y, idx, 0, keepdims=False)
            m_b = jax.lax.dynamic_index_in_dim(mask, idx, 0, keepdims=False)
            new_heads, new_opts, losses = [], [], []
            for i, p in enumerate(points):  # static unroll over grid points
                pred_fn = head_pred(i, p, diffs_b)
                y_i = p.label_transform(y_b) if p.label_transform else y_b

                def loss_fn(hp, pred_fn=pred_fn, y_i=y_i, m_b=m_b):
                    return masked_mse(pred_fn(hp), y_i, m_b)

                loss, grads = jax.value_and_grad(loss_fn)(heads[i])
                updates, new_opt = tx.update(grads, opts[i], heads[i])
                new_heads.append(optax.apply_updates(heads[i], updates))
                new_opts.append(new_opt)
                losses.append(loss)
            return (new_heads, new_opts), jnp.stack(losses)

        (heads, opts), losses = jax.lax.scan(body, (heads, opts), perm)
        return heads, opts, losses[-1]

    @jax.jit
    def predict_all(heads, diffs):
        # (P, n_batches, batch) predictions over a cache.
        def body(_, diffs_b):
            preds = [head_pred(i, p, diffs_b)(heads[i])
                     for i, p in enumerate(points)]
            return None, jnp.stack(preds)

        _, preds = jax.lax.scan(
            body, None, diffs, length=next(iter(diffs.values())).shape[0])
        return jnp.moveaxis(preds, 1, 0)

    last_losses = np.zeros(len(points), np.float32)
    for epoch in range(tcfg.epochs):
        rng, key = jax.random.split(rng)
        perm = jax.device_put(
            jax.random.permutation(key, cache.n_batches),
            NamedSharding(mesh, P()))
        head_params, opt_states, losses = epoch_fn(
            head_params, opt_states, perm, cache.diffs, cache.y, cache.mask)
        last_losses = np.asarray(jax.device_get(losses))

    preds = np.asarray(jax.device_get(
        predict_all(head_params, val_cache.diffs)))  # (P, nb, bs)
    y_val = np.asarray(jax.device_get(val_cache.y))
    keep = np.asarray(jax.device_get(val_cache.mask)) > 0

    results = []
    heads_host = jax.device_get(head_params)
    for i, p in enumerate(points):
        y_pred = preds[i][keep]
        y_true = y_val[keep]
        if p.label_transform:
            y_true = np.asarray(p.label_transform(jnp.asarray(y_true)))
        results.append({
            "name": p.name,
            "train_loss": float(last_losses[i]),
            "val_srcc": float(srcc(y_pred, y_true)),
            "val_mse": float(mse_metric(y_pred, y_true)),
            "head_params": heads_host[i],
        })
    return results


# --------------------------------------------------------------------------
# CLU decoder-only training on cached diffs
# --------------------------------------------------------------------------


def build_local_diff_cache(
    model,
    backbone,
    bparams,
    loader,
    mesh,
    cache_dtype=jnp.float32,
    max_bytes: Optional[int] = 8 << 30,
):
    """Frozen-tower pass over a CLU pair stream → (DiffCache-like dict).

    Returns ``{"diffs": [(nb, bs, h, w, c), ...] shallow→deep,
    "img_sq": (nb, bs, H, W, 1) or None, "y": (nb, bs, H, W),
    "mask": (nb, bs)}`` — everything the decoder needs, so epochs never
    touch the tower.  Applies to the decoder-only grid points (the
    reference CLU sweep's ``lora_rank=None`` rows,
    CLU_training_sweep_example.py:81-89); LoRA/full fine-tune change the
    tower per step and cannot cache.
    """
    # CluUnet.tap_names is assigned in setup(); rebuild the list here.
    from srsem.backbones.resnet import (
        CLIP_STAGE_TAPS,
        CLIP_STEM_TAP,
        IMAGENET_STAGE_TAPS,
        IMAGENET_STEM_TAP,
    )

    tap_list = ((CLIP_STEM_TAP,) + CLIP_STAGE_TAPS
                if model.backbone_kind == "resnet50_clip"
                else (IMAGENET_STEM_TAP,) + IMAGENET_STAGE_TAPS)

    @jax.jit
    def batch_feats(bp, a, b):
        _, taps_a = backbone.apply({"params": bp}, a)
        _, taps_b = backbone.apply({"params": bp}, b)
        diffs = [((taps_a[nm].astype(jnp.float32)
                   - taps_b[nm].astype(jnp.float32)) ** 2).astype(cache_dtype)
                 for nm in tap_list]
        img_sq = None
        if model.v2:
            img_sq = jnp.mean(
                (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                axis=-1, keepdims=True).astype(cache_dtype)
        return diffs, img_sq

    host_diffs: Optional[List[List[np.ndarray]]] = None
    host_img: List[np.ndarray] = []
    ys: List[np.ndarray] = []
    masks: List[np.ndarray] = []
    total = 0
    for batch in loader:
        # Loaders must yield the masked form ``(((a, b), y), mask)`` —
        # srsem.data.loader's contract.  (An isinstance-based fallback for
        # an unmasked form is impossible to discriminate structurally: an
        # unmasked ((a, b), y) batch is also a 2-tuple.)
        ((a, b), y), mask = batch
        mask = np.asarray(mask, np.float32)
        a_d, b_d = shard_batch(mesh, (np.asarray(a), np.asarray(b)))
        diffs, img_sq = jax.device_get(batch_feats(bparams, a_d, b_d))
        if host_diffs is None:
            host_diffs = [[] for _ in diffs]
        for lvl, d in enumerate(diffs):
            host_diffs[lvl].append(np.asarray(d))
            total += d.nbytes
        if img_sq is not None:
            host_img.append(np.asarray(img_sq))
            total += img_sq.nbytes
        ys.append(np.asarray(y, np.float32))
        masks.append(np.asarray(mask, np.float32))
        if max_bytes is not None and total > max_bytes:
            raise MemoryError(
                f"CLU diff cache exceeds {max_bytes} bytes; lower epochs' "
                "cost with the standard train_local loop instead")

    if host_diffs is None:
        raise ValueError("empty loader — nothing to cache")
    bs = ys[0].shape[0]
    if any(y.shape[0] != bs for y in ys):
        # Same guard as build_diff_cache: without it a ragged loader dies
        # in np.stack with an opaque shape error.
        raise ValueError("loader must yield fixed-size (padded) batches")
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return {
        "diffs": [jax.device_put(np.stack(lvl), sh) for lvl in host_diffs],
        "img_sq": (jax.device_put(np.stack(host_img), sh)
                   if host_img else None),
        "y": jax.device_put(np.stack(ys), sh),
        "mask": jax.device_put(np.stack(masks), sh),
    }


def train_local_cached_diffs(
    cfg,
    tcfg: TrainConfig,
    train_loader,
    val_loader,
    mesh=None,
    rng: Optional[jax.Array] = None,
    cache_dtype=jnp.float32,
    max_cache_bytes: Optional[int] = 8 << 30,
    backbone_params=None,
) -> Dict:
    """CLU decoder-only training with the tower amortized to ONE pass.

    ``backbone_params``: converted pretrained tower (``srsem convert`` /
    CLI ``--backbone-checkpoint``); random init is the zero-egress/test
    fallback only.

    Same loss/optimizer/BatchNorm semantics as ``train_local`` for the
    decoder-only grid points (frozen tower ⇒ cached diffs are exactly what
    ``CluUnet.__call__`` would recompute each step — reference:
    CLU_training_sweep_example.py:25-72); raises for LoRA/full fine-tune
    configs, whose tower changes per step.

    Returns {trainable, batch_stats, val_mse, train_loss}.
    """
    from srsem.core.config import LocalModelConfig  # noqa: F401 (doc type)
    from srsem.models.local_models import CluUnet, make_local_model
    from srsem.train.partition import partition_params, trainable_predicate

    if cfg.lora_rank is not None or getattr(cfg, "full_finetune", False):
        raise ValueError(
            "cached-diff CLU training applies to decoder-only configs; "
            "LoRA/full fine-tune change the tower per step")

    mesh = mesh or create_mesh(tcfg.mesh.data_axis, tcfg.mesh.model_axis)
    rng = rng if rng is not None else jax.random.PRNGKey(tcfg.seed)
    model = make_local_model(cfg)
    backbone = make_backbone(cfg.backbone)

    from srsem.data.loader import peek_first_batch

    (a0, b0), _ = peek_first_batch(train_loader)[0]
    a0 = jnp.asarray(a0[:1])
    b0 = jnp.asarray(b0[:1])
    variables = model.init(rng, a0, b0, train=False)
    if backbone_params is not None:
        variables = {**variables, "params": {**variables["params"],
                                             "backbone": backbone_params}}
    bparams = replicate(mesh, variables["params"]["backbone"])
    trainable, _ = partition_params(variables["params"],
                                    trainable_predicate())
    batch_stats = variables.get("batch_stats", {})

    cache = build_local_diff_cache(model, backbone, bparams, train_loader,
                                   mesh, cache_dtype, max_cache_bytes)
    val_cache = build_local_diff_cache(model, backbone, bparams, val_loader,
                                       mesh, cache_dtype, max_cache_bytes)

    tx = optax.adam(tcfg.lr)
    opt_state = tx.init(trainable)
    trainable = replicate(mesh, trainable)
    opt_state = replicate(mesh, opt_state)
    batch_stats = replicate(mesh, batch_stats)
    n_batches = int(cache["y"].shape[0])

    def decode(params, stats, diffs_b, img_b, train):
        variables = {"params": params, "batch_stats": stats}
        if train:
            pred, updates = model.apply(
                variables, diffs_b, img_b, True,
                method=CluUnet.decode_from_diffs, mutable=["batch_stats"])
            return pred, updates["batch_stats"]
        return model.apply(variables, diffs_b, img_b, False,
                           method=CluUnet.decode_from_diffs), stats

    @jax.jit
    def epoch_fn(trainable, opt_state, stats, perm, cache):
        def body(carry, idx):
            tr, opt, st = carry
            diffs_b = [jax.lax.dynamic_index_in_dim(d, idx, 0, False)
                       for d in cache["diffs"]]
            img_b = (jax.lax.dynamic_index_in_dim(cache["img_sq"], idx, 0,
                                                  False)
                     if cache["img_sq"] is not None else None)
            y_b = jax.lax.dynamic_index_in_dim(cache["y"], idx, 0, False)
            m_b = jax.lax.dynamic_index_in_dim(cache["mask"], idx, 0, False)

            def loss_fn(tr):
                pred, new_stats = decode(tr, st, diffs_b, img_b, True)
                return masked_mse(pred, y_b, m_b), new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(tr)
            updates, new_opt = tx.update(grads, opt, tr)
            return (optax.apply_updates(tr, updates), new_opt, new_stats), loss

        (trainable, opt_state, stats), losses = jax.lax.scan(
            body, (trainable, opt_state, stats), perm)
        return trainable, opt_state, stats, losses[-1]

    last_loss = float("nan")
    for epoch in range(tcfg.epochs):
        rng, key = jax.random.split(rng)
        perm = jax.device_put(jax.random.permutation(key, n_batches),
                              NamedSharding(mesh, P()))
        trainable, opt_state, batch_stats, loss = epoch_fn(
            trainable, opt_state, batch_stats, perm, cache)
        last_loss = float(jax.device_get(loss))

    @jax.jit
    def val_fn(trainable, stats, cache):
        def body(acc, xs):
            diffs_b, img_b, y_b, m_b = xs
            pred, _ = decode(trainable, stats, diffs_b, img_b, False)
            se = jnp.sum(((pred - y_b) ** 2)
                         * m_b.reshape((-1,) + (1,) * (pred.ndim - 1)))
            return (acc[0] + se, acc[1] + jnp.sum(m_b) * pred[0].size), None

        xs = (cache["diffs"], cache["img_sq"], cache["y"], cache["mask"])
        (se, n), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)), xs)
        return se / (n + 1e-9)

    val_mse = float(jax.device_get(val_fn(trainable, batch_stats, val_cache)))
    return {
        "trainable": jax.device_get(trainable),
        "batch_stats": jax.device_get(batch_stats),
        "train_loss": last_loss,
        "val_mse": val_mse,
    }

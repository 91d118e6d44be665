"""Sufficient-statistic sweep training: exact conv-head training at
~15 KB/pair.

The diff-cache sweep (srsem/train/diffcache.py) amortizes the frozen
tower to one pass but stores the full (h, w, C) squared-diff pyramids —
~6 MB/pair at 224px, so the 10k-pair SR dataset (reference: README.md:
47-53) outgrows HBM and callers must fall back.  This module stores the
head's *sufficient statistic* instead: the ConvHeadAggregator is a 1x1
conv followed by a spatial mean (reference:
models/global_eval_models.py:379-395), so per layer

    mean_hw(diff @ w + b) == dot(mean_hw(diff), w) + b

exactly — scores AND head gradients computed from the per-layer spatial
mean ``mean_hw(diff)`` (one C-vector per tap) equal those computed from
the full diff tensor, up to FP reduction order.  The depth-3 tap union on
either ResNet-50 backbone is 256+512+1024+2048 = 3,840 floats ≈ 15 KB per
pair in float32 — the full 10k-pair dataset caches in ~150 MB, and every
epoch of every sweep point is a lax.scan over device-resident vectors.

Scope: conv-to-scalar heads (stages_cnn / clsbckb / wperlay — the
reference's actual sweep grid, CLIPLPIPS_REG_training_sweep_example.py:
107-114).  The CLU decoder is nonlinear in its diffs and has no
sufficient statistic; it keeps the diff cache.
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
from srsem.models.global_models import (
    ConvHeadAggregator,
    conv_head_from_stats,
    stage_taps_for,
)
from srsem.train.metrics import mse as mse_metric, srcc
from srsem.train.multisweep import SweepPoint
from srsem.train.steps import masked_mse


@dataclasses.dataclass
class StatCache:
    """Device-resident per-layer diff statistics for a pair stream.

    ``stats[name]``: (n_batches, batch, C) spatial-mean squared diffs,
    batch axis sharded over ``data``; ``y``/``mask``: (n_batches, batch).
    """

    stats: Dict[str, jax.Array]
    y: jax.Array
    mask: jax.Array

    @property
    def n_batches(self) -> int:
        return int(self.y.shape[0])

    @property
    def batch(self) -> int:
        return int(self.y.shape[1])


def build_stat_cache(
    backbone,
    bparams,
    tap_names: Sequence[str],
    loader,
    mesh,
) -> StatCache:
    """One frozen-tower pass over ``loader`` → per-layer stat cache.

    The spatial mean fuses into the tower epilogue on device, so only the
    (batch, C) vectors ever come back to host.  Two per-image tower
    applies (a GT+SR concat would force a GSPMD all-to-all reshard on
    multi-device meshes — CLAUDE.md).
    """
    tap_names = list(tap_names)

    @jax.jit
    def batch_stats(bp, a, b):
        _, taps_a = backbone.apply({"params": bp}, a)
        _, taps_b = backbone.apply({"params": bp}, b)
        return {
            nm: jnp.mean(
                (taps_a[nm].astype(jnp.float32)
                 - taps_b[nm].astype(jnp.float32)) ** 2,
                axis=(1, 2))
            for nm in tap_names
        }

    host: Dict[str, List[np.ndarray]] = {nm: [] for nm in tap_names}
    ys: List[np.ndarray] = []
    masks: List[np.ndarray] = []
    for batch in loader:
        # Masked-form batches only: (((a, b), y), mask) — the
        # srsem.data.loader contract (see srsem/train/diffcache.py).
        ((a, b), y), mask = batch
        a_d, b_d = shard_batch(mesh, (np.asarray(a), np.asarray(b)))
        s = jax.device_get(batch_stats(bparams, a_d, b_d))
        for nm in tap_names:
            host[nm].append(np.asarray(s[nm]))
        ys.append(np.asarray(y, np.float32))
        masks.append(np.asarray(mask, np.float32))

    if not ys:
        raise ValueError("empty loader — nothing to cache")
    bs = ys[0].shape[0]
    if any(y.shape[0] != bs for y in ys):
        raise ValueError("loader must yield fixed-size (padded) batches")

    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return StatCache(
        stats={nm: jax.device_put(np.stack(host[nm]), sh)
               for nm in tap_names},
        y=jax.device_put(np.stack(ys), sh),
        mask=jax.device_put(np.stack(masks), sh),
    )


def train_global_sweep_cached_stats(
    points: Sequence[SweepPoint],
    cfg: GlobalModelConfig,
    tcfg: TrainConfig,
    train_loader,
    val_loader,
    mesh=None,
    rng: Optional[jax.Array] = None,
) -> List[Dict]:
    """The global sweep trained entirely from per-layer diff statistics.

    Same contract as ``train_global_sweep_cached_diffs`` (one summary dict
    per point with val SRCC/MSE and trained head params), same head math
    (``conv_head_from_stats`` is the aggregator with the spatial mean
    commuted through the 1x1 conv), ~400x smaller cache — the whole
    reference sweep (3 depths x 30 epochs, CLIPLPIPS_REG_training_sweep_
    example.py:107-114) runs on-device after one tower pass.
    """
    mesh = mesh or create_mesh(tcfg.mesh.data_axis, tcfg.mesh.model_axis)
    rng = rng if rng is not None else jax.random.PRNGKey(tcfg.seed)
    kind = cfg.backbone.kind
    backbone = make_backbone(cfg.backbone)

    (a0, _b0), _ = next(iter(train_loader))[0]
    a0 = jnp.asarray(a0[:1])
    bparams = replicate(mesh, backbone.init(rng, a0)["params"])
    _, taps0 = backbone.apply({"params": jax.device_get(bparams)}, a0)

    head_params = []
    for i, p in enumerate(points):
        names = p.tap_names(kind)
        agg = ConvHeadAggregator(len(names))
        diffs0 = [jnp.zeros_like(taps0[n], jnp.float32) for n in names]
        head_params.append(
            agg.init(jax.random.fold_in(rng, i), diffs0)["params"])

    tap_union = sorted({n for p in points for n in p.tap_names(kind)})
    cache = build_stat_cache(backbone, bparams, tap_union, train_loader, mesh)
    val_cache = build_stat_cache(backbone, bparams, tap_union, val_loader,
                                 mesh)

    tx = optax.adam(tcfg.lr)
    opt_states = [tx.init(hp) for hp in head_params]
    head_params = replicate(mesh, head_params)
    opt_states = replicate(mesh, opt_states)

    def point_pred(point, stats_b):
        names = point.tap_names(kind)
        sel = [stats_b[nm] for nm in names]
        return lambda hp: conv_head_from_stats(hp, sel)

    @jax.jit
    def epoch_fn(heads, opts, perm, stats, y, mask):
        def body(carry, idx):
            heads, opts = carry
            stats_b = {nm: jax.lax.dynamic_index_in_dim(
                v, idx, 0, keepdims=False) for nm, v in stats.items()}
            y_b = jax.lax.dynamic_index_in_dim(y, idx, 0, keepdims=False)
            m_b = jax.lax.dynamic_index_in_dim(mask, idx, 0, keepdims=False)
            new_heads, new_opts, losses = [], [], []
            for i, p in enumerate(points):  # static unroll over grid points
                pred_fn = point_pred(p, stats_b)
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
    def train_all_epochs(heads, opts, perms, stats, y, mask):
        """All E epochs in ONE jitted scan-of-scans: the per-epoch Python
        round trip costs more than an epoch does at stat-cache speed."""
        def epoch_body(carry, perm):
            heads, opts = carry
            heads, opts, losses = epoch_fn(heads, opts, perm, stats, y, mask)
            return (heads, opts), losses

        (heads, opts), losses = jax.lax.scan(
            epoch_body, (heads, opts), perms)
        return heads, opts, losses[-1]

    @jax.jit
    def predict_all(heads, stats):
        def body(_, stats_b):
            preds = [point_pred(p, stats_b)(heads[i])
                     for i, p in enumerate(points)]
            return None, jnp.stack(preds)

        _, preds = jax.lax.scan(
            body, None, stats, length=next(iter(stats.values())).shape[0])
        return jnp.moveaxis(preds, 1, 0)  # (P, n_batches, batch)

    keys = jax.random.split(rng, tcfg.epochs + 1)
    perms = jnp.stack([jax.random.permutation(k, cache.n_batches)
                       for k in keys[1:]])
    perms = jax.device_put(perms, NamedSharding(mesh, P()))
    head_params, opt_states, last_losses = train_all_epochs(
        head_params, opt_states, perms, cache.stats, cache.y, cache.mask)
    last_losses = np.asarray(jax.device_get(last_losses))

    preds = np.asarray(jax.device_get(
        predict_all(head_params, val_cache.stats)))
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

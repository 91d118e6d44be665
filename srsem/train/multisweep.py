"""Shared-tower sweep training: N sweep points, ONE frozen-tower pass.

The reference parallelizes its hyperparameter sweeps by forking one
process per GPU and letting each wandb agent train one grid point
(reference: CLU_training_sweep_example.py:184-197).  On TPU the natural
replacement is not N processes — it is ONE jitted step that runs the
frozen backbone once per batch and trains ALL points' heads on the shared
tap pyramid.  For the global depth sweep (reference:
CLIPLPIPS_REG_training_sweep_example.py:107-114 — depth ∈ {1,2,3}, same
data, same split) the tower is ~99% of the step cost, so the 3-point
sweep trains for about the price of one run.

Applicability: points must share the input batches.  The global depth
grid does by construction; label-space dimensions (e.g. the CLU
``threshold`` binarization) are supported through per-point
``label_transform`` callables applied inside the jitted step.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from srsem.backbones.resnet import make_backbone
from srsem.core.config import GlobalModelConfig, TrainConfig
from srsem.core.meshes import create_mesh, replicate, shard_batch
from srsem.models.global_models import (
    ConvHeadAggregator,
    squared_diffs,
    stage_taps_for,
    wperlay_taps,
)
from srsem.train.metrics import mse as mse_metric, srcc
from srsem.train.steps import masked_mse


@dataclasses.dataclass
class SweepPoint:
    """One grid point: a head over a tap subset + optional label map."""

    name: str
    depth: int
    head: str = "stages_cnn"
    label_transform: Optional[Callable] = None  # jnp labels -> jnp labels

    def tap_names(self, backbone_kind: str):
        if self.head == "stages_cnn":
            return stage_taps_for(backbone_kind, self.depth)
        if self.head == "wperlay_cnn":
            return wperlay_taps(self.depth)
        raise ValueError(
            f"shared-tower sweep supports conv heads, got {self.head!r}")


def depth_grid(depths: Sequence[int] = (1, 2, 3),
               head: str = "stages_cnn") -> List[SweepPoint]:
    """The reference's global sweep grid
    (CLIPLPIPS_REG_training_sweep_example.py:107-114)."""
    return [SweepPoint(name=f"depth-{d}", depth=d, head=head) for d in depths]


def train_global_sweep_shared_tower(
    points: Sequence[SweepPoint],
    cfg: GlobalModelConfig,
    tcfg: TrainConfig,
    train_loader,
    val_loader,
    mesh=None,
    rng: Optional[jax.Array] = None,
    backbone_params=None,
) -> List[Dict]:
    """Train every point's head simultaneously over one tower stream.

    Returns one summary dict per point: {name, val_srcc, val_mse,
    train_loss, head_params}.

    ``backbone_params``: converted pretrained tower params (CLI
    ``--backbone-checkpoint``); random init is the zero-egress fallback.
    """
    mesh = mesh or create_mesh(tcfg.mesh.data_axis, tcfg.mesh.model_axis)
    rng = rng if rng is not None else jax.random.PRNGKey(tcfg.seed)
    kind = cfg.backbone.kind
    backbone = make_backbone(cfg.backbone)

    from srsem.data.loader import peek_first_batch

    (a0, b0), y0 = peek_first_batch(train_loader)[0]
    a0 = jnp.asarray(a0[:1])
    bparams = (backbone_params if backbone_params is not None
               else backbone.init(rng, a0)["params"])

    # Per-point heads initialized on tap SHAPES — eval_shape traces
    # without running the tower (an eager forward here is seconds of
    # serial host work; same fix as diffcache/statcache).
    _, taps0 = jax.eval_shape(backbone.apply, {"params": bparams}, a0)
    aggs, head_params = [], []
    for i, p in enumerate(points):
        names = p.tap_names(kind)
        agg = ConvHeadAggregator(len(names))
        diffs0 = [jnp.zeros(taps0[n].shape, jnp.float32) for n in names]
        hp = agg.init(jax.random.fold_in(rng, i), diffs0)["params"]
        aggs.append(agg)
        head_params.append(hp)

    tx = optax.adam(tcfg.lr)
    opt_states = [tx.init(hp) for hp in head_params]

    tap_union = sorted({n for p in points for n in p.tap_names(kind)})

    def tower_taps(bp, a, b):
        # Two per-image applies, never a 2N concat: concatenating two
        # data-sharded N-batches makes GSPMD reshard the 2N result every
        # step (a cross-device collective riding ICI on real multi-chip
        # meshes) — every sibling tower path (CLU sweep below, diffcache,
        # statcache, GroupedPairScorer) already splits for this reason.
        # Identical numerics: the tower's BN is frozen.
        def taps_of(x):
            _, taps = backbone.apply({"params": bp}, x)
            return {k: jax.lax.stop_gradient(v) for k, v in taps.items()
                    if k in tap_union}

        return taps_of(a), taps_of(b)

    @jax.jit
    def multi_train_step(heads, opts, bp, a, b, y, mask):
        taps_a, taps_b = tower_taps(bp, a, b)

        new_heads, new_opts, losses = [], [], []
        for i, p in enumerate(points):  # static unroll over grid points
            names = p.tap_names(kind)
            diffs = squared_diffs(taps_a, taps_b, names)
            y_i = p.label_transform(y) if p.label_transform else y

            def loss_fn(hp, diffs=diffs, i=i, y_i=y_i):
                pred = aggs[i].apply({"params": hp}, diffs)
                return masked_mse(pred, y_i, mask)

            loss, grads = jax.value_and_grad(loss_fn)(heads[i])
            updates, new_opt = tx.update(grads, opts[i], heads[i])
            new_heads.append(optax.apply_updates(heads[i], updates))
            new_opts.append(new_opt)
            losses.append(loss)
        return new_heads, new_opts, jnp.stack(losses)

    @jax.jit
    def multi_eval_step(heads, bp, a, b):
        taps_a, taps_b = tower_taps(bp, a, b)
        preds = []
        for i, p in enumerate(points):
            diffs = squared_diffs(taps_a, taps_b, p.tap_names(kind))
            preds.append(aggs[i].apply({"params": heads[i]}, diffs))
        return jnp.stack(preds)  # (P, N)

    bparams = replicate(mesh, bparams)
    head_params = replicate(mesh, head_params)
    opt_states = replicate(mesh, opt_states)

    last_losses = np.zeros(len(points))
    losses = None
    for epoch in range(tcfg.epochs):
        for batch in train_loader:
            # Masked-form batches only: (((a, b), y), mask) — the
            # srsem.data.loader contract (see srsem/train/diffcache.py).
            ((a, b), y), mask = batch
            a, b, y, mask = shard_batch(mesh, (np.asarray(a), np.asarray(b),
                                               np.asarray(y, np.float32),
                                               np.asarray(mask, np.float32)))
            head_params, opt_states, losses = multi_train_step(
                head_params, opt_states, bparams, a, b, y, mask)
    if losses is not None:  # empty loader / epochs=0 keeps the zeros
        last_losses = np.asarray(jax.device_get(losses))

    # Validation: predictions per point over the val stream (padded rows
    # dropped via the loader's mask).
    preds_all: List[List[np.ndarray]] = [[] for _ in points]
    targets: List[np.ndarray] = []
    for batch in val_loader:
        ((a, b), y), mask = batch
        keep = np.asarray(mask) > 0
        a, b = shard_batch(mesh, (np.asarray(a), np.asarray(b)))
        preds = np.asarray(jax.device_get(
            multi_eval_step(head_params, bparams, a, b)))
        for i in range(len(points)):
            preds_all[i].append(preds[i][keep])
        targets.append(np.asarray(y, np.float32)[keep])

    y_true = np.concatenate(targets)
    results = []
    heads_host = jax.device_get(head_params)
    for i, p in enumerate(points):
        y_pred = np.concatenate(preds_all[i])[: len(y_true)]
        y_ref = p.label_transform(jnp.asarray(y_true)) if p.label_transform else y_true
        y_ref = np.asarray(y_ref)
        results.append({
            "name": p.name,
            "train_loss": float(last_losses[i]),
            "val_srcc": float(srcc(y_pred, y_ref)),
            "val_mse": float(mse_metric(y_pred, y_ref)),
            "head_params": heads_host[i],
        })
    return results


def train_local_sweep_shared_tower(
    thresholds: Sequence[Optional[float]],
    cfg,
    tcfg: TrainConfig,
    train_loader,
    val_loader,
    mesh=None,
    rng: Optional[jax.Array] = None,
    backbone_params=None,
) -> List[Dict]:
    """CLU threshold sweep: N binarization points, ONE tower+decode stream.

    ``backbone_params``: converted pretrained tower params (CLI
    ``--backbone-checkpoint``); random init is the zero-egress fallback.

    The reference's 144-point CLU grid (CLU_training_sweep_example.py:
    78-89) varies ``threshold ∈ {None, 0.4, 0.9}`` — a LABEL-space axis:
    the input images, the frozen tower, and therefore the squared-diff
    pyramids are identical across the three points.  This trainer runs the
    tower once per batch and trains one decoder per threshold on the
    shared taps, with per-point labels prepared binarize-THEN-resize by
    the dataset (``KoniqPairsMapsDataset(thresholds=...)`` — order matters,
    reference datasets/local_eval_torch_ds.py:35-40).  Host decode, which
    dominates real epochs, is also paid once instead of N times.

    Every decoder starts from the SAME init (what ``train_local`` would
    draw from ``rng`` — the dataset never affects init), so each point's
    trajectory equals its standalone run (tests/test_multisweep.py).
    Requires a frozen tower (``lora_rank`` must be None — LoRA/full points
    train the tower and cannot share it).

    ``train_loader``/``val_loader`` must yield multi-threshold labels of
    shape (N, T, H, W) in threshold order.

    Returns one summary per threshold: {name, train_loss, val_mse,
    trainable, batch_stats}.
    """
    from srsem.backbones.resnet import (
        CLIP_STAGE_TAPS,
        CLIP_STEM_TAP,
        IMAGENET_STAGE_TAPS,
        IMAGENET_STEM_TAP,
        make_backbone,
    )
    from srsem.models.local_models import CluUnet, make_local_model
    from srsem.train.partition import merge_params, partition_params, \
        trainable_predicate

    if cfg.lora_rank is not None:
        raise ValueError("shared-tower CLU sweep needs a frozen tower "
                         "(lora_rank=None); LoRA/full points train the "
                         "tower and cannot share it")
    mesh = mesh or create_mesh(tcfg.mesh.data_axis, tcfg.mesh.model_axis)
    rng = rng if rng is not None else jax.random.PRNGKey(tcfg.seed)
    n_pts = len(thresholds)

    model = make_local_model(cfg, split_tower=False,
                             width_mult=getattr(cfg, "width_mult", 1.0))
    size = cfg.backbone.image_size
    z = jnp.zeros((1, size, size, 3))
    variables = model.init(rng, z, z, train=False)
    if backbone_params is not None:
        variables = {**variables, "params": {**variables["params"],
                                             "backbone": backbone_params}}
    trainable0, frozen = partition_params(variables["params"],
                                          trainable_predicate())
    stats0 = variables.get("batch_stats", {})

    backbone = make_backbone(cfg.backbone)
    if cfg.backbone.kind == "resnet50_clip":
        tap_names = (CLIP_STEM_TAP,) + CLIP_STAGE_TAPS
    else:
        tap_names = (IMAGENET_STEM_TAP,) + IMAGENET_STAGE_TAPS

    tx = optax.adam(tcfg.lr)
    trainables = [jax.tree.map(jnp.copy, trainable0) for _ in range(n_pts)]
    stats_list = [jax.tree.map(jnp.copy, stats0) for _ in range(n_pts)]
    opt_states = [tx.init(tr) for tr in trainables]

    def tower_taps(fr, a, b):
        # Two per-image applies, never a 2N concat: the concat of two
        # data-sharded batches forces a GSPMD all-to-all on multi-device
        # meshes (and aborts XLA:CPU's AllToAllThunk on the virtual test
        # mesh — see CluUnet.split_tower).  Identical numerics: the tower's
        # BN is frozen, so per-image results don't depend on batch
        # composition.
        def taps_of(x):
            _, taps = backbone.apply({"params": fr["backbone"]}, x)
            return {k: jax.lax.stop_gradient(v) for k, v in taps.items()
                    if k in tap_names}

        return taps_of(a), taps_of(b)

    @jax.jit
    def multi_train_step(trains, opts, stats, fr, a, b, y_multi, mask):
        taps_a, taps_b = tower_taps(fr, a, b)
        new_tr, new_op, new_st, losses = [], [], [], []
        for i in range(n_pts):  # static unroll over threshold points
            y_i = y_multi[:, i]

            def loss_fn(tr, i=i, y_i=y_i):
                vs = {"params": merge_params(tr, fr),
                      "batch_stats": stats[i]}
                pred, upd = model.apply(
                    vs, taps_a, taps_b, a, b, True,
                    method=CluUnet.decode_from_taps,
                    mutable=["batch_stats"])
                return masked_mse(pred, y_i, mask), upd["batch_stats"]

            (loss, st), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trains[i])
            updates, op = tx.update(grads, opts[i], trains[i])
            new_tr.append(optax.apply_updates(trains[i], updates))
            new_op.append(op)
            new_st.append(st)
            losses.append(loss)
        return new_tr, new_op, new_st, jnp.stack(losses)

    @jax.jit
    def multi_eval_step(trains, stats, fr, a, b):
        taps_a, taps_b = tower_taps(fr, a, b)
        preds = []
        for i in range(n_pts):
            vs = {"params": merge_params(trains[i], fr),
                  "batch_stats": stats[i]}
            preds.append(model.apply(vs, taps_a, taps_b, a, b, False,
                                     method=CluUnet.decode_from_taps))
        return jnp.stack(preds)  # (P, N, H, W)

    frozen = replicate(mesh, frozen)
    trainables = replicate(mesh, trainables)
    stats_list = replicate(mesh, stats_list)
    opt_states = replicate(mesh, opt_states)

    last_losses = np.zeros(n_pts)
    losses = None
    for _epoch in range(tcfg.epochs):
        for ((a, b), y), mask in train_loader:
            a, b, y, mask = shard_batch(
                mesh, (np.asarray(a), np.asarray(b),
                       np.asarray(y, np.float32),
                       np.asarray(mask, np.float32)))
            trainables, opt_states, stats_list, losses = multi_train_step(
                trainables, opt_states, stats_list, frozen, a, b, y, mask)
    if losses is not None:  # empty loader / epochs=0 keeps the zeros
        last_losses = np.asarray(jax.device_get(losses))

    sq_err = np.zeros(n_pts)
    n_valid = 0
    for ((a, b), y), mask in val_loader:
        keep = np.asarray(mask) > 0
        a_d, b_d = shard_batch(mesh, (np.asarray(a), np.asarray(b)))
        preds = np.asarray(jax.device_get(
            multi_eval_step(trainables, stats_list, frozen, a_d, b_d)))
        y_np = np.asarray(y, np.float32)
        for i in range(n_pts):
            sq_err[i] += float(((preds[i][keep] - y_np[keep][:, i]) ** 2)
                               .sum())
        n_valid += int(keep.sum()) * y_np.shape[-2] * y_np.shape[-1]

    tr_host = jax.device_get(trainables)
    st_host = jax.device_get(stats_list)
    return [{
        "name": f"threshold-{t}",
        "train_loss": float(last_losses[i]),
        "val_mse": sq_err[i] / max(n_valid, 1),
        "trainable": tr_host[i],
        "batch_stats": st_host[i],
    } for i, t in enumerate(thresholds)]

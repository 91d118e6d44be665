"""End-to-end training loops for the global regressor and the CLU model.

Mirrors ``train_contrastive`` (reference:
CLIPLPIPS_REG_training_sweep_example.py:48-100, CLU_training_sweep_example.
py:25-72): Adam, MSE, per-epoch eval, checkpoint every epoch — but as one
jitted SPMD program over the mesh, with SRCC/MSE evaluators built in and
resumable checkpoints.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from srsem.core.config import GlobalModelConfig, LocalModelConfig, TrainConfig
from srsem.core.meshes import create_mesh, replicate, shard_batch
from srsem.models.global_models import make_global_model
from srsem.models.local_models import make_local_model
from srsem.train import checkpoint as ckpt
from srsem.train.logging import default_writer
from srsem.train.metrics import mse, srcc
from srsem.train.partition import partition_params, trainable_predicate
from srsem.train.steps import build_step_fns


class TrainResult(dict):
    """dict with attribute access for the summary fields."""

    __getattr__ = dict.__getitem__


def _init_variables(model, rng, sample_batch, is_map_model):
    (a, b), _ = sample_batch
    a, b = jnp.asarray(a[:1]), jnp.asarray(b[:1])
    if is_map_model:
        return model.init(rng, a, b, train=False)
    return model.init(rng, a, b)


def run_training(
    model,
    is_map_model: bool,
    train_loader,
    val_loader,
    cfg: TrainConfig,
    predicate,
    writer=None,
    mesh=None,
    rng: Optional[jax.Array] = None,
    variables=None,
    backbone_params=None,
) -> TrainResult:
    """Generic masked-MSE training over the mesh; returns final metrics and
    the trained state.

    ``variables``: optional warm-start tree ({"params": ..., optionally
    "batch_stats": ...}) — e.g. a converted torch tower (srsem convert) or
    a prior run's state; skips the random init.

    ``backbone_params``: replace ``params["backbone"]`` with a converted
    pretrained tower (CLI ``--backbone-checkpoint``) while the rest of the
    tree keeps its (possibly random) init — the common "train heads on the
    real tower" case without hand-assembling ``variables``."""
    mesh = mesh or create_mesh(cfg.mesh.data_axis, cfg.mesh.model_axis)
    ndata = mesh.shape.get("data", 1)
    if cfg.batch_size % ndata:
        # shard_batch would fail mid-epoch with an opaque XLA divisibility
        # error; fail at setup with guidance instead (same policy as
        # ScoreService's group_batch check).  The loader pads partial
        # batches to batch_size, so divisible batch_size ⇒ every device
        # call shards evenly.
        raise ValueError(
            f"batch_size={cfg.batch_size} does not shard evenly over the "
            f"data={ndata} mesh axis; round it up to a multiple of {ndata}")
    own_writer = writer is None
    writer = writer or default_writer()
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)

    if variables is None:
        # peek_first_batch probes shapes WITHOUT consuming the seed+0
        # shuffle epoch (Loader.__iter__ seeds each shuffle with
        # seed + epoch; a consuming peek would cold-start training on the
        # seed+1 ordering and diverge from a warm-start run).
        from srsem.data.loader import peek_first_batch

        first_batch, _ = peek_first_batch(train_loader)
        variables = _init_variables(model, rng, first_batch, is_map_model)
    if backbone_params is not None:
        variables = {**variables, "params": {**variables["params"],
                                             "backbone": backbone_params}}
    batch_stats = variables.get("batch_stats", {})
    trainable, frozen = partition_params(variables["params"], predicate)

    tx = optax.adam(cfg.lr)
    opt_state = tx.init(trainable)
    steps = build_step_fns(model, tx, mesh, is_map_model=is_map_model)

    trainable = replicate(mesh, trainable)
    frozen = replicate(mesh, frozen)
    batch_stats = replicate(mesh, batch_stats)
    opt_state = replicate(mesh, opt_state)

    step = 0
    val_metrics = {}
    for epoch in range(cfg.epochs):
        t0 = time.time()
        epoch_loss, n_batches = jnp.zeros(()), 0
        for ((a, b), y), mask in train_loader:
            images = shard_batch(mesh, (jnp.asarray(a), jnp.asarray(b)))
            y_d, mask_d = shard_batch(mesh, (jnp.asarray(y), jnp.asarray(mask)))
            trainable, opt_state, batch_stats, loss = steps.train_step(
                trainable, opt_state, frozen, batch_stats, images, y_d, mask_d)
            step += 1
            n_batches += 1
            # Accumulate on DEVICE: float(loss) every step would block the
            # host until the step finishes, killing async dispatch and the
            # loader's prefetch overlap; the host syncs only at log_every.
            epoch_loss = epoch_loss + loss
            if step % cfg.log_every == 0:
                writer.write(step, {"train_loss_batch": float(loss)})

        val_metrics = evaluate(steps, trainable, frozen, batch_stats,
                               val_loader, mesh, is_map_model)
        writer.write(step, {
            "epoch": epoch,
            "train_loss_epoch": float(epoch_loss) / max(1, n_batches),
            "epoch_seconds": time.time() - t0,
            **{f"val_{k}": v for k, v in val_metrics.items()},
        })
        if cfg.checkpoint_dir:
            # Trainable subset only — the reference's save_model semantic
            # (reference: models/global_eval_models.py:419-429).
            ckpt.save_checkpoint(cfg.checkpoint_dir, step, {
                "trainable": trainable,
                "opt_state": opt_state,
                "batch_stats": batch_stats,
            }, keep_last=cfg.checkpoint_keep_last)

    if own_writer:
        # A caller-provided writer may serve several runs (sweeps); only
        # the writer this function created is its to close.
        writer.close()
    return TrainResult(
        trainable=trainable, frozen=frozen, batch_stats=batch_stats,
        opt_state=opt_state, step=step, val_metrics=val_metrics, mesh=mesh)


def evaluate(steps, trainable, frozen, batch_stats, loader, mesh, is_map_model):
    """Gather predictions and compute MSE (+SRCC for scalar scores)."""
    preds, targets, losses = [], [], []
    for ((a, b), y), mask in loader:
        images = shard_batch(mesh, (jnp.asarray(a), jnp.asarray(b)))
        y_d, mask_d = shard_batch(mesh, (jnp.asarray(y), jnp.asarray(mask)))
        pred, loss = steps.eval_step(
            trainable, frozen, batch_stats, images, y_d, mask_d)
        pred = np.asarray(jax.device_get(pred))
        valid = np.asarray(mask) > 0
        preds.append(pred[valid])
        targets.append(np.asarray(y)[valid])
        losses.append((float(loss), float(valid.sum())))
    preds_np = np.concatenate(preds) if preds else np.zeros((0,))
    targets_np = np.concatenate(targets) if targets else np.zeros((0,))
    # Each batch loss is already mask-normalized, so weight by the batch's
    # VALID-row count: an equal-weight mean would let a final padded batch
    # with one valid row count as much as a full one, making "loss"
    # disagree with "mse" on the same data.
    n_valid = sum(w for _, w in losses)
    out = {"loss": (float(sum(l * w for l, w in losses) / n_valid)
                    if n_valid else float("nan")),
           "mse": mse(preds_np, targets_np) if len(preds_np) else float("nan")}
    if not is_map_model and len(preds_np) > 1:
        out["srcc"] = srcc(preds_np, targets_np)
    return out


def train_global(cfg: GlobalModelConfig, tcfg: TrainConfig,
                 train_loader, val_loader, **kw) -> TrainResult:
    """Train a global pair-scoring regressor (reference: sweep_train,
    CLIPLPIPS_REG_training_sweep_example.py:118-206)."""
    model = make_global_model(cfg)
    predicate = trainable_predicate(enc_ft=cfg.enc_ft)
    return run_training(model, False, train_loader, val_loader, tcfg,
                        predicate, **kw)


def train_local(cfg: LocalModelConfig, tcfg: TrainConfig,
                train_loader, val_loader, **kw) -> TrainResult:
    """Train a CLU map model (reference: sweep_train,
    CLU_training_sweep_example.py:78-180)."""
    mesh = kw.get("mesh") or create_mesh(tcfg.mesh.data_axis,
                                         tcfg.mesh.model_axis)
    kw["mesh"] = mesh
    # Two tower applies per step on multi-device meshes — the data-sharded
    # GT+SR concat forces a GSPMD all-to-all (see CluUnet.split_tower);
    # identical numerics (FrozenBatchNorm tower).
    model = make_local_model(cfg, split_tower=mesh.shape["data"] > 1)
    predicate = trainable_predicate(
        lora=isinstance(cfg.lora_rank, int),
        full_finetune=cfg.full_finetune)
    return run_training(model, True, train_loader, val_loader, tcfg,
                        predicate, **kw)

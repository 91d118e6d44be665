"""Grid-sweep runner — config-product replacement for wandb sweeps.

The reference launches ``wandb.agent`` processes per GPU with
``CUDA_VISIBLE_DEVICES`` (reference: CLU_training_sweep_example.py:181-197)
to grid over hyperparameters.  On TPU a single process owns the slice, so
sweeps run sequentially over the cartesian product (each point already uses
every chip via the data mesh); results land in a JSONL summary.

Reference grids reproduced in ``GLOBAL_SWEEP`` / ``CLU_SWEEP``:
* global: depth ∈ {1,2,3}, lr=1e-4
  (reference: CLIPLPIPS_REG_training_sweep_example.py:107-114);
* CLU: min_caps ∈ {2,4,8,16}, only_hq ∈ {T,F}, lora_rank ∈ {None,32,"full"},
  threshold ∈ {None,0.4,0.9}, backbone ∈ {clip, imagenet}
  (reference: CLU_training_sweep_example.py:78-89 — including fixing the
  reference's typo of "clip, imgnet" as a single string at :87).
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable, Dict, Iterable, Mapping, Optional, Sequence

GLOBAL_SWEEP: Dict[str, Sequence[Any]] = {"depth": [1, 2, 3]}

CLU_SWEEP: Dict[str, Sequence[Any]] = {
    "imgamincaps": [2, 4, 8, 16],
    "only_hq": [True, False],
    "lora_rank": [None, 32, "full"],
    "threshold": [None, 0.4, 0.9],
    "backbone_kind": ["resnet50_clip", "resnet50"],
}


def run_name(point: Mapping[str, Any], prefix: str = "run") -> str:
    """Run naming from config values, like the reference's wandb run names
    (reference: CLIPLPIPS_REG_training_sweep_example.py:120-127)."""
    parts = [f"{k}-{v}" for k, v in sorted(point.items())]
    return "_".join([prefix] + parts)


def grid_points(axes: Mapping[str, Sequence[Any]]) -> Iterable[Dict[str, Any]]:
    import itertools

    keys = list(axes)
    for values in itertools.product(*(axes[k] for k in keys)):
        yield dict(zip(keys, values))


def make_global_train_fn(csv_path: str, root: str, base_tcfg=None,
                         backbone: str = "resnet50_clip",
                         backbone_params=None):
    """Grid point {depth} → one global-regressor training run
    (reference: CLIPLPIPS_REG_training_sweep_example.py:118-199).

    ``backbone_params``: converted pretrained tower params shared by every
    grid point (CLI ``--backbone-checkpoint``)."""

    def train_fn(point):
        from srsem.core.config import (BackboneConfig, GlobalModelConfig,
                                       TrainConfig)
        from srsem.data.datasets import Subset, UserStudyScores, seeded_split
        from srsem.data.loader import Loader
        from srsem.data.preprocess import Preprocess
        from srsem.train.loop import train_global

        tcfg = base_tcfg or TrainConfig()
        cfg = GlobalModelConfig(backbone=BackboneConfig(kind=backbone),
                                head="stages_cnn", depth=point["depth"])
        pre = Preprocess.for_backbone(backbone, cfg.backbone.image_size)
        ds = UserStudyScores(csv_path, root, pre)
        tr, va = seeded_split(len(ds), tcfg.val_fraction, tcfg.seed)
        result = train_global(
            cfg, tcfg,
            Loader(Subset(ds, tr), tcfg.batch_size, shuffle=True, seed=tcfg.seed),
            Loader(Subset(ds, va), tcfg.batch_size),
            backbone_params=backbone_params)
        return result.val_metrics

    return train_fn


def make_clu_train_fn(csv_path: str, base_tcfg=None, backbone_params=None):
    """Grid point {imgamincaps, only_hq, lora_rank, threshold,
    backbone_kind} → one CLU training run
    (reference: CLU_training_sweep_example.py:92-180).

    ``backbone_params`` (frozen-tower cells only): converted pretrained
    tower params (CLI ``--backbone-checkpoint``)."""

    def train_fn(point):
        from srsem.core.config import (BackboneConfig, LocalModelConfig,
                                       TrainConfig)
        from srsem.data.datasets import (KoniqPairsMapsDataset, Subset,
                                         seeded_split)
        from srsem.data.loader import Loader
        from srsem.data.preprocess import Preprocess
        from srsem.train.loop import train_local

        tcfg = base_tcfg or TrainConfig(batch_size=80, epochs=60)
        # Binarization happens in the DATASET (threshold= below,
        # binarize-then-resize like the reference) — TrainConfig.
        # map_threshold is the serve-path knob and is not read by
        # train_local, so it is deliberately not set here.
        cfg = LocalModelConfig(
            backbone=BackboneConfig(kind=point["backbone_kind"]),
            lora_rank=point["lora_rank"])
        pre = Preprocess.for_backbone(point["backbone_kind"],
                                      cfg.backbone.image_size)
        ds = KoniqPairsMapsDataset(
            csv_path, pre, only_hq=point["only_hq"],
            imgamincaps=point["imgamincaps"], threshold=point["threshold"])
        tr, va = seeded_split(len(ds), tcfg.val_fraction, tcfg.seed)
        result = train_local(
            cfg, tcfg,
            Loader(Subset(ds, tr), tcfg.batch_size, shuffle=True, seed=tcfg.seed),
            Loader(Subset(ds, va), tcfg.batch_size),
            backbone_params=backbone_params)
        return result.val_metrics

    return train_fn


def run_sweep(
    train_fn: Callable[[Dict[str, Any]], Mapping[str, Any]],
    axes: Mapping[str, Sequence[Any]],
    summary_path: Optional[str] = None,
) -> list:
    """Run ``train_fn(point)`` for every grid point; collect summaries."""
    results = []
    f = open(summary_path, "a") if summary_path else None
    try:
        for point in grid_points(axes):
            t0 = time.time()
            summary = dict(train_fn(point))
            rec = {"name": run_name(point), "point": point,
                   "seconds": time.time() - t0, **summary}
            results.append(rec)
            if f:
                f.write(json.dumps(rec, default=str) + "\n")
                f.flush()
    finally:
        if f:
            f.close()
    return results


def run_clu_sweep(
    csv_path: str,
    axes: Mapping[str, Sequence[Any]],
    base_tcfg=None,
    summary_path: Optional[str] = None,
    shared_thresholds: bool = False,
    backbone_params=None,
) -> list:
    """The CLU grid, optionally with the threshold axis trained N-for-1.

    ``shared_thresholds=False`` is ``run_sweep(make_clu_train_fn(...))``.
    With it on, every frozen-tower cell (``lora_rank=None``) trains its
    whole ``threshold`` axis in ONE run — shared tower stream, shared host
    decode, one decoder per binarization point
    (srsem/train/multisweep.py::train_local_sweep_shared_tower): the
    reference's 72 frozen-tower agent runs
    (CLU_training_sweep_example.py:78-89,184-197) become 24.  LoRA/full
    points train the tower, so they fall back to standalone runs.
    """
    if not shared_thresholds:
        return run_sweep(
            make_clu_train_fn(csv_path, base_tcfg,
                              backbone_params=backbone_params),
            axes, summary_path=summary_path)
    from srsem.core.config import BackboneConfig, LocalModelConfig, TrainConfig
    from srsem.data.datasets import KoniqPairsMapsDataset, Subset, seeded_split
    from srsem.data.loader import Loader
    from srsem.data.preprocess import Preprocess
    from srsem.train.multisweep import train_local_sweep_shared_tower

    thresholds = list(axes.get("threshold", [None]))
    outer = {k: v for k, v in axes.items() if k != "threshold"}
    plain_fn = make_clu_train_fn(csv_path, base_tcfg,
                                 backbone_params=backbone_params)

    results = []
    f = open(summary_path, "a") if summary_path else None
    try:
        for cell in grid_points(outer):
            if cell.get("lora_rank") is not None:
                # Tower trains → nothing to share; standalone per threshold.
                for t in thresholds:
                    point = {**cell, "threshold": t}
                    t0 = time.time()
                    summary = dict(plain_fn(point))
                    rec = {"name": run_name(point), "point": point,
                           "seconds": time.time() - t0, **summary}
                    results.append(rec)
                    if f:
                        f.write(json.dumps(rec, default=str) + "\n")
                        f.flush()
                continue

            tcfg = base_tcfg or TrainConfig(batch_size=80, epochs=60)
            cfg = LocalModelConfig(
                backbone=BackboneConfig(kind=cell["backbone_kind"]),
                lora_rank=None)
            pre = Preprocess.for_backbone(cell["backbone_kind"],
                                          cfg.backbone.image_size)
            ds = KoniqPairsMapsDataset(
                csv_path, pre, only_hq=cell["only_hq"],
                imgamincaps=cell["imgamincaps"], thresholds=thresholds)
            tr, va = seeded_split(len(ds), tcfg.val_fraction, tcfg.seed)
            t0 = time.time()
            cell_results = train_local_sweep_shared_tower(
                thresholds, cfg, tcfg,
                Loader(Subset(ds, tr), tcfg.batch_size, shuffle=True,
                       seed=tcfg.seed),
                Loader(Subset(ds, va), tcfg.batch_size),
                backbone_params=backbone_params)
            dt = time.time() - t0
            for t, r in zip(thresholds, cell_results):
                point = {**cell, "threshold": t}
                rec = {"name": run_name(point), "point": point,
                       "seconds": dt, "shared_thresholds": True,
                       "mse": r["val_mse"], "train_loss": r["train_loss"]}
                results.append(rec)
                if f:
                    f.write(json.dumps(rec, default=str) + "\n")
                    f.flush()
    finally:
        if f:
            f.close()
    return results

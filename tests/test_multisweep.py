"""Shared-tower sweep training: all grid points learn from ONE tower
stream per batch (srsem/train/multisweep.py; what the reference does with
one process per GPU — CLU_training_sweep_example.py:184-197)."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsem.core.config import BackboneConfig, GlobalModelConfig, TrainConfig
from srsem.data.loader import Loader
from srsem.train.multisweep import (
    SweepPoint,
    depth_grid,
    train_global_sweep_shared_tower,
)


class PairDataset:
    def __init__(self, n=16, size=64, seed=0):
        rng = np.random.default_rng(seed)
        self.a = rng.uniform(size=(n, size, size, 3)).astype(np.float32)
        noise = rng.normal(scale=0.15, size=self.a.shape)
        self.b = np.clip(self.a + noise, 0, 1).astype(np.float32)
        # Learnable signal: label proportional to injected noise power.
        self.y = np.mean((self.a - self.b) ** 2, axis=(1, 2, 3)).astype(np.float32)
        self.y = self.y / self.y.max()

    def __len__(self):
        return len(self.y)

    def __getitem__(self, i):
        return (self.a[i], self.b[i]), self.y[i]


def test_depth_grid_matches_reference():
    pts = depth_grid()
    assert [p.name for p in pts] == ["depth-1", "depth-2", "depth-3"]


@pytest.mark.slow
def test_shared_tower_sweep_trains_all_points(tmp_path):
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn", depth=3)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, epochs=3, seed=0)
    ds = PairDataset(n=16)
    loader = Loader(ds, batch_size=8, shuffle=True, seed=0, num_workers=2)

    # Include a label-transform point (the CLU threshold analogue).
    points = depth_grid() + [
        SweepPoint(name="binarized", depth=2,
                   label_transform=lambda y: (y > 0.5).astype(jnp.float32))]
    results = train_global_sweep_shared_tower(
        points, cfg, tcfg, loader, loader)

    assert [r["name"] for r in results] == [
        "depth-1", "depth-2", "depth-3", "binarized"]
    for r in results:
        assert np.isfinite(r["train_loss"])
        assert np.isfinite(r["val_mse"])
        assert -1.0 <= r["val_srcc"] <= 1.0 or np.isnan(r["val_srcc"])
    # Head structure matches each point's tap subset: depth+1 conv heads.
    for r, depth in zip(results[:3], (1, 2, 3)):
        n_heads = len([k for k in r["head_params"] if k.startswith("w_layers")])
        assert n_heads == depth + 1, (r["name"], r["head_params"].keys())

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


class MultiThresholdMapPairs:
    """In-memory map dataset emitting per-threshold label stacks
    (T, H, W) — what ``KoniqPairsMapsDataset(thresholds=...)`` produces."""

    def __init__(self, thresholds, n=8, size=64, seed=0):
        rng = np.random.default_rng(seed)
        self.a = rng.uniform(size=(n, size, size, 3)).astype(np.float32)
        self.b = np.clip(
            self.a + rng.normal(scale=0.1, size=self.a.shape), 0, 1
        ).astype(np.float32)
        self.maps = rng.uniform(size=(n, size, size)).astype(np.float32)
        self.thresholds = list(thresholds)

    def __len__(self):
        return len(self.maps)

    def label(self, i, t):
        m = self.maps[i]
        return (m > t).astype(np.float32) if t is not None else m

    def __getitem__(self, i):
        if len(self.thresholds) == 1:
            return (self.a[i], self.b[i]), self.label(i, self.thresholds[0])
        return (self.a[i], self.b[i]), np.stack(
            [self.label(i, t) for t in self.thresholds])


@pytest.mark.slow
def test_clu_shared_tower_threshold_sweep_matches_plain(tmp_path):
    """The CLU threshold axis trained 2-for-1 on one tower stream equals
    the standalone train_local run per point (same rng, same loader
    order) — srsem/train/multisweep.py::train_local_sweep_shared_tower."""
    import jax

    from srsem.core.config import LocalModelConfig
    from srsem.train.loop import train_local
    from srsem.train.multisweep import train_local_sweep_shared_tower

    thresholds = [None, 0.6]
    cfg = LocalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"))
    tcfg = TrainConfig(lr=1e-3, batch_size=8, epochs=1, seed=42)

    multi = MultiThresholdMapPairs(thresholds, n=8)
    loader_multi = Loader(multi, batch_size=8, num_workers=2)
    results = train_local_sweep_shared_tower(
        thresholds, cfg, tcfg, loader_multi, loader_multi,
        rng=jax.random.PRNGKey(42))
    assert [r["name"] for r in results] == ["threshold-None",
                                            "threshold-0.6"]
    for r in results:
        assert np.isfinite(r["train_loss"]) and np.isfinite(r["val_mse"])
    # The two points trained on DIFFERENT labels → different decoders.
    k0 = results[0]["trainable"]["decoder.0"]["conv1"]["kernel"]
    k1 = results[1]["trainable"]["decoder.0"]["conv1"]["kernel"]
    assert float(np.abs(np.asarray(k0) - np.asarray(k1)).max()) > 0

    # Point parity vs the standalone loop: same rng, same batches, same
    # single-threshold labels (binarize at 0.6).
    single = MultiThresholdMapPairs([0.6], n=8)
    loader_single = Loader(single, batch_size=8, num_workers=2)
    plain = train_local(cfg, tcfg, loader_single, loader_single,
                        rng=jax.random.PRNGKey(42))
    np.testing.assert_allclose(
        results[1]["val_mse"], plain.val_metrics["mse"],
        rtol=2e-3, atol=1e-6)
    pk = plain.trainable["decoder.0"]["conv1"]["kernel"]
    np.testing.assert_allclose(np.asarray(k1), np.asarray(pk),
                               rtol=1e-3, atol=2e-5)


def test_koniq_dataset_multi_threshold_labels(tmp_path):
    """KoniqPairsMapsDataset(thresholds=...): stacked labels, each
    binarize-THEN-resize (order matters: resizing a binary mask yields
    fractional edges; the reference binarizes the raw pickled map first —
    datasets/local_eval_torch_ds.py:35-40)."""
    import pickle

    import pandas as pd
    from PIL import Image

    from srsem.data.datasets import KoniqPairsMapsDataset
    from srsem.data.preprocess import Preprocess
    from srsem.ops.image import resize_bilinear

    rng = np.random.default_rng(4)
    a = tmp_path / "a.png"
    b = tmp_path / "b.png"
    for p in (a, b):
        Image.fromarray(rng.integers(0, 255, (48, 48, 3),
                                     dtype=np.uint8)).save(p)
    raw = rng.uniform(size=(24, 24)).astype(np.float32)
    pkl = tmp_path / "m.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(raw, f)
    csv = tmp_path / "pairs.csv"
    pd.DataFrame({"img_a_pth": [str(a)], "img_b_pth": [str(b)],
                  "out_paths": [str(pkl)], "ima_ncaps": [5]}).to_csv(
        csv, index=False)

    pre = Preprocess.for_backbone("resnet50_clip", 48)
    ds = KoniqPairsMapsDataset(str(csv), pre, thresholds=[None, 0.5])
    (_, _), label = ds[0]
    assert label.shape == (2, 48, 48)
    want_none = np.asarray(resize_bilinear(raw, (48, 48),
                                           align_corners=False))
    want_05 = np.asarray(resize_bilinear(
        (raw > 0.5).astype(np.float32), (48, 48), align_corners=False))
    np.testing.assert_allclose(label[0], want_none, rtol=1e-6)
    np.testing.assert_allclose(label[1], want_05, rtol=1e-6)
    # binarize-then-resize ≠ resize-then-binarize
    assert not np.array_equal(
        want_05, (want_none > 0.5).astype(np.float32))

    # Single-threshold path unchanged.
    ds1 = KoniqPairsMapsDataset(str(csv), pre, threshold=0.5)
    (_, _), lab1 = ds1[0]
    np.testing.assert_allclose(lab1, want_05, rtol=1e-6)

"""Diff-cache sweep training (srsem/train/diffcache.py): the frozen tower
runs ONCE over the dataset; all epochs of all grid points train heads on
the device-resident diff cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsem.core.config import BackboneConfig, GlobalModelConfig, TrainConfig
from srsem.data.loader import Loader
from srsem.train.diffcache import (
    build_diff_cache,
    estimate_cache_bytes,
    train_global_sweep_cached_diffs,
)
from srsem.train.multisweep import (
    SweepPoint,
    depth_grid,
    train_global_sweep_shared_tower,
)

from tests.test_multisweep import PairDataset


@pytest.fixture(autouse=True)
def _clear_caches_after_each_test():
    """This module compiles several tower-sized programs per test (sweep
    pairs, cached + uncached CLU training); on the 1-core container the
    XLA:CPU runtime aborts once too many executables accumulate in one
    process (see tests/conftest.py).  Clear after every test, not just per
    module."""
    yield
    jax.clear_caches()


def test_estimate_cache_bytes():
    shapes = {"a": (8, 8, 16), "b": (4, 4, 32)}
    n = estimate_cache_bytes(shapes, n_pairs=10, cache_dtype=jnp.float32)
    assert n == (8 * 8 * 16 + 4 * 4 * 32) * 10 * 4


@pytest.mark.slow
def test_cached_sweep_matches_shared_tower_one_batch():
    """With one batch and one epoch the cached and per-epoch trajectories
    are identical (same head init, same Adam step on the same diffs)."""
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn", depth=3)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, epochs=1, seed=0)
    ds = PairDataset(n=8)
    loader = Loader(ds, batch_size=8, shuffle=False, num_workers=2)
    points = depth_grid(depths=(1, 3))

    r_cache = train_global_sweep_cached_diffs(
        points, cfg, tcfg, loader, loader, rng=jax.random.PRNGKey(0))
    r_tower = train_global_sweep_shared_tower(
        points, cfg, tcfg, loader, loader, rng=jax.random.PRNGKey(0))

    for rc, rt in zip(r_cache, r_tower):
        assert rc["name"] == rt["name"]
        np.testing.assert_allclose(rc["train_loss"], rt["train_loss"],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(rc["val_mse"], rt["val_mse"],
                                   rtol=1e-3, atol=1e-6)
        flat_c = jax.tree.leaves(rc["head_params"])
        flat_t = jax.tree.leaves(rt["head_params"])
        for tc, tt in zip(flat_c, flat_t):
            # The first Adam step is ~sign(grad)*lr, so a near-zero-grad
            # element can flip under the tiny tower drift between the
            # concat-apply (shared-tower) and split-apply (cache) programs;
            # atol 2.5*lr tolerates isolated flips, rtol pins the rest.
            np.testing.assert_allclose(np.asarray(tc), np.asarray(tt),
                                       rtol=1e-3, atol=2.5e-3)


@pytest.mark.slow
def test_cached_sweep_multi_epoch_with_label_transform():
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn", depth=3)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, epochs=4, seed=0)
    ds = PairDataset(n=16)
    loader = Loader(ds, batch_size=8, shuffle=True, seed=0, num_workers=2)
    points = depth_grid(depths=(2,)) + [
        SweepPoint(name="binarized", depth=2,
                   label_transform=lambda y: (y > 0.5).astype(jnp.float32))]

    results = train_global_sweep_cached_diffs(
        points, cfg, tcfg, loader, loader)
    assert [r["name"] for r in results] == ["depth-2", "binarized"]
    for r in results:
        assert np.isfinite(r["train_loss"])
        assert np.isfinite(r["val_mse"])
        n_heads = len([k for k in r["head_params"] if k.startswith("w_layers")])
        assert n_heads == 3


_CLU_CACHED_EQ_SCRIPT = """
import json
import numpy as np
import jax

from srsem.core.config import BackboneConfig, LocalModelConfig, TrainConfig
from srsem.data.loader import Loader
from srsem.train.diffcache import train_local_cached_diffs
from srsem.train.loop import train_local


class MapPairs:
    def __init__(self, n=8, size=64, seed=3):
        r = np.random.default_rng(seed)
        self.a = r.uniform(size=(n, size, size, 3)).astype(np.float32)
        self.b = np.clip(self.a + r.normal(scale=0.1, size=self.a.shape),
                         0, 1).astype(np.float32)
        self.maps = np.mean((self.a - self.b) ** 2, axis=-1)
        self.maps = (self.maps / self.maps.max()).astype(np.float32)

    def __len__(self):
        return len(self.maps)

    def __getitem__(self, i):
        return (self.a[i], self.b[i]), self.maps[i]


cfg = LocalModelConfig(
    backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                            compute_dtype="float32"))
tcfg = TrainConfig(lr=1e-3, batch_size=8, epochs=1, seed=7)
loader = Loader(MapPairs(), batch_size=8, shuffle=False, num_workers=2)

r_cache = train_local_cached_diffs(cfg, tcfg, loader, loader)
jax.clear_caches()
r_loop = train_local(cfg, tcfg, loader, loader)

stats_err = 0.0
s_c = jax.tree.leaves(r_cache["batch_stats"])
s_l = jax.tree.leaves(jax.device_get(r_loop.batch_stats))
for a, b in zip(s_c, s_l):
    stats_err = max(stats_err,
                    float(np.max(np.abs(np.asarray(a) - np.asarray(b)))))
print(json.dumps({
    "cache_train_loss": r_cache["train_loss"],
    "cache_val_mse": r_cache["val_mse"],
    "loop_val_mse": float(r_loop.val_metrics["mse"]),
    "max_batch_stats_abs_err": stats_err,
}))
"""


@pytest.mark.slow
def test_clu_cached_training_matches_train_local():
    """CLU decoder-only training on cached diffs equals the standard
    train_local loop (one batch, one epoch — same init, same Adam step on
    the same diff pyramids).

    Runs in a fresh subprocess: the two whole-epoch programs peak ~24 GB
    of compile RSS, and late in a long suite process that tips the
    XLA:CPU runtime into a message-less SIGABRT (see tests/conftest.py) —
    the identical computation is deterministic-green in a fresh process.
    """
    import json
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    proc = subprocess.run(
        [sys.executable, "-c", _CLU_CACHED_EQ_SCRIPT],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert np.isfinite(out["cache_train_loss"])
    np.testing.assert_allclose(out["cache_val_mse"], out["loop_val_mse"],
                               rtol=5e-3, atol=1e-6)
    # Decoder BN batch_stats followed the same trajectory.
    assert out["max_batch_stats_abs_err"] < 1e-3, out


@pytest.mark.slow
def test_clu_cached_training_rejects_lora():
    from srsem.core.config import LocalModelConfig
    from srsem.train.diffcache import train_local_cached_diffs

    cfg = LocalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"),
        lora_rank=8)
    with pytest.raises(ValueError):
        train_local_cached_diffs(cfg, TrainConfig(), None, None)


@pytest.mark.slow
def test_cache_budget_enforced():
    from srsem.backbones.resnet import make_backbone
    from srsem.core.meshes import create_mesh

    cfg = BackboneConfig(kind="resnet50", image_size=64,
                         compute_dtype="float32")
    backbone = make_backbone(cfg)
    ds = PairDataset(n=8)
    loader = Loader(ds, batch_size=8, shuffle=False, num_workers=2)
    mesh = create_mesh()
    bparams = backbone.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]
    from srsem.models.global_models import stage_taps_for

    with pytest.raises(MemoryError):
        build_diff_cache(backbone, bparams, stage_taps_for("resnet50", 3),
                         loader, mesh, max_bytes=1024)

"""Training-harness tests: partitioning, checkpoints, sweep grids, and an
end-to-end jitted training run over the virtual 8-device mesh (the standard
JAX idiom for testing pjit sharding without TPUs — SURVEY.md §4)."""

import numpy as np
import pytest

from srsem.core.config import (
    BackboneConfig,
    GlobalModelConfig,
    MeshConfig,
    TrainConfig,
)
from srsem.core.meshes import create_mesh
from srsem.train.checkpoint import restore_checkpoint, save_checkpoint
from srsem.train.partition import merge_params, partition_params, trainable_predicate
from srsem.train.sweep import CLU_SWEEP, GLOBAL_SWEEP, grid_points, run_name, run_sweep


class ArrayPairs:
    """In-memory dataset of ((a, b), score) samples."""

    def __init__(self, n=16, size=64, seed=0):
        rng = np.random.default_rng(seed)
        self.a = rng.uniform(size=(n, size, size, 3)).astype(np.float32)
        noise = rng.normal(scale=0.1, size=(n, size, size, 3))
        self.b = np.clip(self.a + noise, 0, 1).astype(np.float32)
        self.y = rng.uniform(size=(n,)).astype(np.float32)

    def __len__(self):
        return len(self.y)

    def __getitem__(self, i):
        return (self.a[i], self.b[i]), self.y[i]


def test_partition_roundtrip():
    tree = {"backbone": {"conv": {"kernel": np.ones(3)}},
            "aggregator": {"w": {"kernel": np.zeros(2)}}}
    t, f = partition_params(tree, trainable_predicate())
    assert "aggregator" in t and "backbone" not in t
    merged = merge_params(t, f)
    assert merged.keys() == tree.keys()


def test_checkpoint_roundtrip(tmp_path):
    tree = {"w": np.arange(5.0), "nested": {"b": np.ones((2, 2))}}
    save_checkpoint(str(tmp_path), 3, tree)
    save_checkpoint(str(tmp_path), 7, {"w": np.zeros(5), "nested": {"b": 2 * np.ones((2, 2))}})
    restored = restore_checkpoint(str(tmp_path), tree)  # latest = 7
    np.testing.assert_array_equal(restored["w"], np.zeros(5))
    restored3 = restore_checkpoint(str(tmp_path), tree, step=3)
    np.testing.assert_array_equal(restored3["w"], np.arange(5.0))


def test_checkpoint_retention(tmp_path):
    """keep_last prunes old step files, never the newest ones, and the
    latest checkpoint stays restorable (TrainConfig.checkpoint_keep_last)."""
    import os

    for step in (1, 2, 3, 4, 5):
        save_checkpoint(str(tmp_path), step,
                        {"w": step * np.ones(3)}, keep_last=2)
    files = sorted(f for f in os.listdir(tmp_path)
                   if f.startswith("step_"))
    assert files == ["step_4.msgpack", "step_5.msgpack"]
    restored = restore_checkpoint(str(tmp_path), {"w": np.zeros(3)})
    np.testing.assert_array_equal(restored["w"], 5 * np.ones(3))
    # keep_last=None keeps everything (reference per-epoch torch.save).
    save_checkpoint(str(tmp_path), 6, {"w": np.ones(3)})
    assert len([f for f in os.listdir(tmp_path)
                if f.startswith("step_")]) == 3


def test_checkpoint_retention_prunes_stale_higher_steps(tmp_path):
    """A reused checkpoint_dir holding step files from a PREVIOUS longer
    run: those higher-numbered leftovers are unreachable via latest.json
    once the new run saves, so retention prunes them instead of letting
    them squat in the keep_last slots and evict fresh epochs."""
    import os

    save_checkpoint(str(tmp_path), 30, {"w": np.ones(3)})  # previous run
    for step in (1, 2, 3):
        save_checkpoint(str(tmp_path), step,
                        {"w": step * np.ones(3)}, keep_last=2)
    files = sorted(f for f in os.listdir(tmp_path)
                   if f.startswith("step_"))
    assert files == ["step_2.msgpack", "step_3.msgpack"]
    restored = restore_checkpoint(str(tmp_path), {"w": np.zeros(3)})
    np.testing.assert_array_equal(restored["w"], 3 * np.ones(3))


def test_orbax_checkpointer_roundtrip(tmp_path):
    """OrbaxCheckpointer save → restore round-trip (the sharding-aware
    multi-host path, srsem/train/checkpoint.py:61-83); latest-step
    selection and typed restore against a target tree."""
    ocp = pytest.importorskip("orbax.checkpoint")  # noqa: F841
    from srsem.train.checkpoint import OrbaxCheckpointer

    mgr = OrbaxCheckpointer(str(tmp_path / "orbax"))
    tree1 = {"w": np.arange(4.0, dtype=np.float32),
             "nested": {"b": np.ones((2, 3), np.float32)}}
    mgr.save(2, tree1)
    mgr.save(5, {"w": np.zeros(4, np.float32),
                 "nested": {"b": 7 * np.ones((2, 3), np.float32)}})
    target = {"w": np.zeros(4, np.float32),
              "nested": {"b": np.zeros((2, 3), np.float32)}}
    latest = mgr.restore(target)
    np.testing.assert_array_equal(latest["nested"]["b"],
                                  7 * np.ones((2, 3)))
    old = mgr.restore(target, step=2)
    np.testing.assert_array_equal(old["w"], np.arange(4.0))
    with pytest.raises(FileNotFoundError):
        OrbaxCheckpointer(str(tmp_path / "empty")).restore(target)


def test_sweep_grids_match_reference():
    # reference: CLIPLPIPS_REG_training_sweep_example.py:107-114
    assert list(grid_points(GLOBAL_SWEEP)) == [
        {"depth": 1}, {"depth": 2}, {"depth": 3}]
    # reference: CLU_training_sweep_example.py:78-89 → 4·2·3·3·2 = 144 points
    assert len(list(grid_points(CLU_SWEEP))) == 144
    assert run_name({"depth": 2}, "glob") == "glob_depth-2"


def test_run_sweep_collects_summaries(tmp_path):
    def fake_train(point):
        return {"val_srcc": point["depth"] / 10}

    results = run_sweep(fake_train, {"depth": [1, 2]},
                        summary_path=str(tmp_path / "sweep.jsonl"))
    assert len(results) == 2
    assert results[1]["val_srcc"] == 0.2
    assert (tmp_path / "sweep.jsonl").read_text().count("\n") == 2


@pytest.mark.slow
def test_train_global_end_to_end_on_mesh(tmp_path):
    """One epoch of the real jitted train loop, batch sharded over the
    8-device mesh, with SRCC/MSE eval and checkpointing."""
    from srsem.data.loader import Loader
    from srsem.train.loop import train_global

    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn", depth=1)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, epochs=1, seed=42,
                       checkpoint_dir=str(tmp_path / "ckpt"),
                       mesh=MeshConfig(data_axis=-1))
    ds = ArrayPairs(n=16)
    loader = Loader(ds, batch_size=8, shuffle=True, seed=0, num_workers=2)
    result = train_global(cfg, tcfg, loader, loader)
    assert np.isfinite(result.val_metrics["mse"])
    assert "srcc" in result.val_metrics
    assert (tmp_path / "ckpt" / "latest.json").exists()


class ArrayMapPairs:
    """In-memory map dataset: ((a, b), cosmap) samples."""

    def __init__(self, n=8, size=64, seed=0):
        rng = np.random.default_rng(seed)
        self.a = rng.uniform(size=(n, size, size, 3)).astype(np.float32)
        self.b = np.clip(
            self.a + rng.normal(scale=0.1, size=self.a.shape), 0, 1
        ).astype(np.float32)
        self.maps = rng.uniform(size=(n, size, size)).astype(np.float32)

    def __len__(self):
        return len(self.maps)

    def __getitem__(self, i):
        return (self.a[i], self.b[i]), self.maps[i]


@pytest.mark.slow
def test_train_local_end_to_end_on_mesh(tmp_path):
    """One epoch of CLU training: map MSE, BatchNorm batch_stats updates,
    checkpointing — over the 8-device mesh."""
    from srsem.core.config import BackboneConfig, LocalModelConfig
    from srsem.data.loader import Loader
    from srsem.train.loop import train_local

    cfg = LocalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"))
    tcfg = TrainConfig(lr=1e-3, batch_size=8, epochs=1, seed=42,
                       checkpoint_dir=str(tmp_path / "ckpt"))
    ds = ArrayMapPairs(n=8)
    loader = Loader(ds, batch_size=8, num_workers=2)
    result = train_local(cfg, tcfg, loader, loader)
    assert np.isfinite(result.val_metrics["mse"])
    # batch_stats were actually updated away from init (mean starts at 0)
    import jax

    stats_norm = sum(
        float(abs(x).sum()) for x in jax.tree.leaves(result.batch_stats))
    assert stats_norm > 0
    assert (tmp_path / "ckpt" / "latest.json").exists()


def test_restore_without_target_returns_raw_tree(tmp_path):
    """Target-free restore (used by the score CLI to pull the trained
    heads out of a checkpoint without knowing the optimizer structure)."""
    tree = {"trainable": {"w": np.arange(3.0)},
            "opt_state": {"m": np.zeros(3)},
            "batch_stats": {}}
    save_checkpoint(str(tmp_path), 1, tree)
    raw = restore_checkpoint(str(tmp_path))
    np.testing.assert_array_equal(raw["trainable"]["w"], np.arange(3.0))


def test_run_training_batch_mesh_guard_and_backbone_injection():
    """(a) batch_size that doesn't shard evenly over the data axis fails at
    SETUP with guidance, not mid-epoch with an opaque XLA divisibility
    error; (b) ``backbone_params`` swaps the frozen tower (the converted-
    checkpoint path) without hand-assembling ``variables``; (c) a caller-
    provided writer survives the run (sweeps reuse one writer)."""
    import jax
    import jax.numpy as jnp

    from srsem.models.global_models import make_global_model
    from srsem.train.loop import run_training

    mesh8 = create_mesh(8, 1)
    bad = TrainConfig(batch_size=5, epochs=0, checkpoint_dir=None)
    with pytest.raises(ValueError, match="shard evenly"):
        run_training(None, False, [], [], bad,
                     trainable_predicate(), mesh=mesh8)

    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=32,
                                compute_dtype="float32"),
        head="stages_cnn", depth=1)
    model = make_global_model(cfg)
    z = jnp.zeros((1, 32, 32, 3))
    vs = model.init(jax.random.PRNGKey(0), z, z)
    tower = jax.tree.map(lambda x: x + 1.0, vs["params"]["backbone"])

    class Writer:
        closed = False

        def write(self, step, metrics):
            pass

        def close(self):
            self.closed = True

    w = Writer()
    # epochs=0: the injection is observable without compiling a step.
    res = run_training(model, False, [], [], 
                       TrainConfig(batch_size=8, epochs=0,
                                   checkpoint_dir=None),
                       trainable_predicate(), writer=w,
                       mesh=create_mesh(1, 1), variables=vs,
                       backbone_params=tower)
    leaf_got = jax.device_get(
        jax.tree.leaves(res.frozen["backbone"])[0])
    leaf_want = np.asarray(jax.tree.leaves(tower)[0])
    np.testing.assert_array_equal(leaf_got, leaf_want)
    assert not w.closed  # caller-owned writer stays open


def test_checkpoint_prune_and_pointer_robustness(tmp_path):
    """(a) Retention prunes the LISTED filenames — a zero-padded
    step_0010.msgpack must not crash the prune by re-deriving a
    non-existent step_10.msgpack; (b) a corrupt latest.json (pre-atomic-
    write crash) recovers from the step files instead of bricking resume."""
    import json

    from srsem.train.checkpoint import latest_step

    d = str(tmp_path)
    save_checkpoint(d, 1, {"w": np.ones(2)})
    # hand-copied zero-padded file from an older tool
    with open(tmp_path / "step_0010.msgpack", "wb") as f:
        f.write(open(tmp_path / "step_1.msgpack", "rb").read())
    save_checkpoint(d, 12, {"w": np.ones(2)}, keep_last=1)
    names = sorted(p.name for p in tmp_path.glob("step_*.msgpack"))
    assert names == ["step_12.msgpack"]  # both old files pruned, no crash

    with open(tmp_path / "latest.json", "w") as f:
        f.write('{"step": 12')  # truncated mid-write
    assert latest_step(d) == 12  # recovered from the step files
    tree = restore_checkpoint(d)
    np.testing.assert_array_equal(tree["w"], np.ones(2))

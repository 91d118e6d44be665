"""Sufficient-statistic sweep training (srsem/train/statcache.py): the
conv-head sweep trained from per-layer spatial-mean diff statistics
(~15 KB/pair) instead of full diff pyramids (~6 MB/pair), exactly.

The head is a 1x1 conv + spatial mean (reference:
models/global_eval_models.py:379-395), so the spatial mean commutes
through the conv: scores and head gradients from the statistic equal
those from the full diff tensor up to FP reduction order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsem.core.config import BackboneConfig, GlobalModelConfig, TrainConfig
from srsem.data.loader import Loader
from srsem.models.global_models import (
    ConvHeadAggregator,
    conv_head_from_stats,
)
from srsem.train.diffcache import train_global_sweep_cached_diffs
from srsem.train.multisweep import SweepPoint, depth_grid
from srsem.train.statcache import (
    StatCache,
    build_stat_cache,
    fit_conv_head_closed_form,
    solve_global_sweep_closed_form,
    train_global_sweep_cached_stats,
)

from tests.test_multisweep import PairDataset


@pytest.fixture(autouse=True)
def _clear_caches_after_each_test():
    """Tower-sized programs per test; clear per test as in
    tests/test_diffcache.py (XLA:CPU executable accumulation aborts)."""
    yield
    jax.clear_caches()


def test_conv_head_from_stats_equals_aggregator():
    """Pure-math check of the sufficient statistic: scoring from
    spatial-mean diffs equals the full ConvHeadAggregator apply."""
    rng = np.random.default_rng(0)
    shapes = [(4, 8, 8, 16), (4, 4, 4, 32), (4, 2, 2, 64)]
    diffs = [jnp.asarray(rng.uniform(size=s).astype(np.float32))
             for s in shapes]
    agg = ConvHeadAggregator(len(diffs))
    params = agg.init(jax.random.PRNGKey(1), diffs)["params"]

    full = agg.apply({"params": params}, diffs)
    stats = [jnp.mean(d, axis=(1, 2)) for d in diffs]
    from_stats = conv_head_from_stats(params, stats)

    np.testing.assert_allclose(np.asarray(from_stats), np.asarray(full),
                               rtol=1e-5, atol=1e-7)


def test_conv_head_from_stats_grouped_shape():
    """The stat head also scores stacked (..., C) stats — any leading
    batch shape works (used by grouped/eval callers)."""
    rng = np.random.default_rng(2)
    stats = [jnp.asarray(rng.uniform(size=(3, 5, c)).astype(np.float32))
             for c in (16, 32)]
    diffs0 = [jnp.zeros((1, 2, 2, c), jnp.float32) for c in (16, 32)]
    agg = ConvHeadAggregator(2)
    params = agg.init(jax.random.PRNGKey(0), diffs0)["params"]
    out = conv_head_from_stats(params, stats)
    assert out.shape == (3, 5)
    assert bool(jnp.all(out >= 0))  # final ReLU


@pytest.mark.slow
def test_stat_sweep_matches_diff_sweep_one_batch():
    """With a single cached batch the permutation is trivially [0] every
    epoch, so the stat-cache and diff-cache trajectories are identical
    multi-epoch (same head init, same Adam steps on algebraically equal
    gradients) up to FP reduction order."""
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn", depth=3)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, epochs=3, seed=0)
    ds = PairDataset(n=8)
    loader = Loader(ds, batch_size=8, shuffle=False, num_workers=2)
    points = depth_grid(depths=(1, 3))

    r_stat = train_global_sweep_cached_stats(
        points, cfg, tcfg, loader, loader, rng=jax.random.PRNGKey(0))
    jax.clear_caches()
    r_diff = train_global_sweep_cached_diffs(
        points, cfg, tcfg, loader, loader, rng=jax.random.PRNGKey(0))

    for rs, rd in zip(r_stat, r_diff):
        assert rs["name"] == rd["name"]
        np.testing.assert_allclose(rs["train_loss"], rd["train_loss"],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(rs["val_mse"], rd["val_mse"],
                                   rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(rs["val_srcc"], rd["val_srcc"],
                                   rtol=1e-3, atol=1e-3)
        flat_s = jax.tree.leaves(rs["head_params"])
        flat_d = jax.tree.leaves(rd["head_params"])
        for ts, td in zip(flat_s, flat_d):
            # Same tolerance story as tests/test_diffcache.py: the first
            # Adam steps are ~sign(grad)*lr, so near-zero-grad elements
            # can flip under FP reduction-order drift.
            np.testing.assert_allclose(np.asarray(ts), np.asarray(td),
                                       rtol=1e-3, atol=2.5e-3)


@pytest.mark.slow
def test_stat_sweep_multi_epoch_with_label_transform():
    """Multi-epoch learning through the stat cache.

    The labels are scaled ×100 into the head's live range: with a
    random-init tower at 64px the initial pre-ReLU scores sit at ±100
    scale, so fitting [0, 1]-scale targets drives every score through the
    reference architecture's final ReLU and the head dies (zero gradients
    — an absorbing state the reference shares, masked there by pretrained
    towers).  SRCC is scale-invariant, so the assertion still validates
    real learning + ranking."""
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn", depth=3)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, epochs=150, seed=0)
    ds = PairDataset(n=16)
    loader = Loader(ds, batch_size=8, shuffle=True, seed=0, num_workers=2)
    points = [
        SweepPoint(name="scaled", depth=2,
                   label_transform=lambda y: y * 100.0),
        SweepPoint(name="binarized", depth=2,
                   label_transform=lambda y: (y > 0.5).astype(jnp.float32))]

    results = train_global_sweep_cached_stats(
        points, cfg, tcfg, loader, loader, rng=jax.random.PRNGKey(0))
    assert [r["name"] for r in results] == ["scaled", "binarized"]
    for r in results:
        assert np.isfinite(r["train_loss"])
        assert np.isfinite(r["val_mse"])
        n_heads = len([k for k in r["head_params"] if k.startswith("w_layers")])
        assert n_heads == 3
    # 150 epochs on the learnable PairDataset signal (labels proportional
    # to the diff power the stats encode): the scaled point must fit.
    # (The binarized point's targets are near-constant on this synthetic
    # set — its SRCC is not meaningful, only its finiteness above.)
    assert results[0]["val_srcc"] > 0.8, results[0]


@pytest.mark.slow
def test_build_stat_cache_shapes():
    from srsem.backbones.resnet import make_backbone
    from srsem.core.meshes import create_mesh
    from srsem.models.global_models import stage_taps_for

    bcfg = BackboneConfig(kind="resnet50", image_size=64,
                          compute_dtype="float32")
    backbone = make_backbone(bcfg)
    mesh = create_mesh()
    bparams = backbone.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]
    ds = PairDataset(n=16)
    loader = Loader(ds, batch_size=8, shuffle=False, num_workers=2)
    names = stage_taps_for("resnet50", 3)
    cache = build_stat_cache(backbone, bparams, names, loader, mesh)
    assert cache.n_batches == 2 and cache.batch == 8
    for nm in names:
        s = cache.stats[nm]
        assert s.ndim == 3 and s.shape[:2] == (2, 8)
        assert bool(jnp.all(jnp.isfinite(s)))


def test_closed_form_recovers_planted_head():
    """The ridge solve recovers a planted linear head exactly (pre-ReLU
    least squares is the head's true objective up to the output clamp),
    ignores masked rows, and emits params interchangeable with trained
    ones (scored via conv_head_from_stats)."""
    rng = np.random.default_rng(3)
    names = ["a", "b"]
    dims = [16, 32]
    nb, bs = 3, 8
    stats = {nm: jnp.asarray(rng.uniform(0.5, 1.5, (nb, bs, d))
                             .astype(np.float32))
             for nm, d in zip(names, dims)}
    w_true = [rng.normal(size=d).astype(np.float32) * 0.1 for d in dims]
    b_true = 2.0  # keeps every pre-ReLU score positive → ReLU inactive
    y = (np.stack([np.asarray(stats[nm]) @ w for nm, w in zip(names, w_true)])
         .mean(axis=0) + b_true).astype(np.float32)
    mask = np.ones((nb, bs), np.float32)
    mask[0, 0] = 0.0
    y[0, 0] = 1e6  # garbage under the mask — must not leak into the fit
    cache = StatCache(stats=stats, y=jnp.asarray(y), mask=jnp.asarray(mask))

    fit = fit_conv_head_closed_form(cache, names, l2=0.0)
    assert fit["train_mse"] < 1e-6

    sel = [stats[nm] for nm in names]
    pred = np.asarray(conv_head_from_stats(fit["params"], sel))
    keep = mask > 0
    np.testing.assert_allclose(pred[keep], y[keep], rtol=1e-4, atol=1e-4)

    # Against an independent numpy least-squares on the same rows.
    x_np = np.concatenate([np.asarray(stats[nm]) for nm in names],
                          axis=-1)[keep] / len(names)
    a_np = np.concatenate([x_np, np.ones((x_np.shape[0], 1), np.float32)], 1)
    theta_np, *_ = np.linalg.lstsq(a_np, y[keep], rcond=None)
    pred_np = a_np @ theta_np
    np.testing.assert_allclose(pred[keep], pred_np, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_closed_form_sweep_fits_learnable_signal():
    """solve_global_sweep_closed_form: one tower pass + one solve per grid
    point reaches (at least) the 150-epoch Adam fit on the learnable
    synthetic signal — and does it with no epochs knob at all."""
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn", depth=3)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, epochs=1, seed=0)
    ds = PairDataset(n=16)
    loader = Loader(ds, batch_size=8, shuffle=True, seed=0, num_workers=2)
    points = [SweepPoint(name="scaled", depth=2,
                         label_transform=lambda y: y * 100.0),
              SweepPoint(name="plain", depth=1)]

    results = solve_global_sweep_closed_form(
        points, cfg, tcfg, loader, loader, rng=jax.random.PRNGKey(0))
    assert [r["name"] for r in results] == ["scaled", "plain"]
    for r in results:
        assert np.isfinite(r["train_loss"])
        assert np.isfinite(r["val_mse"])
    # The Adam path needs 150 epochs to clear 0.8 SRCC on this signal
    # (test_stat_sweep_multi_epoch_with_label_transform); the solve is the
    # optimum of the same objective.
    assert results[0]["val_srcc"] > 0.8, results[0]
    n_heads = len([k for k in results[0]["head_params"]
                   if k.startswith("w_layers")])
    assert n_heads == 3

    # closed_form_init: Adam starting AT the optimum must not lose it in
    # a couple of refinement epochs.  The refinement lr must be small for
    # this head: Adam's scale-free steps move EVERY kernel component by
    # ~lr, and with thousands of large sufficient-statistic inputs a
    # single step shifts predictions by O(fan_in·|stat|·lr) — at lr 1e-4
    # that is an O(10) functional drift on the ×100-label point (measured:
    # mse 0→69, SRCC 0.77-0.80 depending on batch order), while lr 1e-5
    # stays at the optimum (SRCC 0.99, mse 0.67) for any ordering.
    jax.clear_caches()
    tcfg2 = TrainConfig(lr=1e-5, batch_size=8, epochs=2, seed=0)
    refined = train_global_sweep_cached_stats(
        points, cfg, tcfg2, loader, loader, rng=jax.random.PRNGKey(0),
        closed_form_init=True)
    assert refined[0]["val_srcc"] > 0.8, refined[0]


def test_token_head_from_stats_equals_aggregator():
    """Token-head sufficient statistic: scoring from token-mean diffs
    equals the full TokenHeadAggregator apply, shared and per-layer."""
    from srsem.models.global_models import (TokenHeadAggregator,
                                            token_head_from_stats)

    rng = np.random.default_rng(5)
    diffs = [jnp.asarray(rng.uniform(size=(3, 17, 24)).astype(np.float32))
             for _ in range(2)]
    for shared in (False, True):
        agg = TokenHeadAggregator(len(diffs), shared=shared)
        params = agg.init(jax.random.PRNGKey(7), diffs)["params"]
        full = agg.apply({"params": params}, diffs)
        stats = [jnp.mean(d, axis=1) for d in diffs]
        got = token_head_from_stats(params, stats, shared=shared)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   rtol=1e-5, atol=1e-7)


def test_closed_form_token_heads():
    """fit_token_head_closed_form: per-layer == the conv solve (same
    algebra/layout); shared recovers a planted singleLin head via the
    layer-mean statistic, scored through token_head_from_stats."""
    from srsem.models.global_models import token_head_from_stats
    from srsem.train.statcache import fit_token_head_closed_form

    rng = np.random.default_rng(11)
    names = ["blocks.9", "blocks.10", "blocks.11"]
    # Overdetermined for BOTH fits: rows (nb*bs=64) > L*W+1=49 unknowns,
    # else the planted weights aren't identified (any interpolant fits).
    w_dim, nb, bs = 16, 4, 16
    stats = {nm: jnp.asarray(rng.uniform(0.2, 1.2, (nb, bs, w_dim))
                             .astype(np.float32)) for nm in names}
    w_true = rng.normal(size=w_dim).astype(np.float32) * 0.1
    b_true = 1.5  # pre-ReLU scores stay positive → ReLU inactive
    y = (np.stack([np.asarray(stats[nm]) @ w_true for nm in names])
         .mean(axis=0) + b_true).astype(np.float32)
    cache = StatCache(stats=stats, y=jnp.asarray(y),
                      mask=jnp.ones((nb, bs), np.float32))

    fit = fit_token_head_closed_form(cache, names, shared=True, l2=0.0)
    assert fit["train_mse"] < 1e-8
    np.testing.assert_allclose(
        np.asarray(fit["params"]["w_layer"]["kernel"][:, 0]), w_true,
        rtol=1e-3, atol=1e-4)
    sel = [stats[nm] for nm in names]
    pred = np.asarray(token_head_from_stats(fit["params"], sel,
                                            shared=True))
    np.testing.assert_allclose(pred, y, rtol=1e-4, atol=1e-4)

    # Per-layer: same solve/layout as the conv head, scored via the
    # token aggregator's stats path.
    fit_pl = fit_token_head_closed_form(cache, names, shared=False, l2=0.0)
    pred_pl = np.asarray(token_head_from_stats(fit_pl["params"], sel))
    np.testing.assert_allclose(pred_pl, y, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_stat_sweep_epochs_zero_returns_init():
    """tcfg.epochs == 0 returns the initialized heads gracefully (the
    diffcache path's documented contract) instead of crashing on an empty
    permutation stack (review r4)."""
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn", depth=3)
    tcfg = TrainConfig(lr=1e-3, batch_size=8, epochs=0, seed=0)
    ds = PairDataset(n=8)
    loader = Loader(ds, batch_size=8, shuffle=False, num_workers=2)
    points = depth_grid(depths=(2,))

    results = train_global_sweep_cached_stats(
        points, cfg, tcfg, loader, loader, rng=jax.random.PRNGKey(0))
    assert len(results) == 1
    assert results[0]["train_loss"] == 0.0
    assert np.isfinite(results[0]["val_mse"])
    n_heads = len([k for k in results[0]["head_params"]
                   if k.startswith("w_layers")])
    assert n_heads == 3

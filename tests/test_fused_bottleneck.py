"""Pallas fused bottleneck + fused serving towers
(srsem/ops/fused_bottleneck.py, srsem/backbones/fused_resnet.py).

CPU tests run the kernel in interpret mode; the real Mosaic compile is
exercised on-chip by bench.py's A/B (BENCH_NOTES.md).  Parity target: the
fused tower consumes the SAME param tree as the Flax towers and must match
``backbone.apply`` on every tap to FP-reduction-order tolerance — frozen
BN folding and the 9-shifted-matmul conv are algebraically exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srsem.backbones.fused_resnet import fused_apply
from srsem.backbones.resnet import ImageNetResNet50, ClipResNet50
from srsem.ops.fused_bottleneck import (
    bottleneck_weights,
    fold_bn_into_conv,
    fused_bottleneck,
)


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


def test_fold_bn_into_conv_exact():
    """conv→BN == folded conv, including a pre-existing conv bias."""
    rng = np.random.default_rng(0)
    k = _rand(rng, (3, 3, 8, 16), 0.2)
    bias = _rand(rng, (16,))
    bn = {"scale": _rand(rng, (16,), 0.5) + 1.0,
          "bias": _rand(rng, (16,)),
          "mean": _rand(rng, (16,)),
          "var": jnp.abs(_rand(rng, (16,))) + 0.5}
    x = _rand(rng, (2, 6, 6, 8))

    conv = lambda x, w, b: jax.lax.conv_general_dilated(  # noqa: E731
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    scale = bn["scale"] * jax.lax.rsqrt(bn["var"] + 1e-5)
    shift = bn["bias"] - bn["mean"] * scale
    want = conv(x, k, bias) * scale + shift
    kf, bf = fold_bn_into_conv(k, bn, bias=bias)
    got = conv(x, kf, bf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_bottleneck_matches_conv_chain():
    """Kernel (interpret mode) == the XLA conv1→conv2→conv3+residual chain."""
    rng = np.random.default_rng(1)
    n, h, w, c, wd = 2, 8, 8, 32, 8
    x = _rand(rng, (n, h, w, c))
    w1, b1 = _rand(rng, (c, wd), 0.1), _rand(rng, (wd,))
    w2, b2 = _rand(rng, (3, 3, wd, wd), 0.1), _rand(rng, (wd,))
    w3, b3 = _rand(rng, (wd, c), 0.1), _rand(rng, (c,))

    h1 = jax.nn.relu(jnp.einsum("nhwc,cd->nhwd", x, w1) + b1)
    h2 = jax.lax.conv_general_dilated(
        h1, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h2 = jax.nn.relu(h2 + b2)
    want = jax.nn.relu(jnp.einsum("nhwd,dc->nhwc", h2, w3) + b3 + x)

    got = fused_bottleneck(x, w1, b1, w2, b2, w3, b3,
                           compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_bottleneck_weights_layout():
    """bottleneck_weights squeezes 1x1 kernels and keeps the 3x3."""
    rng = np.random.default_rng(2)
    bn = lambda c: {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),  # noqa: E731
                    "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    p = {"conv1": {"kernel": _rand(rng, (1, 1, 32, 8))}, "bn1": bn(8),
         "conv2": {"kernel": _rand(rng, (3, 3, 8, 8))}, "bn2": bn(8),
         "conv3": {"kernel": _rand(rng, (1, 1, 8, 32))}, "bn3": bn(32)}
    w1, b1, w2, b2, w3, b3 = bottleneck_weights(p)
    assert w1.shape == (32, 8) and w2.shape == (3, 3, 8, 8)
    assert w3.shape == (8, 32)
    assert b1.shape == (8,) and b3.shape == (32,)


@pytest.mark.slow
def test_grouped_scorer_fused_tower_parity():
    """GroupedPairScorer(fused_tower=True) == the dense-tower scorer on the
    same variables (interpret-mode kernel; FP-order tolerance)."""
    from srsem.core.config import BackboneConfig, GlobalModelConfig
    from srsem.eval.grouped import GroupedPairScorer
    from srsem.models.global_models import make_global_model

    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn", depth=2)
    model = make_global_model(cfg)
    z = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(3), z, z)
    # Push head biases positive so scores clear the final ReLU — otherwise
    # both paths emit exactly 0.0 and the comparison is vacuous.
    variables = jax.tree_util.tree_map_with_path(
        lambda path, v: v + 1.0
        if any(getattr(p, "key", None) == "bias" for p in path) else v,
        variables)

    rng = np.random.default_rng(7)
    g, k = 2, 2
    gt = rng.integers(0, 256, (g, 64, 64, 3), dtype=np.uint8)
    sr = rng.integers(0, 256, (g, k, 64, 64, 3), dtype=np.uint8)

    dense = GroupedPairScorer(cfg, variables, k=k, batch_size=g)
    fused = GroupedPairScorer(cfg, variables, k=k, batch_size=g,
                              fused_tower=True, fused_interpret=True)
    want = np.asarray(jax.device_get(dense.score_arrays(gt, sr)))
    got = np.asarray(jax.device_get(fused.score_arrays(gt, sr)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_grouped_map_scorer_fused_tower_parity():
    """GroupedMapScorer(fused_tower=True) == dense-tower maps (interpret
    kernel; FP-order tolerance)."""
    from srsem.core.config import BackboneConfig, LocalModelConfig
    from srsem.eval.grouped import GroupedMapScorer
    from srsem.models.local_models import make_local_model

    cfg = LocalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"))
    model = make_local_model(cfg)
    z = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(5), z, z, False)

    rng = np.random.default_rng(9)
    g, k = 2, 2
    gt = rng.integers(0, 256, (g, 64, 64, 3), dtype=np.uint8)
    sr = rng.integers(0, 256, (g, k, 64, 64, 3), dtype=np.uint8)

    dense = GroupedMapScorer(cfg, variables, k=k, batch_size=g)
    fused = GroupedMapScorer(cfg, variables, k=k, batch_size=g,
                             fused_tower=True, fused_interpret=True)
    want = np.asarray(jax.device_get(dense.score_arrays(gt, sr)))
    got = np.asarray(jax.device_get(fused.score_arrays(gt, sr)))
    # BN-folding changes every conv's FP summation order; through the
    # 50-layer tower + UNet decoder + sigmoid the measured pointwise
    # deviation is ~2.6e-3 max / 4e-6 mean on [0,1]-range maps.
    np.testing.assert_allclose(got, want, atol=6e-3)
    assert float(np.abs(got - want).mean()) < 1e-4


@pytest.mark.slow
@pytest.mark.parametrize("head", ["stages_cnn", "emb_lin"])
def test_pair_scorer_fused_tower_parity(head):
    """PairScorer(fused_tower=True) == the dense scorer for the conv-diff
    head AND the embedding MLP head (the latter exercises the fused
    tower's pooled-embedding output)."""
    from srsem.core.config import BackboneConfig, GlobalModelConfig
    from srsem.eval.scorer import PairScorer
    from srsem.models.global_models import make_global_model

    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"),
        head=head, depth=2)
    model = make_global_model(cfg)
    z = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(2), z, z)
    if head == "stages_cnn":  # push past the final ReLU (see above)
        variables = jax.tree_util.tree_map_with_path(
            lambda path, v: v + 1.0
            if any(getattr(p, "key", None) == "bias" for p in path) else v,
            variables)

    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)

    dense = PairScorer(cfg, variables, batch_size=2)
    fused = PairScorer(cfg, variables, batch_size=2, fused_tower=True,
                       fused_interpret=True)
    want = np.asarray(jax.device_get(dense.score_arrays(a, b)))
    got = np.asarray(jax.device_get(fused.score_arrays(a, b)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_pair_scorer_local_fused_tower_parity():
    """PairScorer(model_kind='local', fused_tower=True) == dense CLU maps."""
    from srsem.core.config import BackboneConfig, LocalModelConfig
    from srsem.eval.scorer import PairScorer

    cfg = LocalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"))
    rng = np.random.default_rng(6)
    a = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)

    from srsem.models.local_models import make_local_model

    z = jnp.zeros((1, 64, 64, 3))
    variables = make_local_model(cfg).init(jax.random.PRNGKey(4), z, z,
                                           train=False)
    dense = PairScorer(cfg, variables, batch_size=2, model_kind="local")
    fused = PairScorer(cfg, variables, batch_size=2, model_kind="local",
                       fused_tower=True, fused_interpret=True)
    want = np.asarray(jax.device_get(dense.score_arrays(a, b)))
    got = np.asarray(jax.device_get(fused.score_arrays(a, b)))
    np.testing.assert_allclose(got, want, atol=6e-3)
    assert float(np.abs(got - want).mean()) < 1e-4


@pytest.mark.slow
def test_dual_scorer_fused_tower_parity():
    """DualScorer(fused_tower=True) == dense tower for BOTH outputs
    (grouped scores + CLU maps; interpret kernel, FP-order tolerance)."""
    from srsem.core.config import (BackboneConfig, GlobalModelConfig,
                                   LocalModelConfig)
    from srsem.eval.dataset_sweep import DualScorer
    from srsem.models.global_models import make_global_model
    from srsem.models.local_models import make_local_model

    bb = BackboneConfig(kind="resnet50_clip", image_size=64,
                        compute_dtype="float32")
    gcfg = GlobalModelConfig(backbone=bb, head="stages_cnn", depth=2)
    lcfg = LocalModelConfig(backbone=bb)
    z = jnp.zeros((1, 64, 64, 3))
    gvars = make_global_model(gcfg).init(jax.random.PRNGKey(0), z, z)
    lvars = make_local_model(lcfg).init(jax.random.PRNGKey(1), z, z,
                                        train=False)
    # Positive head biases so the global scores clear the final ReLU.
    gvars = jax.tree_util.tree_map_with_path(
        lambda path, v: v + 1.0
        if any(getattr(p, "key", None) == "bias" for p in path) else v,
        gvars)

    rng = np.random.default_rng(11)
    g, k = 2, 2
    gt = rng.integers(0, 256, (g, 64, 64, 3), dtype=np.uint8)
    sr = rng.integers(0, 256, (g, k, 64, 64, 3), dtype=np.uint8)

    dense = DualScorer(gcfg, lcfg, gvars, lvars, batch_size=g)
    fused = DualScorer(gcfg, lcfg, gvars, lvars, batch_size=g,
                       fused_tower=True, fused_interpret=True)
    want_s, want_m = (np.asarray(jax.device_get(o))
                      for o in dense.score_group_arrays(gt, sr))
    got_s, got_m = (np.asarray(jax.device_get(o))
                    for o in fused.score_group_arrays(gt, sr))
    np.testing.assert_allclose(got_s, want_s, rtol=2e-3, atol=2e-3)
    # Sigmoid maps: BN-fold FP-order drift through tower + decoder
    # (see test_grouped_map_scorer_fused_tower_parity).
    np.testing.assert_allclose(got_m, want_m, atol=6e-3)
    assert float(np.abs(got_m - want_m).mean()) < 1e-4


def test_grouped_scorer_fused_tower_guards():
    """fused_tower rejects non-ResNet backbones and LoRA towers."""
    from srsem.core.config import BackboneConfig, GlobalModelConfig
    from srsem.eval.grouped import GroupedPairScorer

    vit = GlobalModelConfig(
        backbone=BackboneConfig(kind="vit_clip"), head="stages_vit", depth=2)
    with pytest.raises(ValueError, match="ResNet"):
        GroupedPairScorer(vit, {}, k=2, fused_tower=True)
    # GlobalModelConfig carries no lora_rank field; the guard still
    # protects configs that do (duck-typed here).
    base = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50"), head="stages_cnn", depth=2)

    class _LoraCfg:
        backbone = base.backbone
        head = base.head
        depth = base.depth
        lora_rank = 4

    with pytest.raises(ValueError, match="LoRA"):
        GroupedPairScorer(_LoraCfg(), {}, k=2, fused_tower=True)


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["resnet50", "resnet50_clip"])
def test_fused_tower_matches_flax(kind):
    """Full fused tower (Pallas interiors in interpret mode) == the Flax
    tower on every tap and the pooled output, same param tree."""
    model = (ImageNetResNet50(dtype=jnp.float32) if kind == "resnet50"
             else ClipResNet50(dtype=jnp.float32, image_size=64))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    # Non-trivial BN stats so the folding is actually exercised.
    params = jax.tree.map(lambda v: v, variables["params"])

    want_emb, want_taps = model.apply(variables, x)
    got_emb, got_taps = fused_apply(kind, params, x, dtype=jnp.float32,
                                    interpret=True)

    assert set(got_taps) == set(want_taps)
    for nm in want_taps:
        np.testing.assert_allclose(
            np.asarray(got_taps[nm]), np.asarray(want_taps[nm]),
            rtol=1e-3, atol=1e-3, err_msg=f"tap {nm} ({kind})")
    np.testing.assert_allclose(np.asarray(got_emb), np.asarray(want_emb),
                               rtol=1e-3, atol=1e-3)


def test_fused_bottleneck_tiled_matches_whole_image():
    """Halo-tiled bottleneck == whole-image kernel == XLA chain, including
    the zero-halo edge tiles (h1 masking — conv2's SAME padding pads h1)."""
    from srsem.ops.fused_bottleneck import fused_bottleneck_tiled

    rng = np.random.default_rng(3)
    n, h, w, c, wd = 2, 16, 16, 64, 16
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    mk = lambda *s: jnp.asarray(  # noqa: E731
        rng.normal(size=s).astype(np.float32) * 0.1)
    w1, b1 = mk(c, wd), mk(wd)
    w2, b2 = mk(3, 3, wd, wd), mk(wd)
    w3, b3 = mk(wd, c), mk(c)

    want = fused_bottleneck(x, w1, b1, w2, b2, w3, b3,
                            compute_dtype=jnp.float32, interpret=True)
    for th in (2, 4, 8):
        got = fused_bottleneck_tiled(x, w1, b1, w2, b2, w3, b3, row_tile=th,
                                     compute_dtype=jnp.float32,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_fused_tower_stage0_tiled_matches_flax():
    """fuse_stages=(0,1,2,3): stage 0 routes through the halo-tiled kernel
    (TILED_STAGE_ROWS) and the full tower still matches the Flax tower."""
    from srsem.backbones.fused_resnet import fused_apply
    from srsem.backbones.resnet import ImageNetResNet50

    model = ImageNetResNet50(dtype=jnp.float32)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    want_emb, want_taps = model.apply(variables, x)
    got_emb, got_taps = fused_apply("resnet50", variables["params"], x,
                                    jnp.float32, interpret=True,
                                    fuse_stages=(0, 1, 2, 3))
    # f32 FP-order drift accumulates through all 16 blocks; activations
    # reach O(100), so tolerances are relative-dominated.
    np.testing.assert_allclose(np.asarray(got_emb), np.asarray(want_emb),
                               rtol=1e-3, atol=1e-3)
    for k in want_taps:
        np.testing.assert_allclose(np.asarray(got_taps[k]),
                                   np.asarray(want_taps[k]),
                                   rtol=1e-3, atol=1e-3)

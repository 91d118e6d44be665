"""Parity: fused Pallas decoder levels == CluUnet.decode_from_diffs.

The fused path folds serving BatchNorm (running statistics) into the conv
weights and runs each level as one VMEM-resident kernel
(srsem/ops/fused_decoder.py, interpret mode here).  Reference for the
level math: models/local_eval_models.py:38-82,117-124.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsem.models.local_models import (
    CluUnet,
    DEFAULT_FUSE_LEVELS,
    fused_serving_decode,
)


def _random_stats(variables, seed: int):
    """Perturb BN running stats so the fold is exercised non-trivially."""
    rng = np.random.default_rng(seed)

    def perturb(path, v):
        name = getattr(path[-1], "key", "")
        arr = np.asarray(v)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 2.0, arr.shape), arr.dtype)
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.3, arr.shape), arr.dtype)
        return v

    return {**variables,
            "batch_stats": jax.tree_util.tree_map_with_path(
                perturb, variables["batch_stats"])}


def _diffs_for(model, size: int, n: int, seed: int):
    rng = np.random.default_rng(seed)
    chans = (64, 256, 512, 1024, 2048)
    shapes = [(n, size // (2 ** (i + 1)), size // (2 ** (i + 1)), c)
              for i, c in enumerate(chans)]
    return [jnp.asarray(rng.uniform(0, 0.5, s).astype(np.float32) ** 2)
            for s in shapes]


@pytest.mark.slow
@pytest.mark.parametrize("v2", [False, True])
def test_fused_decode_matches_reference_decoder(v2):
    model = CluUnet(backbone_kind="resnet50_clip", v2=v2,
                    decoder_dtype=jnp.float32, image_size=64)
    z = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), z, z, train=False)
    variables = _random_stats(variables, 1)

    diffs = _diffs_for(model, 64, 2, seed=2)
    img_sq = (jnp.asarray(
        np.random.default_rng(3).uniform(0, 0.1, (2, 64, 64, 1))
        .astype(np.float32)) if v2 else None)

    want = model.apply(variables, diffs, img_sq, False,
                       method=CluUnet.decode_from_diffs)
    # every level fused, whole-image kernels (interpret: no VMEM ceiling)
    got_all = fused_serving_decode(model, variables, diffs, img_sq,
                                   interpret=True,
                                   fuse_levels=(0, 1, 2, 3, 4),
                                   tiled_rows={})
    # the default split (levels 0-2 fused whole-image, 3-4 on folded XLA;
    # tiled_rows defaults empty — halo tiling is explicit-only since the
    # on-chip r3 A/B, see DEFAULT_TILED_LEVEL_ROWS)
    got_dflt = fused_serving_decode(model, variables, diffs, img_sq,
                                    interpret=True,
                                    fuse_levels=DEFAULT_FUSE_LEVELS)
    # explicit halo-tiled rows on every pair level
    got_tiled = fused_serving_decode(model, variables, diffs, img_sq,
                                     interpret=True,
                                     fuse_levels=DEFAULT_FUSE_LEVELS,
                                     tiled_rows={0: 8, 1: 4, 2: 2})
    want, got_all, got_dflt, got_tiled = map(np.asarray, jax.device_get(
        (want, got_all, got_dflt, got_tiled)))
    assert want.shape == got_all.shape == (2, 64, 64)
    np.testing.assert_allclose(got_all, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_dflt, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_tiled, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pair_scorer_fused_decoder_parity():
    """PairScorer(model_kind='local', fused_decoder=True) == dense maps,
    dense tower + fused Pallas decoder (interpret mode)."""
    from srsem.core.config import BackboneConfig, LocalModelConfig
    from srsem.eval.scorer import PairScorer
    from srsem.models.local_models import make_local_model

    cfg = LocalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"))
    z = jnp.zeros((1, 64, 64, 3))
    variables = make_local_model(cfg).init(jax.random.PRNGKey(7), z, z,
                                           train=False)
    rng = np.random.default_rng(8)
    a = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)

    dense = PairScorer(cfg, variables, batch_size=2, model_kind="local")
    fused = PairScorer(cfg, variables, batch_size=2, model_kind="local",
                       fused_decoder=True, fused_interpret=True)
    want = np.asarray(jax.device_get(dense.score_arrays(a, b)))
    got = np.asarray(jax.device_get(fused.score_arrays(a, b)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_grouped_map_scorer_fused_decoder_parity():
    """GroupedMapScorer(fused_decoder=True) == the plain grouped maps."""
    from srsem.core.config import BackboneConfig, LocalModelConfig
    from srsem.eval.grouped import GroupedMapScorer

    cfg = LocalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"))
    from srsem.models.local_models import make_local_model

    z = jnp.zeros((1, 64, 64, 3))
    variables = make_local_model(cfg).init(jax.random.PRNGKey(9), z, z,
                                           train=False)
    rng = np.random.default_rng(10)
    gt = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    sr = rng.integers(0, 256, (2, 2, 64, 64, 3), dtype=np.uint8)

    plain = GroupedMapScorer(cfg, variables, k=2, batch_size=2)
    fused = GroupedMapScorer(cfg, variables, k=2, batch_size=2,
                             fused_decoder=True, fused_interpret=True)
    want = np.asarray(jax.device_get(plain.score_arrays(gt, sr)))
    got = np.asarray(jax.device_get(fused.score_arrays(gt, sr)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_fused_decode_no_sigmoid_global_copy():
    """The head="unet_global" copy (sigmoid=False) decodes identically."""
    model = CluUnet(backbone_kind="resnet50_clip", sigmoid=False,
                    decoder_dtype=jnp.float32, image_size=64)
    z = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(4), z, z, train=False)
    variables = _random_stats(variables, 5)
    diffs = _diffs_for(model, 64, 2, seed=6)
    want = np.asarray(jax.device_get(model.apply(
        variables, diffs, None, False, method=CluUnet.decode_from_diffs)))
    got = np.asarray(jax.device_get(fused_serving_decode(
        model, variables, diffs, interpret=True, fuse_levels=(0, 1, 2))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_dual_scorer_fused_decoder_parity():
    """DualScorer(fused_decoder=True): scores unchanged, maps equal the
    plain grouped decode up to folded-BN FP-order drift."""
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
    gvars = make_global_model(gcfg).init(jax.random.PRNGKey(12), z, z)
    lvars = make_local_model(lcfg).init(jax.random.PRNGKey(13), z, z,
                                        train=False)
    gvars = jax.tree_util.tree_map_with_path(
        lambda path, v: v + 1.0
        if any(getattr(p, "key", None) == "bias" for p in path) else v,
        gvars)

    rng = np.random.default_rng(14)
    g, k = 2, 2
    gt = rng.integers(0, 256, (g, 64, 64, 3), dtype=np.uint8)
    sr = rng.integers(0, 256, (g, k, 64, 64, 3), dtype=np.uint8)

    dense = DualScorer(gcfg, lcfg, gvars, lvars, batch_size=g)
    fused = DualScorer(gcfg, lcfg, gvars, lvars, batch_size=g,
                       fused_decoder=True, fused_interpret=True)
    want_s, want_m = (np.asarray(jax.device_get(o))
                      for o in dense.score_group_arrays(gt, sr))
    got_s, got_m = (np.asarray(jax.device_get(o))
                    for o in fused.score_group_arrays(gt, sr))
    np.testing.assert_allclose(got_s, want_s, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got_m, want_m, atol=6e-3)
    assert float(np.abs(got_m - want_m).mean()) < 1e-4

"""DualScorer: shared-backbone global+CLU sweep (BASELINE config #5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from srsem.core.config import BackboneConfig, GlobalModelConfig, LocalModelConfig
from srsem.eval.dataset_sweep import DualScorer
from srsem.models.global_models import make_global_model
from srsem.models.local_models import make_local_model


@pytest.mark.slow
def test_dual_scorer_folders(tmp_path, rng):
    bb = BackboneConfig(kind="resnet50_clip", image_size=64,
                        compute_dtype="float32")
    gcfg = GlobalModelConfig(backbone=bb, head="stages_cnn", depth=3)
    lcfg = LocalModelConfig(backbone=bb)
    z = jnp.zeros((1, 64, 64, 3))
    gvars = make_global_model(gcfg).init(rng, z, z)
    lvars = make_local_model(lcfg).init(jax.random.PRNGKey(1), z, z, train=False)

    gt = tmp_path / "HQ"
    sr = tmp_path / "sr_out"
    gt.mkdir()
    sr.mkdir()
    r = np.random.default_rng(0)
    for i in range(3):
        arr = r.integers(0, 255, (80, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(gt / f"{i}.jpg")
        Image.fromarray(np.clip(arr + 10, 0, 255).astype(np.uint8)).save(
            sr / f"{i}.png")
    # corrupt SR image → NaN row
    open(sr / "3.png", "wb").write(b"junk")
    Image.fromarray(r.integers(0, 255, (80, 80, 3), dtype=np.uint8)).save(
        gt / "3.jpg")

    scorer = DualScorer(gcfg, lcfg, gvars, lvars, batch_size=2)
    df = scorer.score_folders(str(gt), str(sr))
    assert len(df) == 4
    assert df["score"].notna().sum() == 3
    assert np.isnan(df[df.image == "3"]["score"].iloc[0])
    ok = df[df.image != "3"]
    assert (ok["map_mean"] >= 0.5 - 1e-6).all()  # sigmoid-after-ReLU range
    assert (ok["score"] >= 0).all()


def test_dual_scorer_rejects_mismatched_backbones(rng):
    gcfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"))
    lcfg = LocalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"))
    with pytest.raises(ValueError):
        DualScorer(gcfg, lcfg, {}, {})


def test_nr_iqa_head_outputs_and_frozen_backbone(rng, tmp_path):
    """Native KonIQ++-style NR-IQA head: 5 outputs, trainable head only."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from srsem.eval.nr_iqa import OUTPUT_NAMES, NrIqaHead, NrIqaScorer

    model = NrIqaHead(compute_dtype=jnp.float32)
    x = jax.random.uniform(rng, (2, 64, 64, 3))
    vs = model.init(rng, x)
    out = model.apply(vs, x)
    assert out.shape == (2, 5)

    def loss(p):
        # Linear in the outputs: the head's final layer is zero-initialized
        # (srsem/eval/nr_iqa.py), so a squared loss would have zero grad at
        # init; sum(out) still exercises the full trainable path.
        return jnp.sum(model.apply({"params": p}, x))

    g = jax.grad(loss)(vs["params"])
    backbone_norm = sum(
        float(jnp.abs(t).sum()) for t in jax.tree.leaves(g["backbone"]))
    head_norm = sum(
        float(jnp.abs(t).sum())
        for k, v in g.items() if k.startswith("head")
        for t in jax.tree.leaves(v))
    assert backbone_norm == 0.0 and head_norm > 0.0

    img_path = str(tmp_path / "img.jpg")
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (80, 80, 3),
                                          dtype=np.uint8)).save(img_path)
    scorer = NrIqaScorer(vs, image_size=64, compute_dtype="float32")
    scores = scorer(img_path)
    assert set(scores) == set(OUTPUT_NAMES)
    assert all(np.isfinite(v) for v in scores.values())


@pytest.mark.slow
def test_dual_grouped_matches_pairwise(rng):
    """Grouped dual scoring (shared GT tower pass) equals per-pair dual
    scoring for both the global scores and the CLU maps."""
    bb = BackboneConfig(kind="resnet50_clip", image_size=64,
                        compute_dtype="float32")
    gcfg = GlobalModelConfig(backbone=bb, head="stages_cnn", depth=3)
    lcfg = LocalModelConfig(backbone=bb)
    z = jnp.zeros((1, 64, 64, 3))
    gvars = make_global_model(gcfg).init(rng, z, z)
    lvars = make_local_model(lcfg).init(jax.random.PRNGKey(1), z, z, train=False)

    scorer = DualScorer(gcfg, lcfg, gvars, lvars, batch_size=8)
    r = np.random.default_rng(2)
    g, k = 4, 2
    gt = r.integers(0, 256, (g, 64, 64, 3), dtype=np.uint8)
    sr = r.integers(0, 256, (g, k, 64, 64, 3), dtype=np.uint8)

    scores_g, maps_g = scorer.score_group_arrays(gt, sr)
    scores_g = np.asarray(jax.device_get(scores_g))
    maps_g = np.asarray(jax.device_get(maps_g))
    assert scores_g.shape == (g, k)
    assert maps_g.shape == (g, k, 64, 64)

    from srsem.core.meshes import batch_sharding

    data = batch_sharding(scorer.mesh)
    a = np.repeat(gt, k, axis=0)
    b = sr.reshape(g * k, 64, 64, 3)
    scores_p, maps_p = scorer._score_both(
        scorer._gvars, scorer._lvars,
        jax.device_put(a, data), jax.device_put(b, data))
    # Different batch shapes compile to different accumulation orders;
    # observed drift is ~3e-4 relative through the 50-layer tower.
    np.testing.assert_allclose(scores_g.reshape(-1),
                               np.asarray(jax.device_get(scores_p)),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(maps_g.reshape(g * k, 64, 64),
                               np.asarray(jax.device_get(maps_p)),
                               rtol=2e-3, atol=1e-2)

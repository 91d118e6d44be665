"""Grouped GT-vs-K-SR scorer: numerics equal the pairwise scorer, with
(1+K)/(2K) of the tower passes (srsem/eval/grouped.py)."""

import numpy as np
import pytest
from PIL import Image

import jax

from srsem.core.config import BackboneConfig, GlobalModelConfig
from srsem.eval.grouped import GroupedPairScorer
from srsem.eval.scorer import PairScorer
from srsem.models.global_models import make_global_model


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn", depth=2)
    model = make_global_model(cfg)
    z = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(3), z, z)
    return cfg, variables


@pytest.mark.slow
def test_grouped_matches_pairwise(setup):
    cfg, variables = setup
    k, g = 3, 4
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 256, (g, 64, 64, 3), dtype=np.uint8)
    sr = rng.integers(0, 256, (g, k, 64, 64, 3), dtype=np.uint8)

    grouped = GroupedPairScorer(cfg, variables, k=k, batch_size=g)
    got = np.asarray(jax.device_get(grouped.score_arrays(gt, sr)))
    assert got.shape == (g, k)

    pair = PairScorer(cfg, variables, batch_size=16)
    a = np.repeat(gt, k, axis=0)
    b = sr.reshape(g * k, 64, 64, 3)
    pad = 16 - g * k  # pad to the mesh-divisible pairwise batch
    a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
    b = np.concatenate([b, np.zeros((pad,) + b.shape[1:], b.dtype)])
    want = np.asarray(jax.device_get(pair.score_arrays(a, b)))[: g * k]
    np.testing.assert_allclose(got.reshape(-1), want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_grouped_folder_set(setup, tmp_path):
    cfg, variables = setup
    rng = np.random.default_rng(1)
    gt_dir = tmp_path / "HQ"
    gt_dir.mkdir()
    sr_dirs = []
    for m in range(2):
        d = tmp_path / f"sr{m}"
        d.mkdir()
        sr_dirs.append(str(d))
    for i in range(3):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(gt_dir / f"im{i}.png")
        for m in range(2):
            noisy = np.clip(arr + rng.integers(-25, 25, arr.shape), 0, 255)
            Image.fromarray(noisy.astype(np.uint8)).save(
                tmp_path / f"sr{m}" / f"im{i}.png")
    # corrupt one SR file → NaN row
    (tmp_path / "sr0" / "im2.png").write_bytes(b"broken")

    scorer = GroupedPairScorer(cfg, variables, k=2, batch_size=4)
    df = scorer.score_folder_set(str(gt_dir), sr_dirs)
    assert len(df) == 3
    assert {"sr0", "sr1"} <= set(df.columns)
    assert np.isnan(df.loc[df.image_name == "im2", "sr0"]).all()
    good = df[df.image_name != "im2"]
    assert np.isfinite(good[["sr0", "sr1"]].to_numpy()).all()


@pytest.mark.slow
@pytest.mark.parametrize("v2", [False, True])
def test_grouped_map_matches_pairwise(v2):
    """GroupedMapScorer (shared GT tower pass + decode_from_diffs) equals
    per-pair CLU map scoring, for both the base and v2 (pixel-diff channel)
    variants."""
    import jax.numpy as jnp

    from srsem.core.config import LocalModelConfig
    from srsem.eval.grouped import GroupedMapScorer
    from srsem.models.local_models import make_local_model

    bb = BackboneConfig(kind="resnet50_clip", image_size=64,
                        compute_dtype="float32")
    lcfg = LocalModelConfig(backbone=bb, v2=v2)
    model = make_local_model(lcfg)
    z = jnp.zeros((1, 64, 64, 3))
    lvars = model.init(jax.random.PRNGKey(5), z, z, train=False)

    g, k = 2, 3
    rng = np.random.default_rng(7)
    gt = rng.integers(0, 256, (g, 64, 64, 3), dtype=np.uint8)
    sr = rng.integers(0, 256, (g, k, 64, 64, 3), dtype=np.uint8)

    grouped = GroupedMapScorer(lcfg, lvars, k=k, batch_size=g)
    got = np.asarray(jax.device_get(grouped.score_arrays(gt, sr)))
    assert got.shape == (g, k, 64, 64)

    # Pairwise reference: direct (unsharded) model apply.  PairScorer's
    # mesh-sharded local path hits the XLA:CPU AllToAllThunk abort on the
    # virtual test mesh (CluUnet's internal concat([a, b]) resharding —
    # an XLA:CPU runtime bug, see CLAUDE.md); the numerics under test are
    # identical either way.
    a = np.repeat(gt, k, axis=0)
    b = sr.reshape(g * k, 64, 64, 3)
    pre = grouped.preprocess
    want = np.asarray(jax.device_get(model.apply(
        lvars, pre.device_normalize(jnp.asarray(a)),
        pre.device_normalize(jnp.asarray(b)), train=False)))
    np.testing.assert_allclose(got.reshape(g * k, 64, 64), want,
                               rtol=2e-3, atol=1e-2)


def test_grouped_rejects_mlp_heads(setup):
    cfg, variables = setup
    import dataclasses

    bad = dataclasses.replace(cfg, head="emb_lin")
    with pytest.raises(ValueError):
        GroupedPairScorer(bad, variables, k=2)


@pytest.mark.slow
@pytest.mark.parametrize("head,depth", [
    ("single_lin_vit", 2),   # shared head (reference :29-80)
    ("stages_vit", 1),       # every 3rd block (reference :116)
    ("wperlay_vit", 2),      # consecutive blocks (reference :218)
])
def test_grouped_vit_matches_pairwise(head, depth):
    """The fused (G, K) token head equals pairwise ViT scoring for all
    three token-head variants (srsem/models/global_models.py::
    fused_grouped_token_head)."""
    import jax.numpy as jnp

    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="vit_clip", image_size=64,
                                compute_dtype="float32", vit_width=96,
                                vit_depth=4, vit_heads=4),
        head=head, depth=depth)
    model = make_global_model(cfg)
    z = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(11), z, z)

    g, k = 2, 3
    rng = np.random.default_rng(13)
    gt = rng.integers(0, 256, (g, 64, 64, 3), dtype=np.uint8)
    sr = rng.integers(0, 256, (g, k, 64, 64, 3), dtype=np.uint8)

    grouped = GroupedPairScorer(cfg, variables, k=k, batch_size=g)
    got = np.asarray(jax.device_get(grouped.score_arrays(gt, sr)))
    assert got.shape == (g, k)

    pre = grouped.preprocess
    a = pre.device_normalize(jnp.asarray(np.repeat(gt, k, axis=0)))
    b = pre.device_normalize(jnp.asarray(sr.reshape(g * k, 64, 64, 3)))
    want = np.asarray(jax.device_get(model.apply(variables, a, b)))
    np.testing.assert_allclose(got.reshape(-1), want, rtol=1e-4, atol=1e-5)


def test_sr_model_names_disambiguate_collisions():
    """Two SR runs sharing a model dir basename must not collide into one
    score column (review r4: the dict comprehension silently dropped one
    model's scores)."""
    from srsem.eval.grouped import _sr_model_names

    assert _sr_model_names(["/runA/esrgan", "/runB/esrgan"]) == [
        "runA__esrgan", "runB__esrgan"]
    assert _sr_model_names(["/a/esrgan/", "/b/swinir"]) == [
        "esrgan", "swinir"]
    with pytest.raises(ValueError, match="unique"):
        _sr_model_names(["/a/m", "/a/m"])


def test_match_stems_deterministic_extension_tiebreak(tmp_path):
    """A stem present under two extensions picks the lexicographically
    first filename on every machine — never filesystem iteration order
    (review r4)."""
    from srsem.eval.grouped import _match_stems

    gt = tmp_path / "gt"
    sr = tmp_path / "sr"
    gt.mkdir()
    sr.mkdir()
    for n in ("im2.png", "im2.jpg", "im3.png"):
        (gt / n).write_bytes(b"x")
    (sr / "im2.png").write_bytes(b"x")
    (sr / "im3.jpg").write_bytes(b"x")
    stems, folder_files = _match_stems(str(gt), [str(sr)])
    assert stems == ["im2", "im3"]
    assert folder_files[0]["im2"].name == "im2.jpg"

    with pytest.raises(ValueError, match="common"):
        _match_stems(str(tmp_path / "gt"), [str(tmp_path)])

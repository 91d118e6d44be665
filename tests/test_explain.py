"""Explainability stack tests: IQA metrics, overlap metrics, Grad-CAM."""

import numpy as np
import pytest

from srsem.explain.iqa import psnr, psnr_map, ssim, ssim_map
from srsem.explain.overlap import binarize_top_percent, overlap_metrics
from srsem.explain.targets import (
    cosine_similarity_target,
    mse_target,
    vector_sum_target,
)


def test_psnr_basics(np_rng):
    x = np_rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    assert np.asarray(psnr(x, x))[0] > 100  # identical → huge PSNR
    y = np.clip(x + 0.1, 0, 1).astype(np.float32)
    vals = np.asarray(psnr(x, y))
    expected = 10 * np.log10(1.0 / np.mean((x[0] - y[0]) ** 2))
    assert vals[0] == pytest.approx(expected, abs=1e-3)


def test_ssim_identity_and_bounds(np_rng):
    x = np_rng.uniform(size=(1, 48, 48, 3)).astype(np.float32)
    assert np.asarray(ssim(x, x))[0] == pytest.approx(1.0, abs=1e-4)
    noise = np_rng.uniform(size=(1, 48, 48, 3)).astype(np.float32)
    val = float(np.asarray(ssim(x, noise))[0])
    assert -1.0 <= val < 0.8


def test_psnr_map_matches_direct_sliding_window(np_rng):
    """Cross-check the separable box-filter formulation against a direct
    per-window computation (the reference's unfold semantics,
    my_psnr_map.py:5-33)."""
    x = np_rng.uniform(size=(1, 12, 12, 3)).astype(np.float32)
    y = np_rng.uniform(size=(1, 12, 12, 3)).astype(np.float32)
    w = 5
    ours = np.asarray(psnr_map(x, y, window=w))[0]

    half = w // 2
    xp = np.pad(x[0], ((half, half), (half, half), (0, 0)), mode="edge")
    yp = np.pad(y[0], ((half, half), (half, half), (0, 0)), mode="edge")
    direct = np.zeros((12, 12), np.float32)
    for i in range(12):
        for j in range(12):
            px = xp[i:i + w, j:j + w]
            py = yp[i:i + w, j:j + w]
            mse = np.mean((px - py) ** 2)
            direct[i, j] = 10 * np.log10(1.0 / max(mse, 1e-12))
    np.testing.assert_allclose(ours, direct, atol=1e-2)


def test_ssim_map_shape(np_rng):
    x = np_rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    m = np.asarray(ssim_map(x, x))
    assert m.shape == (1, 22, 22)  # valid conv: 32 - 11 + 1
    np.testing.assert_allclose(m, 1.0, atol=1e-4)


def test_binarize_top_percent():
    x = np.arange(100, dtype=np.float32).reshape(10, 10)
    b = np.asarray(binarize_top_percent(x, top_percent=0.1))
    assert b.sum() == pytest.approx(10, abs=1)
    assert b[9, 9] == 1.0 and b[0, 0] == 0.0


def test_overlap_metrics_full_and_disjoint():
    a = np.zeros((10, 10), np.float32)
    a[:5] = 1.0
    full = overlap_metrics(a, a, top_percent=0.5)
    assert full[0] == pytest.approx(100.0)
    assert full[2] == pytest.approx(50.0)


def test_targets():
    import jax.numpy as jnp

    t = jnp.array([1.0, 0.0])
    assert float(mse_target(t)(jnp.array([1.0, 0.0]))) == 0.0
    assert float(cosine_similarity_target(t)(jnp.array([2.0, 0.0]))) == pytest.approx(1.0)
    assert float(vector_sum_target()(jnp.array([1.0, 2.0]))) == 3.0


def test_grad_cam_on_small_backbone(rng):
    """CAM from the ImageNet tower: highlights where the target gradient
    lives; shape/range contract."""
    import jax
    from functools import partial

    from srsem.backbones.resnet import ImageNetResNet50
    from srsem.explain.gradcam import grad_cam

    model = ImageNetResNet50(dtype=np.float32)
    img = jax.random.uniform(rng, (1, 64, 64, 3))
    vs = model.init(rng, img)

    def embed_fn(x, tap_offsets):
        return model.apply(vs, x, tap_offsets=tap_offsets)

    cam = grad_cam(embed_fn, img, "layer4.2.act3",
                   vector_sum_target(), out_hw=(64, 64))
    assert cam.shape == (1, 64, 64)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
    assert cam.max() > 0.0


def test_similarity_matrix_vectorized(np_rng):
    from srsem.explain.overlap import similarity_matrix
    from srsem.explain.targets import cosine_similarity_target

    v = np_rng.standard_normal((4, 8)).astype(np.float32)
    m = similarity_matrix(v, cosine_similarity_target)
    assert m.shape == (4, 4)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)
    np.testing.assert_allclose(m, m.T, atol=1e-5)


def test_grad_cam_matrix_all_pairs(rng):
    """n×n CAM grid (reference: gcam_utils.py:23-36)."""
    import jax

    from srsem.backbones.resnet import ImageNetResNet50
    from srsem.explain.gradcam import grad_cam_matrix
    from srsem.explain.targets import cosine_similarity_target

    model = ImageNetResNet50(dtype=np.float32)
    imgs = [jax.random.uniform(jax.random.PRNGKey(i), (1, 64, 64, 3))
            for i in range(2)]
    vs = model.init(rng, imgs[0])

    def embed_fn(x, tap_offsets):
        return model.apply(vs, x, tap_offsets=tap_offsets)

    embs = np.stack([np.asarray(embed_fn(im, None)[0])[0] for im in imgs])
    cams = grad_cam_matrix(embed_fn, imgs, embs, "layer4.2.act3",
                           cosine_similarity_target, out_hw=(64, 64))
    assert cams.shape == (2, 2, 64, 64)
    assert np.isfinite(cams).all()
    assert cams.max() <= 1.0 + 1e-6 and cams.min() >= 0.0


def test_saliency_path_for_conventions():
    """Relative paths keep reference parity (insert at component 2 —
    compute_metrics.py:130-134); absolute paths skip the root instead of
    producing /SaliencyMaps at the filesystem root; only the FILENAME's
    extension is swapped (review r4)."""
    import os

    from srsem.eval.approaches import saliency_path_for

    sep = os.sep
    assert saliency_path_for(sep.join(["imgs", "hq", "1.png"])) == \
        sep.join(["imgs", "SaliencyMaps", "hq", "1.npy"])
    assert saliency_path_for(sep.join(["", "data", "hq", "1.png"])) == \
        sep.join(["", "data", "SaliencyMaps", "hq", "1.npy"])
    assert saliency_path_for(sep.join(["a.b", "hq", "img"])) == \
        sep.join(["a.b", "SaliencyMaps", "hq", "img.npy"])


def test_iqa_maps_keep_shape_for_even_windows(np_rng):
    """The box filter pads (half, window-1-half): a symmetric pad + VALID
    conv returns (H+1, W+1) maps for EVEN windows, breaking the
    documented same-shape contract (review r5)."""
    import jax.numpy as jnp

    x = jnp.asarray(np_rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(np_rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    for w in (7, 8):
        m = np.asarray(psnr_map(x, y, window=w))
        assert m.shape == (1, 32, 32), (w, m.shape)
        assert np.isfinite(m).all()

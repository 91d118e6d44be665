"""Parity tests for resize ops against torch's two bilinear conventions —
the reference mixes ``UpsamplingBilinear2d`` (align_corners=True,
models/local_eval_models.py:84) and ``F.interpolate(align_corners=False)``
(models/local_eval_models.py:449)."""

import numpy as np
import pytest

from srsem.ops.image import normalize, resize_bilinear, upsample_x2_align_corners

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((7, 7), (14, 14)), ((14, 10), (28, 20)), ((224, 224), (56, 56)),
     ((13, 9), (7, 5)), ((4, 4), (9, 9))],
)
def test_resize_matches_torch(align_corners, in_hw, out_hw, np_rng):
    x = np_rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(x, out_hw, align_corners=align_corners))
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw, mode="bilinear", align_corners=align_corners,
        ).permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_upsample_x2_matches_torch_upsampling_bilinear2d(np_rng):
    x = np_rng.standard_normal((1, 7, 7, 5), dtype=np.float32)
    ours = np.asarray(upsample_x2_align_corners(x))
    theirs = (
        torch.nn.UpsamplingBilinear2d(scale_factor=2)(
            torch.from_numpy(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_resize_rank2_and_identity(np_rng):
    x = np_rng.standard_normal((8, 8), dtype=np.float32)
    same = np.asarray(resize_bilinear(x, (8, 8)))
    np.testing.assert_array_equal(same, x)
    up = resize_bilinear(x, (16, 16))
    assert up.shape == (16, 16)


def test_normalize():
    x = np.full((1, 2, 2, 3), 0.5, np.float32)
    y = np.asarray(normalize(x, (0.5, 0.5, 0.5), (0.25, 0.5, 1.0)))
    np.testing.assert_allclose(y, 0.0, atol=1e-7)


def test_mxu_resize_matches_gather_resize(np_rng):
    """The matmul (MXU) formulation must be numerically identical to the
    gather formulation for both alignment conventions."""
    import jax

    from srsem.ops.image import resize_bilinear_mxu

    x = np_rng.standard_normal((2, 7, 9, 5)).astype(np.float32)
    for ac in (True, False):
        for hw in ((14, 18), (5, 4), (21, 27)):
            a = np.asarray(resize_bilinear(x, hw, align_corners=ac))
            b = np.asarray(jax.jit(
                lambda v, hw=hw, ac=ac: resize_bilinear_mxu(
                    v, hw, align_corners=ac))(x))
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_numpy_resize_matches_jax_resize(np_rng):
    """The device-free numpy resize used by the visualization path
    (srsem/explain/visual.py:_resize_bilinear_np) pins the same
    half-pixel convention as resize_bilinear — overlays rendered by the
    jax-free CLI match what the device pipeline would produce."""
    from srsem.explain.visual import _resize_bilinear_np

    for in_hw, out_hw in (((8, 12), (32, 48)), ((13, 9), (7, 5)),
                          ((4, 4), (9, 9)), ((1, 5), (3, 15))):
        m = np_rng.standard_normal(in_hw).astype(np.float32)
        a = _resize_bilinear_np(m, out_hw)
        b = np.asarray(resize_bilinear(m[None, ..., None], out_hw))[0, ..., 0]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_numpy_resize_matches_jax_kernel(np_rng):
    """srsem.ops.npimage.resize_bilinear_np (the host loader-thread
    resize — no device dispatch from __getitem__) equals the JAX kernel
    across ranks and both align_corners conventions (review r4)."""
    from srsem.ops.npimage import resize_bilinear_np

    cases = (((8, 12), (32, 48)), ((13, 9), (7, 5)), ((4, 4), (9, 9)))
    for ac in (False, True):
        for in_hw, out_hw in cases:
            m2 = np_rng.standard_normal(in_hw).astype(np.float32)
            np.testing.assert_allclose(
                resize_bilinear_np(m2, out_hw, align_corners=ac),
                np.asarray(resize_bilinear(m2, out_hw, align_corners=ac)),
                rtol=1e-5, atol=1e-6)
            m4 = np_rng.standard_normal((2,) + in_hw + (3,)).astype(np.float32)
            np.testing.assert_allclose(
                resize_bilinear_np(m4, out_hw, align_corners=ac),
                np.asarray(resize_bilinear(m4, out_hw, align_corners=ac)),
                rtol=1e-5, atol=1e-6)


def test_interpolate_pos_embed_shared_helper(np_rng):
    """interpolate_pos_embed: no-op on matching grids, bilinear cls+grid
    resize otherwise, rank-2 and rank-3 layouts (shared by AttentionPool2d
    / ClipViT / fused attnpool — review r4)."""
    import jax
    import jax.numpy as jnp

    from srsem.ops.image import interpolate_pos_embed

    pos = np_rng.standard_normal((17, 8)).astype(np.float32)  # 4x4 grid
    same = interpolate_pos_embed(jnp.asarray(pos), (4, 4))
    np.testing.assert_array_equal(np.asarray(same), pos)

    out = np.asarray(interpolate_pos_embed(jnp.asarray(pos), (2, 2)))
    assert out.shape == (5, 8)
    np.testing.assert_allclose(out[0], pos[0])  # cls untouched
    want = np.asarray(jax.image.resize(
        jnp.asarray(pos[1:]).reshape(4, 4, 8), (2, 2, 8),
        method="bilinear")).reshape(4, 8)
    np.testing.assert_allclose(out[1:], want, rtol=1e-6)

    out3 = np.asarray(interpolate_pos_embed(jnp.asarray(pos)[None], (2, 2)))
    assert out3.shape == (1, 5, 8)
    np.testing.assert_allclose(out3[0], out, rtol=1e-6)

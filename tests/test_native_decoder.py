"""Native C++ decoder tests: build, decode both formats, PIL parity,
failure contract (srsem/native/decoder.cpp)."""

import numpy as np
import pytest
from PIL import Image

from srsem import native
from srsem.data.preprocess import Preprocess

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native decoder unavailable: {native.build_error()}")


@pytest.fixture()
def image_files(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (300, 400, 3), dtype=np.uint8)
    pj = str(tmp_path / "a.jpg")
    pp = str(tmp_path / "a.png")
    Image.fromarray(arr).save(pj, quality=95)
    Image.fromarray(arr).save(pp)
    return pj, pp, arr


def test_decode_shapes_and_formats(image_files):
    pj, pp, _ = image_files
    for p in (pj, pp):
        out = native.decode(p, 224, 1.0)
        assert out is not None and out.shape == (224, 224, 3)
        assert out.dtype == np.uint8


def test_png_resample_close_to_pil(image_files):
    """PNG is lossless, so the diff is pure resampling: PIL uses fixed-point
    bicubic, ours float — expect sub-LSB mean agreement."""
    _, pp, _ = image_files
    pre = Preprocess(size=224, crop_pct=1.0)
    pil = pre.decode_uint8(pp).astype(np.int32)
    nat = native.decode(pp, 224, 1.0).astype(np.int32)
    diff = np.abs(pil - nat)
    # Noise images are the resampling worst case; PIL's fixed-point
    # arithmetic rounds differently on a tiny tail of pixels.
    assert diff.mean() < 0.5
    assert np.quantile(diff, 0.999) <= 6
    assert diff.max() <= 16


def test_crop_pct_scales_before_crop(image_files):
    pj, _, _ = image_files
    full = native.decode(pj, 224, 1.0)
    cropped = native.decode(pj, 224, 0.875)  # scales up then center-crops
    assert full.shape == cropped.shape == (224, 224, 3)
    assert not np.array_equal(full, cropped)


def test_batch_failure_contract(image_files, tmp_path):
    pj, pp, _ = image_files
    bad = str(tmp_path / "bad.jpg")
    open(bad, "wb").write(b"junk")
    missing = str(tmp_path / "missing.jpg")
    imgs, ok = native.decode_batch([pj, bad, pp, missing], 64)
    assert imgs.shape == (4, 64, 64, 3)
    np.testing.assert_array_equal(ok, [True, False, True, False])
    assert imgs[1].sum() == 0  # failed rows zero-filled


def test_grayscale_png_promoted_to_rgb(tmp_path):
    gray = Image.fromarray(
        np.random.default_rng(1).integers(0, 256, (100, 120), dtype=np.uint8),
        mode="L")
    p = str(tmp_path / "gray.png")
    gray.save(p)
    out = native.decode(p, 64, 1.0)
    assert out is not None and out.shape == (64, 64, 3)
    # all three channels equal for grayscale input
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


@pytest.fixture()
def big_jpeg(tmp_path):
    """Smooth 1024px JPEG — the realistic large-SR-output decode case."""
    y, x = np.mgrid[0:1024, 0:1280]
    arr = np.stack([
        (128 + 100 * np.sin(x / 97.0) * np.cos(y / 71.0)),
        (128 + 100 * np.cos(x / 53.0)),
        (128 + 100 * np.sin((x + y) / 129.0)),
    ], axis=-1).clip(0, 255).astype(np.uint8)
    p = str(tmp_path / "big.jpg")
    Image.fromarray(arr).save(p, quality=92)
    return p


def test_fast_jpeg_close_to_full_decode(big_jpeg):
    """DCT-scaled decode (PIL draft semantics) stays LSB-scale close to the
    full decode: the scaled image's shortest edge still covers the resize
    target, so bicubic only ever downsamples."""
    full = native.decode(big_jpeg, 224, 1.0).astype(np.int32)
    fast = native.decode(big_jpeg, 224, 1.0, fast_jpeg=True).astype(np.int32)
    diff = np.abs(full - fast)
    assert diff.mean() < 1.5
    assert np.quantile(diff, 0.99) <= 6


def test_fast_jpeg_noop_on_small_images(image_files):
    """Images already at/below the resize target must decode identically:
    the scale selector picks 8/8 (full resolution)."""
    pj, _, _ = image_files  # 300x400 vs min_edge 256 -> scale 6/8? No:
    # min edge 300, target 256 -> smallest n with ceil(300n/8) >= 256 is 7,
    # so use a target above the edge to force the full-decode branch.
    full = native.decode(pj, 224, 224 / 300)  # pre-crop target 300
    fast = native.decode(pj, 224, 224 / 300, fast_jpeg=True)
    np.testing.assert_array_equal(full, fast)


def test_fast_jpeg_pil_draft_path(big_jpeg):
    """The PIL fallback uses Image.draft with the same contract."""
    slow = Preprocess(size=224, crop_pct=1.0).decode_uint8(big_jpeg)
    fast = Preprocess(size=224, crop_pct=1.0,
                      fast_jpeg=True).decode_uint8(big_jpeg)
    diff = np.abs(slow.astype(np.int32) - fast.astype(np.int32))
    assert fast.shape == (224, 224, 3)
    assert diff.mean() < 1.5


def test_fast_jpeg_batch(big_jpeg, image_files):
    pj, pp, _ = image_files
    imgs, ok = native.decode_batch([big_jpeg, pj, pp], 128, fast_jpeg=True)
    assert imgs.shape == (3, 128, 128, 3)
    assert ok.all()


def test_scorer_rejects_native_backend_when_unavailable(monkeypatch):
    """decode_backend='native' without the native library must fail at
    CONSTRUCTION: decode_uint8_native returns None for both 'library
    missing' and 'file undecodable', so without the guard a config error
    surfaced as an all-NaN result set."""
    import pytest

    from srsem import native
    from srsem.core.config import BackboneConfig, GlobalModelConfig
    from srsem.eval.scorer import PairScorer

    monkeypatch.setattr(native, "available", lambda: False)
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=32,
                                compute_dtype="float32"),
        head="stages_cnn", depth=1)
    with pytest.raises(RuntimeError, match="native decoder is unavailable"):
        PairScorer(cfg, {"params": {}}, batch_size=4,
                   decode_backend="native")

"""Folder-metrics behaviors: native-resolution scoring (the reference's
pyiqa loads full-size images — 1_compute_image_metrics.py:34-41),
shape-bucketed batching, and the NaN contracts."""

import numpy as np
from PIL import Image

from srsem.eval.folder_metrics import ImageQualityMetrics


def _save(path, arr):
    Image.fromarray(arr).save(path)


def test_native_resolution_buckets_and_mismatch_nan(tmp_path):
    rng = np.random.default_rng(0)
    # Two 72x64 pairs (non-square), one 48x48 pair, one mismatched pair.
    paths = []
    for i, (h, w) in enumerate([(72, 64), (72, 64), (48, 48)]):
        g = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        e = np.clip(g + rng.integers(-20, 20, g.shape), 0, 255).astype(np.uint8)
        gp, ep = tmp_path / f"g{i}.png", tmp_path / f"e{i}.png"
        _save(gp, g)
        _save(ep, e)
        paths.append((str(gp), str(ep)))
    # mismatched sizes → NaN row
    g = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    e = rng.integers(0, 255, (72, 64, 3), dtype=np.uint8)
    _save(tmp_path / "g3.png", g)
    _save(tmp_path / "e3.png", e)
    paths.append((str(tmp_path / "g3.png"), str(tmp_path / "e3.png")))

    calc = ImageQualityMetrics(image_size=None, batch_size=4)
    rows = calc.batch([p[0] for p in paths], [p[1] for p in paths])
    for row in rows[:3]:
        assert np.isfinite(row["SSIM"]) and np.isfinite(row["PSNR"])
        assert np.isfinite(row["LPIPS"])
        assert 0.0 < row["SSIM"] < 1.0
    assert np.isnan(rows[3]["SSIM"]) and np.isnan(rows[3]["LPIPS"])


def test_fixed_size_mode_still_single_bucket(tmp_path):
    rng = np.random.default_rng(1)
    gps, eps = [], []
    for i, (h, w) in enumerate([(40, 50), (64, 48)]):  # mixed sizes
        g = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        e = np.clip(g + 10, 0, 255).astype(np.uint8)
        _save(tmp_path / f"g{i}.png", g)
        _save(tmp_path / f"e{i}.png", e)
        gps.append(str(tmp_path / f"g{i}.png"))
        eps.append(str(tmp_path / f"e{i}.png"))
    calc = ImageQualityMetrics(image_size=64, batch_size=2)
    rows = calc.batch(gps, eps)
    assert all(np.isfinite(r["SSIM"]) for r in rows)

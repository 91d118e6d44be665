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


def test_chunked_decode_and_nr_on_mismatched_pairs(tmp_path):
    """(a) decode_chunk windows bound host memory without changing any
    row; (b) a batched KonIQ++ backend scores the NO-REFERENCE columns for
    every decodable eval image, including pairs whose GT shape mismatches
    (only the FR columns go NaN there)."""
    rng = np.random.default_rng(2)
    gps, eps = [], []
    for i in range(5):
        g = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        e = np.clip(g + rng.integers(-15, 15, g.shape), 0, 255).astype(np.uint8)
        _save(tmp_path / f"g{i}.png", g)
        _save(tmp_path / f"e{i}.png", e)
        gps.append(str(tmp_path / f"g{i}.png"))
        eps.append(str(tmp_path / f"e{i}.png"))
    # pair 5: GT/eval shapes disagree
    _save(tmp_path / "g5.png", rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
    _save(tmp_path / "e5.png", rng.integers(0, 255, (48, 48, 3), dtype=np.uint8))
    gps.append(str(tmp_path / "g5.png"))
    eps.append(str(tmp_path / "e5.png"))

    class FakeNR:
        def batch(self, ev):
            import numpy as _np
            return _np.ones((ev.shape[0], 5)) * 0.5

    calc = ImageQualityMetrics(image_size=None, batch_size=2,
                               koniqpp=FakeNR())
    full = calc.batch(gps, eps)
    windowed = calc.batch(gps, eps, decode_chunk=2)
    for a, b in zip(full, windowed):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, equal_nan=True)
    assert np.isnan(full[5]["SSIM"])          # FR columns NaN on mismatch
    assert full[5]["Koniq++IQA"] == 0.5       # NR columns still scored
    assert all(r["Koniq++blur"] == 0.5 for r in full[:5])


def test_resume_detects_changed_folder(tmp_path):
    """The CSV resume check compares STEMS, not just row count — renaming
    an image must trigger recompute instead of serving stale rows."""
    import os

    from srsem.eval.folder_metrics import process_image_folders

    rng = np.random.default_rng(3)
    gt_dir, ev_dir = tmp_path / "gt", tmp_path / "ev"
    gt_dir.mkdir(); ev_dir.mkdir()
    for name in ("a", "b"):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        _save(gt_dir / f"{name}.png", img)
        _save(ev_dir / f"{name}.png", img)
    calc = ImageQualityMetrics(image_size=32, batch_size=2)
    csv = str(tmp_path / "metrics.csv")
    df1 = process_image_folders(calc, str(gt_dir), str(ev_dir), csv)
    assert list(df1["image_name"]) == ["a", "b"]
    # identical folder → idempotent (returned untouched)
    mtime = os.path.getmtime(csv)
    df2 = process_image_folders(calc, str(gt_dir), str(ev_dir), csv)
    assert os.path.getmtime(csv) == mtime and list(df2["image_name"]) == ["a", "b"]
    # rename one stem in both folders: count unchanged, stems changed
    os.rename(gt_dir / "b.png", gt_dir / "c.png")
    os.rename(ev_dir / "b.png", ev_dir / "c.png")
    df3 = process_image_folders(calc, str(gt_dir), str(ev_dir), csv)
    assert list(df3["image_name"]) == ["a", "c"]

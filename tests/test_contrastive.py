"""Inpainting contrastive dataset tests
(reference: datasets/global_eval_torch_ds.py:35-186)."""

import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from srsem.data.contrastive import (
    InpaintContrastiveDataset,
    grow_box_to_size,
    parse_bbox_string,
)


def test_parse_bbox_string():
    # floor x0/y0, ceil w/h (reference :177-186)
    assert parse_bbox_string("[10.7,20.2,30.1,40.9]") == [10, 20, 31, 41]


def test_grow_box_prefers_side_with_room():
    # Box near the left edge: growth should go right.
    x0, y0, x1, y1 = grow_box_to_size(0, 0, 50, 50, 224, 400, 300)
    assert x0 == 0 and x1 == 224
    assert y0 == 0 and y1 == 224
    # Box near the right edge: growth goes left.
    x0, _, x1, _ = grow_box_to_size(350, 0, 400, 50, 224, 400, 300)
    assert x1 == 400 and x0 == 400 - 224


def test_grow_box_spills_remainder():
    # Centered box in a narrow image: both sides grow, clamped to edges.
    x0, _, x1, _ = grow_box_to_size(100, 0, 130, 50, 224, 230, 300)
    assert x0 == 0 or x1 == 230 or (x1 - x0) == 224


@pytest.fixture()
def inpaint_tree(tmp_path):
    root = tmp_path / "ImpaintSDD"
    (root / "impainted_proposals").mkdir(parents=True)
    (root / "positive_pairs").mkdir()
    rng = np.random.default_rng(0)

    def save(p, w=320, h=240):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(p)

    rows = []
    for j in range(2):
        gt = root / f"gt_{j}.jpg"
        save(gt)
        # negatives keyed by ROW index, positives by instance id (:49-57)
        save(root / "impainted_proposals" / f"{j}_0.png")
        save(root / "positive_pairs" / f"{100 + j}_0.png")
        save(root / "positive_pairs" / f"{100 + j}_1.png")
        rows.append({"id": 100 + j, "bbox": "[40.0,30.0,60.0,50.0]",
                     "gt_image_path": str(gt)})
    pd.DataFrame(rows).to_csv(root / "instances.csv", index=False)
    return str(root)


def test_inpaint_contrastive_sample_contract(inpaint_tree):
    ds = InpaintContrastiveDataset(inpaint_tree)
    assert len(ds) == 2
    imgs, labels, idx = ds[0]
    # 2 positives + resized GT → 3 positive labels, 1 negative
    assert imgs.shape == (4, 224, 224, 3)
    assert imgs.dtype == np.float32
    np.testing.assert_array_equal(labels, [1, 1, 1, 0])
    np.testing.assert_array_equal(idx, [0, 0, 0, 0])


def test_inpaint_skips_rows_missing_either_side(tmp_path):
    root = tmp_path / "x"
    (root / "impainted_proposals").mkdir(parents=True)
    (root / "positive_pairs").mkdir()
    gt = root / "gt.jpg"
    Image.new("RGB", (100, 100)).save(gt)
    pd.DataFrame([{"id": 5, "bbox": "[0,0,10,10]",
                   "gt_image_path": str(gt)}]).to_csv(
        root / "instances.csv", index=False)
    ds = InpaintContrastiveDataset(str(root))
    assert len(ds) == 0  # no positives/negatives on disk


def test_inpaint_tolerates_bookkeeping_files(inpaint_tree):
    """Stray non-numeric-prefixed files (.gitkeep, Thumbs.db) in the
    proposal/positive dirs are skipped, not a construction-time
    ValueError (review r4)."""
    import pathlib

    root = pathlib.Path(inpaint_tree)
    (root / "impainted_proposals" / ".gitkeep").write_text("")
    (root / "positive_pairs" / "Thumbs.db").write_bytes(b"\x00")
    ds = InpaintContrastiveDataset(inpaint_tree)
    assert len(ds) == 2
    imgs, labels, idx = ds[0]
    assert imgs.shape == (4, 224, 224, 3)

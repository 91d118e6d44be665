"""Data layer tests on synthetic folders mimicking the reference CSV/image
schemas (SURVEY.md §4: end-to-end smoke on tiny generated JPEGs + CSVs)."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from srsem.data.datasets import (
    ImpaintMapsDataset,
    KoniqPairsMapsDataset,
    Subset,
    UserStudyScores,
    seeded_split,
)
from srsem.data.loader import Loader, collate, pad_batch
from srsem.data.preprocess import Preprocess


@pytest.fixture()
def user_study_tree(tmp_path):
    root = tmp_path / "150_clip+koniq_set"
    (root / "SR").mkdir(parents=True)
    (root / "HQ").mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        hq_name = f"{i}.jpg"
        sr_name = f"bsrgan_{i}.png"
        Image.fromarray(rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)).save(
            root / "HQ" / hq_name)
        Image.fromarray(rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)).save(
            root / "SR" / sr_name)
        rows.append({"Super Resolution Image": sr_name,
                     "Answer": "Yes" if i % 2 == 0 else "No"})
    csv = tmp_path / "study.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv), str(root)


def test_user_study_scores_contract(user_study_tree):
    csv, root = user_study_tree
    pre = Preprocess(size=32, crop_pct=1.0)
    ds = UserStudyScores(csv, root, pre)
    assert len(ds) == 6
    (a, b), y = ds[0]
    assert a.shape == (32, 32, 3) and b.shape == (32, 32, 3)
    assert a.dtype == np.float32
    assert y == 1.0  # Answer == "Yes" binarization
    assert ds[1][1] == 0.0


def test_koniq_pairs_maps_dataset(tmp_path):
    pre = Preprocess(size=32, crop_pct=1.0)
    rng = np.random.default_rng(1)
    rows = []
    for i, ncaps in enumerate([1, 3, 5]):
        for name, sub in (("a", "HQ"), ("b", "SR")):
            img = Image.fromarray(
                rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
            img.save(tmp_path / f"{sub}_{i}.png")
        cosmap = rng.uniform(size=(10, 10)).astype(np.float32)
        pkl = tmp_path / f"map_{i}.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(cosmap, f)
        rows.append({"img_a_pth": str(tmp_path / f"HQ_{i}.png"),
                     "img_b_pth": str(tmp_path / f"SR_{i}.png"),
                     "out_paths": str(pkl), "ima_ncaps": ncaps})
    csv = tmp_path / "filt_refs.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    ds = KoniqPairsMapsDataset(str(csv), pre, imgamincaps=2)
    assert len(ds) == 2  # ncaps=1 filtered out
    (a, b), m = ds[0]
    assert m.shape == (32, 32)  # map resized to input resolution

    ds_hq = KoniqPairsMapsDataset(str(csv), pre, imgamincaps=0, only_hq=True)
    assert len(ds_hq) == 3  # img_a paths contain "HQ"

    # Binarization happens BEFORE the bilinear resize (reference:
    # datasets/local_eval_torch_ds.py:35-40), so resized values live in
    # [0, 1] but are not strictly binary.
    ds_bin = KoniqPairsMapsDataset(str(csv), pre, imgamincaps=2, threshold=0.5)
    (_, _), mb = ds_bin[0]
    assert mb.min() >= 0.0 and mb.max() <= 1.0
    raw = ds_bin.df.iloc[0]["out_paths"]
    with open(raw, "rb") as f:
        orig = pickle.load(f)
    # the continuous source map had non-binary values; binarize+resize keeps
    # plateaus at exactly 0/1 where the source was uniformly below/above
    assert not set(np.unique(orig)).issubset({0.0, 1.0})


def test_collate_pad_and_loader(user_study_tree):
    csv, root = user_study_tree
    pre = Preprocess(size=32, crop_pct=1.0)
    ds = UserStudyScores(csv, root, pre)
    loader = Loader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    ((a, b), y), mask = batches[-1]
    assert a.shape == (4, 32, 32, 3)  # padded to static shape
    assert mask.sum() == 2  # 6 items → final batch has 2 valid rows


def test_peek_batch_does_not_consume_epoch(user_study_tree):
    """The init probe (run_training/diffcache/statcache/multisweep) must
    not burn the seed+0 shuffle: peek_batch returns a full padded batch
    without advancing the epoch counter, so a cold-start run trains
    epoch 0 on exactly the ordering a no-peek run would see."""
    from srsem.data.loader import peek_first_batch

    csv, root = user_study_tree
    pre = Preprocess(size=32, crop_pct=1.0)
    ds = UserStudyScores(csv, root, pre)

    def first_labels(loader):
        return [np.asarray(y)[m > 0] for (( _a, _b), y), m in loader]

    peeked = Loader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    ((pa, _pb), _py), pmask = peek_first_batch(peeked)
    assert pa.shape == (4, 32, 32, 3) and pmask.shape == (4,)
    fresh = Loader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    for got, want in zip(first_labels(peeked), first_labels(fresh)):
        np.testing.assert_array_equal(got, want)
    # plain iterables fall back to next(iter(...))
    sentinel = [("batch0", "mask0")]
    assert peek_first_batch(sentinel) == ("batch0", "mask0")


def test_seeded_split_deterministic():
    tr1, va1 = seeded_split(100, 0.2, 42)
    tr2, va2 = seeded_split(100, 0.2, 42)
    np.testing.assert_array_equal(tr1, tr2)
    assert len(va1) == 20 and len(tr1) == 80
    assert set(tr1) | set(va1) == set(range(100))


def test_preprocess_center_crop_geometry():
    pre = Preprocess(size=32, crop_pct=1.0)
    img = Image.new("RGB", (100, 50), (255, 0, 0))
    out = pre.decode_uint8(img)
    assert out.shape == (32, 32, 3)
    # crop_pct < 1 scales up before cropping (timm semantics)
    pre2 = Preprocess(size=32, crop_pct=0.875)
    out2 = pre2.decode_uint8(img)
    assert out2.shape == (32, 32, 3)


def test_loader_propagates_dataset_errors():
    """A dataset exception must raise in the CONSUMER, not kill the
    producer thread and hang q.get() forever (review r4)."""

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise FileNotFoundError("missing image")
            z = np.zeros((4, 4, 3), np.float32)
            return (z, z), np.float32(0.0)

    loader = Loader(Broken(), batch_size=4, num_workers=2)
    with pytest.raises(FileNotFoundError, match="missing image"):
        list(loader)

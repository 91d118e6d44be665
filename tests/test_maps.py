"""Panoptic post-processing + cosine-map assembly tests
(reference: datasets/SRdatasetPseudolabelGen/oneformer_panoptic.py:18-97)."""

import numpy as np
import pytest

from srsem.maps.cosmap import assemble_cosine_map
from srsem.maps.panoptic import (
    filter_small_components,
    panoptic_to_masks,
    reassign_disconnected_components,
)
from srsem.pseudo.text_embed import HashingTextEmbedder


def test_reassign_splits_disconnected_instances():
    m = np.zeros((10, 10), np.int64)
    m[0:3, 0:3] = 5
    m[7:10, 7:10] = 5  # same id, disconnected
    out = reassign_disconnected_components(m)
    ids_a = np.unique(out[0:3, 0:3])
    ids_b = np.unique(out[7:10, 7:10])
    assert len(ids_a) == 1 and len(ids_b) == 1
    assert ids_a[0] != ids_b[0]


def test_filter_small_components_merges_into_dominant_neighbor():
    m = np.ones((20, 20), np.int64)
    m[10:, :] = 2
    m[0, 0] = 3  # single-pixel region — below any sane threshold
    out = filter_small_components(m, area_threshold_percent=1.0)
    assert 3 not in np.unique(out)
    assert out[0, 0] == 1  # surrounded by label 1


def test_filter_keeps_large_components():
    m = np.ones((10, 10), np.int64)
    m[5:, :] = 2
    out = filter_small_components(m, area_threshold_percent=5.0)
    assert set(np.unique(out)) == {1, 2}


def test_panoptic_to_masks_partition():
    m = np.array([[0, 0], [1, 2]])
    masks = panoptic_to_masks(m)
    assert set(masks) == {0, 1, 2}
    total = sum(mask.sum() for mask in masks.values())
    assert total == m.size


def test_assemble_cosine_map_paints_regions():
    panoptic = np.zeros((8, 8), np.int64)
    panoptic[:, 4:] = 1
    caps_a = {0: "a dog", 1: "a car"}
    caps_b = {0: "a dog", 1: "a bicycle"}
    cosmap, ncaps = assemble_cosine_map(
        panoptic, caps_a, caps_b, HashingTextEmbedder())
    assert ncaps == 2
    assert cosmap.shape == (8, 8)
    # identical captions → cosine 1 on the left region
    np.testing.assert_allclose(cosmap[:, :4], 1.0, atol=1e-5)
    assert cosmap[0, 7] < 0.999  # different captions on the right


def test_assemble_cosine_map_missing_caption_defaults():
    panoptic = np.zeros((4, 4), np.int64)
    panoptic[2:, :] = 7
    cosmap, ncaps = assemble_cosine_map(
        panoptic, {0: "x"}, {0: "x"}, HashingTextEmbedder(), default=0.0)
    np.testing.assert_allclose(cosmap[2:, :], 0.0)


def test_cosine_map_dataset_folder_aware_filenames(tmp_path):
    """Pairs sharing a stem across SR folders (the KonIQ layout keeps one
    filename per folder) must write DISTINCT .pkl maps — bare stems
    collided them all onto the first pair's map via skip-existing
    (review r4)."""
    import pickle

    import pandas as pd

    from srsem.maps.cosmap import write_cosine_map_dataset

    pan = np.zeros((4, 4), np.int64)
    pan[:, 2:] = 1
    caps_same = {0: "a dog", 1: "a cat"}
    caps_diff = {0: "a truck", 1: "a boat"}
    records = [
        ("HQ/123.jpg", "srA/123.png", pan, caps_same, caps_same),
        ("HQ/123.jpg", "srB/123.png", pan, caps_same, caps_diff),
    ]
    out_dir = tmp_path / "maps"
    csv = tmp_path / "filt_refs.csv"
    write_cosine_map_dataset(records, HashingTextEmbedder(),
                             str(out_dir), str(csv))
    refs = pd.read_csv(csv)
    assert len(set(refs["out_paths"])) == 2
    maps = []
    for p in refs["out_paths"]:
        with open(p, "rb") as f:
            maps.append(pickle.load(f))
    # identical captions → all-ones map; differing captions → not
    np.testing.assert_allclose(maps[0], 1.0, atol=1e-5)
    assert not np.allclose(maps[1], 1.0, atol=1e-5)

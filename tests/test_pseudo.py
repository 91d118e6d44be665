"""Pseudo-label stack tests: caption format round-trip, pair enumeration,
batched cosine scoring (reference: datasets/SRdatasetPseudolabelGen/)."""

import os

import numpy as np
import pytest

from srsem.pseudo.captions import (
    SEPARATOR,
    default_folders,
    enumerate_pairs,
    merge_caption_dicts,
    parse_caption_file,
    write_caption_file,
)
from srsem.pseudo.scoring import (
    cosine_similarity_matrix,
    rowwise_cosine,
    score_caption_pairs,
)
from srsem.pseudo.text_embed import HashingTextEmbedder


def test_caption_file_roundtrip(tmp_path):
    path = str(tmp_path / "wholeim_captions_batch.txt")
    caps = {"100": " A dog on grass.", "101": " A red car."}
    write_caption_file(path, caps, append=False)
    parsed = parse_caption_file(path)
    assert parsed == caps
    # Append more (the reference appends for resumability,
    # 1_qwen_koniq_captions_run.py:124).
    write_caption_file(path, {"102": " A tree."})
    parsed = parse_caption_file(path)
    assert len(parsed) == 3 and parsed["102"] == " A tree."


def test_caption_parse_handles_extension_in_name(tmp_path):
    path = str(tmp_path / "caps.txt")
    with open(path, "w") as f:
        f.write("Image: 123.jpg\nCaption: a photo" + SEPARATOR
                + "Image: 456.png\nCaption: another")
    parsed = parse_caption_file(path)
    assert parsed == {"123": " a photo", "456": " another"}


def test_default_folders_match_reference_layout():
    folders = default_folders("koniq-10k_sr")
    assert len(folders) == 16  # HQ + 5 models × 3 degradation factors
    assert folders[0].endswith("HQ")
    assert any("degfac_0.7_bsrgan" in f for f in folders)
    assert any(f.endswith("LQ_x4_stablesr_out") for f in folders)


def test_enumerate_pairs_hq_sr_plus_sr_combinations():
    folders = ["HQ", "srA", "srB"]
    listings = {"HQ": ["1.jpg"], "srA": ["1.png"], "srB": ["1.png"]}
    pairs = enumerate_pairs(folders, listings)
    # 3 HQ pairs (HQ self + 2 SR) + C(3,2)=3 SR×SR combinations
    assert len(pairs) == 6
    assert (os.path.join("HQ", "1.jpg"), os.path.join("srA", "1.png")) in pairs


def test_score_caption_pairs_embeds_each_unique_caption_once():
    calls = []

    class CountingEmbedder(HashingTextEmbedder):
        def encode(self, texts):
            calls.append(len(texts))
            return super().encode(texts)

    captions = {"a": "dog on grass", "b": "dog on the grass", "c": "red car"}
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "b")]
    cos = score_caption_pairs(captions, pairs, CountingEmbedder())
    assert len(calls) == 1 and calls[0] == 3  # unique captions only
    assert cos.shape == (4,)
    assert cos[0] == pytest.approx(cos[3])
    assert cos[0] > cos[1]  # similar captions score higher


def test_cosine_helpers():
    a = np.array([[1.0, 0.0], [0.0, 2.0]], np.float32)
    m = np.asarray(cosine_similarity_matrix(a, a))
    np.testing.assert_allclose(m, np.eye(2), atol=1e-6)
    r = np.asarray(rowwise_cosine(a, a))
    np.testing.assert_allclose(r, 1.0, atol=1e-6)


def test_hashing_embedder_deterministic_and_normalized():
    e = HashingTextEmbedder()
    v1 = e.encode(["hello world"])
    v2 = e.encode(["hello world"])
    np.testing.assert_array_equal(v1, v2)
    assert np.linalg.norm(v1[0]) == pytest.approx(1.0, abs=1e-5)


def test_score_c2i_and_embed_folder(tmp_path):
    """C2I: image-folder embedding + caption cosine (BASELINE config #2),
    using a stub image tower so no weights are needed."""
    from PIL import Image

    from srsem.data.preprocess import Preprocess
    from srsem.pseudo.scoring import embed_image_folder, score_c2i

    rng = np.random.default_rng(0)
    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(
            folder / f"{i}.jpg")
    open(folder / "bad.png", "wb").write(b"junk")

    class StubEncoder:
        def encode_image(self, batch):
            # mean-pool pixels into a fake 8-d embedding
            x = np.asarray(batch, np.float32).reshape(batch.shape[0], -1)
            return x[:, :8] + 1.0

    pre = Preprocess(size=16, crop_pct=1.0)
    embs = embed_image_folder(StubEncoder(), str(folder), pre, batch_size=2)
    assert set(embs) == {"0", "1", "2", "bad"}
    assert np.isnan(embs["bad"]).all()
    assert embs["0"].shape == (8,)

    caps = {"0": "a photo", "1": "a photo", "2": "other thing"}
    scores = score_c2i(caps, embs, HashingTextEmbedder(dim=8))
    assert set(scores) == {"0", "1", "2"}
    assert all(-1.001 <= v <= 1.001 for v in scores.values())


def test_enumerate_pairs_png_hq_folder():
    """The HQ path comes from the HQ folder's OWN listing, so a .png HQ
    set keys consistently with merge_caption_dicts instead of emitting
    nonexistent '<stem>.jpg' paths (review r4)."""
    folders = ["HQ", "srA"]
    listings = {"HQ": ["1.png"], "srA": ["1.png"]}
    pairs = enumerate_pairs(folders, listings)
    hq = os.path.join("HQ", "1.png")
    assert (hq, os.path.join("srA", "1.png")) in pairs
    assert all(a == hq for a, _ in pairs)


def test_merge_caption_dicts_mixed_extension_folder(tmp_path):
    """A mixed-extension folder must key each caption by the image's
    ACTUAL filename (what enumerate_pairs emits), not one folder-wide
    inferred extension — the reference's single-ext inference KeyErrors
    the scoring lookup on every other extension.  Uniform folders keep
    reference-identical keys."""
    import os

    from srsem.pseudo.captions import enumerate_pairs, merge_caption_dicts

    folder = tmp_path / "HQ"
    folder.mkdir()
    for name in ("1.jpg", "2.png"):
        (folder / name).write_bytes(b"x")
    merged = merge_caption_dicts([{"1": "cap one", "2": "cap two"}],
                                 [str(folder)])
    assert merged == {os.path.join(str(folder), "1.jpg"): "cap one",
                      os.path.join(str(folder), "2.png"): "cap two"}
    # every enumerate_pairs path resolves in the merged dict
    listings = {str(folder): ["1.jpg", "2.png"]}
    for a, b in enumerate_pairs([str(folder)], listings,
                                hq_folder=str(folder)):
        assert a in merged and b in merged

"""Evaluation-orchestrator tests: compute_embedding_sim_metrics, the three
approach drivers, concept clustering, and the VLM region-marking utilities
(reference: additional_approaches/src/eval_utils/, caption_generation_
vipllava.py)."""

import numpy as np
import pytest
from PIL import Image

from srsem.eval.approaches import (
    cluster_concepts,
    compute_embedding_sim_metrics,
    focus_embedding_similarity,
    saliency_path_for,
    simple_embedding_similarity,
)
from srsem.explain.targets import cosine_similarity_target, mse_target
from srsem.pseudo.text_embed import HashingTextEmbedder
from srsem.pseudo.vlm import StaticCaptioner, caption_regions, draw_mask_contour


class StubSuite:
    """Minimal embedder-suite double: embeddings = downsampled pixels."""

    def __init__(self, dim=16):
        self.dim = dim
        self.load_img = lambda path: self._load(path)
        self.img_embedder = lambda img: self._embed(img)
        self._text = HashingTextEmbedder(dim=dim)
        self.txt_embedder = lambda texts: self._text.encode(
            [texts] if isinstance(texts, str) else list(texts))

        class _Focus:
            focus_emb = None

            def __call__(inner, img):
                emb = self._embed(img)
                f = inner.focus_emb / np.linalg.norm(inner.focus_emb)
                return f[None] * (emb @ f)[:, None]

        self.focus_img_embedder = _Focus()

    def _load(self, path):
        arr = np.asarray(Image.open(path).convert("RGB").resize((16, 16)),
                         np.float32) / 255.0
        return arr[None]

    def _embed(self, img):
        x = np.asarray(img, np.float32).reshape(img.shape[0], -1)
        return x[:, : self.dim]


@pytest.fixture()
def image_pair(tmp_path):
    rng = np.random.default_rng(0)
    hq = str(tmp_path / "hq.png")
    rec = str(tmp_path / "rec.png")
    arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    Image.fromarray(arr).save(hq)
    Image.fromarray(np.clip(arr + 12, 0, 255).astype(np.uint8)).save(rec)
    return hq, rec


def test_compute_embedding_sim_metrics_no_gradcam(image_pair):
    hq, rec = image_pair
    suite = StubSuite()
    res = compute_embedding_sim_metrics(
        suite.img_embedder, None, None, hq, rec,
        cosine_similarity_target, suite.load_img, do_gradcam=False)
    assert {"hq_pth", "rec_pth", "score", "ssim", "psnr"} <= set(res)
    assert -1.0 <= res["score"] <= 1.0 + 1e-5
    assert 0 < res["ssim"] <= 1.0


def test_simple_and_focus_drivers_accumulate_rows(image_pair):
    hq, rec = image_pair
    suite = StubSuite()
    data = []
    simple_embedding_similarity(
        suite, None, [mse_target, cosine_similarity_target], None,
        hq, rec, data, do_gradcam=False)
    assert len(data) == 2
    assert {r["embedding_method"] for r in data} == {"simple"}

    tagger = lambda path: ["sky", "tree", "water", "cloud", "sun"]  # noqa: E731
    focus_embedding_similarity(
        suite, tagger, [mse_target], None, hq, rec, data, do_gradcam=False)
    focus_rows = [r for r in data if r["embedding_method"] == "focus"]
    assert 1 <= len(focus_rows) <= 3  # ≤3 clustered concepts
    assert all("img_element" in r for r in focus_rows)


def test_cluster_concepts_caps_at_three():
    emb = HashingTextEmbedder(dim=16)
    few = cluster_concepts(emb.encode, ["a", "b"])
    assert few == ["a", "b"]
    many = cluster_concepts(
        emb.encode, ["sky", "skies", "tree", "trees", "water", "ocean"])
    assert len(many) == 3


def test_saliency_path_convention():
    # reference inserts "SaliencyMaps" as 2nd path component
    # (compute_metrics.py:130-134)
    assert saliency_path_for("data/HQ/img1.jpg") == "data/SaliencyMaps/HQ/img1.npy"


def test_draw_mask_contour_marks_boundary_only():
    img = np.zeros((12, 12, 3), np.uint8)
    mask = np.zeros((12, 12), bool)
    mask[3:9, 3:9] = True
    out = draw_mask_contour(img, mask, thickness=1)
    magenta = (out == np.array([255, 0, 255])).all(axis=-1)
    assert magenta.sum() > 0
    assert not magenta[5, 5]       # interior untouched
    assert not magenta[0, 0]       # outside untouched
    assert magenta[3, 4]           # boundary marked


def test_caption_regions_one_per_mask():
    img = np.zeros((10, 10, 3), np.uint8)
    panoptic = np.zeros((10, 10), np.int64)
    panoptic[:, 5:] = 2
    caps = caption_regions(StaticCaptioner(), img, panoptic)
    assert set(caps) == {0, 2}
    assert all(isinstance(c, str) for c in caps.values())

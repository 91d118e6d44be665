"""Training-free embedding-metric evaluation orchestrators.

Rebuilds ``compute_embedding_sim_metrics``
(reference: additional_approaches/src/eval_utils/compute_metrics.py:81-168)
and the three approach drivers
(reference: additional_approaches/src/eval_utils/embedding_approaches.py:
6-75): per HQ/reconstruction pair compute the embedding-metric score,
classical SSIM/PSNR/LPIPS, and the Grad-CAM comparison suite against a
saliency map (PSNR/SSIM/overlap between the metric CAM, the plain-embedding
CAM, and the saliency map).

Saliency maps load from a parallel ``SaliencyMaps/`` tree with the same
relative path and a ``.npy``/``.pt`` stem (reference :130-134 inserts
"SaliencyMaps" as the second path component).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from srsem.explain.gradcam import grad_cam
from srsem.explain.iqa import psnr, ssim
from srsem.explain.overlap import overlap_metrics
from srsem.explain.targets import vector_sum_target
from srsem.ops.image import resize_bilinear


def saliency_path_for(img_path: str) -> str:
    """Insert "SaliencyMaps" as the 2nd path component, swap ext
    (reference: compute_metrics.py:130-134 — byte-identical on the
    relative paths the reference uses).  Two hardenings over the
    reference: absolute paths skip the leading root component (the
    reference's literal insert(1) would produce /SaliencyMaps/... at the
    filesystem root), and only the FILENAME's extension is swapped (a
    dotted parent directory must not truncate the path)."""
    parts = img_path.split(os.sep)
    parts.insert(2 if parts and parts[0] == "" else 1, "SaliencyMaps")
    name = parts[-1]
    parts[-1] = (name.rsplit(".", 1)[0] if "." in name else name) + ".npy"
    return os.sep.join(parts)


def load_saliency(img_path: str) -> Optional[np.ndarray]:
    path = saliency_path_for(img_path)
    if os.path.exists(path):
        return np.load(path)
    return None


def _map_pair_scores(a: np.ndarray, b: np.ndarray, prefix: str) -> Dict[str, float]:
    """PSNR/SSIM between two single-channel maps, b resized to a."""
    if b.shape != a.shape:
        b = np.asarray(resize_bilinear(b[None, ..., None], a.shape))[0, ..., 0]
    a4 = a[None, ..., None].astype(np.float32)
    b4 = b[None, ..., None].astype(np.float32)
    return {f"{prefix}_psnr": float(np.asarray(psnr(a4, b4))[0]),
            f"{prefix}_ssim": float(np.asarray(ssim(a4, b4))[0])}


def _overlap_scores(a, b, name_a: str, name_b: str) -> Dict[str, float]:
    pa, pb, pt = overlap_metrics(a, b)
    return {f"{name_a}_vsoverlap_{name_b}": pa,
            f"{name_b}_vsoverlap_{name_a}": pb,
            f"{name_a}_overlap_{name_b}": pt}


def compute_embedding_sim_metrics(
    embedder: Callable,
    embed_fn_for_cam: Optional[Callable],
    tap_name: Optional[str],
    hq_path: str,
    rec_path: str,
    target_factory: Callable,
    load_img: Callable,
    do_gradcam: bool = True,
    grid_hw=None,
    saliency: Optional[np.ndarray] = None,
    lpips_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """One pair × one metric → result dict (reference :81-168).

    ``embedder``: pixels → embedding (any of the suite's five embedders);
    ``embed_fn_for_cam``: (img, tap_offsets) → (emb, taps) for Grad-CAM;
    ``target_factory``: embedding → scalar target fn (srsem.explain.targets).
    """
    hq_img = load_img(hq_path)
    rec_img = load_img(rec_path)
    hq_emb = np.asarray(embedder(hq_img))
    rec_emb = np.asarray(embedder(rec_img))

    target = target_factory(hq_emb)
    data: Dict[str, float] = {
        "hq_pth": hq_path, "rec_pth": rec_path,
        "metric": getattr(target_factory, "__name__", str(target_factory)),
        "score": float(np.mean(np.asarray(target(rec_emb)))),
    }
    hq4 = np.asarray(hq_img, np.float32)
    rec4 = np.asarray(rec_img, np.float32)
    if hq4.ndim == 3:
        hq4, rec4 = hq4[None], rec4[None]
    data["ssim"] = float(np.asarray(ssim(hq4, rec4))[0])
    data["psnr"] = float(np.asarray(psnr(hq4, rec4))[0])
    if lpips_fn is not None:
        # reference computes lpips alongside ssim/psnr per pair
        # (compute_metrics.py:121-123); srsem.eval.lpips.make_lpips is the
        # real learned backend ([0,1] NHWC batches).
        data["lpips"] = float(np.asarray(lpips_fn(hq4, rec4))[0])

    if do_gradcam and embed_fn_for_cam is not None and tap_name is not None:
        out_hw = hq4.shape[1:3]
        cam = grad_cam(embed_fn_for_cam, rec_img, tap_name,
                       target_factory(hq_emb), out_hw, grid_hw)[0]
        hq_cam = grad_cam(embed_fn_for_cam, hq_img, tap_name,
                          vector_sum_target(), out_hw, grid_hw)[0]
        if saliency is None:
            saliency = load_saliency(hq_path)
        if saliency is not None:
            data.update(_map_pair_scores(cam, saliency, "gcam_saliency"))
            data.update(_map_pair_scores(hq_cam, saliency, "hqgcam_saliency"))
            data.update(_overlap_scores(hq_cam, saliency, "hqgcam", "saliency"))
            data.update(_overlap_scores(cam, saliency, "gradcam", "saliency"))
        data.update(_map_pair_scores(cam, hq_cam, "gcam_hqgcam"))
        data.update(_overlap_scores(hq_cam, cam, "hqgcam", "gradcam"))
    return data


def cluster_concepts(txt_embedder: Callable, concepts: List[str],
                     n_clusters: int = 3) -> List[str]:
    """KMeans-cluster concept embeddings and keep one representative per
    cluster — ≤3 focus concepts (reference: embedding_approaches.py:6-32;
    note the reference keeps the concepts indexed by np.unique of the
    labels, i.e. the first ``n_clusters`` indices — reproduced)."""
    if len(concepts) <= n_clusters:
        return list(concepts)
    from sklearn.cluster import KMeans

    embs = np.asarray(txt_embedder(concepts))
    labels = KMeans(n_clusters=n_clusters, random_state=42).fit_predict(embs)
    keep_idx = np.unique(labels)
    return list(np.array(concepts)[keep_idx])


def simple_embedding_similarity(suite, ram_projector, target_factories,
                                tap_name, hq_pth, rec_pth, data: list,
                                do_gradcam=True, embed_fn_for_cam=None,
                                grid_hw=None):
    """(reference: embedding_approaches.py:35-44)"""
    for factory in target_factories:
        res = compute_embedding_sim_metrics(
            suite.img_embedder, embed_fn_for_cam, tap_name, hq_pth, rec_pth,
            factory, suite.load_img, do_gradcam, grid_hw)
        res["embedding_method"] = "simple"
        data.append(res)


def focus_embedding_similarity(suite, ram_tagger, target_factories, tap_name,
                               hq_pth, rec_pth, data: list, do_gradcam=True,
                               embed_fn_for_cam=None, grid_hw=None):
    """RAM tags → ≤3 clustered concepts → per-concept focus scoring
    (reference: embedding_approaches.py:46-62)."""
    elements = cluster_concepts(suite.txt_embedder, list(ram_tagger(hq_pth)))
    for elem in elements:
        focus_emb = np.asarray(suite.txt_embedder([elem]))[0]
        suite.focus_img_embedder.focus_emb = focus_emb
        for factory in target_factories:
            res = compute_embedding_sim_metrics(
                suite.focus_img_embedder, embed_fn_for_cam, tap_name,
                hq_pth, rec_pth, factory, suite.load_img, do_gradcam, grid_hw)
            res["img_element"] = elem
            res["embedding_method"] = "focus"
            data.append(res)


def splice_focus_embedding_similarity(suite, target_factories, tap_name,
                                      hq_pth, rec_pth, data: list, rank=None,
                                      do_gradcam=True, embed_fn_for_cam=None,
                                      grid_hw=None):
    """(reference: embedding_approaches.py:64-75)"""
    if rank is not None:
        suite.splice_focus_img_embedder.rank = rank
    for factory in target_factories:
        res = compute_embedding_sim_metrics(
            suite.splice_focus_img_embedder, embed_fn_for_cam, tap_name,
            hq_pth, rec_pth, factory, suite.load_img, do_gradcam, grid_hw)
        res["embedding_method"] = "splice_focus"
        res["rank"] = rank
        data.append(res)

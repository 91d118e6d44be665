"""Index readers + sample builders for the four reference datasets.

All return numpy samples shaped ``((img_a, img_b), label)`` matching the
reference's Dataset contracts (SURVEY.md §2.3).  They are plain Python
sequences — batching/prefetch live in srsem.data.loader.
"""

from __future__ import annotations

import os
import pickle
from itertools import combinations
from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from srsem.data.preprocess import Preprocess
from srsem.ops.npimage import resize_bilinear_np


class UserStudyScores:
    """User-study pair dataset for the global regressor.

    Mirrors the working inline copy in the training script
    (reference: CLIPLPIPS_REG_training_sweep_example.py:16-39): the HQ
    filename is derived from the SR name (``sr.split("_")[-1]``,
    ``.png``→``.jpg``), images live under ``<root>/SR`` and ``<root>/HQ``,
    and the label is the binarized answer (``Answer == "Yes" → 1.0``) — or
    the raw ``userStudyScores`` column when present
    (reference: datasets/global_eval_torch_ds.py:4-23).
    """

    def __init__(self, csv_path: str, root: str, preprocess: Preprocess):
        self.df = pd.read_csv(csv_path)
        self.root = root
        self.preprocess = preprocess
        if "img_names" in self.df.columns:
            self._name_col, self._score_col = "img_names", "userStudyScores"
        else:
            self._name_col, self._score_col = "Super Resolution Image", "Answer"

    def __len__(self) -> int:
        return len(self.df)

    def paths(self, idx: int) -> Tuple[str, str]:
        sr_name = self.df.iloc[idx][self._name_col]
        hq_name = sr_name.split("_")[-1].replace(".png", ".jpg")
        return (os.path.join(self.root, "SR", sr_name),
                os.path.join(self.root, "HQ", hq_name))

    def label(self, idx: int) -> float:
        row = self.df.iloc[idx]
        if self._score_col == "Answer":
            return 1.0 if row["Answer"] == "Yes" else 0.0
        return float(row[self._score_col])

    def __getitem__(self, idx: int):
        sr, hq = self.paths(idx)
        return ((self.preprocess(sr), self.preprocess(hq)),
                np.float32(self.label(idx)))


class KoniqPairsMapsDataset:
    """Cosine-map pair dataset for CLU training.

    Mirrors ``KoNiqPairsDataset_maps``
    (reference: datasets/local_eval_torch_ds.py:10-42): filter rows by
    ``ima_ncaps >= imgamincaps`` and optionally HQ-only; load the pickled
    cosine map; optionally binarize at ``threshold``; bilinearly resize the
    map (align_corners=False) to the model input resolution.
    """

    def __init__(self, csv_path: str, preprocess: Preprocess,
                 only_hq: bool = False, imgamincaps: int = 2,
                 threshold: Optional[float] = None,
                 thresholds: Optional[Sequence[Optional[float]]] = None):
        df = pd.read_csv(csv_path)
        df = df[df["ima_ncaps"] >= imgamincaps]
        if only_hq:
            df = df[df["img_a_pth"].str.contains("HQ")]
        self.df = df.reset_index(drop=True)
        self.preprocess = preprocess
        self.threshold = threshold
        # Multi-threshold mode (the shared-tower CLU sweep,
        # srsem/train/multisweep.py): emit ONE label per threshold,
        # stacked (T, H, W), each prepared binarize-THEN-resize exactly
        # like the single-threshold path — the images and pickle are
        # decoded once for all T points.
        self.thresholds = list(thresholds) if thresholds is not None else None

    def __len__(self) -> int:
        return len(self.df)

    def _prepare_map(self, cosmap: np.ndarray, t: Optional[float],
                     hw) -> np.ndarray:
        if t is not None:
            cosmap = (cosmap > t).astype(np.float32)
        # Pure-numpy on host: a jnp resize here would dispatch a tiny op
        # to the default device from every loader worker thread,
        # serializing against the jitted train step on the one-claim axon
        # TPU (srsem/ops/npimage.py — parity-pinned vs the JAX kernel).
        return resize_bilinear_np(cosmap, hw, align_corners=False)

    def __getitem__(self, idx: int):
        row = self.df.iloc[idx]
        img_a = self.preprocess(row["img_a_pth"])
        img_b = self.preprocess(row["img_b_pth"])
        with open(row["out_paths"], "rb") as f:
            cosmap = np.asarray(pickle.load(f), dtype=np.float32)
        hw = (img_a.shape[0], img_a.shape[1])
        if self.thresholds is not None:
            label = np.stack(
                [self._prepare_map(cosmap, t, hw) for t in self.thresholds])
        else:
            label = self._prepare_map(cosmap, self.threshold, hw)
        return ((img_a, img_b), label)


class ImpaintMapsDataset:
    """COCO-inpainting map dataset.

    Mirrors ``ImpaintDS_maps`` (reference: datasets/local_eval_torch_ds.py:
    44-108): CSV rows (gt_image_path, impainted_pth, segmentation_map_path)
    plus all same-image positive-pair ``combinations`` appended; label map is
    the inverted normalized segmentation mask — all-zeros (after inversion,
    all-ones is NOT what the reference produces: a black mask normalizes to
    the most-negative value, so parity keeps the reference's exact recipe:
    run the mask through the image preprocessor, take channel 0, divide by
    the max, invert).
    """

    def __init__(self, csv_path: str, preprocess: Preprocess):
        df = pd.read_csv(csv_path)
        folder = os.path.dirname(csv_path) or "."
        pos_dir = os.path.join(folder, "positive_pairs")
        if os.path.isdir(pos_dir):
            groups: dict = {}
            for im in sorted(os.listdir(pos_dir)):
                key = im.split(".")[0].split("_")[0]
                groups.setdefault(key, []).append(os.path.join(pos_dir, im))
            combis = []
            for ims in groups.values():
                combis += list(combinations(ims, 2))
            if combis:
                df = pd.concat(
                    [df, pd.DataFrame(combis, columns=["gt_image_path", "impainted_pth"])],
                    ignore_index=True)
        self.df = df.reset_index(drop=True)
        self.preprocess = preprocess

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, idx: int):
        from PIL import Image

        row = self.df.iloc[idx]
        img_a = self.preprocess(row["gt_image_path"])
        img_b = self.preprocess(row["impainted_pth"])
        seg = row.get("segmentation_map_path")
        if seg is None or (isinstance(seg, float) and np.isnan(seg)):
            with Image.open(row["gt_image_path"]) as ref_im:
                mask_img = Image.new("RGB", ref_im.size, color=(0, 0, 0))
            mask = self.preprocess(mask_img)
        else:
            mask = self.preprocess(seg)
        mask = mask[..., 0]
        mask = mask / mask.max()
        cosmap = 1.0 - mask
        return ((img_a, img_b), cosmap.astype(np.float32))


def seeded_split(n: int, val_fraction: float, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """80/20-style split with a fixed seed — the reference uses
    ``torch.random_split`` seeded 42
    (reference: CLIPLPIPS_REG_training_sweep_example.py:144-156)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_val = int(round(n * val_fraction))
    return perm[n_val:], perm[:n_val]


class Subset:
    def __init__(self, base, indices: Sequence[int]):
        self.base = base
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.base[self.indices[i]]

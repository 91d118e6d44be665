"""SR-output filtering metrics over image folders.

Rebuilds the reference's stage-1 filtering job
(reference: datasets/SRdatasetPseudolabelGen/1_compute_image_metrics.py):
match GT/eval files by stem, compute per-pair quality metrics, write a
``metrics.csv`` per folder with NaN rows for failures, and sweep the five
SR-model output folders.

TPU-first restructure: the reference scores one pair at a time through
pyiqa on GPU inside a 3-worker process pool (:164-182).  Here decode runs
on host threads while SSIM/PSNR/LPIPS evaluate as ONE jitted batch program
on device; folders stream sequentially through the same compiled function.
Metric backends:

* SSIM / PSNR — native JAX (srsem.explain.iqa);
* LPIPS — the real learned metric (srsem.eval.lpips: AlexNet tower,
  unit-normalized features, learned 1x1 lins — pyiqa's default net);
  pass ``lpips_params`` (from ``convert_lpips``) for the official
  checkpoint, or ``lpips_fn`` for any custom backend (e.g. the
  uniform-weight pyramid stand-in kept below);
* KonIQ++ — an external no-reference model in the reference (vendored
  checkout, not in its tree); pluggable callable here, NaN columns when
  absent — the same degradation the reference exhibits without the
  Koniqpp/ checkout.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from PIL import Image

from srsem.data.preprocess import IMG_EXTENSIONS  # noqa: F401 (re-export)
from srsem.explain.iqa import psnr as psnr_fn, ssim as ssim_fn

KONIQPP_COLUMNS = ("Koniq++IQA", "Koniq++blur", "Koniq++artifacts",
                   "Koniq++contrast", "Koniq++color")


class ImageQualityMetrics:
    """Batched pair-metric evaluator.

    ``koniqpp``: optional callable path → dict with the five KonIQ++
    scores; ``lpips_fn``: optional callable (gt_batch, eval_batch) → (N,)
    distances (defaults to the real LPIPS architecture, srsem.eval.lpips,
    with ``lpips_params`` when given — the converted official checkpoint).
    """

    def __init__(self, image_size: Optional[int] = 224, batch_size: int = 32,
                 koniqpp: Optional[Callable] = None,
                 lpips_fn: Optional[Callable] = None,
                 lpips_params: Optional[dict] = None,
                 lpips_net: str = "alex"):
        """``image_size=None`` scores at NATIVE resolution like the
        reference (pyiqa loads full-size images —
        1_compute_image_metrics.py:34-41); batches group by shape, so a
        folder of uniform-size images still runs as one compiled program.
        An int forces a square resize (useful for mixed-size folders)."""
        self.image_size = image_size
        self.batch_size = batch_size
        self.koniqpp = koniqpp
        if lpips_fn is None:
            from srsem.eval.lpips import make_lpips

            lpips_fn = make_lpips(net=lpips_net, params=lpips_params,
                                  image_size=image_size or 224)
        self.lpips_fn = lpips_fn

        @jax.jit
        def _classical(gt, ev):
            return ssim_fn(gt, ev), psnr_fn(gt, ev)

        self._classical = _classical

    def _load(self, path: str) -> np.ndarray:
        img = Image.open(path).convert("RGB")
        if self.image_size is not None:
            img = img.resize((self.image_size, self.image_size), Image.BICUBIC)
        return np.asarray(img, np.float32) / 255.0

    def batch(self, gt_paths: Sequence[str], eval_paths: Sequence[str],
              workers: int = 8,
              decode_chunk: Optional[int] = None) -> List[Dict[str, float]]:
        """Metrics for matched path lists; failed rows carry NaNs
        (reference: 1_compute_image_metrics.py:119-134).

        Decode is CHUNKED (``decode_chunk`` pairs in flight, default
        4x batch_size): a reference-scale 10k-pair folder decoded up
        front would hold ~12 GB of float32 at 224px and far more in
        native-resolution mode — the window bounds host memory at
        O(decode_chunk) images while the device still sees full
        ``batch_size`` programs (shape buckets re-form per window)."""
        def safe_load(pair):
            try:
                return self._load(pair[0]), self._load(pair[1])
            except Exception:
                return None

        n = len(gt_paths)
        window = decode_chunk or max(4 * self.batch_size, 64)
        nan_row = {"SSIM": np.nan, "PSNR": np.nan, "LPIPS": np.nan,
                   **{c: np.nan for c in KONIQPP_COLUMNS}}
        rows = [dict(nan_row) for _ in range(n)]
        batched_nr = getattr(self.koniqpp, "batch", None)
        per_path_nr_idx: List[int] = []

        from srsem.ops.image import IMAGENET_MEAN, IMAGENET_STD, normalize

        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            for start in range(0, n, window):
                span = range(start, min(start + window, n))
                decoded = list(pool.map(
                    safe_load, ((gt_paths[i], eval_paths[i]) for i in span)))
                ok = [(i, d) for i, d in zip(span, decoded) if d is not None]
                per_path_nr_idx.extend(i for i, _ in ok)

                # FR metrics bucket by PAIR shape (native-resolution mode:
                # one bucket per image size; fixed-size mode degenerates
                # to a single bucket).  A pair whose two images disagree
                # in shape keeps its NaN FR columns — the reference's
                # pyiqa call would raise there too (:119-134).
                fr_buckets: Dict[tuple, List[int]] = {}
                # NR (KonIQ++) needs only the EVAL image, so it buckets by
                # eval shape over EVERY decodable row — a GT/eval shape
                # mismatch must not blank the no-reference columns.
                nr_buckets: Dict[tuple, List[int]] = {}
                local = {i: d for i, d in ok}
                for i, (g, e) in ok:
                    if g.shape == e.shape:
                        fr_buckets.setdefault(g.shape, []).append(i)
                    nr_buckets.setdefault(e.shape, []).append(i)

                for idxs in fr_buckets.values():
                    for s in range(0, len(idxs), self.batch_size):
                        chunk = idxs[s: s + self.batch_size]
                        gt = jnp.asarray(np.stack([local[i][0] for i in chunk]))
                        ev = jnp.asarray(np.stack([local[i][1] for i in chunk]))
                        ssim_v, psnr_v = self._classical(gt, ev)
                        lpips_v = self.lpips_fn(gt, ev)
                        for j, i in enumerate(chunk):
                            rows[i]["SSIM"] = float(ssim_v[j])
                            rows[i]["PSNR"] = float(psnr_v[j])
                            rows[i]["LPIPS"] = float(lpips_v[j])
                if batched_nr is not None:
                    # NR-IQA rides the already-decoded eval batch on
                    # device (ImageNet-normalized, the head's training-
                    # time input — srsem/train/nr_iqa.py) instead of a
                    # per-path re-decode.
                    for idxs in nr_buckets.values():
                        for s in range(0, len(idxs), self.batch_size):
                            chunk = idxs[s: s + self.batch_size]
                            ev = jnp.asarray(
                                np.stack([local[i][1] for i in chunk]))
                            nr = np.asarray(batched_nr(
                                normalize(ev, IMAGENET_MEAN, IMAGENET_STD)))
                            for j, i in enumerate(chunk):
                                rows[i].update(dict(zip(KONIQPP_COLUMNS,
                                                        nr[j].tolist())))
        if self.koniqpp is not None and batched_nr is None:
            for i in per_path_nr_idx:
                try:
                    rows[i].update(self.koniqpp(eval_paths[i]))
                except Exception:
                    pass
        return rows

    def __call__(self, gt_path: str, eval_path: str) -> Dict[str, float]:
        return self.batch([gt_path], [eval_path])[0]


def make_pyramid_lpips(image_size: int = 224):
    """LPIPS-style perceptual distance over the frozen ImageNet ResNet-50
    pyramid: unit-normalize each tapped stage channelwise, mean squared
    difference per stage, mean over stages.  Uniform-weight LPIPS — the
    learned 1x1 heads are exactly the global regressor
    (srsem.models.global_models), which can replace this when trained."""
    from srsem.backbones.resnet import IMAGENET_STAGE_TAPS, ImageNetResNet50
    from srsem.ops.image import IMAGENET_MEAN, IMAGENET_STD, normalize

    model = ImageNetResNet50(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)))

    @jax.jit
    def lpips(gt, ev):
        n = gt.shape[0]
        x = jnp.concatenate([gt, ev], axis=0)
        x = normalize(x, IMAGENET_MEAN, IMAGENET_STD)
        _, taps = model.apply(variables, x)
        total = 0.0
        for name in IMAGENET_STAGE_TAPS:
            f = taps[name].astype(jnp.float32)
            f = f / jnp.linalg.norm(f, axis=-1, keepdims=True).clip(1e-9)
            diff = (f[:n] - f[n:]) ** 2
            total = total + jnp.mean(diff, axis=(1, 2, 3))
        return total / len(IMAGENET_STAGE_TAPS)

    return lpips


def process_image_folders(metrics_calc: ImageQualityMetrics, gt_folder: str,
                          eval_folder: str, output_csv: str) -> pd.DataFrame:
    """Match by stem, score, write CSV (reference:
    1_compute_image_metrics.py:62-155).  Resumable: an existing complete CSV
    is returned untouched (idempotent folder jobs, SURVEY.md §5)."""
    gt_files = {f.stem: f for f in Path(gt_folder).iterdir()
                if f.is_file() and f.suffix.lower() in IMG_EXTENSIONS}
    eval_files = {f.stem: f for f in Path(eval_folder).iterdir()
                  if f.is_file() and f.suffix.lower() in IMG_EXTENSIONS}
    common = sorted(set(gt_files) & set(eval_files))
    if not common:
        raise ValueError("No matching image pairs found between the two folders")

    if os.path.exists(output_csv):
        existing = pd.read_csv(output_csv)
        # Row COUNT alone is an unsound idempotence check: a renamed or
        # replaced image keeps the count equal while the CSV rows go
        # stale.  The stem list must match exactly (order included — rows
        # are written in sorted-stem order).
        if ("image_name" in existing.columns
                and list(existing["image_name"].astype(str)) == list(common)):
            return existing

    gt_paths = [str(gt_files[n]) for n in common]
    eval_paths = [str(eval_files[n]) for n in common]
    rows = metrics_calc.batch(gt_paths, eval_paths)
    df = pd.DataFrame([
        {"image_name": n, "gt_path": g, "eval_path": e, **r}
        for n, g, e, r in zip(common, gt_paths, eval_paths, rows)
    ])
    df.to_csv(output_csv, index=False)
    return df


def run_folder_sweep(gt_folder: str, eval_folders: Sequence[str],
                     metrics_calc: Optional[ImageQualityMetrics] = None,
                     csv_name: str = "metrics.csv") -> Dict[str, pd.DataFrame]:
    """Sweep the SR-model output folders (the reference drives this with a
    3-worker process pool, :164-182; one process owns the TPU here, so
    folders stream through the same compiled batch program)."""
    metrics_calc = metrics_calc or ImageQualityMetrics()
    out = {}
    for folder in eval_folders:
        out[folder] = process_image_folders(
            metrics_calc, gt_folder, folder, os.path.join(folder, csv_name))
    return out

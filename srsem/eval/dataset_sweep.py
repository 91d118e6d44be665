"""Full SR-outputs dataset sweep: global scores + CLU maps in one pass.

BASELINE config #5: score the 10k GT/SR pair set with fused preprocessing,
the global regressor AND the CLU map model, sharded over the mesh.  The
reference would run these as two separate jobs, each with two frozen
backbone passes per pair; here the frozen tower runs ONCE per pair batch
and its tap pyramid feeds both the global head and the UNet decoder —
halving the dominant cost of running both evaluations.

Folder convention mirrors the reference's KonIQ SR layout
(reference: qwen_caps_embedding_script.py:59-76): a GT folder and SR-model
output folders with matching stems.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srsem.core.config import GlobalModelConfig, LocalModelConfig
from srsem.core.meshes import batch_sharding, create_mesh, replicated_sharding
from srsem.data.preprocess import Preprocess
from srsem.models.global_models import stage_taps_for
from srsem.models.local_models import CluUnet


class DualScorer:
    """Shared-backbone global + CLU scoring.

    Requires both models to use the same backbone kind/size so the frozen
    tower params can be shared (the flagship pairing: resnet50_clip).
    ``variables`` carries {"backbone", "aggregator", "decoder"} param trees
    (+ CLU batch_stats).
    """

    def __init__(self, global_cfg: GlobalModelConfig,
                 local_cfg: LocalModelConfig, global_variables,
                 local_variables, mesh=None, batch_size: int = 32,
                 num_workers: int = 16, decode_backend: str = "pil",
                 fused_tower: bool = False,
                 fused_decoder: bool = False,
                 fused_interpret: bool | None = None,
                 fast_jpeg: bool = False):
        if global_cfg.backbone.kind != local_cfg.backbone.kind:
            raise ValueError("global/local backbones must match to share taps")
        if fused_tower and global_cfg.backbone.kind not in (
                "resnet50", "resnet50_clip"):
            raise ValueError(
                f"fused_tower needs a ResNet backbone, got "
                f"{global_cfg.backbone.kind!r}")
        if fused_interpret is None:
            # See GroupedPairScorer: real Pallas kernel on TPU backends,
            # interpret elsewhere.
            fused_interpret = jax.default_backend() not in ("tpu", "axon")
        self.mesh = mesh or create_mesh()
        # The batch dim shards over `data`; round up so it divides evenly.
        n_data = self.mesh.shape["data"]
        self.batch_size = ((batch_size + n_data - 1) // n_data) * n_data
        self.num_workers = num_workers
        self.decode_backend = decode_backend
        self.preprocess = Preprocess.for_backbone(
            global_cfg.backbone.kind, global_cfg.backbone.image_size,
            fast_jpeg=fast_jpeg)

        lmodel = CluUnet(
            backbone_kind=local_cfg.backbone.kind, v2=local_cfg.v2,
            compute_dtype=jnp.dtype(local_cfg.backbone.compute_dtype),
            image_size=local_cfg.backbone.image_size)

        from srsem.backbones.resnet import (
            CLIP_STAGE_TAPS,
            CLIP_STEM_TAP,
            IMAGENET_STAGE_TAPS,
            IMAGENET_STEM_TAP,
            make_backbone,
        )

        backbone = make_backbone(global_cfg.backbone)
        tap_names = stage_taps_for(global_cfg.backbone.kind, global_cfg.depth)
        lmodel_tap_names = (
            (CLIP_STEM_TAP,) + CLIP_STAGE_TAPS
            if local_cfg.backbone.kind == "resnet50_clip"
            else (IMAGENET_STEM_TAP,) + IMAGENET_STAGE_TAPS)
        pre = self.preprocess

        kind = global_cfg.backbone.kind
        tower_dtype = jnp.dtype(global_cfg.backbone.compute_dtype)

        def tower(gvars, x):
            """One frozen-tower pass → taps (fused Pallas interiors when
            fused_tower; srsem/backbones/fused_resnet.py)."""
            if fused_tower:
                from srsem.backbones.fused_resnet import fused_apply

                return fused_apply(kind, gvars["params"]["backbone"], x,
                                   tower_dtype,
                                   interpret=fused_interpret)[1]
            return backbone.apply(
                {"params": gvars["params"]["backbone"]}, x)[1]

        def score_both(gvars, lvars, a_u8, b_u8):
            a = pre.device_normalize(a_u8)
            b = pre.device_normalize(b_u8)
            # One frozen-tower pass per image for BOTH models, as two
            # N-batch applies — an (a, b) concat forces a GSPMD all-to-all
            # reshard on multi-device meshes (frozen BN ⇒ identical
            # numerics either way).
            taps_a = tower(gvars, a)
            taps_b = tower(gvars, b)

            # Global head on squared diffs (aggregator applied directly).
            from srsem.models.global_models import (ConvHeadAggregator,
                                                    squared_diffs)

            diffs = squared_diffs(taps_a, taps_b, tap_names)
            agg = ConvHeadAggregator(len(tap_names))
            scores = agg.apply({"params": gvars["params"]["aggregator"]}, diffs)

            # CLU decoder over the same taps.
            if fused_decoder:
                # Fused Pallas decoder levels with serving BN folded
                # (srsem/models/local_models.py::fused_serving_decode).
                from srsem.models.local_models import fused_serving_decode

                dd = jnp.dtype(lmodel.decoder_dtype)
                ldiffs = [
                    ((taps_a[nm].astype(jnp.float32)
                      - taps_b[nm].astype(jnp.float32)) ** 2).astype(dd)
                    for nm in lmodel_tap_names]
                img_sq = (jnp.mean(
                    (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                    axis=-1, keepdims=True) if lmodel.v2 else None)
                maps = fused_serving_decode(lmodel, lvars, ldiffs, img_sq,
                                            interpret=fused_interpret)
                return scores, maps
            maps = lmodel.apply(
                {"params": {**lvars["params"],
                            "backbone": gvars["params"]["backbone"]},
                 **({"batch_stats": lvars["batch_stats"]}
                    if "batch_stats" in lvars else {})},
                a, b, train=False,
                method=lambda m, a_, b_, train: m.decode_from_taps(
                    taps_a, taps_b, a_, b_, train))
            return scores, maps

        repl = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        self._score_both = jax.jit(
            score_both, in_shardings=(repl, repl, data, data),
            out_shardings=(data, data))
        self._gvars = jax.device_put(global_variables, repl)
        self._lvars = jax.device_put(local_variables, repl)

        # Grouped GT-vs-K-SR dual scoring: one GT tower pass per group
        # serves BOTH the global head and the CLU decoder for all K SR
        # outputs ((1+K)/(2K) of the tower passes — srsem/eval/grouped.py
        # has the global-only analysis).  jit built lazily per K.
        def score_groups(gvars, lvars, gt_u8, sr_u8):
            from srsem.models.local_models import CluUnet

            g, k = sr_u8.shape[0], sr_u8.shape[1]
            gt = pre.device_normalize(gt_u8)
            sr = pre.device_normalize(sr_u8.reshape((g * k,) + sr_u8.shape[2:]))
            # Two tower applies (G and G*K batches) — a GT+SR concat would
            # force a GSPMD all-to-all reshard on multi-device meshes (see
            # srsem/eval/grouped.py).
            taps_g = tower(gvars, gt)
            taps_s = tower(gvars, sr)

            # Global head, fused in (G, K) layout — the helper owns the
            # aggregator param layout
            # (srsem/models/global_models.py::fused_grouped_head).
            from srsem.models.global_models import (fused_grouped_head,
                                                    grouped_diff_pyramid)

            scores = fused_grouped_head(
                gvars["params"]["aggregator"], taps_g, taps_s, tap_names)

            # CLU decoder: per-pair diff pyramids built with the same fused
            # broadcast (GT taps never tiled K× in HBM), then
            # decode_from_diffs.
            dd = jnp.dtype(lmodel.decoder_dtype)
            diffs = grouped_diff_pyramid(taps_g, taps_s, lmodel_tap_names, dd)
            img_sq = None
            if lmodel.v2:
                gt_f = gt.astype(jnp.float32)[:, None]
                sr_f = sr.reshape((g, k) + sr.shape[1:]).astype(jnp.float32)
                img_sq = jnp.mean((gt_f - sr_f) ** 2, axis=-1, keepdims=True)
                img_sq = img_sq.reshape((g * k,) + img_sq.shape[2:])
            if fused_decoder:
                from srsem.models.local_models import fused_serving_decode

                maps = fused_serving_decode(lmodel, lvars, diffs, img_sq,
                                            interpret=fused_interpret)
            else:
                maps = lmodel.apply(
                    {"params": {**lvars["params"],
                                "backbone": gvars["params"]["backbone"]},
                     **({"batch_stats": lvars["batch_stats"]}
                        if "batch_stats" in lvars else {})},
                    diffs, img_sq, False, method=CluUnet.decode_from_diffs)
            return scores, maps.reshape((g, k) + maps.shape[1:])

        self._score_groups = jax.jit(
            score_groups, in_shardings=(repl, repl, data, data),
            out_shardings=(data, data))

    def score_group_arrays(self, gt_u8: np.ndarray,
                           sr_u8: np.ndarray):
        """(G,H,W,3) GT + (G,K,H,W,3) SR → ((G,K) scores, (G,K,H,W) maps)
        with one shared GT tower pass per group.  G is padded up to a
        multiple of the data axis."""
        g = gt_u8.shape[0]
        n_data = self.mesh.shape["data"]
        pad = (-g) % n_data
        if pad:
            gt_u8 = np.concatenate(
                [gt_u8, np.zeros((pad,) + gt_u8.shape[1:], gt_u8.dtype)])
            sr_u8 = np.concatenate(
                [sr_u8, np.zeros((pad,) + sr_u8.shape[1:], sr_u8.dtype)])
        data = batch_sharding(self.mesh)
        scores, maps = self._score_groups(
            self._gvars, self._lvars,
            jax.device_put(gt_u8, data), jax.device_put(sr_u8, data))
        return scores[:g], maps[:g]

    def _decode_one(self, path: str) -> np.ndarray:
        if self.decode_backend == "native":
            # C++ decode (GIL-free inside the thread pool; srsem/native) —
            # same contract as PairScorer._decode_one.
            img = self.preprocess.decode_uint8_native(path)
            if img is None:
                raise IOError(f"native decode failed: {path}")
            return img
        return self.preprocess.decode_uint8(path)

    def score_folders(self, gt_folder: str, sr_folder: str,
                      exts=(".jpg", ".png")) -> "pd.DataFrame":
        """Match stems, score every pair → DataFrame(image, score,
        map_mean, map_min).  NaN rows on decode failure.  Host decode runs
        in a ``num_workers`` thread pool honoring ``decode_backend``, and
        chunk i+1 decodes while chunk i runs on device — the same
        double-buffering as PairScorer.score_paths."""
        import concurrent.futures as cf

        import pandas as pd

        gt = {os.path.splitext(f)[0]: os.path.join(gt_folder, f)
              for f in sorted(os.listdir(gt_folder)) if f.endswith(exts)}
        sr = {os.path.splitext(f)[0]: os.path.join(sr_folder, f)
              for f in sorted(os.listdir(sr_folder)) if f.endswith(exts)}
        names = sorted(set(gt) & set(sr))
        rows = []
        bs = self.batch_size
        size = self.preprocess.size
        data = batch_sharding(self.mesh)

        def safe_pair(name):
            try:
                return self._decode_one(gt[name]), self._decode_one(sr[name])
            except Exception:
                return None

        chunks = [names[i: i + bs] for i in range(0, len(names), bs)]
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            submit = lambda chunk: [  # noqa: E731
                pool.submit(safe_pair, n) for n in chunk]
            pending = submit(chunks[0]) if chunks else None
            for ci, chunk in enumerate(chunks):
                futures, pending = pending, (
                    submit(chunks[ci + 1]) if ci + 1 < len(chunks) else None)
                a = np.zeros((bs, size, size, 3), np.uint8)
                b = np.zeros_like(a)
                ok = np.zeros((bs,), bool)
                for i, fut in enumerate(futures):
                    d = fut.result()
                    if d is not None:
                        a[i], b[i] = d
                        ok[i] = True
                scores, maps = self._score_both(
                    self._gvars, self._lvars,
                    jax.device_put(a, data), jax.device_put(b, data))
                scores = np.array(jax.device_get(scores), np.float32,
                                  copy=True)
                maps = np.asarray(jax.device_get(maps), np.float32)
                for i, name in enumerate(chunk):
                    rows.append({
                        "image": name,
                        "score": float(scores[i]) if ok[i] else np.nan,
                        "map_mean": (float(maps[i].mean())
                                     if ok[i] else np.nan),
                        "map_min": float(maps[i].min()) if ok[i] else np.nan,
                    })
        return pd.DataFrame(rows)

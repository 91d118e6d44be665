"""Grouped GT-vs-K-SR scoring: one frozen-tower pass per unique image.

The 10k-pair KonIQ SR benchmark scores each GT against the outputs of K=5
SR models (reference: README.md:47-53; qwen_caps_embedding_script.py:59-76
enumerates HQ×SR pairs).  The reference — and the plain pair scorer — runs
the GT through the frozen tower once PER PAIR: 2·K tower passes per group.
Here the group shares the GT pass: (1 + K) passes, an algorithmic
(2K)/(1+K) ≈ 1.67× cut of the dominant cost at K=5 with numerically
equivalent scores (algebraically identical squared-diff/head math; the
fused (G, K) head changes the FP reduction order — tests/test_grouped.py
pins equality at rtol/atol).

Covers the conv-head variants (stages_cnn / clsbckb / wperlay — including
the flagship and the README winner) and the ViT token heads
(single_lin_vit / stages_vit / wperlay_vit, fused the same way); the MLP
heads (stages_cnn_pooling / emb_lin) fall back to pairwise — their heads
are nonlinear in the features, so there is no fused (G, K) form.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srsem.core.config import GlobalModelConfig, LocalModelConfig
from srsem.core.meshes import batch_sharding, create_mesh, replicated_sharding
from srsem.data.preprocess import IMG_EXTENSIONS as _EXTS, Preprocess
from srsem.models.global_models import (
    fused_grouped_head,
    fused_grouped_token_head,
    grouped_diff_pyramid,
    stage_taps_for,
    wperlay_taps,
)

CONV_HEADS = ("stages_cnn", "wperlay_cnn")
VIT_HEADS = ("single_lin_vit", "stages_vit", "wperlay_vit")
GROUPED_HEADS = CONV_HEADS + VIT_HEADS



def _sr_model_names(sr_folders: Sequence[str]) -> List[str]:
    """One display name per SR folder — score-column keys and map-file
    stems.  Plain basenames collide when two runs share a model dir name
    (``/runA/esrgan`` vs ``/runB/esrgan`` both → "esrgan", silently
    dropping one model's scores); collisions grow parent segments
    (``runA__esrgan``) until names are unique."""
    paths = [Path(str(f).rstrip("/")) for f in sr_folders]
    max_depth = max((len(p.parts) for p in paths), default=1)
    for depth in range(1, max_depth + 1):
        names = ["__".join(p.parts[-depth:]) for p in paths]
        if len(set(names)) == len(names):
            return names
    raise ValueError(
        f"SR folders do not resolve to unique names (duplicate paths?): "
        f"{list(map(str, sr_folders))}")


def _match_stems(gt_folder: str, sr_folders: Sequence[str]
                 ) -> Tuple[List[str], List[Dict[str, Path]]]:
    """Stems common to GT and every SR folder + per-folder stem→path maps.

    Deterministic tie-break: when a folder holds one stem under several
    extensions (``im2.png`` and ``im2.jpg``), the lexicographically FIRST
    filename wins — filesystem iteration order must never pick the input.
    """
    stems = None
    folder_files: List[Dict[str, Path]] = []
    for folder in [gt_folder, *sr_folders]:
        files: Dict[str, Path] = {}
        for f in sorted(Path(folder).iterdir()):
            if f.suffix.lower() in _EXTS and f.stem not in files:
                files[f.stem] = f
        folder_files.append(files)
        stems = set(files) if stems is None else stems & set(files)
    out = sorted(stems or ())
    if not out:
        raise ValueError("no stems common to GT and all SR folders")
    return out, folder_files


def _decoded_group_chunks(preprocess, stems: Sequence[str],
                          folder_files: Sequence[Dict[str, Path]],
                          k: int, bs: int, pool: cf.ThreadPoolExecutor):
    """Yield ``(chunk_stems, gt (bs,H,W,3), sr (bs,K,H,W,3), ok (bs,))``
    with chunk i+1's decodes submitted BEFORE chunk i is yielded, so host
    decode overlaps the caller's device call (the double-buffering
    PairScorer.score_paths already does — srsem/eval/scorer.py).  A failed
    decode clears ``ok`` for that group (NaN-row contract, reference:
    1_compute_image_metrics.py:119-134)."""
    size = preprocess.size

    def decode_one(path) -> Optional[np.ndarray]:
        try:
            return preprocess.decode_uint8(str(path))
        except Exception:
            return None

    def submit(chunk):
        return [pool.submit(lambda grp: [decode_one(p) for p in grp],
                            [ff[s] for ff in folder_files])
                for s in chunk]

    chunks = [stems[i: i + bs] for i in range(0, len(stems), bs)]
    pending = submit(chunks[0]) if chunks else []
    for ci, chunk in enumerate(chunks):
        futures, pending = pending, (
            submit(chunks[ci + 1]) if ci + 1 < len(chunks) else [])
        gt = np.zeros((bs, size, size, 3), np.uint8)
        sr = np.zeros((bs, k, size, size, 3), np.uint8)
        ok = np.zeros((bs,), bool)
        for i, fut in enumerate(futures):
            imgs = fut.result()
            if all(im is not None for im in imgs):
                gt[i] = imgs[0]
                sr[i] = np.stack(imgs[1:])
                ok[i] = True
        yield chunk, gt, sr, ok


def _pad_to_data_axis(mesh, gt_u8: np.ndarray, sr_u8: np.ndarray
                      ) -> Tuple[int, np.ndarray, np.ndarray]:
    """Pad the group dim up to a multiple of the mesh data axis; returns
    the original G so callers slice padding off the result."""
    g = gt_u8.shape[0]
    pad = (-g) % mesh.shape["data"]
    if pad:
        gt_u8 = np.concatenate(
            [gt_u8, np.zeros((pad,) + gt_u8.shape[1:], gt_u8.dtype)])
        sr_u8 = np.concatenate(
            [sr_u8, np.zeros((pad,) + sr_u8.shape[1:], sr_u8.dtype)])
    return g, gt_u8, sr_u8


class GroupedPairScorer:
    """Batched scorer for (GT, [SR_1..SR_K]) groups.

    ``score_arrays(gt_u8 (G,H,W,3), sr_u8 (G,K,H,W,3)) -> (G,K)`` float32;
    identical numerics to scoring the K pairs independently.
    """

    def __init__(self, cfg: GlobalModelConfig, variables, k: int,
                 mesh=None, batch_size: int = 32, num_workers: int = 16,
                 fused_tower: bool = False,
                 fused_interpret: bool | None = None,
                 fast_jpeg: bool = False):
        if cfg.head not in GROUPED_HEADS:
            raise ValueError(
                f"grouped scoring supports the linear-to-scalar heads "
                f"{GROUPED_HEADS}, got {cfg.head!r} — use PairScorer")
        if fused_tower and cfg.backbone.kind not in (
                "resnet50", "resnet50_clip"):
            raise ValueError(
                f"fused_tower needs a ResNet backbone, got "
                f"{cfg.backbone.kind!r}")
        if fused_tower and (getattr(cfg, "lora_rank", None) is not None
                            or getattr(cfg.backbone, "lora_rank", None)
                            is not None):
            raise ValueError(
                "fused_tower serves the frozen base tower only — it folds "
                "BN into conv weights and carries no LoRA deltas")
        if fused_interpret is None:
            # Pallas TPU kernels lower only on TPU backends ("tpu", or the
            # "axon" relay); interpret elsewhere so the fused path (and the
            # --fused-tower CLI flag) still runs on any backend.
            fused_interpret = jax.default_backend() not in ("tpu", "axon")
        self.cfg = cfg
        self.k = k
        self.mesh = mesh or create_mesh()
        n_data = self.mesh.shape["data"]
        # G (the group batch) shards over `data`.
        self.batch_size = max(((batch_size + n_data - 1) // n_data) * n_data,
                              n_data)
        self.num_workers = num_workers
        self.preprocess = Preprocess.for_backbone(
            cfg.backbone.kind, cfg.backbone.image_size, fast_jpeg=fast_jpeg)

        from srsem.backbones.resnet import make_backbone
        from srsem.backbones.vit import vit_block_taps

        backbone = make_backbone(cfg.backbone)
        if cfg.head == "stages_cnn":
            names = stage_taps_for(cfg.backbone.kind, cfg.depth)
        elif cfg.head == "wperlay_cnn":
            names = wperlay_taps(cfg.depth)
        else:  # ViT heads: taps mirror GlobalPairScorer.setup
            names = vit_block_taps(
                cfg.depth, total=cfg.backbone.vit_depth,
                step=3 if cfg.head == "stages_vit" else 1)
        shared_head = cfg.head == "single_lin_vit"
        is_vit = cfg.head in VIT_HEADS
        pre = self.preprocess

        def score_grouped(v, gt_u8, sr_u8):
            g = gt_u8.shape[0]
            k = sr_u8.shape[1]
            gt = pre.device_normalize(gt_u8)
            sr = pre.device_normalize(
                sr_u8.reshape((g * k,) + sr_u8.shape[2:]))
            # Two tower applies (G and G*K batches) instead of one concat:
            # the G- and G*K-sharded batch dims have different per-device
            # boundaries, so a concat forces a GSPMD all-to-all reshard on
            # multi-device meshes (and crashes XLA:CPU's AllToAllThunk on
            # the virtual test mesh).  Frozen running-stat BN ⇒ splitting
            # the batch is numerically identical.
            if fused_tower:
                # VMEM-resident Pallas bottleneck interiors
                # (srsem/backbones/fused_resnet.py); same param tree.
                from srsem.backbones.fused_resnet import fused_apply

                dt = jnp.dtype(cfg.backbone.compute_dtype)
                _, taps_g = fused_apply(cfg.backbone.kind,
                                        v["params"]["backbone"], gt, dt,
                                        interpret=fused_interpret)
                _, taps_s = fused_apply(cfg.backbone.kind,
                                        v["params"]["backbone"], sr, dt,
                                        interpret=fused_interpret)
            else:
                bparams = {"params": v["params"]["backbone"]}
                _, taps_g = backbone.apply(bparams, gt)
                _, taps_s = backbone.apply(bparams, sr)
            # Fused (G, K) scoring with the linear head folded into the
            # reduction; the helpers own the aggregator param layout
            # (srsem/models/global_models.py::fused_grouped_{token_,}head).
            if is_vit:
                return fused_grouped_token_head(
                    v["params"]["aggregator"], taps_g, taps_s, names,
                    shared=shared_head)
            return fused_grouped_head(
                v["params"]["aggregator"], taps_g, taps_s, names)

        repl = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        self._score = jax.jit(score_grouped,
                              in_shardings=(repl, data, data),
                              out_shardings=data)
        self._variables = jax.device_put(variables, repl)

    def score_arrays(self, gt_u8: np.ndarray, sr_u8: np.ndarray) -> jax.Array:
        """(G,H,W,3) GT + (G,K,H,W,3) SR → (G,K) scores.  G is padded up to
        a multiple of the data axis (padding rows sliced off the result)."""
        g, gt_u8, sr_u8 = _pad_to_data_axis(self.mesh, gt_u8, sr_u8)
        data = batch_sharding(self.mesh)
        out = self._score(self._variables,
                          jax.device_put(gt_u8, data),
                          jax.device_put(sr_u8, data))
        return out[:g]

    # ---- end-to-end folder path ------------------------------------------


    def score_folder_set(self, gt_folder: str,
                         sr_folders: Sequence[str]) -> "object":
        """Match stems across GT + K SR folders; one score column per SR
        folder (unique names via _sr_model_names); NaN rows where any
        decode fails (reference failure contract:
        1_compute_image_metrics.py:119-134).  Host decode of chunk i+1
        overlaps the device call for chunk i (_decoded_group_chunks)."""
        import pandas as pd

        if len(sr_folders) != self.k:
            raise ValueError(f"expected {self.k} SR folders, got {len(sr_folders)}")
        stems, folder_files = _match_stems(gt_folder, sr_folders)
        names = _sr_model_names(sr_folders)

        rows = []
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for chunk, gt, sr, ok in _decoded_group_chunks(
                    self.preprocess, stems, folder_files, self.k,
                    self.batch_size, pool):
                scores = np.array(jax.device_get(self.score_arrays(gt, sr)),
                                  np.float32, copy=True)
                scores[~ok] = np.nan
                for i, s in enumerate(chunk):
                    rows.append({"image_name": s,
                                 **dict(zip(names, scores[i]))})
        return pd.DataFrame(rows)


class GroupedMapScorer:
    """Grouped CLU map scoring: (GT, [SR_1..K]) → (G, K, H, W) fidelity maps
    with ONE shared GT tower pass per group.

    The UNet decoder still runs once per pair (its input is the per-pair
    diff pyramid), but the frozen tower — roughly two thirds of the CLU
    serving cost (BENCH_NOTES.md) — drops from 2K to 1+K passes per group.
    Diffs are built with a fused broadcast over the shared GT taps
    (``(tg[:, None] - ts) ** 2`` reshaped into the decoder's pair batch) and
    fed to :meth:`CluUnet.decode_from_diffs`, so the GT tap tensors are
    never tiled K× in HBM.  Map numerics equal the pairwise scorer
    (tests/test_grouped.py).
    """

    def __init__(self, cfg: LocalModelConfig, variables, k: int,
                 mesh=None, batch_size: int = 8, fused_tower: bool = False,
                 fused_decoder: bool = False,
                 fused_interpret: bool | None = None,
                 fast_jpeg: bool = False):
        from srsem.backbones.resnet import (
            CLIP_STAGE_TAPS,
            CLIP_STEM_TAP,
            IMAGENET_STAGE_TAPS,
            IMAGENET_STEM_TAP,
            make_backbone,
        )
        from srsem.models.local_models import CluUnet, make_local_model

        if fused_tower and (cfg.backbone.kind not in
                            ("resnet50", "resnet50_clip")
                            or cfg.lora_rank is not None):
            raise ValueError(
                "fused_tower needs a frozen (no-LoRA) ResNet backbone — it "
                "folds BN into conv weights and carries no LoRA deltas")
        if fused_interpret is None:
            # See GroupedPairScorer: real kernel on TPU backends, interpret
            # elsewhere.
            fused_interpret = jax.default_backend() not in ("tpu", "axon")
        self.cfg = cfg
        self.k = k
        self.mesh = mesh or create_mesh()
        n_data = self.mesh.shape["data"]
        self.batch_size = max(((batch_size + n_data - 1) // n_data) * n_data,
                              n_data)
        self.preprocess = Preprocess.for_backbone(
            cfg.backbone.kind, cfg.backbone.image_size, fast_jpeg=fast_jpeg)

        model = make_local_model(cfg)
        backbone = make_backbone(cfg.backbone)
        names = ((CLIP_STEM_TAP,) + CLIP_STAGE_TAPS
                 if cfg.backbone.kind == "resnet50_clip"
                 else (IMAGENET_STEM_TAP,) + IMAGENET_STAGE_TAPS)
        dd = jnp.dtype(getattr(cfg, "decoder_dtype", "float32"))
        pre = self.preprocess

        def score_grouped(v, gt_u8, sr_u8):
            g, kk = gt_u8.shape[0], sr_u8.shape[1]
            gt = pre.device_normalize(gt_u8)
            sr = pre.device_normalize(
                sr_u8.reshape((g * kk,) + sr_u8.shape[2:]))
            # Two tower applies — see GroupedPairScorer: a GT+SR concat
            # would force a GSPMD all-to-all reshard on multi-device meshes.
            if fused_tower:
                from srsem.backbones.fused_resnet import fused_apply

                dt = jnp.dtype(cfg.backbone.compute_dtype)
                _, taps_g = fused_apply(cfg.backbone.kind,
                                        v["params"]["backbone"], gt, dt,
                                        interpret=fused_interpret)
                _, taps_s = fused_apply(cfg.backbone.kind,
                                        v["params"]["backbone"], sr, dt,
                                        interpret=fused_interpret)
            else:
                bparams = {"params": v["params"]["backbone"]}
                _, taps_g = backbone.apply(bparams, gt)
                _, taps_s = backbone.apply(bparams, sr)
            diffs = grouped_diff_pyramid(taps_g, taps_s, names, dd)
            img_sq = None
            if cfg.v2:
                gt_f = gt.astype(jnp.float32)[:, None]
                sr_f = sr.reshape((g, kk) + sr.shape[1:]).astype(jnp.float32)
                img_sq = jnp.mean((gt_f - sr_f) ** 2, axis=-1, keepdims=True)
                img_sq = img_sq.reshape((g * kk,) + img_sq.shape[2:])
            if fused_decoder:
                # Fused Pallas decoder levels, serving BN folded into conv
                # weights (srsem/models/local_models.py::fused_serving_decode).
                from srsem.models.local_models import fused_serving_decode

                maps = fused_serving_decode(model, v, diffs, img_sq,
                                            interpret=fused_interpret)
            else:
                maps = model.apply(
                    {"params": v["params"],
                     **({"batch_stats": v["batch_stats"]}
                        if "batch_stats" in v else {})},
                    diffs, img_sq, False, method=CluUnet.decode_from_diffs)
            return maps.reshape((g, kk) + maps.shape[1:])

        repl = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        self._score = jax.jit(score_grouped,
                              in_shardings=(repl, data, data),
                              out_shardings=data)
        self._variables = jax.device_put(variables, repl)

    def score_arrays(self, gt_u8: np.ndarray, sr_u8: np.ndarray) -> jax.Array:
        """(G,H,W,3) GT + (G,K,H,W,3) SR → (G,K,H,W) maps.  G is padded up
        to a multiple of the data axis (padding sliced off the result)."""
        g, gt_u8, sr_u8 = _pad_to_data_axis(self.mesh, gt_u8, sr_u8)
        data = batch_sharding(self.mesh)
        out = self._score(self._variables,
                          jax.device_put(gt_u8, data),
                          jax.device_put(sr_u8, data))
        return out[:g]

    def score_folder_set(self, gt_folder: str, sr_folders: Sequence[str],
                         maps_dir: Optional[str] = None,
                         num_workers: int = 16) -> "object":
        """Match stems across GT + K SR folders; per (stem, SR model) emit
        map_mean/map_min summary columns (NaN on decode failure — the
        reference failure contract, 1_compute_image_metrics.py:119-134);
        optionally save each full map to ``maps_dir/<stem>__<model>.npy``
        (model names unique via _sr_model_names).  Host decode of chunk
        i+1 overlaps the device call for chunk i."""
        import pandas as pd

        if len(sr_folders) != self.k:
            raise ValueError(
                f"expected {self.k} SR folders, got {len(sr_folders)}")
        stems, folder_files = _match_stems(gt_folder, sr_folders)
        model_names = _sr_model_names(sr_folders)
        if maps_dir:
            Path(maps_dir).mkdir(parents=True, exist_ok=True)

        rows = []
        with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
            for chunk, gt, sr, ok in _decoded_group_chunks(
                    self.preprocess, stems, folder_files, self.k,
                    self.batch_size, pool):
                maps = np.asarray(
                    jax.device_get(self.score_arrays(gt, sr)), np.float32)
                for i, s in enumerate(chunk):
                    row = {"image_name": s}
                    for m, name in enumerate(model_names):
                        if ok[i]:
                            row[f"{name}_map_mean"] = float(maps[i, m].mean())
                            row[f"{name}_map_min"] = float(maps[i, m].min())
                            if maps_dir:
                                np.save(os.path.join(
                                    maps_dir, f"{s}__{name}.npy"), maps[i, m])
                        else:
                            row[f"{name}_map_mean"] = np.nan
                            row[f"{name}_map_min"] = np.nan
                    rows.append(row)
        return pd.DataFrame(rows)

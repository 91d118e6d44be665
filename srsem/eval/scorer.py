"""High-throughput batched pair scoring — the framework's serving path.

This is what the reference does one pair at a time in a torch eval loop
(reference: CLIPLPIPS_REG_training_sweep_example.py:85-94), rebuilt for TPU:

* host threads decode JPEG/PNG and do the antialiased resize+crop to uint8;
* batches stream to device, where normalize → backbone → head run as one
  jitted program with the batch sharded over the mesh's ``data`` axis;
* uint8 host→device transfer (3 bytes/pixel instead of 12 for float32)
  keeps PCIe/ICI out of the critical path; normalization fuses into the
  first conv;
* double-buffering: batch N+1 decodes while batch N computes.

Also hosts the CLU map scorer (same pipeline, map outputs).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srsem.core.config import GlobalModelConfig, LocalModelConfig
from srsem.core.meshes import batch_sharding, create_mesh, replicated_sharding
from srsem.data.preprocess import Preprocess
from srsem.models.global_models import make_global_model
from srsem.models.local_models import make_local_model


class PairScorer:
    """Batched scorer for (GT, SR) image pairs.

    ``model_kind``: "global" → scalar per pair; "local" → fidelity map.
    """

    def __init__(
        self,
        cfg,
        variables,
        mesh=None,
        batch_size: int = 64,
        model_kind: str = "global",
        num_workers: int = 16,
        decode_backend: str = "pil",
        fused_tower: bool = False,
        fused_decoder: bool = False,
        fused_interpret: bool | None = None,
        fast_jpeg: bool = False,
    ):
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
            # Real Pallas kernel on TPU backends ("tpu"/"axon"), interpret
            # elsewhere (see srsem/eval/grouped.py).
            fused_interpret = jax.default_backend() not in ("tpu", "axon")
        self.cfg = cfg
        self.mesh = mesh or create_mesh()
        # The batch dim shards over `data`; round up so it divides evenly.
        n_data = self.mesh.shape["data"]
        self.batch_size = ((batch_size + n_data - 1) // n_data) * n_data
        self.model_kind = model_kind
        self.num_workers = num_workers
        self.decode_backend = decode_backend
        if decode_backend == "native":
            # Fail fast on the CONFIG error: decode_uint8_native returns
            # None both for "library not built" and "file undecodable", so
            # without this check a missing native lib surfaces as an
            # all-NaN result set masquerading as per-file data failures.
            from srsem import native

            if not native.available():
                raise RuntimeError(
                    "decode_backend='native' but the native decoder is "
                    "unavailable — build srsem/native (see `srsem info "
                    "--native`) or use the default PIL backend")
        self.preprocess = Preprocess.for_backbone(
            cfg.backbone.kind, cfg.backbone.image_size, fast_jpeg=fast_jpeg)
        # Split tower applies on multi-device meshes: the data-sharded
        # GT+SR concat would force a GSPMD all-to-all reshard (see
        # CluUnet.split_tower); single-chip keeps the faster 2N-concat
        # form.  Applies to BOTH the local CLU and the global
        # head="unet_global" CluUnet copy.
        from srsem.core.meshes import DATA_AXIS

        split = self.mesh.shape[DATA_AXIS] > 1
        if model_kind == "global":
            self.model = make_global_model(cfg, split_tower=split)
        else:
            self.model = make_local_model(cfg, split_tower=split)

        repl = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        pre = self.preprocess

        # Serving uses dense XLA by default: the Pallas fused-HEAD kernel
        # (srsem/ops/fused_head.py) measured slower at every published
        # config (224px b128: 4.96k vs 5.86k pairs/s; 512px b16: 714 vs
        # 820) — XLA's own fusion of diff²→1x1-conv→mean into the backbone
        # epilogue wins.  The kernel remains as a verified experiment.
        # ``fused_tower`` opts the frozen TOWER into the VMEM-resident
        # Pallas bottleneck kernel instead (srsem/backbones/fused_resnet.py).
        # ``fused_decoder`` opts the CLU UNet decoder into the fused Pallas
        # level kernels with serving BN folded into the conv weights
        # (srsem/models/local_models.py::fused_serving_decode).
        kind = cfg.backbone.kind
        tower_dtype = jnp.dtype(cfg.backbone.compute_dtype)
        model_cls = type(self.model)
        from srsem.models.local_models import CluUnet

        is_clu = isinstance(self.model, CluUnet)
        if fused_decoder and not is_clu:
            raise ValueError(
                "fused_decoder applies to the CLU UNet decoder — use "
                "model_kind='local' (or the head='unet_global' copy)")
        dense_tower = None
        if fused_decoder and not fused_tower:
            from srsem.backbones.resnet import make_backbone

            dense_tower = make_backbone(cfg.backbone)
        if is_clu:
            from srsem.backbones.resnet import (
                CLIP_STAGE_TAPS, CLIP_STEM_TAP, IMAGENET_STAGE_TAPS,
                IMAGENET_STEM_TAP)

            tap_names = ((CLIP_STEM_TAP,) + CLIP_STAGE_TAPS
                         if kind == "resnet50_clip"
                         else (IMAGENET_STEM_TAP,) + IMAGENET_STAGE_TAPS)

        def score_batch(variables, a_u8, b_u8):
            a = pre.device_normalize(a_u8)
            b = pre.device_normalize(b_u8)
            if fused_tower or fused_decoder:
                from srsem.models.global_models import GlobalPairScorer
                from srsem.models.local_models import fused_serving_decode

                if fused_tower:
                    from srsem.backbones.fused_resnet import fused_apply

                    bp = variables["params"]["backbone"]
                    emb_a, taps_a = fused_apply(kind, bp, a, tower_dtype,
                                                interpret=fused_interpret)
                    emb_b, taps_b = fused_apply(kind, bp, b, tower_dtype,
                                                interpret=fused_interpret)
                else:  # fused_decoder over the dense XLA tower
                    bp = {"params": variables["params"]["backbone"]}
                    emb_a, taps_a = dense_tower.apply(bp, a)
                    emb_b, taps_b = dense_tower.apply(bp, b)
                if is_clu and fused_decoder:
                    dd = self.model.decoder_dtype
                    diffs = [
                        ((taps_a[nm].astype(jnp.float32)
                          - taps_b[nm].astype(jnp.float32)) ** 2).astype(dd)
                        for nm in tap_names]
                    img_sq = None
                    if self.model.v2:
                        img_sq = jnp.mean(
                            (a.astype(jnp.float32)
                             - b.astype(jnp.float32)) ** 2,
                            axis=-1, keepdims=True)
                    return fused_serving_decode(
                        self.model, variables, diffs, img_sq,
                        interpret=fused_interpret)
                if is_clu:
                    # CLU map model, or the head="unet_global" CluUnet copy.
                    return self.model.apply(
                        variables, taps_a, taps_b, a, b, False,
                        method=model_cls.decode_from_taps)
                return self.model.apply(
                    variables, emb_a, emb_b, taps_a, taps_b,
                    method=GlobalPairScorer.score_from_taps)
            if model_kind == "local":
                return self.model.apply(variables, a, b, train=False)
            return self.model.apply(variables, a, b)

        self._score_batch = jax.jit(
            score_batch,
            in_shardings=(repl, data, data),
            out_shardings=data,
        )
        self._variables = jax.device_put(variables, repl)

    # ---- device path ----------------------------------------------------

    def score_arrays(self, a_u8: np.ndarray, b_u8: np.ndarray) -> jax.Array:
        """Score a uint8 NHWC batch pair.  The batch is zero-padded up to a
        multiple of the mesh's ``data`` axis (the sharded dim must divide
        evenly) and the padding rows are trimmed from the result."""
        from srsem.eval.grouped import _pad_to_data_axis

        n, a_u8, b_u8 = _pad_to_data_axis(
            self.mesh, np.asarray(a_u8), np.asarray(b_u8))
        pad = a_u8.shape[0] - n
        data = batch_sharding(self.mesh)
        a_d = jax.device_put(a_u8, data)
        b_d = jax.device_put(b_u8, data)
        out = self._score_batch(self._variables, a_d, b_d)
        return out[:n] if pad else out

    # ---- end-to-end path -------------------------------------------------

    def _decode_one(self, path: str) -> np.ndarray:
        if self.decode_backend == "native":
            # C++ decode (GIL-free inside the thread pool; srsem/native).
            img = self.preprocess.decode_uint8_native(path)
            if img is None:
                raise IOError(f"native decode failed: {path}")
            return img
        return self.preprocess.decode_uint8(path)

    def _decode_pair(self, pair: Tuple[str, str]) -> Tuple[np.ndarray, np.ndarray]:
        return self._decode_one(pair[0]), self._decode_one(pair[1])

    def score_paths(self, pairs: Sequence[Tuple[str, str]]) -> np.ndarray:
        """Decode + score a list of (path_a, path_b); returns one score (or
        map) per pair.  Failed decodes yield NaN rows — the reference's
        per-item failure contract (reference:
        datasets/SRdatasetPseudolabelGen/1_compute_image_metrics.py:119-134).
        """
        bs = self.batch_size
        results: List[np.ndarray] = []
        chunks = [pairs[i: i + bs] for i in range(0, len(pairs), bs)]
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            submit = lambda chunk: [  # noqa: E731
                pool.submit(self._safe_decode, p) for p in chunk]
            pending = submit(chunks[0]) if chunks else None
            for i in range(len(chunks)):
                # Double-buffer: chunk i+1 decodes while chunk i scores.
                nxt = submit(chunks[i + 1]) if i + 1 < len(chunks) else None
                results.append(self._finish_chunk(pending))
                pending = nxt
        out = np.concatenate(results, axis=0) if results else np.zeros((0,))
        return out[: len(pairs)]

    def _safe_decode(self, pair):
        try:
            return self._decode_pair(pair)
        except Exception:
            return None

    def _finish_chunk(self, futures) -> np.ndarray:
        decoded = [f.result() for f in futures]
        n = len(decoded)
        size = self.preprocess.size
        a = np.zeros((self.batch_size, size, size, 3), np.uint8)
        b = np.zeros_like(a)
        ok = np.zeros((self.batch_size,), bool)
        for i, d in enumerate(decoded):
            if d is not None:
                a[i], b[i] = d
                ok[i] = True
        scores = np.array(jax.device_get(self.score_arrays(a, b)),
                          np.float32, copy=True)
        scores = scores[:n]
        scores[~ok[:n]] = np.nan
        return scores

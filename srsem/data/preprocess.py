"""Image decode + preprocessing.

The reference preprocesses with timm's eval transform
(``resolve_model_data_config`` + ``create_transform``,
reference: models/global_eval_models.py:331-333): resize shortest edge to
``size / crop_pct`` with bicubic interpolation, center-crop ``size``,
scale to [0,1], normalize.  CLIP backbones use crop_pct 1.0 and CLIP
mean/std; the ImageNet backbone uses crop_pct 0.875 and ImageNet mean/std.

Split TPU-first: decode + antialiased resize + crop happen on host threads
producing HWC uint8 (PIL's bicubic matches the reference bit-for-bit since
the reference also goes through PIL); the scale+normalize step is device-side
(fused by XLA into the first conv).  ``Preprocess.__call__`` also offers the
all-host float path for exact-parity unit tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

import jax.numpy as jnp

from srsem.ops.image import CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD

#: Canonical image-file extensions for folder jobs — ONE home so the
#: folder-metrics sweep and the grouped scorer match the same files
#: (they drifted: grouped once omitted .tiff/.tif).
IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".tif"}


@dataclasses.dataclass(frozen=True)
class Preprocess:
    """timm-eval-equivalent preprocessing pipeline."""

    size: int = 224
    crop_pct: float = 1.0
    mean: Sequence[float] = CLIP_MEAN
    std: Sequence[float] = CLIP_STD
    interpolation: int = Image.BICUBIC
    # DCT-scaled JPEG decode (PIL Image.draft semantics): the JPEG is decoded
    # at the largest M/8 downscale whose shortest edge still covers the
    # resize target, so the bicubic stage only ever downsamples.  ~LSB-scale
    # resampling differences vs the full decode; default OFF for bit parity
    # with the reference's full PIL decode.
    fast_jpeg: bool = False

    @staticmethod
    def for_backbone(kind: str, size: int = 224,
                     fast_jpeg: bool = False) -> "Preprocess":
        if kind in ("resnet50_clip", "vit_clip"):
            return Preprocess(size=size, crop_pct=1.0, mean=CLIP_MEAN,
                              std=CLIP_STD, fast_jpeg=fast_jpeg)
        if kind == "resnet50":
            # Classic ImageNet eval crop_pct.  Note: timm's current default
            # resnet50 weights (a1_in1k) resolve crop_pct 0.95 — when
            # loading those exact weights, construct
            # Preprocess(crop_pct=0.95, ...) to match their eval protocol.
            return Preprocess(size=size, crop_pct=0.875,
                              mean=IMAGENET_MEAN, std=IMAGENET_STD,
                              fast_jpeg=fast_jpeg)
        raise ValueError(f"unknown backbone kind {kind!r}")

    def decode_uint8_native(self, path: str) -> Optional[np.ndarray]:
        """C++ fast path (srsem.native): threaded libjpeg/libpng decode +
        bicubic resample (within ~0.2 LSB mean of PIL).  Returns None when
        the native library is unavailable or the file fails to decode."""
        from srsem import native

        if not native.available():
            return None
        return native.decode(path, self.size, self.crop_pct,
                             fast_jpeg=self.fast_jpeg)

    def decode_batch_native(self, paths, n_threads: int = 16):
        """Batch C++ decode → (N, size, size, 3) uint8 + ok mask."""
        from srsem import native

        return native.decode_batch(paths, self.size, self.crop_pct,
                                   n_threads, fast_jpeg=self.fast_jpeg)

    def decode_uint8(self, path_or_img) -> np.ndarray:
        """Host path: decode → shortest-edge bicubic resize → center crop.
        Returns HWC uint8."""
        img = path_or_img
        if not isinstance(img, Image.Image):
            img = Image.open(img)
        if self.fast_jpeg and getattr(img, "format", None) == "JPEG":
            # Pillow's native draft mode: configures the JPEG loader for a
            # DCT-space downscale that keeps both dims >= the resize target.
            t = int(round(self.size / self.crop_pct))
            img.draft("RGB", (t, t))
        img = img.convert("RGB")
        scale_size = int(round(self.size / self.crop_pct))
        w, h = img.size
        if w <= h:
            new_w, new_h = scale_size, max(1, int(round(h * scale_size / w)))
        else:
            new_w, new_h = max(1, int(round(w * scale_size / h))), scale_size
        img = img.resize((new_w, new_h), self.interpolation)
        left = (new_w - self.size) // 2
        top = (new_h - self.size) // 2
        img = img.crop((left, top, left + self.size, top + self.size))
        return np.asarray(img, dtype=np.uint8)

    def __call__(self, path_or_img) -> np.ndarray:
        """Full host path: HWC float32, normalized."""
        x = self.decode_uint8(path_or_img).astype(np.float32) / 255.0
        return (x - np.asarray(self.mean, np.float32)) / np.asarray(self.std, np.float32)

    def device_normalize(self, batch_u8):
        """Device path: NHWC uint8 → normalized float32 (jit-friendly;
        XLA fuses the affine into the consumer conv)."""
        x = batch_u8.astype(jnp.float32) / 255.0
        return (x - jnp.asarray(self.mean, jnp.float32)) / jnp.asarray(self.std, jnp.float32)


def decode_image(path, size: int = 224, kind: str = "resnet50_clip") -> np.ndarray:
    return Preprocess.for_backbone(kind, size).decode_uint8(path)

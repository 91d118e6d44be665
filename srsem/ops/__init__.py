"""Device-side ops: image resizing/preprocessing and Pallas-fused kernels."""

from srsem.ops.image import (  # noqa: F401
    normalize,
    resize_bilinear,
    upsample_x2_align_corners,
)

"""Explainability + classical-metric evaluation: Grad-CAM on scalar
targets, overlap metrics, PSNR/SSIM (+ sliding-window maps)."""

from srsem.explain.targets import (  # noqa: F401
    cosine_similarity_target,
    mse_target,
    vector_sum_target,
)
from srsem.explain.gradcam import grad_cam, grad_cam_matrix  # noqa: F401
from srsem.explain.iqa import psnr, psnr_map, ssim, ssim_map  # noqa: F401
from srsem.explain.overlap import (  # noqa: F401
    binarize_top_percent,
    overlap_metrics,
    similarity_matrix,
)
from srsem.explain.embedders import EmbedderSuite, RamProjector  # noqa: F401

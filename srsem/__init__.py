"""srsem — TPU-native semantic-fidelity evaluation for super-resolution.

A brand-new JAX/XLA/Pallas framework with the capabilities of the PyTorch
reference `Haradai/Measuring-Semantic-Differences-in-the-Super-Resolution-Domain`:

* global semantic-fidelity regressors ("CLIP-LPIPS") scoring GT/SR image pairs
  (reference: models/global_eval_models.py),
* local semantic-fidelity map models ("CLU" — ResNet-50 encoder + UNet decoder)
  (reference: models/local_eval_models.py),
* pseudo-label generation pipelines (C2C/C2I cosine scoring, panoptic region
  maps) (reference: datasets/SRdatasetPseudolabelGen/),
* a jitted training harness with grid sweeps (reference: the two
  *_training_sweep_example.py scripts),
* training-free embedding metrics + explainability (SpLiCE, greedy
  decomposition, Grad-CAM, PSNR/SSIM maps)
  (reference: additional_approaches/src/).

Design is TPU-first, not a port: explicit multi-output Flax backbones instead
of forward hooks, pure functions instead of mutable hook dicts, NHWC layouts,
Pallas-fused scoring kernels, a single `jax.sharding.Mesh` data-parallel
program instead of per-GPU processes, and Orbax/msgpack checkpoints instead of
ad-hoc `.pt` files.
"""

__version__ = "0.1.0"

from srsem.core.config import (  # noqa: F401
    BackboneConfig,
    GlobalModelConfig,
    LocalModelConfig,
    MeshConfig,
    TrainConfig,
)

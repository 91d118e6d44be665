"""LoRA (low-rank adaptation) for conv kernels.

Replaces the reference's ``pytora.apply_lora(self.clip, lora_r=rank)``
(reference: models/local_eval_models.py:6,23).  Instead of monkey-patching
modules, each conv kernel optionally carries two small trainable factors; the
effective kernel is ``W + (alpha / r) * reshape(A @ B)``.  ``A`` is zero- and
``B`` is normally-initialized so training starts from the frozen backbone
exactly (the standard LoRA init, and what pytora does).

Because the factors are ordinary params under a ``lora_a``/``lora_b`` name,
the trainable-subset partitioner (srsem.train.partition) selects them by
name, mirroring the reference's "save LoRA weights only" checkpoint semantic
(reference: models/local_eval_models.py:160-171).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


def lora_delta(module: nn.Module, kshape: Tuple[int, ...], rank: int, b_init) -> jnp.ndarray:
    """Create lora_a/lora_b params on ``module`` and return the kernel delta.

    ``kshape`` is the HWIO conv kernel shape; the factorization treats the
    kernel as a ``(kh*kw*in, out)`` matrix.
    """
    kh, kw, cin, cout = kshape
    fan_in = kh * kw * cin
    a = module.param("lora_a", nn.initializers.zeros, (fan_in, rank), jnp.float32)
    b = module.param("lora_b", b_init, (rank, cout), jnp.float32)
    scale = 1.0 / rank
    return (a @ b).reshape(kh, kw, cin, cout) * scale


def is_lora_path(path: Tuple[str, ...]) -> bool:
    return any(p in ("lora_a", "lora_b") for p in path)

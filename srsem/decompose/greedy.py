"""Greedy text-span decomposition, jitted.

Rebuilds the reference's ``greedy_decomposer``
(reference: additional_approaches/src/greedy_decomposer.py:5-107): iterate
``rank`` times — pick the dictionary concept with the largest dot product
against the residual target, record it, subtract its projection from the
target AND from every remaining concept (deflation), then reconstruct in
one of five modes.

TPU-first: the reference's Python loop with data-dependent indexing becomes
a ``lax.scan`` over a static ``rank`` — argmax/gather/deflation are all
vectorized, so one compiled program handles the whole decomposition.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MODES = ("debug", "w_filt_rec", "filt_rec", "w_rec", "rec")


@partial(jax.jit, static_argnames=("rank",))
def _greedy_span(concepts: Array, target: Array, rank: int):
    """Returns (selected_idx (rank,), filtered_components C_ (rank, d))."""

    def step(carry, _):
        meta_target, meta_concepts = carry
        dots = meta_concepts @ meta_target
        j = jnp.argmax(dots)
        concept = meta_concepts[j]
        n_concept = concept / jnp.linalg.norm(concept).clip(1e-12)
        # Deflate target and the whole dictionary.
        new_target = meta_target - n_concept * jnp.dot(n_concept, meta_target)
        proj = meta_concepts @ n_concept
        new_concepts = meta_concepts - proj[:, None] * n_concept[None, :]
        return (new_target, new_concepts), (j, concept)

    (_, _), (idxs, comps) = jax.lax.scan(
        step, (target, concepts), None, length=rank)
    return idxs, comps


def _cosine(a: Array, b: Array) -> Array:
    return (b @ a) / (jnp.linalg.norm(b, axis=-1) * jnp.linalg.norm(a)).clip(1e-12)


class GreedyDecomposer:
    """modes (reference :10-19): debug → (C_, C, texts); *_rec →
    reconstruction from filtered (C_) or original (C) concept embeddings,
    plain mean or cosine-weighted sum."""

    def __init__(self, concepts: np.ndarray,
                 vocab: Optional[Sequence[str]] = None,
                 rank: int = 50, mode: str = "debug"):
        self.concepts = jnp.asarray(concepts, jnp.float32)
        self.vocab = np.asarray(vocab) if vocab is not None else None
        self.rank = rank
        self.mode = mode

    def __call__(self, target):
        target = jnp.asarray(target, jnp.float32)
        idxs, comps = _greedy_span(self.concepts, target, self.rank)
        originals = self.concepts[idxs]
        if self.mode == "debug":
            texts = (list(self.vocab[np.asarray(idxs)])
                     if self.vocab is not None else list(np.asarray(idxs)))
            return comps, originals, texts
        if self.mode in ("w_filt_rec", "w_rec"):
            basis = comps if self.mode == "w_filt_rec" else originals
            cos = _cosine(target, basis)
            # Reference math (greedy_decomposer.py:78-107) with only the
            # exact-zero denominator guarded, sign-preserving — mixed-sign
            # cosines summing to ~0 would otherwise emit NaN/Inf weights.
            s = cos.sum()
            s = jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)
            return jnp.sum(basis * (cos / s)[:, None], axis=0)
        if self.mode == "filt_rec":
            return jnp.mean(comps, axis=0)
        if self.mode == "rec":
            return jnp.mean(originals, axis=0)
        raise ValueError(f"unknown mode {self.mode!r}")

"""Batched C2C/C2I cosine scoring.

The reference computes one cosine per pair, re-encoding both captions each
time — O(pairs) forward passes (reference: datasets/SRdatasetPseudolabelGen/
qwen_caps_embedding_script.py:119-135).  TPU-native replacement: embed the
UNIQUE captions once as one batched device sweep, then gather per-pair rows
and compute all cosines in a single einsum — O(unique captions) forwards.
For the 10k-image set that is a ~32× reduction in encoder work (16 folders
× 10k captions vs ~500k pairs).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.jit
def cosine_similarity_matrix(a: Array, b: Array) -> Array:
    """Pairwise cosine matrix between rows of a (n,d) and b (m,d)."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-9)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-9)
    return a @ b.T


@jax.jit
def rowwise_cosine(a: Array, b: Array) -> Array:
    """Cosine of matching rows of two (n, d) arrays."""
    num = jnp.sum(a * b, axis=-1)
    den = (jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)).clip(1e-9)
    return num / den


def score_caption_pairs(
    captions: Dict[str, str],
    pairs: Sequence[Tuple[str, str]],
    embedder,
) -> np.ndarray:
    """cosine(emb(caption[a]), emb(caption[b])) for each (a, b) pair.

    Output matches the reference's per-pair normalized dot product
    (reference: qwen_caps_embedding_script.py:125-129) but embeds each
    unique caption exactly once.
    """
    keys: List[str] = []
    index: Dict[str, int] = {}
    for a, b in pairs:
        for k in (a, b):
            if k not in index:
                index[k] = len(keys)
                keys.append(k)
    unique_texts = [captions[k] for k in keys]
    embs = np.asarray(embedder.encode(unique_texts), np.float32)

    ia = np.array([index[a] for a, _ in pairs], np.int32)
    ib = np.array([index[b] for _, b in pairs], np.int32)
    cos = rowwise_cosine(jnp.asarray(embs[ia]), jnp.asarray(embs[ib]))
    return np.asarray(cos)


def score_image_caption_pairs(image_embs: np.ndarray, caption_embs: np.ndarray) -> np.ndarray:
    """C2I scoring: cosine between matching rows of image and caption
    embeddings (both already in CLIP's joint space)."""
    return np.asarray(rowwise_cosine(jnp.asarray(image_embs),
                                     jnp.asarray(caption_embs)))

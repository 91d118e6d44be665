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


def embed_image_folder(
    dual_encoder,
    folder: str,
    preprocess,
    batch_size: int = 64,
    exts=(".jpg", ".png"),
    num_workers: int = 8,
) -> Dict[str, np.ndarray]:
    """Batch-embed every image in a folder through the CLIP image tower →
    {stem: embedding}.  The device side runs full static batches; decode
    happens in host threads.  This is the image half of C2I scoring
    (BASELINE config #2)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    names = [n for n in sorted(os.listdir(folder)) if n.endswith(exts)]
    paths = [os.path.join(folder, n) for n in names]
    size = preprocess.size
    out: Dict[str, np.ndarray] = {}
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for start in range(0, len(paths), batch_size):
            chunk = paths[start: start + batch_size]
            decoded = list(pool.map(
                lambda p: _safe_decode_norm(preprocess, p), chunk))
            batch = np.zeros((batch_size, size, size, 3), np.float32)
            ok = np.zeros((batch_size,), bool)
            for i, d in enumerate(decoded):
                if d is not None:
                    batch[i] = d
                    ok[i] = True
            embs = np.asarray(dual_encoder.encode_image(jnp.asarray(batch)))
            for i, name in enumerate(chunk):
                stem = os.path.splitext(os.path.basename(name))[0]
                out[stem] = embs[i] if ok[i] else np.full(
                    embs.shape[-1], np.nan, np.float32)
    return out


def _safe_decode_norm(preprocess, path):
    try:
        return preprocess(path)
    except Exception:
        return None


def score_c2i(
    captions: Dict[str, str],
    image_embs: Dict[str, np.ndarray],
    text_embedder,
) -> Dict[str, float]:
    """Caption-to-image cosine per stem: embed unique captions once, cosine
    against the matching image embedding (the C2I pseudo-label,
    BASELINE config #2).  Stems missing on either side are skipped."""
    stems = [s for s in captions if s in image_embs]
    if not stems:
        return {}
    text_embs = np.asarray(text_embedder.encode([captions[s] for s in stems]))
    img = np.stack([image_embs[s] for s in stems])
    cos = np.asarray(rowwise_cosine(jnp.asarray(img), jnp.asarray(text_embs)))
    return dict(zip(stems, cos.tolist()))

"""Embedding-metric wrapper suite: the five embedders + RAM projector.

Rebuilds the reference's per-backbone wrapper classes (CLIP/SLIP/ALBEF all
expose the same five callables — reference:
additional_approaches/src/slip/model_wrapper.py:10-195,
clip/model_wrapper_old.py:31-186, albef/model_wrapper.py:11-197) as ONE
generic suite over any dual encoder with ``encode_image``/``encode_text``:

* ``img_embedder(pixels)``            — plain joint-space embedding;
* ``txt_embedder(texts)``             — text side;
* ``focus_img_embedder(pixels)``      — project the image embedding onto a
  text-concept direction: ``f̂ · (e·f̂)`` (reference slip wrapper :92-99);
* ``unfocus_img_embedder(pixels)``    — remove that projection: ``e − focus``
  (reference :116-123);
* ``splice_focus_img_embedder(pixels)`` — decompose → (optionally weights)
  → recompose through SpLiCE (reference :125-177).

Backbone-specific checkpoints (SLIP ViT-B/16, ALBEF ViT+BERT, RAM++
Swin-L) are pluggable dual-encoder backends: any object with
``encode_image``/``encode_text`` plugs in, including
srsem.pseudo.clip_text.ClipDualEncoder.  The RAM tagging → focus-concept
flow is reproduced by ``RamProjector`` over a pluggable tagger.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-12)


class FocusEmbedder:
    """Set ``.focus_emb`` (a text-concept embedding) then call on pixels —
    the reference's stateful-attribute protocol kept for API parity."""

    def __init__(self, encode_image: Callable, mode: str = "focus"):
        self.encode_image = encode_image
        self.focus_emb = None
        self.mode = mode

    def __call__(self, pixels):
        if self.focus_emb is None:
            raise RuntimeError("set .focus_emb before calling")
        emb = jnp.asarray(self.encode_image(pixels))
        f = _normalize(jnp.asarray(self.focus_emb).reshape(-1))
        scalars = jnp.sum(emb * f, axis=-1, keepdims=True)
        focused = f[None, :] * scalars
        return focused if self.mode == "focus" else emb - focused


class SpliceFocusEmbedder:
    """Embed → SpLiCE decompose → recompose (or raw weights).

    Attributes mirror the reference knobs (slip wrapper :132-141):
    ``method`` ("admm" keeps gradients / "skl"), ``l1``, ``rank``,
    ``target_mode`` ("rank"/"l1"), ``weights_mode``.
    """

    def __init__(self, encode_image: Callable, splice):
        self.encode_image = encode_image
        self.splice = splice
        self.method = "admm"
        self.l1 = 3.0
        self.rank = 5
        self.target_mode = "rank"
        self.weights_mode = False

    def __call__(self, pixels):
        emb = np.asarray(self.encode_image(pixels))
        if self.target_mode == "l1":
            weights = self.splice.decompose(emb, self.method, l1=self.l1)
        else:
            weights = self.splice.decompose(emb, self.method, rank=self.rank)
        if weights is None:
            return None  # rank search failed (reference :170-172)
        if self.weights_mode:
            return weights
        return self.splice.recompose(weights)


class EmbedderSuite:
    """The uniform surface the eval orchestrators consume."""

    def __init__(self, dual_encoder, load_img: Callable = None,
                 patch_grid_size: int = 17, image_size: int = 224,
                 splice=None):
        self.model = dual_encoder
        self.load_img = load_img
        self.patch_grid_size = patch_grid_size
        self.image_size = image_size
        self.img_embedder = dual_encoder.encode_image
        self.txt_embedder = dual_encoder.encode_text
        self.focus_img_embedder = FocusEmbedder(dual_encoder.encode_image, "focus")
        self.unfocus_img_embedder = FocusEmbedder(dual_encoder.encode_image, "unfocus")
        self.splice_focus_img_embedder = (
            SpliceFocusEmbedder(dual_encoder.encode_image, splice)
            if splice is not None else None)


class RamProjector:
    """RAM-tag-driven embedding reconstruction
    (reference: additional_approaches/src/ram/model_wrapper.py:34-64):
    embed the image's tags, weight each tag embedding by its normalized dot
    product with the image embedding, return the weighted sum.  The
    reference normalizes the concept matrix along dim=0 — per embedding
    *dimension*, not per concept (sic, :50) — reproduced for parity.
    ``ret_concepts`` also returns the tag list (:36,:60-63)."""

    def __init__(self, tagger: Callable[[object], Sequence[str]],
                 encode_image: Callable, encode_text: Callable,
                 ret_concepts: bool = False):
        self.tagger = tagger  # image → list of tag strings (pluggable RAM++)
        self.encode_image = encode_image
        self.encode_text = encode_text
        self.ret_concepts = ret_concepts

    def tags(self, image) -> Sequence[str]:
        return self.tagger(image)

    def __call__(self, image, pixels):
        tags = list(self.tagger(image))
        img_emb = jnp.asarray(self.encode_image(pixels)).reshape(-1)
        tag_embs = jnp.asarray(self.encode_text(tags))
        tag_embs = tag_embs / jnp.linalg.norm(tag_embs, axis=0).clip(1e-12)
        dots = tag_embs @ img_emb
        # Plain dots/dots.sum() like the reference (ram/model_wrapper.py:
        # 39-64) — a negative sum divides by the NEGATIVE sum (clipping it
        # to +eps would blow weights up to ~1e12 with flipped sign); only
        # the exact-zero singularity is guarded, sign-preserving.
        s = jnp.sum(dots)
        s = jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)
        weights = dots / s
        rec = jnp.sum(tag_embs * weights[:, None], axis=0)
        return (rec, tags) if self.ret_concepts else rec

"""SLIP / ALBEF dual-encoder backends for the embedder suite.

The reference vendors full SLIP and ALBEF codebases
(reference: additional_approaches/src/slip/models.py — Meta's SLIP ViT-B/16;
additional_approaches/src/albef/{model_retrieval.py,vit.py,xbert.py} — ViT +
BERT fusion) but its wrappers use only the dual-encoder surface: projected
image/text embeddings in a joint space
(reference: slip/model_wrapper.py:37-78, albef/model_wrapper.py:83-172).
Here those surfaces are composed from our native towers:

* ``SlipDualEncoder`` — ClipViT visual tower + learned projection to the
  SLIP joint space (512-d), text tower = CLIP text transformer + its own
  projection (SLIP's text encoder is a CLIP-style transformer);
* ``AlbefDualEncoder`` — ClipViT visual tower projected from the CLS token
  (ALBEF vision_proj) + a BERT text encoder (MiniLM-architecture class)
  projected from its CLS token (ALBEF text_proj); ALBEF's cross-modal
  fusion head is not used by the reference's metrics and is out of scope.

Both satisfy the ``encode_image`` / ``encode_text`` protocol consumed by
srsem.explain.embedders.EmbedderSuite, so all five embedders (plain /
focus / unfocus / splice-focus) work unchanged over either backend.
Weights convert from the respective torch checkpoints via
srsem.utils.convert (ViT) + per-model projection matrices.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from srsem.backbones.vit import ClipViT
from srsem.pseudo.text_embed import MiniLMEncoder


def _as_proj(proj):
    """Accept a bare (in, out) matrix, a {"kernel","bias"} dict (the
    convert_albef layout), or a (kernel, bias) pair → (kernel, bias)."""
    if isinstance(proj, dict):
        return (jnp.asarray(proj["kernel"], jnp.float32),
                jnp.asarray(proj["bias"], jnp.float32))
    if isinstance(proj, (tuple, list)):
        return (jnp.asarray(proj[0], jnp.float32),
                jnp.asarray(proj[1], jnp.float32))
    w = jnp.asarray(proj, jnp.float32)
    return w, jnp.zeros((w.shape[-1],), jnp.float32)


class SlipDualEncoder:
    """SLIP ViT-B/16 joint space (512-d)."""

    def __init__(self, vit_variables, image_proj: np.ndarray,
                 text_encoder=None, text_variables=None,
                 text_proj: Optional[np.ndarray] = None, tokenizer=None,
                 vit: Optional[ClipViT] = None):
        self.vit = vit or ClipViT()
        self.vit_variables = vit_variables
        self.image_proj = jnp.asarray(image_proj, jnp.float32)
        self.text_encoder = text_encoder
        self.text_variables = text_variables
        self.text_proj = (jnp.asarray(text_proj, jnp.float32)
                          if text_proj is not None else None)
        self.tokenizer = tokenizer
        self._encode = jax.jit(
            lambda v, x: self.vit.apply(v, x)[0] @ self.image_proj)

    def encode_image(self, pixels) -> jax.Array:
        return self._encode(self.vit_variables, jnp.asarray(pixels))

    def encode_text(self, texts) -> jax.Array:
        if self.text_encoder is None or self.tokenizer is None:
            raise RuntimeError("SLIP text tower not configured")
        ids = self.tokenizer(texts)
        if isinstance(ids, dict):
            ids = ids["input_ids"]
        emb = self.text_encoder.apply(self.text_variables, jnp.asarray(ids))
        return emb @ self.text_proj if self.text_proj is not None else emb


class AlbefDualEncoder:
    """ALBEF unimodal joint space (256-d): image = L2-normalized
    ``vision_proj(ViT CLS)``, text = L2-normalized ``text_proj(BERT CLS)``
    (reference: albef/model_wrapper.py:93-97, 106-110 — both projections
    are biased Linears followed by ``F.normalize``).

    ``vit`` defaults to ALBEF's deit-style tower (no pre-norm, eps 1e-6,
    24×24 pos grid for 384px inputs — reference albef/vit.py:97-141);
    ``bert`` to a 12-layer BERT-base in CLS-pool mode.  Build the
    argument trees with srsem.utils.convert.convert_albef (wired through
    ``srsem convert --kind albef``)."""

    def __init__(self, vit_variables, vision_proj,
                 bert_variables=None, text_proj=None,
                 tokenizer=None, vit: Optional[ClipViT] = None,
                 bert: Optional[MiniLMEncoder] = None):
        self.vit = vit or ClipViT(use_norm_pre=False, ln_eps=1e-6,
                                  pos_grid=24, act="gelu",
                                  dtype=jnp.float32)
        self.vit_variables = vit_variables
        self.vision_proj = _as_proj(vision_proj)
        self.bert = bert or MiniLMEncoder(hidden=768, layers=12, heads=12,
                                          intermediate=3072, pool="cls")
        self.bert_variables = bert_variables
        self.text_proj = _as_proj(text_proj) if text_proj is not None else None
        self.tokenizer = tokenizer

        def encode_img(v, x):
            w, b = self.vision_proj
            emb = self.vit.apply(v, x)[0] @ w + b
            return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        self._encode_img = jax.jit(encode_img)

    def encode_image(self, pixels) -> jax.Array:
        return self._encode_img(self.vit_variables, jnp.asarray(pixels))

    def encode_text(self, texts) -> jax.Array:
        if self.bert_variables is None or self.tokenizer is None:
            raise RuntimeError("ALBEF text tower not configured")
        tok = self.tokenizer(texts)
        emb = self.bert.apply({"params": self.bert_variables},
                              jnp.asarray(tok["input_ids"]),
                              jnp.asarray(tok["attention_mask"]))
        if self.text_proj is None:
            return emb
        w, b = self.text_proj
        emb = emb @ w + b
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

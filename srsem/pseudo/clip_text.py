"""CLIP text tower + dual-encoder joint space.

The reference gets CLIP text/image embeddings from HF ``CLIPModel``
(reference: additional_approaches/src/clip/model_wrapper.py:6-105) and uses
them for C2I cosine scoring and the focus-embedding metrics.  Native
rebuild: the standard CLIP text transformer (49408-token vocab, width 512,
12 layers, 8 heads, causal mask, final LayerNorm, projection to the joint
space) in Flax, weight-convertible from OpenAI/HF checkpoints, paired with
our ResNet-50 attention-pool image tower (srsem.backbones.resnet) whose
embedding already lives in the same 1024-d joint space.

The BPE tokenizer is pluggable (HF tokenizer from a local cache, or any
callable ``texts -> (ids, attn_mask)``); this module owns only the math.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


class ClipTextBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, causal_mask: Array) -> Array:
        n, t, c = x.shape
        head_dim = c // self.heads
        dense = lambda name, feats: nn.Dense(  # noqa: E731
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,  # noqa: E731
                                       param_dtype=jnp.float32, name=name)

        h = ln("ln_1")(x).astype(self.dtype)
        qkv = dense("attn.qkv", 3 * c)(h).reshape(n, t, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(head_dim)
        scores = scores + causal_mask[None, None]
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        h = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, c)
        x = x + dense("attn.out_proj", c)(h).astype(x.dtype)

        h = ln("ln_2")(x).astype(self.dtype)
        h = dense("mlp.c_fc", 4 * c)(h)
        # CLIP uses QuickGELU: x * sigmoid(1.702 x)
        h = h * jax.nn.sigmoid(1.702 * h)
        return x + dense("mlp.c_proj", c)(h).astype(x.dtype)


class ClipTextEncoder(nn.Module):
    """token ids (N, T) → joint-space embedding (N, embed_dim)."""

    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context: int = 77
    embed_dim: int = 1024  # RN50 joint space; 512 for ViT-B CLIP
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids: Array) -> Array:
        n, t = ids.shape
        x = nn.Embed(self.vocab_size, self.width,
                     name="token_embedding")(ids).astype(self.dtype)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context, self.width), jnp.float32)
        x = x + pos[:t].astype(self.dtype)
        causal = jnp.triu(jnp.full((t, t), -1e9, jnp.float32), k=1)
        for l in range(self.layers):
            x = ClipTextBlock(self.width, self.heads, dtype=self.dtype,
                              name=f"resblocks.{l}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln_final")(x)
        # Take features at the EOT token (highest token id per row).
        eot = jnp.argmax(ids, axis=-1)
        feats = x[jnp.arange(n), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.embed_dim), jnp.float32)
        return feats.astype(jnp.float32) @ proj


class ClipDualEncoder:
    """Image + text towers sharing the joint space; the native replacement
    for HF CLIPModel in the C2I scoring path and the focus metrics."""

    def __init__(self, image_model, image_variables, text_variables=None,
                 embed_dim: int = 1024, tokenizer=None, context: int = 77):
        self.image_model = image_model
        self.image_variables = image_variables
        self.text_model = ClipTextEncoder(embed_dim=embed_dim, context=context)
        self.text_variables = text_variables
        self.tokenizer = tokenizer
        self._encode_image = jax.jit(
            lambda v, x: self.image_model.apply(v, x)[0])
        self._encode_text = jax.jit(
            lambda v, ids: self.text_model.apply(v, ids))

    def init_text(self, rng) -> None:
        ids = jnp.zeros((1, 77), jnp.int32)
        self.text_variables = self.text_model.init(rng, ids)

    def encode_image(self, images: Array) -> Array:
        """NHWC normalized images → (N, embed_dim)."""
        return self._encode_image(self.image_variables, images)

    def encode_text_ids(self, ids: Array) -> Array:
        return self._encode_text(self.text_variables, jnp.asarray(ids))

    def encode_text(self, texts) -> Array:
        if self.tokenizer is None:
            raise RuntimeError(
                "no tokenizer configured; pass token ids to encode_text_ids "
                "or supply a tokenizer (e.g. a local HF CLIPTokenizer)")
        ids = self.tokenizer(texts)
        if isinstance(ids, dict):
            ids = ids["input_ids"]
        return self.encode_text_ids(np.asarray(ids))

"""CLIP ViT-B/16 visual tower with per-block residual-branch taps, NHWC in.

The reference's ViT heads hook ``blocks.{l}.ls2`` — timm's LayerScale module
after the MLP branch (reference: models/global_eval_models.py:19,116,218).
For CLIP checkpoints LayerScale is the identity, so the tapped tensor is the
**MLP residual branch output before the residual add**, shape
``(batch, 1 + num_patches, width)``.  We reproduce exactly that: each block
emits its ``mlp(norm2(x))`` branch as the tap.

Layout (timm ``vit_base_patch16_clip_224``): 16x16/16 patch conv → prepend
class token → learned positional embedding → pre-norm (``norm_pre``) → 12
pre-LN transformer blocks → final LayerNorm.  The embedding returned is the
final class token (projection to the CLIP joint space lives in
srsem.pseudo.clip_text, which owns the contrastive tower pair).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def vit_block_taps(depth: int, total: int = 12, step: int = 1) -> Tuple[str, ...]:
    """Tap names for the ``depth`` deepest blocks (optionally strided), e.g.
    ``blocks.{11-depth..11}.ls2`` (reference: models/global_eval_models.py:19)
    or every 3rd block (reference: models/global_eval_models.py:116)."""
    last = total - 1
    return tuple(f"blocks.{l}.ls2" for l in range(last - (depth * step), last + 1, step) if l >= 0)


def _act(name: str, h):
    if name == "gelu":
        return nn.gelu(h, approximate=False)
    if name == "quick_gelu":
        # OpenAI CLIP's activation: x·sigmoid(1.702x).
        return h * jax.nn.sigmoid(1.702 * h)
    raise ValueError(f"unknown act {name!r}")


class ViTBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32
    act: str = "gelu"
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        dense = lambda name, feats: nn.Dense(  # noqa: E731
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=self.ln_eps, dtype=jnp.float32,
            param_dtype=jnp.float32, name=name)

        n, t, c = x.shape
        head_dim = c // self.heads

        h = ln("norm1")(x).astype(self.dtype)
        qkv = dense("attn.qkv", 3 * c)(h).reshape(n, t, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, self.dtype))
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        h = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, c)
        x = x + dense("attn.proj", c)(h).astype(x.dtype)

        h = ln("norm2")(x).astype(self.dtype)
        h = dense("mlp.fc1", 4 * c)(h)
        h = _act(self.act, h)
        mlp_branch = dense("mlp.fc2", c)(h).astype(x.dtype)
        # timm's ls2 is identity for CLIP ViTs → the hook captures exactly
        # this pre-residual branch output.  The caller performs the residual
        # add so gradient probes can perturb the branch.
        return x, mlp_branch


class ClipViT(nn.Module):
    patch: int = 16
    width: int = 768
    depth: int = 12
    heads: int = 12
    dtype: Any = jnp.bfloat16
    # Side of the positional-embedding grid the params were trained at
    # (14 = 224px/16).  Other input sizes interpolate at apply time.
    pos_grid: int = 14
    # "quick_gelu" for OpenAI CLIP checkpoints; "gelu" for timm/laion ones.
    act: str = "gelu"
    # DeiT-style towers (ALBEF's visual encoder — reference
    # additional_approaches/src/albef/vit.py:97-141) have NO pre-norm and
    # use eps=1e-6 LayerNorms; CLIP-ViT defaults keep both as-is.
    use_norm_pre: bool = True
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, tap_offsets=None) -> Tuple[Array, Dict[str, Array]]:
        taps: Dict[str, Array] = {}
        n, h, w, _ = x.shape
        patches = nn.Conv(
            self.width, (self.patch, self.patch), (self.patch, self.patch),
            padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
            name="patch_embed")(x.astype(self.dtype))
        gh, gw = patches.shape[1], patches.shape[2]
        tokens = patches.reshape(n, gh * gw, self.width)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.width), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (n, 1, self.width)), tokens],
            axis=1)
        # Positional table sized for the training grid; bilinearly
        # interpolated for other input sizes (the reference's ALBEF-style
        # pos-embed resize on load, SURVEY.md §2.6 / albef wrapper :58-60).
        nominal = self.pos_grid
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, nominal * nominal + 1, self.width), jnp.float32)
        from srsem.ops.image import interpolate_pos_embed

        pos = interpolate_pos_embed(pos, (gh, gw))
        tokens = tokens + pos.astype(self.dtype)
        if self.use_norm_pre:
            tokens = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                                  param_dtype=jnp.float32,
                                  name="norm_pre")(tokens)

        for l in range(self.depth):
            x_attn, branch = ViTBlock(
                self.width, self.heads, dtype=self.dtype, act=self.act,
                ln_eps=self.ln_eps, name=f"blocks.{l}")(tokens)
            name = f"blocks.{l}.ls2"
            if tap_offsets and name in tap_offsets:
                # Gradient-probe offset (srsem.explain.gradcam): the ls2
                # branch feeds the residual add, so jax.grad w.r.t. the
                # offset = d(output)/d(branch activation).
                branch = branch + tap_offsets[name].astype(branch.dtype)
            taps[name] = branch
            tokens = x_attn + branch

        tokens = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                              param_dtype=jnp.float32, name="norm")(tokens)
        return tokens[:, 0], taps

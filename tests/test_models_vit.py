"""ViT-backbone global-head forward tests (small towers)
(reference classes: models/global_eval_models.py:6-305)."""

import jax
import jax.numpy as jnp
import pytest

from srsem.core.config import BackboneConfig, GlobalModelConfig
from srsem.models.global_models import make_global_model


@pytest.fixture(scope="module")
def tiny_vit_backbone():
    return BackboneConfig(kind="vit_clip", image_size=64,
                          compute_dtype="float32", vit_width=96,
                          vit_depth=4, vit_heads=4)


@pytest.mark.parametrize("head,depth,expected_heads", [
    ("single_lin_vit", 2, 1),    # one shared Linear (reference :29)
    ("stages_vit", 1, 2),        # every 3rd block (reference :116)
    ("wperlay_vit", 2, 3),       # consecutive blocks (reference :218)
])
def test_vit_heads_forward_and_param_count(tiny_vit_backbone, head, depth,
                                           expected_heads, rng):
    cfg = GlobalModelConfig(backbone=tiny_vit_backbone, head=head, depth=depth)
    m = make_global_model(cfg)
    a = jax.random.uniform(rng, (2, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    vs = m.init(rng, a, b)
    out = m.apply(vs, a, b)
    assert out.shape == (2,)
    assert bool((out >= 0).all())
    agg = vs["params"]["aggregator"]
    assert len(agg) == expected_heads


def test_vit_pos_embed_interpolates_at_other_sizes(rng):
    from srsem.backbones.vit import ClipViT

    model = ClipViT(patch=16, width=96, depth=2, heads=4,
                    dtype=jnp.float32, pos_grid=4)  # trained at 64px
    x64 = jnp.zeros((1, 64, 64, 3))
    vs = model.init(rng, x64)
    # Apply at a different resolution: pos table interpolates.
    x96 = jnp.zeros((1, 96, 96, 3))
    emb, taps = model.apply(vs, x96)
    assert emb.shape == (1, 96)
    assert taps["blocks.1.ls2"].shape == (1, 1 + 36, 96)

"""Behavioral tests for the global pair-scoring regressors.

The reference has no tests (SURVEY.md §4); these encode its documented
numerics: squared-diff features, 1x1-conv heads, spatial→layer mean, final
ReLU (reference: models/global_eval_models.py:379-395)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsem.core.config import BackboneConfig, GlobalModelConfig
from srsem.models.global_models import (
    make_global_model,
    stage_taps_for,
    wperlay_taps,
)


def _make(head, kind="resnet50_clip", depth=2, enc_ft=False):
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind=kind, image_size=64, compute_dtype="float32"),
        head=head, depth=depth, enc_ft=enc_ft)
    return make_global_model(cfg), cfg


@pytest.mark.parametrize("head,kind", [
    ("stages_cnn", "resnet50_clip"),
    ("stages_cnn", "resnet50"),
    ("wperlay_cnn", "resnet50_clip"),
])
def test_identical_pair_diff_heads_score_from_bias_only(head, kind, rng):
    """Identical inputs → all squared diffs are zero → score is
    relu(mean(bias)) of the heads, independent of the image content."""
    model, _ = _make(head, kind)
    x = jax.random.uniform(rng, (2, 64, 64, 3))
    vs = model.init(rng, x, x)
    s_same = model.apply(vs, x, x)
    other = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 64, 3))
    s_same2 = model.apply(vs, other, other)
    np.testing.assert_allclose(np.asarray(s_same), np.asarray(s_same2), atol=1e-5)


def test_scores_nonnegative_and_batch_shaped(rng):
    model, _ = _make("stages_cnn", depth=3)
    a = jax.random.uniform(rng, (3, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(1), (3, 64, 64, 3))
    vs = model.init(rng, a, b)
    s = model.apply(vs, a, b)
    assert s.shape == (3,)
    assert bool((s >= 0).all())  # final ReLU


def test_tap_selection_matches_reference_wanted_layers():
    # reference: models/global_eval_models.py:327 — range(3-depth, 4) is
    # depth+1 stages: depth=1 → stages 2,3.
    assert stage_taps_for("resnet50_clip", 1) == (
        "stages.2.2.act", "stages.3.2.act")
    assert stage_taps_for("resnet50_clip", 3) == (
        "stages.0.2.act", "stages.1.2.act", "stages.2.2.act", "stages.3.2.act")
    # reference: models/global_eval_models.py:701 — range(4-depth, 5).
    assert stage_taps_for("resnet50", 2) == (
        "layer2.2.act3", "layer3.2.act3", "layer4.2.act3")
    # reference: models/global_eval_models.py:832-833 — last depth+1 of 12
    assert wperlay_taps(1) == ("stages.3.1.act", "stages.3.2.act")
    assert len(wperlay_taps(11)) == 12


def test_head_param_shapes_match_reference_conv_heads(rng):
    """stages_cnn heads are 1x1 convs Conv2d(256·2^s, 1) for s in
    range(3-depth, 4) (reference: models/global_eval_models.py:336)."""
    model, _ = _make("stages_cnn", depth=3)
    x = jnp.zeros((1, 64, 64, 3))
    vs = model.init(rng, x, x)
    agg = vs["params"]["aggregator"]
    shapes = {k: v["kernel"].shape for k, v in agg.items()}
    assert shapes == {"w_layers.0": (256, 1), "w_layers.1": (512, 1),
                      "w_layers.2": (1024, 1), "w_layers.3": (2048, 1)}


def test_pooling_head_input_dim(rng):
    """MLP input = Σ 256·2^s · 2 over the depth+1 tapped stages
    (reference: models/global_eval_models.py:459)."""
    model, _ = _make("stages_cnn_pooling", depth=2)
    x = jnp.zeros((1, 64, 64, 3))
    vs = model.init(rng, x, x)
    k = vs["params"]["aggregator"]["fin_lin.0"]["kernel"]
    assert k.shape == ((512 + 1024 + 2048) * 2, 2056)


def test_emb_lin_uses_embeddings_only(rng):
    model, _ = _make("emb_lin")
    x = jnp.zeros((1, 64, 64, 3))
    vs = model.init(rng, x, x)
    k = vs["params"]["aggregator"]["fin_lin.0"]["kernel"]
    assert k.shape == (2048, 1028)  # concat of two 1024-d CLIP embeddings


def test_frozen_backbone_gets_no_gradient(rng):
    model, _ = _make("stages_cnn", depth=1)
    a = jax.random.uniform(rng, (1, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    # Pick an init whose score clears the final ReLU, else its gradient is
    # legitimately zero (dead-ReLU at init is possible with depth=1).
    for seed in range(16):
        vs = model.init(jax.random.PRNGKey(seed), a, b)
        if float(model.apply(vs, a, b)[0]) > 0:
            break
    else:
        pytest.skip("no active init found")

    def loss(params):
        return jnp.sum(model.apply({"params": params}, a, b))

    grads = jax.grad(loss)(vs["params"])
    backbone_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["backbone"]))
    head_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["aggregator"]))
    assert backbone_norm == 0.0
    assert head_norm > 0.0


def test_unet_global_head_returns_unbounded_map(rng):
    """The reference's global CLIP_lpips_Unet copy has NO final sigmoid
    (models/global_eval_models.py:921-1068)."""
    import jax

    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"),
        head="unet_global")
    model = make_global_model(cfg)
    a = jax.random.uniform(rng, (1, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(9), (1, 64, 64, 3))
    vs = model.init(rng, a, b)
    out = model.apply(vs, a, b)
    assert out.shape == (1, 64, 64)
    # ReLU output without sigmoid → values can exceed 1
    assert float(out.min()) >= 0.0


def test_head_bias_init_torch_mode_moments(rng):
    """``head_bias_init="torch"`` samples torch's Conv2d/Linear default
    bias distribution U(±1/√fan_in) — the reference scoring heads never
    call init_weights, so their biases come from torch's
    ``reset_parameters`` (reference: models/global_eval_models.py:361-369).
    Moments of the initializer match torch's over a large sample."""
    import torch

    from srsem.models.global_models import head_bias_initializer

    fan_in = 256
    bound = fan_in ** -0.5
    init = head_bias_initializer("torch", fan_in)
    vals = np.asarray(init(rng, (20000,), jnp.float32))
    assert float(np.abs(vals).max()) <= bound
    assert abs(float(vals.mean())) < 0.003
    # U(±bound) has std bound/√3.
    np.testing.assert_allclose(float(vals.std()), bound / np.sqrt(3.0),
                               rtol=0.05)

    # torch's own default: every Conv2d(C→1, 1x1) bias lies in the bound,
    # and the pooled sample std agrees with U(±bound).
    torch.manual_seed(0)
    tb = np.asarray([
        float(torch.nn.Conv2d(fan_in, 1, 1).bias.detach())
        for _ in range(600)])
    assert float(np.abs(tb).max()) <= bound
    np.testing.assert_allclose(float(tb.std()), bound / np.sqrt(3.0),
                               rtol=0.15)


def test_head_bias_init_config_modes(rng):
    """Model-level wiring: the default ("live") initializes every scoring
    head bias to exactly +0.01; "torch" draws each within its OWN
    fan_in bound (per-stage channel counts differ) and non-constant."""
    from flax import traverse_util

    def init_biases(mode):
        cfg = GlobalModelConfig(
            backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                    compute_dtype="float32"),
            head="stages_cnn", depth=2, head_bias_init=mode)
        model = make_global_model(cfg)
        x = jax.random.uniform(rng, (1, 64, 64, 3))
        vs = model.init(jax.random.PRNGKey(11), x, x)
        flat = traverse_util.flatten_dict(vs["params"]["aggregator"])
        out = {}
        for path, v in flat.items():
            if path[-1] == "bias":
                kernel = flat[path[:-1] + ("kernel",)]
                out[path[0]] = (float(v[0]), kernel.shape[0])
        return out

    live = init_biases("live")
    assert len(live) == 3  # depth=2 → 3 tapped stages
    assert all(b == pytest.approx(0.01) for b, _ in live.values())

    torch_mode = init_biases("torch")
    for name, (b, fan_in) in torch_mode.items():
        assert abs(b) <= fan_in ** -0.5, (name, b, fan_in)
    assert len({b for b, _ in torch_mode.values()}) == 3  # non-constant

    with pytest.raises(ValueError, match="head_bias_init"):
        init_biases("bogus")

    # The MLP heads legitimately ignore the mode (their reference classes
    # call init_weights explicitly), but a typo must still fail at build
    # time there too — not only on the heads that consult it.
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"),
        head="stages_cnn_pooling", depth=2, head_bias_init="bogus")
    model = make_global_model(cfg)
    x = jax.random.uniform(rng, (1, 64, 64, 3))
    with pytest.raises(ValueError, match="head_bias_init"):
        model.init(jax.random.PRNGKey(11), x, x)


def test_make_global_model_unet_split_tower(rng):
    """head='unet_global' propagates split_tower so mesh-aware callers
    (PairScorer on a data>1 mesh) avoid the GT+SR concat's GSPMD
    all-to-all reshard (CluUnet.split_tower; CLAUDE.md convention)."""
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=32,
                                compute_dtype="float32"),
        head="unet_global")
    assert make_global_model(cfg).split_tower is False
    m = make_global_model(cfg, split_tower=True)
    assert m.split_tower is True and m.sigmoid is False

"""Behavioral tests for the CLU local-map models
(reference: models/local_eval_models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsem.core.config import BackboneConfig, LocalModelConfig
from srsem.models.local_models import make_local_model


def _make(kind="resnet50_clip", v2=False, lora_rank=None):
    cfg = LocalModelConfig(
        backbone=BackboneConfig(kind=kind, image_size=64, compute_dtype="float32"),
        v2=v2, lora_rank=lora_rank)
    return make_local_model(cfg)


@pytest.mark.parametrize("kind,v2", [
    ("resnet50_clip", False), ("resnet50", False), ("resnet50_clip", True),
    ("resnet50", True),
])
def test_map_output_resolution_and_range(kind, v2, rng):
    model = _make(kind, v2)
    a = jax.random.uniform(rng, (2, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    vs = model.init(rng, a, b, train=False)
    out = model.apply(vs, a, b, train=False)
    assert out.shape == (2, 64, 64)  # map at input resolution
    # final ReLU feeds the sigmoid → outputs live in [0.5, 1] (reference
    # quirk: decoder[0] ends in ReLU then sigmoid,
    # models/local_eval_models.py:39-45,123).
    assert float(out.min()) >= 0.5 - 1e-6
    assert float(out.max()) <= 1.0 + 1e-6


def test_decoder_channel_plan_matches_reference(rng):
    """Conv-in channels mirror models/local_eval_models.py:38-82."""
    model = _make("resnet50_clip", v2=False)
    x = jnp.zeros((1, 64, 64, 3))
    vs = model.init(rng, x, x, train=False)
    p = vs["params"]
    conv_in = {lvl: p[f"decoder.{lvl}"]["conv1"]["kernel"].shape[2]
               for lvl in range(5)}
    assert conv_in == {0: 256 + 64, 1: 256 + 512, 2: 512 + 1024,
                       3: 1024 + 2048, 4: 2048}


def test_v2_adds_one_channel_per_level(rng):
    model = _make("resnet50_clip", v2=True)
    x = jnp.zeros((1, 64, 64, 3))
    vs = model.init(rng, x, x, train=False)
    p = vs["params"]
    conv_in = {lvl: p[f"decoder.{lvl}"]["conv1"]["kernel"].shape[2]
               for lvl in range(5)}
    assert conv_in == {0: 256 + 64 + 1, 1: 256 + 512 + 1, 2: 512 + 1024 + 1,
                       3: 1024 + 2048 + 1, 4: 2048 + 1}


def test_lora_params_exist_and_only_decoder_plus_lora_train(rng):
    from srsem.train.partition import partition_params, trainable_predicate
    from flax import traverse_util

    model = _make("resnet50_clip", lora_rank=4)
    x = jnp.zeros((1, 64, 64, 3))
    vs = model.init(rng, x, x, train=False)
    flat = traverse_util.flatten_dict(vs["params"])
    lora_keys = [k for k in flat if "lora_a" in k or "lora_b" in k]
    assert lora_keys, "LoRA factors missing"

    trainable, frozen = partition_params(
        vs["params"], trainable_predicate(lora=True))
    t_flat = traverse_util.flatten_dict(trainable)
    assert any("lora_a" in k for k in t_flat)
    assert all(k[0] != "backbone" or "lora_a" in k or "lora_b" in k
               for k in t_flat)


def test_lora_zero_init_preserves_frozen_forward(rng):
    """LoRA A=0 init → forward identical to the frozen model at step 0
    (pytora/standard LoRA semantics)."""
    a = jax.random.uniform(rng, (1, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))

    base = _make("resnet50_clip", lora_rank=None)
    vs_base = base.init(rng, a, b, train=False)
    lora = _make("resnet50_clip", lora_rank=4)
    vs_lora = lora.init(rng, a, b, train=False)

    out_base = base.apply(vs_base, a, b, train=False)
    out_lora = lora.apply(vs_lora, a, b, train=False)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_lora), atol=1e-6)


def test_bf16_decoder_matches_f32_maps(rng):
    """The bf16 serving decoder (decoder_dtype="bfloat16") must agree with
    the f32 parity path to bf16 precision: same params, same inputs."""
    import dataclasses

    cfg32 = LocalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"))
    cfg16 = dataclasses.replace(cfg32, decoder_dtype="bfloat16")
    m32 = make_local_model(cfg32)
    m16 = make_local_model(cfg16)
    a = jax.random.uniform(rng, (2, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    vs = m32.init(rng, a, b, train=False)
    out32 = np.asarray(m32.apply(vs, a, b, train=False))
    out16 = np.asarray(m16.apply(vs, a, b, train=False))
    assert out16.dtype == np.float32  # map output stays f32
    # bf16 error is heavy-tailed through 10 random-init conv layers, so the
    # contract is statistical (maps are consumed through quantile
    # binarization / overlays): bulk agreement + rank correlation.
    err = np.abs(out16 - out32)
    assert np.mean(err) < 5e-3, float(np.mean(err))
    assert np.mean(err < 2e-2) > 0.95, float(np.mean(err < 2e-2))
    corr = np.corrcoef(out16.ravel(), out32.ravel())[0, 1]
    assert corr > 0.995, corr
    # and the parity default is bit-stable against itself
    np.testing.assert_array_equal(
        out32, np.asarray(m32.apply(vs, a, b, train=False)))


def test_bf16_output_dtype_narrows_map_only(rng):
    """output_dtype="bfloat16" narrows only the RETURNED buffer: sigmoid
    still runs in f32, so values equal the f32-output model rounded to
    bf16 (one rounding step, not a bf16 compute chain)."""
    import dataclasses

    cfg32 = LocalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"))
    cfgo = dataclasses.replace(cfg32, output_dtype="bfloat16")
    m32 = make_local_model(cfg32)
    mo = make_local_model(cfgo)
    a = jax.random.uniform(rng, (2, 64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    vs = m32.init(rng, a, b, train=False)
    out32 = m32.apply(vs, a, b, train=False)
    outo = mo.apply(vs, a, b, train=False)
    assert outo.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(outo), np.asarray(out32.astype(jnp.bfloat16)))

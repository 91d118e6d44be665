"""MFU pass 2: roofline position + candidate optimizations, on-chip.

1. XLA cost_analysis of the headline program: FLOPs + HBM bytes accessed →
   is 24% MFU actually the bandwidth roofline for this model?
2. Space-to-depth stem prototype: the 7x7/2 RGB conv re-expressed as a
   4x4/1 conv over a 2x-space-to-depth input (12 channels) — the classic
   MLPerf ResNet trick for TPU stem efficiency.
3. int8 probe: representative conv timings in int8 vs bf16 to size a
   quantized serving mode.

Usage: python scripts/profile_mfu2.py   (from anywhere; fixes sys.path)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from benchlib import note, sync_time  # noqa: E402


def main():
    from srsem.core.config import BackboneConfig, GlobalModelConfig
    from srsem.data.preprocess import Preprocess
    from srsem.models.global_models import make_global_model

    batch, size = 128, 224
    rng = jax.random.PRNGKey(0)
    host = np.random.default_rng(0)
    a_u8 = jnp.asarray(host.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    b_u8 = jnp.asarray(host.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    z = jnp.zeros((1, size, size, 3), jnp.float32)

    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=size,
                                compute_dtype="bfloat16"),
        head="stages_cnn", depth=3)
    model = make_global_model(cfg)
    pre = Preprocess.for_backbone("resnet50", size)
    variables = model.init(rng, z, z)

    @jax.jit
    def score(v, a, b):
        return model.apply(v, pre.device_normalize(a), pre.device_normalize(b))

    # ---- 1. cost analysis ------------------------------------------------
    try:
        compiled = jax.jit(score).lower(variables, a_u8, b_u8).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", 0.0)
        byt = ca.get("bytes accessed", 0.0)
        t_meas = sync_time(score, (variables, a_u8, b_u8), 20)
        note(exp="cost_analysis", flops_T=round(flops / 1e12, 3),
             bytes_GB=round(byt / 1e9, 3),
             arithmetic_intensity=round(flops / max(byt, 1), 1),
             t_ms=round(t_meas * 1e3, 3),
             implied_GBps=round(byt / t_meas / 1e9, 1),
             implied_TFs=round(flops / t_meas / 1e12, 1))
    except Exception as e:
        note(exp="cost_analysis", error=str(e)[:300])

    # ---- 2. space-to-depth stem prototype --------------------------------
    x2n = jnp.concatenate([pre.device_normalize(a_u8),
                           pre.device_normalize(b_u8)]).astype(jnp.bfloat16)
    w = jax.random.normal(rng, (7, 7, 3, 64), jnp.bfloat16) * 0.05

    @jax.jit
    def stem_ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def stem_s2d(x, w):
        n, h, w_, c = x.shape
        # pad H,W by (3, 5): left pad 3 as the reference conv, right pad to
        # an even total so the 2x space-to-depth regroup divides evenly
        xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
        hs, ws = xp.shape[1] // 2, xp.shape[2] // 2
        xs = xp.reshape(n, hs, 2, ws, 2, c).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(n, hs, ws, 4 * c)
        # kernel: pad 7->8, regroup into (4,4,12,64); iteration order must
        # match the input regroup (dy, dx, c).
        wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        ws8 = wp.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        ws8 = ws8.reshape(4, 4, 12, 64)
        return jax.lax.conv_general_dilated(
            xs, ws8, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, :112, :112]

    ref = stem_ref(x2n, w)
    s2d = stem_s2d(x2n, w)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - s2d.astype(jnp.float32))))
    # device_get of raw conv outputs is transfer-dominated on the axon
    # tunnel -- time sum-reduced variants so only a scalar crosses.
    stem_ref_s = jax.jit(lambda x, w: jnp.sum(stem_ref(x, w)))
    stem_s2d_s = jax.jit(lambda x, w: jnp.sum(stem_s2d(x, w)))
    t_ref = sync_time(stem_ref_s, (x2n, w), 30)
    t_s2d = sync_time(stem_s2d_s, (x2n, w), 30)
    note(exp="stem_s2d", max_err=err, ref_ms=round(t_ref * 1e3, 3),
         s2d_ms=round(t_s2d * 1e3, 3),
         speedup=round(t_ref / t_s2d, 2),
         shapes_equal=ref.shape == s2d.shape)

    # ---- 3. int8 conv probe ----------------------------------------------
    try:
        xq = jax.random.normal(rng, (256, 56, 56, 256))
        wq = jax.random.normal(rng, (3, 3, 256, 256)) * 0.05
        xb, wb = xq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16)
        xi = jnp.clip(xq * 16, -127, 127).astype(jnp.int8)
        wi = jnp.clip(wq * 512, -127, 127).astype(jnp.int8)

        @jax.jit
        def conv_bf16(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def conv_int8(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        conv_bf16_s = jax.jit(lambda x, w: jnp.sum(conv_bf16(x, w)))
        conv_int8_s = jax.jit(lambda x, w: jnp.sum(conv_int8(x, w)))
        tb = sync_time(conv_bf16_s, (xb, wb), 20)
        ti = sync_time(conv_int8_s, (xi, wi), 20)
        note(exp="int8_conv_probe", bf16_ms=round(tb * 1e3, 3),
             int8_ms=round(ti * 1e3, 3), speedup=round(tb / ti, 2))
    except Exception as e:
        note(exp="int8_conv_probe", error=str(e)[:300])

    # ---- 4. dtype of whole-graph: try f32 params pre-cast to bf16 --------
    try:
        vars_bf16 = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            variables)
        t = sync_time(score, (vars_bf16, a_u8, b_u8), 20)
        note(exp="precast_bf16_params", ms=round(t * 1e3, 3),
             pairs_per_s=round(batch / t, 1))
    except Exception as e:
        note(exp="precast_bf16_params", error=str(e)[:300])


if __name__ == "__main__":
    main()

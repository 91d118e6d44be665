"""CLU map-model throughput dissection (VERDICT r1 next-step #3, CLU part).

Measures, in one TPU claim: cost analysis (FLOPs vs bytes → roofline
position), f32 vs bf16 decoder compute, bf16 upsample einsums, and a
per-level decoder ablation to find the hot block.

Usage: python scripts/profile_clu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from benchlib import note, sync_time  # noqa: E402


def main():
    from srsem.data.preprocess import Preprocess
    from srsem.models.local_models import CluUnet

    batch, size = 32, 224
    rng = jax.random.PRNGKey(0)
    host = np.random.default_rng(0)
    a_u8 = jnp.asarray(host.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    b_u8 = jnp.asarray(host.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    z = jnp.zeros((1, size, size, 3), jnp.float32)
    pre = Preprocess.for_backbone("resnet50_clip", size)

    def build(decoder_dtype):
        model = CluUnet(backbone_kind="resnet50_clip",
                        compute_dtype=jnp.bfloat16,
                        decoder_dtype=decoder_dtype, image_size=size)
        variables = model.init(rng, z, z, train=False)

        @jax.jit
        def score(v, a, b):
            m = model.apply(v, pre.device_normalize(a),
                            pre.device_normalize(b), train=False)
            return jnp.sum(m), m[0, :4, :4]  # scalar sync; tiny slice out

        return model, variables, score

    for name, dd in (("f32_decoder", jnp.float32),
                     ("bf16_decoder", jnp.bfloat16)):
        model, variables, score = build(dd)
        try:
            compiled = jax.jit(score).lower(variables, a_u8, b_u8).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops, byt = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
        except Exception:
            flops = byt = 0.0
        t = sync_time(score, (variables, a_u8, b_u8), 20)
        note(exp=f"clu_{name}", ms=round(t * 1e3, 3),
             maps_per_s=round(batch / t, 1),
             flops_T=round(flops / 1e12, 3), bytes_GB=round(byt / 1e9, 3),
             implied_GBps=round(byt / t / 1e9, 1),
             implied_TFs=round(flops / t / 1e12, 1))

    # --- ablation: truncate the decoder at each level ----------------------
    from srsem.backbones.resnet import ClipResNet50, CLIP_STEM_TAP, CLIP_STAGE_TAPS
    from srsem.models.local_models import DecoderBlock
    from srsem.ops.image import upsample_x2_align_corners

    bb = ClipResNet50(dtype=jnp.bfloat16, image_size=size)
    bvars = bb.init(rng, z)
    names = (CLIP_STEM_TAP,) + CLIP_STAGE_TAPS

    @jax.jit
    def tower_only(v, a, b):
        x = jnp.concatenate([pre.device_normalize(a), pre.device_normalize(b)])
        emb, taps = bb.apply(v, x)
        return emb.sum() + sum(jnp.sum(taps[n]) for n in names)

    t = sync_time(tower_only, (bvars, a_u8, b_u8), 20)
    note(exp="clu_tower_only", ms=round(t * 1e3, 3),
         maps_per_s=round(batch / t, 1))

    # Per-level decoder cost: run blocks deepest→level L only.
    from srsem.models.local_models import _LEVEL_CHANNELS

    _, variables, _ = build(jnp.float32)
    blocks = [
        DecoderBlock(64, 1, final_kernel=1, final_bn=False,
                     dtype=jnp.float32) if lvl == 0
        else DecoderBlock(ch, ch, dtype=jnp.float32)
        for lvl, ch in enumerate(_LEVEL_CHANNELS)
    ]

    def block_vars(v, lvl):
        return {"params": v["params"][f"decoder.{lvl}"],
                "batch_stats": v["batch_stats"][f"decoder.{lvl}"]}

    for stop in (4, 3, 2, 1, 0):
        def partial_decode(v, a, b, stop=stop):
            an, bn = pre.device_normalize(a), pre.device_normalize(b)
            n = an.shape[0]
            _, taps = bb.apply({"params": v["params"]["backbone"]},
                               jnp.concatenate([an, bn]))
            diffs = [((taps[nm][:n].astype(jnp.float32)
                       - taps[nm][n:].astype(jnp.float32)) ** 2)
                     for nm in names]
            h = blocks[4].apply(block_vars(v, 4), diffs[-1], False)
            h = upsample_x2_align_corners(h)
            for lvl in range(3, stop - 1, -1):
                h = jnp.concatenate([diffs[lvl], h], axis=-1)
                h = blocks[lvl].apply(block_vars(v, lvl), h, False)
                h = upsample_x2_align_corners(h)
            return jnp.sum(h)

        fn = jax.jit(partial_decode)
        t = sync_time(fn, (variables, a_u8, b_u8), 15)
        note(exp=f"clu_decode_to_level_{stop}", ms=round(t * 1e3, 3))


if __name__ == "__main__":
    main()

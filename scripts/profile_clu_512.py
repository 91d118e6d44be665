"""CLU map-model roofline at 512px (VERDICT r4 next-step #4).

The 224px dissection (scripts/profile_clu.py, BENCH_NOTES r2) justified the
CLU throughput against cost analysis; the 512px number (~190 maps/s across
rounds) never got the same treatment.  This script measures, in one TPU
claim, at the realistic SR-output size (BASELINE config #1 is a 512px
pair):

* cost_analysis (FLOPs + HBM bytes per execution) for the f32-decoder and
  bf16-decoder programs at batch 8 -> implied GB/s and TF/s vs the v5e
  peaks (~0.82 TB/s HBM, ~197 TF/s bf16) — where on the roofline the
  program sits;
* batch scaling (4/8/16) — whether 190 maps/s is a batch artifact;
* tower-only vs full model — how much the decoder adds at 512px;
* per-level truncated decode — which level dominates at this size.

Usage: python scripts/profile_clu_512.py  (claims the TPU; run alone).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_HBM_GBPS = 820.0
V5E_BF16_TFS = 197.0


from benchlib import note, sync_time  # noqa: E402


def main():
    from srsem.data.preprocess import Preprocess
    from srsem.models.local_models import CluUnet

    size = 512
    rng = jax.random.PRNGKey(0)
    host = np.random.default_rng(0)
    z = jnp.zeros((1, size, size, 3), jnp.float32)
    pre = Preprocess.for_backbone("resnet50_clip", size)

    def inputs(batch):
        a = jnp.asarray(host.integers(0, 256, (batch, size, size, 3),
                                      dtype=np.uint8))
        b = jnp.asarray(host.integers(0, 256, (batch, size, size, 3),
                                      dtype=np.uint8))
        return a, b

    def build(decoder_dtype):
        model = CluUnet(backbone_kind="resnet50_clip",
                        compute_dtype=jnp.bfloat16,
                        decoder_dtype=decoder_dtype, image_size=size)
        variables = model.init(rng, z, z, train=False)

        @jax.jit
        def score(v, a, b):
            m = model.apply(v, pre.device_normalize(a),
                            pre.device_normalize(b), train=False)
            return jnp.sum(m), m[0, :4, :4]

        return model, variables, score

    # --- roofline: cost analysis + timing, f32 vs bf16 decoder, b8 -------
    batch = 8
    a_u8, b_u8 = inputs(batch)
    for name, dd in (("f32_decoder", jnp.float32),
                     ("bf16_decoder", jnp.bfloat16)):
        model, variables, score = build(dd)
        try:
            compiled = jax.jit(score).lower(variables, a_u8, b_u8).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops, byt = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
        except Exception as e:
            note(exp=f"cost_analysis_{name}", error=str(e)[:200])
            flops = byt = 0.0
        t = sync_time(score, (variables, a_u8, b_u8), 12)
        gbps = byt / t / 1e9
        tfs = flops / t / 1e12
        note(exp=f"clu512_{name}", ms=round(t * 1e3, 2),
             maps_per_s=round(batch / t, 1),
             flops_T=round(flops / 1e12, 3), bytes_GB=round(byt / 1e9, 3),
             intensity_flops_per_byte=round(flops / max(byt, 1), 1),
             implied_GBps=round(gbps, 1),
             pct_hbm_peak=round(100 * gbps / V5E_HBM_GBPS, 1),
             implied_TFs=round(tfs, 1),
             pct_bf16_peak=round(100 * tfs / V5E_BF16_TFS, 1))

    # --- batch scaling on the bf16 decoder (the serving config) ----------
    model16, vars16, score16 = build(jnp.bfloat16)
    for b in (4, 8, 16):
        aa, bb = inputs(b)
        t = sync_time(score16, (vars16, aa, bb), 10)
        note(exp=f"clu512_bf16_b{b}", ms=round(t * 1e3, 2),
             maps_per_s=round(b / t, 1))

    # --- tower-only at 512px ---------------------------------------------
    from srsem.backbones.resnet import (CLIP_STAGE_TAPS, CLIP_STEM_TAP,
                                        ClipResNet50)

    bb_net = ClipResNet50(dtype=jnp.bfloat16, image_size=size)
    bvars = bb_net.init(rng, z)
    names = (CLIP_STEM_TAP,) + CLIP_STAGE_TAPS

    @jax.jit
    def tower_only(v, a, b):
        x = jnp.concatenate([pre.device_normalize(a),
                             pre.device_normalize(b)])
        emb, taps = bb_net.apply(v, x)
        return emb.sum() + sum(jnp.sum(taps[n]) for n in names)

    t = sync_time(tower_only, (bvars, a_u8, b_u8), 12)
    note(exp="clu512_tower_only", ms=round(t * 1e3, 2),
         maps_per_s=round(batch / t, 1))

    # --- per-level truncated decode (bf16 decoder path) -------------------
    from srsem.models.local_models import _LEVEL_CHANNELS, DecoderBlock
    from srsem.ops.image import upsample_x2_align_corners

    _, variables, _ = build(jnp.bfloat16)
    blocks = [
        DecoderBlock(64, 1, final_kernel=1, final_bn=False,
                     dtype=jnp.bfloat16) if lvl == 0
        else DecoderBlock(ch, ch, dtype=jnp.bfloat16)
        for lvl, ch in enumerate(_LEVEL_CHANNELS)
    ]

    def block_vars(v, lvl):
        return {"params": v["params"][f"decoder.{lvl}"],
                "batch_stats": v["batch_stats"][f"decoder.{lvl}"]}

    for stop in (4, 3, 2, 1, 0):
        def partial_decode(v, a, b, stop=stop):
            an, bn = pre.device_normalize(a), pre.device_normalize(b)
            n = an.shape[0]
            _, taps = bb_net.apply({"params": v["params"]["backbone"]},
                                   jnp.concatenate([an, bn]))
            diffs = [((taps[nm][:n].astype(jnp.bfloat16)
                       - taps[nm][n:].astype(jnp.bfloat16)) ** 2)
                     for nm in names]
            h = blocks[4].apply(block_vars(v, 4), diffs[-1], False)
            h = upsample_x2_align_corners(h, compute_dtype=jnp.bfloat16)
            for lvl in range(3, stop - 1, -1):
                h = jnp.concatenate([diffs[lvl], h], axis=-1)
                h = blocks[lvl].apply(block_vars(v, lvl), h, False)
                h = upsample_x2_align_corners(h, compute_dtype=jnp.bfloat16)
            return jnp.sum(h)

        fn = jax.jit(partial_decode)
        t = sync_time(fn, (variables, a_u8, b_u8), 8)
        note(exp=f"clu512_decode_to_level_{stop}", ms=round(t * 1e3, 2))


if __name__ == "__main__":
    main()

"""MFU dissection of the headline global-scoring path (VERDICT r1 #3).

Runs a ladder of experiments in ONE process/TPU claim and prints JSON
lines: dispatch-amortization (scan-of-k inside jit), backbone vs heads,
stem vs stages, normalize cost, and batch scaling — to locate where the
~75% of peak goes.  Results land in BENCH_NOTES.md.

Usage (real TPU): python scripts/profile_mfu.py
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
    from srsem.backbones.resnet import ImageNetResNet50

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

    flops_per_pair = 2 * 4.09e9  # two RN50 forwards @224px

    @jax.jit
    def score(v, a, b):
        return model.apply(v, pre.device_normalize(a), pre.device_normalize(b))

    t = sync_time(score, (variables, a_u8, b_u8), 30)
    note(exp="baseline_b128", ms=round(t * 1e3, 3),
         pairs_per_s=round(batch / t, 1),
         mfu_pct=round(100 * batch * flops_per_pair / t / 197e12, 1))

    # --- dispatch amortization: K forwards inside one jit via scan ------
    K = 8

    @jax.jit
    def score_k(v, a, b):
        def body(carry, _):
            s = model.apply(v, pre.device_normalize(a), pre.device_normalize(b))
            return carry + jnp.sum(s), None

        total, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return total

    t = sync_time(score_k, (variables, a_u8, b_u8), 10)
    note(exp=f"scan_of_{K}_b128", ms_per_forward=round(t / K * 1e3, 3),
         pairs_per_s=round(batch * K / t, 1),
         mfu_pct=round(100 * batch * K * flops_per_pair / t / 197e12, 1))

    # --- backbone-only (2N concat, no heads) ----------------------------
    bb = ImageNetResNet50(dtype=jnp.bfloat16)
    bvars = {"params": variables["params"]["backbone"]}

    @jax.jit
    def tower_2n(v, a, b):
        x = jnp.concatenate([pre.device_normalize(a), pre.device_normalize(b)])
        emb, taps = bb.apply(v, x)
        return emb.sum() + sum(jnp.sum(t) for t in taps.values())

    t = sync_time(tower_2n, (bvars, a_u8, b_u8), 30)
    note(exp="tower_2n_only", ms=round(t * 1e3, 3),
         pairs_per_s=round(batch / t, 1),
         mfu_pct=round(100 * batch * flops_per_pair / t / 197e12, 1))

    # --- tower WITHOUT taps materialized (embedding only) ---------------
    @jax.jit
    def tower_emb_only(v, a, b):
        x = jnp.concatenate([pre.device_normalize(a), pre.device_normalize(b)])
        emb, _ = bb.apply(v, x)
        return jnp.sum(emb)

    t = sync_time(tower_emb_only, (bvars, a_u8, b_u8), 30)
    note(exp="tower_emb_only", ms=round(t * 1e3, 3),
         pairs_per_s=round(batch / t, 1),
         mfu_pct=round(100 * batch * flops_per_pair / t / 197e12, 1))

    # --- normalize alone --------------------------------------------------
    @jax.jit
    def norm_only(a, b):
        return jnp.sum(pre.device_normalize(a)) + jnp.sum(pre.device_normalize(b))

    t = sync_time(norm_only, (a_u8, b_u8), 30)
    note(exp="normalize_only", ms=round(t * 1e3, 3))

    # --- stem alone (7x7/2 conv on RGB) -----------------------------------
    from srsem.backbones.resnet import LoraConv

    stem = LoraConv(64, (7, 7), (2, 2), ((3, 3), (3, 3)), dtype=jnp.bfloat16)
    x2n = jnp.concatenate([pre.device_normalize(a_u8),
                           pre.device_normalize(b_u8)])
    svars = stem.init(rng, z)

    @jax.jit
    def stem_only(v, x):
        return jnp.sum(stem.apply(v, x))

    t = sync_time(stem_only, (svars, x2n), 30)
    stem_flops = 2 * batch * 112 * 112 * 7 * 7 * 3 * 64 * 2
    note(exp="stem_only_2n", ms=round(t * 1e3, 3),
         mfu_pct=round(100 * stem_flops / t / 197e12, 1))

    # --- batch scaling -----------------------------------------------------
    for bsz in (256, 512):
        try:
            aa = jnp.asarray(host.integers(0, 256, (bsz, size, size, 3),
                                           dtype=np.uint8))
            bb_ = jnp.asarray(host.integers(0, 256, (bsz, size, size, 3),
                                            dtype=np.uint8))
            t = sync_time(score, (variables, aa, bb_), 10)
            note(exp=f"baseline_b{bsz}", ms=round(t * 1e3, 3),
                 pairs_per_s=round(bsz / t, 1),
                 mfu_pct=round(100 * bsz * flops_per_pair / t / 197e12, 1))
        except Exception as e:
            note(exp=f"baseline_b{bsz}", error=str(e)[:200])

    # --- fp8-free bf16 end to end? check dtype of taps ----------------------
    emb, taps = bb.apply(bvars, x2n[:2])
    note(exp="tap_dtypes", dtypes={k: str(v.dtype) for k, v in taps.items()})


if __name__ == "__main__":
    main()

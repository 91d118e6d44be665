"""A/B the fused Pallas decoder levels vs the XLA decoder on the real chip.

Times CluUnet.decode_from_diffs (eval mode) against
fused_serving_decode at the serving shapes (224px, b32) for several
``fuse_levels`` choices, then the full CLU model (tower + decoder).

Timing per CLAUDE.md: queue iterations without sync, jax.device_get at the
end (block_until_ready returns early on axon).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from srsem.models.local_models import CluUnet, fused_serving_decode

BATCH, SIZE, ITERS = 32, 224, 30


def timeit(fn, *args, iters=ITERS):
    out = fn(*args)
    jax.device_get(out[..., :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out[..., :1])
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for dd in (jnp.bfloat16, jnp.float32):
        model = CluUnet(backbone_kind="resnet50_clip", decoder_dtype=dd,
                        image_size=SIZE)
        z = jnp.zeros((1, SIZE, SIZE, 3))
        variables = model.init(jax.random.PRNGKey(0), z, z, train=False)

        chans = (64, 256, 512, 1024, 2048)
        diffs = [jnp.asarray(rng.uniform(0, 0.5, (
            BATCH, SIZE // 2 ** (i + 1), SIZE // 2 ** (i + 1), c))
            .astype(np.float32)).astype(dd) for i, c in enumerate(chans)]

        xla_fn = jax.jit(lambda v, ds: model.apply(
            v, ds, None, False, method=CluUnet.decode_from_diffs))
        t_xla = timeit(xla_fn, variables, diffs)
        print(f"--- decoder A/B, b{BATCH} {SIZE}px, decoder_dtype="
              f"{jnp.dtype(dd).name} ---", flush=True)
        print(f"  xla decode_from_diffs: {t_xla*1e3:7.2f} ms "
              f"({BATCH/t_xla:7.1f} maps/s)", flush=True)

        # (fuse_levels, tiled_rows): {} = whole-image kernels; None =
        # the production default (L0/L1 halo-tiled); explicit dicts probe
        # tile sizes.
        for levels, rows in [
                ((0,), {}), ((0,), {0: 8}), ((0,), {0: 16}),
                ((1,), {}), ((1,), {1: 8}), ((1,), {1: 14}),
                ((2,), {}), ((3,), {}),
                ((0, 1, 2), None), ((0, 1, 2), {}),
                ((0, 1, 2, 3), None)]:
            fused_fn = jax.jit(
                lambda v, ds, lv=levels, tr=rows: fused_serving_decode(
                    model, v, ds, fuse_levels=lv, tiled_rows=tr))
            try:
                t = timeit(fused_fn, variables, diffs)
            except Exception as e:
                print(f"  fused levels={levels} rows={rows}: FAILED "
                      f"{str(e)[:160]}", flush=True)
                continue
            want = np.asarray(jax.device_get(xla_fn(variables, diffs)),
                              np.float32)
            got = np.asarray(jax.device_get(fused_fn(variables, diffs)),
                             np.float32)
            err = float(np.abs(want - got).max())
            print(f"  fused levels={levels} rows={rows}: {t*1e3:7.2f} ms "
                  f"({BATCH/t:7.1f} maps/s)  speedup {t_xla/t:5.2f}x  "
                  f"maxerr {err:.4f}", flush=True)

        # full model: tower + decoder
        full_xla = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))
        a = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3))
                        .astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3))
                        .astype(np.float32))
        t_full = timeit(full_xla, variables, a, b)
        print(f"  full model xla: {t_full*1e3:7.2f} ms "
              f"({BATCH/t_full:7.1f} maps/s)", flush=True)


if __name__ == "__main__":
    main()

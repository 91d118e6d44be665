"""A/B the Pallas fused bottleneck vs the XLA conv chain on the real chip.

Run on the TPU (no env overrides).  Times (1) each stage's stride-1
bottleneck at 224px feature shapes via a CHAINED lax.scan — the block
output feeds the next input, so one dispatch covers all iterations and the
axon relay's per-call latency (which distorted an earlier per-dispatch
A/B into 647 ms/block readings) cancels out — and (2) the full fused
tower (srsem/backbones/fused_resnet.py) against ``backbone.apply`` at the
bench batch size.

Timing per CLAUDE.md: sync with jax.device_get (block_until_ready returns
early on axon).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from srsem.backbones.fused_resnet import fused_apply
from srsem.backbones.resnet import ImageNetResNet50, ClipResNet50
from srsem.ops.fused_bottleneck import fused_bottleneck

ITERS = 30


def chain_time(step, x, iters=ITERS, reps=3):
    """Median wall time of one chained step: scan(step, x, length=iters)."""

    @jax.jit
    def run(x):
        return jax.lax.scan(lambda h, _: (step(h), None), x,
                            None, length=iters)[0]

    out = run(x)  # compile + warm
    jax.device_get(out.reshape(-1)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x)
        jax.device_get(out.reshape(-1)[0])
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2]


def ab_blocks(batch=128):
    """Per-stage block A/B at 224px tower shapes, chained-scan timing."""
    rng = np.random.default_rng(0)
    print(f"--- per-block A/B (chained x{ITERS}), batch={batch}, bf16 ---",
          flush=True)
    for (hw, c, wd) in [(56, 256, 64), (28, 512, 128),
                        (14, 1024, 256), (7, 2048, 512)]:
        x = jnp.asarray(rng.normal(size=(batch, hw, hw, c))
                        .astype(np.float32)).astype(jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(c, wd)).astype(np.float32) * 0.05)
        b1 = jnp.zeros((wd,))
        w2 = jnp.asarray(rng.normal(size=(3, 3, wd, wd)).astype(np.float32) * 0.05)
        b2 = jnp.zeros((wd,))
        w3 = jnp.asarray(rng.normal(size=(wd, c)).astype(np.float32) * 0.05)
        b3 = jnp.zeros((c,))

        def xla_step(h):
            h1 = jax.nn.relu(
                jnp.einsum("nhwc,cd->nhwd", h,
                           w1.astype(h.dtype)) + b1.astype(h.dtype))
            h2 = jax.lax.conv_general_dilated(
                h1, w2.astype(h.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h2 = jax.nn.relu(h2 + b2.astype(h.dtype))
            y = jnp.einsum("nhwd,dc->nhwc", h2, w3.astype(h.dtype))
            return jax.nn.relu(y + b3.astype(h.dtype) + h)

        fused_step = functools.partial(
            fused_bottleneck, w1=w1, b1=b1, w2=w2, b2=b2, w3=w3, b3=b3)

        try:
            t_fused = chain_time(fused_step, x)
            got = fused_step(x)
            want = xla_step(x)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - want.astype(jnp.float32))))
        except Exception as e:
            print(f"  {hw}x{hw}x{c}: FUSED FAILED: {str(e)[:200]}")
            continue
        t_xla = chain_time(xla_step, x)
        gb = 2 * x.size * x.dtype.itemsize / 1e9  # read x + write y
        print(f"  {hw:3d}x{hw}x{c:4d}: xla {t_xla*1e3:7.3f} ms "
              f"({gb/t_xla:6.0f} GB/s io)  fused {t_fused*1e3:7.3f} ms "
              f"({gb/t_fused:6.0f} GB/s io)  speedup {t_xla/t_fused:5.2f}x  "
              f"maxerr {err:.4f}", flush=True)


def ab_tower(kind, batch=128, size=224, fuse_stages=(1, 2, 3)):
    print(f"--- full tower A/B: {kind}, batch={batch}, {size}px, "
          f"fuse_stages={fuse_stages} ---", flush=True)
    model = (ImageNetResNet50(dtype=jnp.bfloat16) if kind == "resnet50"
             else ClipResNet50(dtype=jnp.bfloat16, image_size=size))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 3))
                    .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)))
    params = variables["params"]

    flax_fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
    fused_fn = jax.jit(lambda p, x: fused_apply(kind, p, x,
                                                fuse_stages=fuse_stages))

    def timeit(fn, iters=20):
        out = fn(params, x)
        jax.device_get(out[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, x)
        jax.device_get(out[0])
        return (time.perf_counter() - t0) / iters

    t_fused = None
    for attempt in range(3):  # the axon remote-compile helper 500s flakily
        try:
            t_fused = timeit(fused_fn)
            break
        except Exception as e:
            print(f"  fused tower attempt {attempt}: {str(e)[:200]}",
                  flush=True)
            time.sleep(5)
    if t_fused is None:
        print("  fused tower FAILED (3 attempts)")
        return
    t_flax = timeit(flax_fn)

    _, taps_a = flax_fn(params, x)
    _, taps_b = fused_fn(params, x)
    err = max(float(jnp.max(jnp.abs(taps_a[k].astype(jnp.float32)
                                    - taps_b[k].astype(jnp.float32))))
              for k in taps_a)
    print(f"  flax {t_flax*1e3:7.2f} ms ({batch/t_flax:7.1f} img/s)   "
          f"fused {t_fused*1e3:7.2f} ms ({batch/t_fused:7.1f} img/s)   "
          f"speedup {t_flax/t_fused:5.2f}x   max tap err {err:.4f}",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    ab_blocks()
    ab_tower("resnet50_clip")
    ab_tower("resnet50")
    # stage 0 via the halo-tiled kernel (TILED_STAGE_ROWS)
    ab_tower("resnet50", fuse_stages=(0, 1, 2, 3))
    ab_tower("resnet50_clip", fuse_stages=(0, 1, 2, 3))
    # BASELINE config #1 is a 512px pair: stage activations are ~5.2x
    # larger, so VMEM-residency saves proportionally more HBM traffic.
    ab_tower("resnet50", batch=16, size=512)
    ab_tower("resnet50_clip", batch=16, size=512)

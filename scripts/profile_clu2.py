"""CLU decoder micro-experiments: split-conv vs concat-conv at the wide
shallow levels (L0/L1), f32 vs bf16.

conv(concat([d, u])) == conv_d(d) + conv_u(u) exactly (kernel sliced along
input channels) — the split form never materializes the (112,112,320)
concat and lets XLA fuse conv_u with the upsample einsum's output.

Usage: python scripts/profile_clu2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from benchlib import note, sync_time  # noqa: E402


def main():
    from srsem.ops.image import upsample_x2_align_corners

    rng = jax.random.PRNGKey(0)
    n = 32

    # L0 geometry at 224px: diff (n,112,112,64), h pre-upsample (n,56,56,256).
    for dtype_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        d0 = jax.random.normal(rng, (n, 112, 112, 64), dt)
        h1 = jax.random.normal(jax.random.PRNGKey(1), (n, 56, 56, 256), dt)
        w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 320, 64), dt) * 0.05
        b = jnp.zeros((64,), dt)

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def concat_form(d0, h1, w, b):
            u = upsample_x2_align_corners(h1, compute_dtype=dt)
            x = jnp.concatenate([d0, u], axis=-1)
            return jnp.sum(jax.nn.relu(conv(x, w) + b))

        @jax.jit
        def split_form(d0, h1, w, b):
            u = upsample_x2_align_corners(h1, compute_dtype=dt)
            y = conv(d0, w[:, :, :64]) + conv(u, w[:, :, 64:]) + b
            return jnp.sum(jax.nn.relu(y))

        # numerics check (f32 exact)
        if dt == jnp.float32:
            va = concat_form(d0, h1, w, b)
            vb = split_form(d0, h1, w, b)
            note(exp="l0_split_check",
                 rel_err=float(abs(va - vb) / (abs(va) + 1e-9)))

        tc = sync_time(concat_form, (d0, h1, w, b), 20)
        ts = sync_time(split_form, (d0, h1, w, b), 20)
        note(exp=f"l0_{dtype_name}", concat_ms=round(tc * 1e3, 3),
             split_ms=round(ts * 1e3, 3), speedup=round(tc / ts, 2))

    # L1 geometry: diff (n,56,56,256), h (n,28,28,512), conv 768->256.
    for dtype_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        d1 = jax.random.normal(rng, (n, 56, 56, 256), dt)
        h2 = jax.random.normal(jax.random.PRNGKey(3), (n, 28, 28, 512), dt)
        w1 = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 768, 256), dt) * 0.05
        b1 = jnp.zeros((256,), dt)

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def concat_form(d, h, w, b):
            u = upsample_x2_align_corners(h, compute_dtype=dt)
            return jnp.sum(jax.nn.relu(
                conv(jnp.concatenate([d, u], axis=-1), w) + b))

        @jax.jit
        def split_form(d, h, w, b):
            u = upsample_x2_align_corners(h, compute_dtype=dt)
            return jnp.sum(jax.nn.relu(
                conv(d, w[:, :, :256]) + conv(u, w[:, :, 256:]) + b))

        tc = sync_time(concat_form, (d1, h2, w1, b1), 20)
        ts = sync_time(split_form, (d1, h2, w1, b1), 20)
        note(exp=f"l1_{dtype_name}", concat_ms=round(tc * 1e3, 3),
             split_ms=round(ts * 1e3, 3), speedup=round(tc / ts, 2))


if __name__ == "__main__":
    main()

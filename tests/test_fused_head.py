"""Pallas fused scoring kernel vs the reference aggregation numerics
(interpreter mode on CPU — same kernel code path as TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srsem.ops.fused_head import fused_global_score, fused_stage_score


def test_fused_stage_score_matches_dense_math(np_rng):
    n, h, w, c = 3, 8, 8, 32
    fa = np_rng.standard_normal((n, h, w, c)).astype(np.float32)
    fb = np_rng.standard_normal((n, h, w, c)).astype(np.float32)
    wt = np_rng.standard_normal((c,)).astype(np.float32)
    b = np.float32(0.3)

    got = np.asarray(fused_stage_score(
        jnp.asarray(fa), jnp.asarray(fb), jnp.asarray(wt), jnp.asarray(b),
        interpret=True))
    want = ((fa - fb) ** 2 @ wt).mean(axis=(1, 2)) + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_global_score_matches_aggregator(np_rng):
    """Kernel path == ConvHeadAggregator == reference aggregation
    (models/global_eval_models.py:379-395)."""
    from srsem.models.global_models import ConvHeadAggregator

    shapes = {"s0": (2, 8, 8, 16), "s1": (2, 4, 4, 32)}
    taps_a = {k: np_rng.standard_normal(v).astype(np.float32)
              for k, v in shapes.items()}
    taps_b = {k: np_rng.standard_normal(v).astype(np.float32)
              for k, v in shapes.items()}
    names = ("s0", "s1")

    agg = ConvHeadAggregator(len(names))
    diffs = [(jnp.asarray(taps_a[n]) - jnp.asarray(taps_b[n])) ** 2
             for n in names]
    vs = agg.init(jax.random.PRNGKey(0), diffs)
    want = np.asarray(agg.apply(vs, diffs))

    got = np.asarray(fused_global_score(
        {k: jnp.asarray(v) for k, v in taps_a.items()},
        {k: jnp.asarray(v) for k, v in taps_b.items()},
        vs["params"], names, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_stage_score_tiling_path(np_rng):
    """Force multi-tile grids by shrinking the VMEM budget."""
    import srsem.ops.fused_head as fh

    n, h, w, c = 2, 16, 16, 8
    fa = np_rng.standard_normal((n, h, w, c)).astype(np.float32)
    fb = np_rng.standard_normal((n, h, w, c)).astype(np.float32)
    wt = np_rng.standard_normal((c,)).astype(np.float32)

    old = fh._VMEM_BUDGET
    try:
        fh._VMEM_BUDGET = 64 * 8 * 4  # 64 rows per tile → 4 tiles
        assert fh._tile_rows(h * w, c, 4) < h * w
        got = np.asarray(fh.fused_stage_score(
            jnp.asarray(fa), jnp.asarray(fb), jnp.asarray(wt),
            jnp.asarray(np.float32(0.0)), interpret=True))
    finally:
        fh._VMEM_BUDGET = old
    want = ((fa - fb) ** 2 @ wt).mean(axis=(1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

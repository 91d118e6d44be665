"""Benchmark: GT/SR image-pairs/sec/chip for the global CLIP-LPIPS score.

Measures the device-side scoring path of the flagship global regressor
(ImageNet ResNet-50 backbone, depth 3 — the reference README's winning
variant) at 224px in bfloat16: uint8 batch → normalize → dual backbone
pass → squared-diff 1x1-conv heads → scalar scores.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json north star of 20k
pairs/min on a v5e-8 slice = 41.67 pairs/sec/chip.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_SEC_PER_CHIP = 20_000 / 60 / 8  # north star, v5e-8


def main() -> None:
    from srsem.core.config import BackboneConfig, GlobalModelConfig
    from srsem.core.meshes import batch_sharding, create_mesh, replicated_sharding
    from srsem.data.preprocess import Preprocess
    from srsem.models.global_models import make_global_model

    batch = 128
    size = 224
    cfg = GlobalModelConfig(
        backbone=BackboneConfig(kind="resnet50", image_size=size,
                                compute_dtype="bfloat16"),
        head="stages_cnn", depth=3)
    model = make_global_model(cfg)
    pre = Preprocess.for_backbone("resnet50", size)

    rng = jax.random.PRNGKey(0)
    init_img = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(rng, init_img, init_img)

    mesh = create_mesh()
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    variables = jax.device_put(variables, repl)

    @jax.jit
    def score(variables, a_u8, b_u8):
        return model.apply(variables, pre.device_normalize(a_u8),
                           pre.device_normalize(b_u8))

    host_rng = np.random.default_rng(0)
    a = jax.device_put(
        host_rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8), data)
    b = jax.device_put(
        host_rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8), data)

    # Warm up / compile.  NOTE: sync via device_get — on the axon TPU
    # platform block_until_ready returns before execution finishes, which
    # inflates throughput ~100x (measured).
    jax.device_get(score(variables, a, b))

    n_iters = 30
    t0 = time.perf_counter()
    out = None
    for _ in range(n_iters):
        out = score(variables, a, b)
    jax.device_get(out)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    pairs_per_sec_per_chip = (batch * n_iters) / dt / n_chips
    print(json.dumps({
        "metric": "global_cliplpips_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec_per_chip, 2),
        "unit": "image_pairs/sec/chip",
        "vs_baseline": round(
            pairs_per_sec_per_chip / BASELINE_PAIRS_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()

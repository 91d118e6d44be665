"""Why does bench's clu_maps_512px (167 maps/s) trail the roofline probe
(252 maps/s)?  A/B in one TPU claim, batch 8, bf16 tower + bf16 decoder:

* full-map output (the bench/serving form: (8, 512, 512) f32 out) vs a
  reduced scalar+corner output (the roofline probe form) — does
  materializing/holding the 8 MB output per call cost ~16 ms on axon?
* model built at image_size=512 vs built at 224 and applied at 512
  (bench reuses the 224 model) — any shape-specialization effect?
* device_put-sharded inputs (bench) vs plain device arrays (probe).

Usage: python scripts/ab_clu512_output.py   (claims the TPU; run alone).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from benchlib import note, sync_time  # noqa: E402


def main():
    from srsem.core.meshes import batch_sharding, create_mesh, replicated_sharding
    from srsem.data.preprocess import Preprocess
    from srsem.models.local_models import CluUnet

    size, batch = 512, 8
    rng = jax.random.PRNGKey(0)
    host = np.random.default_rng(0)
    pre = Preprocess.for_backbone("resnet50_clip", size)
    mesh = create_mesh(1, 1, devices=[jax.devices()[0]])
    data = batch_sharding(mesh)
    repl = replicated_sharding(mesh)

    a_np = host.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    b_np = host.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)

    for build_size in (512, 224):
        model = CluUnet(backbone_kind="resnet50_clip",
                        compute_dtype=jnp.bfloat16,
                        decoder_dtype=jnp.bfloat16, image_size=build_size)
        z = jnp.zeros((1, build_size, build_size, 3), jnp.float32)
        variables = jax.device_put(model.init(rng, z, z, train=False), repl)

        @jax.jit
        def full_map(v, a, b, model=model):
            return model.apply(v, pre.device_normalize(a),
                               pre.device_normalize(b), train=False)

        @jax.jit
        def reduced(v, a, b, model=model):
            m = model.apply(v, pre.device_normalize(a),
                            pre.device_normalize(b), train=False)
            return jnp.sum(m), m[0, :4, :4]

        for in_name, (aa, bb) in (
                ("sharded", (jax.device_put(a_np, data),
                             jax.device_put(b_np, data))),
                ("plain", (jnp.asarray(a_np), jnp.asarray(b_np)))):
            for out_name, fn in (("full_map", full_map),
                                 ("reduced", reduced)):
                t = sync_time(fn, (variables, aa, bb), 15)
                note(exp=f"clu512_build{build_size}_{in_name}_{out_name}",
                     ms=round(t * 1e3, 2), maps_per_s=round(batch / t, 1))


if __name__ == "__main__":
    main()

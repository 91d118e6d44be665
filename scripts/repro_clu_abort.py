"""Minimal repro loop for the XLA:CPU SIGABRT in CLU programs on the
8-virtual-device mesh.  Runs the CLU split-eval program repeatedly."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
f = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in f:
    os.environ["XLA_FLAGS"] = (f + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from srsem.core.config import BackboneConfig, LocalModelConfig
from srsem.core.meshes import batch_sharding, create_mesh, replicated_sharding
from srsem.models.local_models import make_local_model

mesh = create_mesh()
repl = replicated_sharding(mesh)
data = batch_sharding(mesh)
cfg = LocalModelConfig(backbone=BackboneConfig(
    kind="resnet50_clip", image_size=64, compute_dtype="float32"))
model = make_local_model(cfg, split_tower=True)
z = jnp.zeros((1, 64, 64, 3))
vs = jax.device_put(model.init(jax.random.PRNGKey(0), z, z, train=False), repl)
r = np.random.default_rng(0)
a = jax.device_put(r.uniform(size=(8, 64, 64, 3)).astype(np.float32), data)
b = jax.device_put(r.uniform(size=(8, 64, 64, 3)).astype(np.float32), data)

@jax.jit
def ev(v, x, y):
    return model.apply(v, x, y, train=False)

for i in range(int(sys.argv[1]) if len(sys.argv) > 1 else 30):
    out = np.asarray(jax.device_get(ev(vs, a, b)))
    print(f"iter {i} ok mean={out.mean():.5f}", flush=True)
print("ALL OK")

import time, json
import jax, jax.numpy as jnp, numpy as np
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from srsem.core.config import BackboneConfig, LocalModelConfig
from srsem.core.meshes import create_mesh, replicated_sharding, batch_sharding
from srsem.data.preprocess import Preprocess
from srsem.models.local_models import make_local_model

size, b = 224, 32
rng = jax.random.PRNGKey(0)
host = np.random.default_rng(0)
mesh = create_mesh(); repl = replicated_sharding(mesh); data = batch_sharding(mesh)
lcfg = LocalModelConfig(backbone=BackboneConfig(kind="resnet50_clip", image_size=size, compute_dtype="bfloat16"))
m = make_local_model(lcfg)
pre = Preprocess.for_backbone("resnet50_clip", size)
z = jnp.zeros((1, size, size, 3))
vs = jax.device_put(m.init(rng, z, z, train=False), repl)
a = jax.device_put(host.integers(0,256,(b,size,size,3),dtype=np.uint8), data)
bb = jax.device_put(host.integers(0,256,(b,size,size,3),dtype=np.uint8), data)

@jax.jit
def two_apply(v, x, y):
    return m.apply(v, pre.device_normalize(x), pre.device_normalize(y), train=False)

@jax.jit
def concat_apply(v, x, y):
    xn = pre.device_normalize(x); yn = pre.device_normalize(y)
    n = xn.shape[0]
    def call(mod, a_, b_, train):
        emb, taps = mod.backbone(jnp.concatenate([a_, b_], axis=0))
        taps = jax.tree.map(jax.lax.stop_gradient, taps)
        ta = {k: v[:n] for k, v in taps.items()}
        tb = {k: v[n:] for k, v in taps.items()}
        return mod.decode_from_taps(ta, tb, a_, b_, train)
    return m.apply(v, xn, yn, False, method=call)

def tput(fn, iters=40):
    for _ in range(2): jax.device_get(fn(vs, a, bb))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters): out = fn(vs, a, bb)
    jax.device_get(out)
    return b*iters/(time.perf_counter()-t0)

r = {"two_apply": round(tput(two_apply),1), "concat": round(tput(concat_apply),1),
     "two_apply2": round(tput(two_apply),1), "concat2": round(tput(concat_apply),1)}
print(json.dumps(r))

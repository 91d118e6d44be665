"""On-chip A/B of the grouped scorer's group batch G (K=5 fixed).

Measured (healthy chip, session 3, 224px bf16, device-staged uint8):
G=8: 8,512-8,916 pairs/s; G=12: 7,616; G=16: 7,813; G=24: 8,408-8,705;
G=32: 7,647; G=48: 7,446 (bench) - G=8 wins; bench carries
global_grouped_gt5_g8 as the headline candidate.
"""
import json, sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from srsem.core.config import BackboneConfig, GlobalModelConfig
from srsem.core.meshes import batch_sharding, create_mesh, replicated_sharding
from srsem.data.preprocess import Preprocess
from srsem.models.global_models import make_global_model
from srsem.eval.grouped import GroupedPairScorer

size = 224
rng = jax.random.PRNGKey(0)
host = np.random.default_rng(0)
mesh = create_mesh(); repl = replicated_sharding(mesh); data = batch_sharding(mesh)
gcfg = GlobalModelConfig(backbone=BackboneConfig(kind="resnet50", image_size=size, compute_dtype="bfloat16"), head="stages_cnn", depth=3)
gmodel = make_global_model(gcfg)
z = jnp.zeros((1, size, size, 3), jnp.float32)
gvars = jax.device_put(gmodel.init(rng, z, z), repl)
K = 5
for G in (8, 12, 16, 24, 32):
    sc = GroupedPairScorer(gcfg, jax.device_get(gvars), k=K, mesh=mesh, batch_size=G)
    gt = jax.device_put(host.integers(0,256,(G,size,size,3),dtype=np.uint8), data)
    sr = jax.device_put(host.integers(0,256,(G,K,size,size,3),dtype=np.uint8), data)
    fn = lambda a,b: sc._score(sc._variables, a, b)
    for _ in range(2): jax.device_get(fn(gt, sr))
    t0 = time.perf_counter(); out = None
    iters = max(10, 480 // G)
    for _ in range(iters): out = fn(gt, sr)
    jax.device_get(out)
    print(json.dumps({"G": G, "pairs_per_sec": round(G*K*iters/(time.perf_counter()-t0),1)}), flush=True)

"""Single-CPU-device timing of the CLU forward's pieces, to find what
makes the 8-virtual-device dryrun CLU step slow (it is NOT collectives:
fwd train=True and train=False both cost ~64 s on the mesh)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from srsem.core.config import BackboneConfig, LocalModelConfig
from srsem.models.local_models import CluUnet, make_local_model

t0 = time.monotonic()


def mark(msg):
    print(f"[{time.monotonic() - t0:7.1f}s] {msg}", flush=True)


rng = jax.random.PRNGKey(0)
batch = 1  # one pair = one dryrun shard
a = jnp.zeros((batch, 64, 64, 3), jnp.float32)
b = jnp.ones((batch, 64, 64, 3), jnp.float32)

lcfg = LocalModelConfig(
    backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                            compute_dtype="float32"))
lmodel = make_local_model(lcfg, split_tower=True)
lvars = lmodel.init(rng, a, b, train=False)
mark("init done")


def timeit(name, fn, *args):
    out = jax.device_get(fn(*args))
    mark(f"{name}: compiled")
    for _ in range(2):
        t1 = time.monotonic()
        out = jax.device_get(fn(*args))
        mark(f"{name}: exec {time.monotonic() - t1:.2f}s")
    return out


@jax.jit
def full_fwd(v, a, b):
    return lmodel.apply(v, a, b, train=False).sum()


timeit("full fwd", full_fwd, lvars, a, b)

backbone = lmodel.bind(lvars).backbone  # bound module for tower-only


@jax.jit
def tower_only(v, a):
    bvars = {"params": v["params"]["backbone"]}
    if "batch_stats" in v and "backbone" in v.get("batch_stats", {}):
        bvars["batch_stats"] = v["batch_stats"]["backbone"]
    from srsem.backbones.resnet import ClipResNet50

    m = ClipResNet50(dtype=jnp.float32, image_size=64)
    emb, taps = m.apply(bvars, a)
    return sum(jnp.sum(t) for t in taps.values()) + jnp.sum(emb)


timeit("tower only", tower_only, lvars, a)


@jax.jit
def decoder_only(v, a, b):
    from srsem.backbones.resnet import ClipResNet50, CLIP_STEM_TAP, \
        CLIP_STAGE_TAPS

    m = ClipResNet50(dtype=jnp.float32, image_size=64)
    bvars = {"params": v["params"]["backbone"]}
    _, ta = m.apply(bvars, a)
    _, tb = m.apply(bvars, b)
    names = (CLIP_STEM_TAP,) + CLIP_STAGE_TAPS
    diffs = [(ta[n].astype(jnp.float32) - tb[n].astype(jnp.float32)) ** 2
             for n in names]
    maps = lmodel.apply(lvars, diffs, None, False,
                        method=CluUnet.decode_from_diffs)
    return maps.sum()


timeit("tower x2 + decoder via decode_from_diffs", decoder_only, lvars, a, b)

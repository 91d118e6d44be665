"""Diagnose the CLU dryrun step cost on the 8-virtual-device CPU mesh.

MULTICHIP_r02 timed out on the CLU train step; with the persistent
compilation cache pre-warmed the dryrun passes but the CLU step still
took ~805 s of mostly sys-time on this 1-core host, vs ~125 s measured
for the identical replicated step compiled in-process.  Hypotheses:

  (a) the cache-loaded AOT executable executes pathologically
      (different thunk scheduling / feature-mismatch fallback), or
  (b) XLA:CPU collective rendezvous (BatchNorm psum chain) spins, and
      the earlier 125 s reading was lucky scheduling.

Usage:  python scripts/diag_clu_dryrun.py [--no-cache] [--scheduler]
        [--fwd-only] [--train-false] [--mesh1d]

Each flag combination is a separate process run (XLA flags must be set
before backend init).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-cache", action="store_true",
                    help="skip the persistent compilation cache")
    ap.add_argument("--scheduler", action="store_true",
                    help="enable xla_cpu_enable_concurrency_optimized_scheduler")
    ap.add_argument("--fwd-only", action="store_true",
                    help="time jitted forward (train=True) instead of train step")
    ap.add_argument("--train-false", action="store_true",
                    help="with --fwd-only: eval-mode BN (no psum chain)")
    ap.add_argument("--mesh1d", action="store_true",
                    help="use a 1D (data=8) mesh instead of (data=4, model=2)")
    args = ap.parse_args()

    n_devices = 8
    flags = os.environ.get("XLA_FLAGS", "")
    flags += f" --xla_force_host_platform_device_count={n_devices}"
    flags += (" --xla_cpu_collective_timeout_seconds=1200"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
    if args.scheduler:
        flags += " --xla_cpu_enable_concurrency_optimized_scheduler=true"
    os.environ["XLA_FLAGS"] = flags.strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    if not args.no_cache:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_dryrun_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import optax

    from srsem.core.config import BackboneConfig, LocalModelConfig
    from srsem.core.meshes import batch_sharding, create_mesh, \
        replicated_sharding
    from srsem.models.local_models import make_local_model
    from srsem.train.partition import partition_params, trainable_predicate
    from srsem.train.steps import build_step_fns

    t0 = time.monotonic()

    def mark(msg):
        print(f"[{time.monotonic() - t0:7.1f}s] {msg}", flush=True)

    devices = jax.devices("cpu")[:n_devices]
    if args.mesh1d:
        mesh = create_mesh(data=8, model=1, devices=devices)
    else:
        mesh = create_mesh(data=4, model=2, devices=devices)
    mark(f"mesh ready {dict(mesh.shape)}")

    rng = jax.random.PRNGKey(0)
    batch = 8
    a = jnp.zeros((batch, 64, 64, 3), jnp.float32)
    b = jnp.ones((batch, 64, 64, 3), jnp.float32)
    mask = jnp.ones((batch,), jnp.float32)
    y_map = jnp.zeros((batch, 64, 64), jnp.float32)

    lcfg = LocalModelConfig(
        backbone=BackboneConfig(kind="resnet50_clip", image_size=64,
                                compute_dtype="float32"))
    lmodel = make_local_model(lcfg, split_tower=mesh.shape["data"] > 1)
    lvariables = lmodel.init(rng, a[:1], b[:1], train=False)
    mark("CLU init done")

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    l_trainable, l_frozen = partition_params(
        lvariables["params"], trainable_predicate())
    tx = optax.adam(1e-4)
    l_opt = tx.init(l_trainable)
    l_frozen = jax.device_put(l_frozen, repl)
    l_trainable = jax.device_put(l_trainable, repl)
    l_opt = jax.device_put(l_opt, repl)
    l_stats = jax.device_put(lvariables.get("batch_stats", {}), repl)
    a, b, mask, y_map = (jax.device_put(x, data) for x in (a, b, mask, y_map))
    mark("params placed")

    if args.fwd_only:
        train_flag = not args.train_false

        @jax.jit
        def fwd(tr, fr, stats, a, b):
            params = {**fr, **tr}
            variables = {"params": params, "batch_stats": stats}
            if train_flag:
                out, upd = lmodel.apply(
                    variables, a, b, train=True, mutable=["batch_stats"])
                return out.sum() + sum(
                    jnp.sum(x) for x in jax.tree.leaves(upd))
            return lmodel.apply(variables, a, b, train=False).sum()

        mark(f"fwd(train={train_flag}): compile+exec starting")
        out = jax.device_get(fwd(l_trainable, l_frozen, l_stats, a, b))
        mark(f"fwd done out={out}")
        t1 = time.monotonic()
        out = jax.device_get(fwd(l_trainable, l_frozen, l_stats, a, b))
        mark(f"fwd 2nd exec done in {time.monotonic() - t1:.1f}s")
        return

    l_steps = build_step_fns(lmodel, tx, mesh, is_map_model=True)
    mark("train step: compile+exec starting")
    new_tr, new_opt, new_stats, l_loss = l_steps.train_step(
        l_trainable, l_opt, l_frozen, l_stats, (a, b), y_map, mask)
    l_loss = jax.device_get(l_loss)
    mark(f"train step done loss={float(l_loss):.6f}")
    t1 = time.monotonic()
    # trainable/opt_state/batch_stats are donated — chain the new state.
    _, _, _, l_loss = l_steps.train_step(
        new_tr, new_opt, l_frozen, new_stats, (a, b), y_map, mask)
    jax.device_get(l_loss)
    mark(f"train step 2nd exec done in {time.monotonic() - t1:.1f}s")


if __name__ == "__main__":
    main()

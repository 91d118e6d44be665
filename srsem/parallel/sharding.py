"""GSPMD parameter-sharding rules.

The reference has no model parallelism (SURVEY.md §2.9) — at ~25M params the
models fit trivially and data parallelism is the warranted strategy.  The
framework still supports a ``model`` mesh axis: large conv kernels and dense
layers shard their output-channel dim, giving tensor parallelism "for free"
through GSPMD (XLA inserts the all-gathers/reduce-scatters).  It exists so
the multi-chip path exercises >1D meshes (and for future, larger towers);
``dryrun_multichip`` validates it compiles and runs.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srsem.core.meshes import MODEL_AXIS


def _spec_for(path, leaf, min_shard_dim: int) -> P:
    """Shard the trailing (output-channel) dim of big kernels over the model
    axis; replicate everything else.  BN statistics and biases stay
    replicated (they are O(channels))."""
    name = path[-1] if path else ""
    if name not in ("kernel",):
        return P()
    if leaf.ndim < 2 or leaf.shape[-1] < min_shard_dim:
        return P()
    return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))


def param_pspecs(params, min_shard_dim: int = 1024):
    """PartitionSpec pytree for a param tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec(path, leaf):
        names = tuple(
            getattr(p, "key", getattr(p, "name", None)) for p in path)
        return _spec_for([n for n in names if n is not None], leaf, min_shard_dim)

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec(path, leaf), params)


def param_shardings(mesh: Mesh, params, min_shard_dim: int = 1024):
    """NamedSharding pytree for a param tree over ``mesh``.

    When the mesh has a trivial model axis this degenerates to full
    replication, so the same code path serves 1-chip and N-chip runs.
    """
    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    specs = param_pspecs(params, min_shard_dim)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))

"""Checkpointing: (trainable params, opt state, step, batch_stats).

Upgrades the reference's per-epoch ``torch.save(state_dict)`` with no
optimizer state and no resume (reference:
CLIPLPIPS_REG_training_sweep_example.py:95, models/global_eval_models.py:
419-429) to resumable checkpoints, while keeping the reference's
"trainable-subset-only" semantic: the frozen backbone is never written.

Uses Orbax when available; falls back to flax msgpack serialization (both
are pure-pytree formats — no pickle of code).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(directory: str, step: int, tree: Dict[str, Any],
                    keep_last: Optional[int] = None) -> str:
    """Write ``tree`` (any pytree of arrays) to ``directory/step_N.msgpack``
    and update ``latest.json``.  Returns the checkpoint path.

    ``keep_last``: retention policy — after a successful write, delete all
    but the newest N ``step_*.msgpack`` files (None = keep everything, the
    reference's per-epoch torch.save behavior).  Files with step numbers
    GREATER than the one just written are leftovers from a previous run in
    a reused directory (``latest.json`` no longer points at them) and are
    pruned as stale rather than squatting in the keep_last slots.  Pruning
    never touches the file just written and only runs after
    ``latest.json`` points at it, so a crash mid-prune can't lose the
    newest checkpoint."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}.msgpack")
    tree = jax.device_get(tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    # latest.json is the crash-safety linchpin (see docstring), so its own
    # write must be atomic: a kill/disk-full mid-json.dump would leave a
    # truncated pointer and brick every future restore even though valid
    # step files exist.  Write-to-temp + os.replace is atomic on POSIX.
    meta = os.path.join(directory, "latest.json")
    tmp = meta + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"step": step, "path": path}, f)
    os.replace(tmp, meta)
    if keep_last is not None and keep_last > 0:
        # Prune by the LISTED filenames, not names re-derived from the
        # parsed step: "step_0010.msgpack" parses to 10 but re-deriving
        # "step_10.msgpack" would os.remove a non-existent path (and
        # "step_7"/"step_07" would double-delete one step).
        entries = sorted(
            (int(name[len("step_"):-len(".msgpack")]), name)
            for name in os.listdir(directory)
            if name.startswith("step_") and name.endswith(".msgpack")
            and name[len("step_"):-len(".msgpack")].isdigit())
        fresh = [e for e in entries if e[0] <= step]
        stale = [e for e in entries if e[0] > step]
        for old, name in stale + fresh[:-keep_last]:
            if name != f"step_{step}.msgpack":
                os.remove(os.path.join(directory, name))
    return path


def latest_step(directory: str) -> Optional[int]:
    meta = os.path.join(directory, "latest.json")
    if not os.path.exists(meta):
        return None
    try:
        with open(meta) as f:
            return int(json.load(f)["step"])
    except (ValueError, KeyError):
        # Pointer corrupted by a pre-atomic-write crash: recover from the
        # step files themselves rather than bricking resume.
        steps = [int(n[len("step_"):-len(".msgpack")])
                 for n in os.listdir(directory)
                 if n.startswith("step_") and n.endswith(".msgpack")
                 and n[len("step_"):-len(".msgpack")].isdigit()]
        return max(steps) if steps else None


def restore_checkpoint(directory: str, target: Optional[Dict[str, Any]] = None,
                       step: Optional[int] = None) -> Dict[str, Any]:
    """Restore a checkpoint.  With ``target`` the bytes are validated
    against its pytree structure; without one the raw nested dict is
    returned (useful to pull just the trainable subtree)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {directory}")
    path = os.path.join(directory, f"step_{step}.msgpack")
    with open(path, "rb") as f:
        payload = f.read()
    if target is None or not target:
        return serialization.msgpack_restore(payload)
    return serialization.from_bytes(target, payload)


class OrbaxCheckpointer:
    """Orbax-backed alternative (async-capable, sharding-aware) with the
    same trainable-subset contract.  Use for multi-host runs; the msgpack
    path above stays the dependency-light default."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(self.directory)

    def save(self, step: int, tree: Dict[str, Any]) -> None:
        self.manager.save(step, args=self._ocp.args.StandardSave(tree))
        self.manager.wait_until_finished()

    def restore(self, target: Dict[str, Any],
                step: Optional[int] = None) -> Dict[str, Any]:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoint under {self.directory}")
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(target))

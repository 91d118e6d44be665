"""Trainable/frozen parameter partitioning.

The reference freezes backbones by wrapping their forward in
``torch.no_grad`` and checkpointing only the trained subtree
(``save_model`` saves ``w_layers``/``decoder``/LoRA-augmented state dicts —
reference: models/global_eval_models.py:419-429,
models/local_eval_models.py:160-171).  The JAX-native equivalent: split the
param pytree into (trainable, frozen) by path predicate; only the trainable
half enters ``jax.grad`` and the optimizer, and only it is checkpointed.
XLA then constant-folds nothing but also never materializes frozen grads.
"""

from __future__ import annotations

from typing import Callable, Tuple

from flax import traverse_util

PathPredicate = Callable[[Tuple[str, ...]], bool]


def trainable_predicate(
    enc_ft: bool = False,
    lora: bool = False,
    full_finetune: bool = False,
    backbone_key: str = "backbone",
) -> PathPredicate:
    """Which param paths train:

    * default       — everything outside the backbone (heads / decoder);
    * ``lora``      — additionally the backbone's ``lora_a``/``lora_b``;
    * ``enc_ft`` / ``full_finetune`` — everything.
    """

    def pred(path: Tuple[str, ...]) -> bool:
        if enc_ft or full_finetune:
            return True
        if path[0] != backbone_key:
            return True
        if lora and any(p in ("lora_a", "lora_b") for p in path):
            return True
        return False

    return pred


def partition_params(params, predicate: PathPredicate):
    """Split a nested param dict → (trainable, frozen) flat-path dicts."""
    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if predicate(k)}
    frozen = {k: v for k, v in flat.items() if not predicate(k)}
    return (
        traverse_util.unflatten_dict(trainable),
        traverse_util.unflatten_dict(frozen),
    )


def merge_params(trainable, frozen):
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(trainable))
    return traverse_util.unflatten_dict(flat)

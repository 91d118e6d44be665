"""Pluggable metric writers (stdout / JSONL / composite).

The reference logs per-batch and per-epoch losses to wandb
(reference: CLIPLPIPS_REG_training_sweep_example.py:74-98).  Here logging is
dependency-free: a writer protocol with stdout and JSONL implementations;
a wandb adapter can be added without touching the loop.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Dict, Optional


class StdoutWriter:
    def __init__(self, prefix: str = ""):
        self.prefix = prefix

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        body = " ".join(f"{k}={v:.6g}" for k, v in metrics.items())
        print(f"{self.prefix}[step {step}] {body}", file=sys.stderr, flush=True)

    def close(self) -> None:
        pass


class JsonlWriter:
    def __init__(self, path: str):
        self.f = open(path, "a")

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()

    def close(self) -> None:
        self.f.close()


class MultiWriter:
    def __init__(self, *writers):
        self.writers = writers

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        for w in self.writers:
            w.write(step, metrics)

    def close(self) -> None:
        for w in self.writers:
            w.close()


class WandbWriter:
    """Optional wandb adapter — the reference logs through wandb
    (reference: CLIPLPIPS_REG_training_sweep_example.py:74-98).  Import is
    deferred so the framework has no hard wandb dependency."""

    def __init__(self, project: str, name: Optional[str] = None,
                 config: Optional[Dict] = None):
        import wandb  # noqa: F401 — gated optional dependency

        self._wandb = wandb
        self.run = wandb.init(project=project, name=name, config=config or {})

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._wandb.finish()


def default_writer(jsonl_path: Optional[str] = None, prefix: str = ""):
    if jsonl_path:
        return MultiWriter(StdoutWriter(prefix), JsonlWriter(jsonl_path))
    return StdoutWriter(prefix)

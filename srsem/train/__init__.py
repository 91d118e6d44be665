"""Training harness: jitted steps, param partitioning, metrics, checkpoints,
sweeps.  Replaces the reference's plain torch loops + wandb grid sweeps
(reference: CLIPLPIPS_REG_training_sweep_example.py,
CLU_training_sweep_example.py)."""

from srsem.train.partition import merge_params, partition_params, trainable_predicate  # noqa: F401
from srsem.train.metrics import mse, srcc  # noqa: F401
from srsem.train.loop import train_global, train_local  # noqa: F401

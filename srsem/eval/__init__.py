"""Evaluation: batched pair scorers, SRCC/MSE evaluators, dataset sweeps."""

from srsem.eval.scorer import PairScorer  # noqa: F401

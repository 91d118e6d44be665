"""Sparse concept decomposition: SpLiCE (ADMM/Lasso) + greedy text-span."""

from srsem.decompose.admm import admm_lasso  # noqa: F401
from srsem.decompose.splice import SpliceDecomposer  # noqa: F401
from srsem.decompose.greedy import GreedyDecomposer  # noqa: F401

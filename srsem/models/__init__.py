"""Pair-scoring models: global regressor heads and CLU local-map models."""

from srsem.models.global_models import GlobalPairScorer, make_global_model  # noqa: F401
from srsem.models.local_models import CluUnet, make_local_model  # noqa: F401

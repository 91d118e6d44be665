"""Core: configuration dataclasses, mesh/sharding helpers, dtype policy, PRNG."""

from srsem.core.config import (  # noqa: F401
    BackboneConfig,
    GlobalModelConfig,
    LocalModelConfig,
    MeshConfig,
    TrainConfig,
)
from srsem.core.meshes import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicated_sharding,
)

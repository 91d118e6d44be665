"""Local semantic-map pipeline: panoptic post-processing, region masks, and
per-pixel cosine-map assembly."""

from srsem.maps.panoptic import (  # noqa: F401
    filter_small_components,
    panoptic_to_masks,
    reassign_disconnected_components,
)
from srsem.maps.cosmap import assemble_cosine_map, write_cosine_map_dataset  # noqa: F401
